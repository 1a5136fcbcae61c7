"""Config-driven orchestration (api/orchestrate.py): the EFTLSS analogue.

Covers the reference's tracer-config merging/validation (theory.py:126-156),
product surface (theory.py:244-267) and the end-to-end config → logp path
for a two-tracer + cross analysis in template-fit mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.api.orchestrate import (
    Analysis,
    ParamSpace,
    merge_tracer_configs,
)


def test_merge_tracer_configs_default_and_cross():
    cfgs = merge_tracer_configs({
        "default": {"ls": [0, 2], "nd": 1e-4, "with_IRresum": True},
        "A": {"z": 0.5},
        "B": {"z": 0.8, "nd": 2e-4},
        "X": {"z": 0.6, "cross": ["A", "B"]},
    })
    assert cfgs["A"]["ls"] == [0, 2] and cfgs["A"]["nd"] == 1e-4
    assert cfgs["B"]["nd"] == 2e-4
    assert cfgs["X"]["cross"] == ["A", "B"]

    with pytest.raises(ValueError, match="not defined"):
        merge_tracer_configs({"X": {"cross": ["A", "missing"]}, "A": {}})
    with pytest.raises(ValueError, match="exactly 2"):
        merge_tracer_configs({"X": {"cross": ["X"]}})


def test_param_space_priors():
    space = ParamSpace.from_config({
        "a": {"prior": {"min": 0.0, "max": 2.0}, "ref": 1.0},
        "b": {"prior": {"dist": "norm", "loc": 3.0, "scale": 0.5}},
        "c": 42.0,
        "d": {"value": 7.0},
    })
    assert space.sampled == ["a", "b"]
    assert space.fixed == {"c": 42.0, "d": 7.0}
    np.testing.assert_allclose(space.theta0(), [1.0, 3.0])

    lp_in = space.log_prior(jnp.array([1.0, 3.0]))
    lp_out = space.log_prior(jnp.array([2.5, 3.0]))
    assert np.isfinite(lp_in) and np.isneginf(lp_out)
    # norm prior contributes its density
    lp_shift = space.log_prior(jnp.array([1.0, 3.5]))
    np.testing.assert_allclose(lp_in - lp_shift, 0.5, atol=1e-12)

    d = space.to_dict(np.array([0.3, 2.9]))
    assert d["a"] == 0.3 and d["c"] == 42.0

    lo, hi = space.bounds()
    np.testing.assert_allclose(lo, [0.0, -np.inf])
    np.testing.assert_allclose(hi, [2.0, np.inf])


# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def template_file(tmp_path_factory):
    """EH98 linear P(k) written to disk (the template-fit input)."""
    from eftpipe_tpu.boltzmann.eh98 import eh98_pk

    path = tmp_path_factory.mktemp("tpl") / "plin.txt"
    k = np.logspace(-5, 0, 300)
    pk = np.asarray(eh98_pk(jnp.asarray(k), 0.02237, 0.12, 0.6777, 3.044,
                            0.9649, 0.7)[0])
    np.savetxt(path, np.column_stack([k, pk]))
    return path


def make_config(workdir, template_file, with_like=True):
    theory = {
        "tracers": {
            "default": {
                "ls": [0, 2],
                "with_IRresum": True,
                "with_APeffect": False,
                "boltzmann": {"name": "fixed_template", "path": str(template_file)},
            },
            "LRG": {"z": 0.7, "nd": 5e-5},
            "ELG": {"z": 0.845, "nd": 1.85e-4},
            "X": {"z": 0.77, "cross": ["LRG", "ELG"]},
        }
    }
    info = {
        "theory": theory,
        "params": {
            "f": {"prior": {"min": 0.1, "max": 1.5}, "ref": 0.8},
            "alperp": 1.0,
            "alpara": 1.0,
            "LRG_b1": {"prior": {"min": 0.0, "max": 4.0}, "ref": 2.2},
            "LRG_b2": 0.8, "LRG_b4": 0.8,
            "ELG_b1": {"prior": {"min": 0.0, "max": 4.0}, "ref": 1.3},
            "ELG_b2": 0.5, "ELG_b4": 0.5,
        },
    }
    if with_like:
        info["likelihood"] = {
            "tracers": ["LRG", "ELG", "X"],
            "data": {
                "LRG": {"path": str(workdir / "data_LRG.txt"), "ls": [0, 2],
                        "kmin": 0.02, "kmax": 0.2},
                "ELG": {"path": str(workdir / "data_ELG.txt"), "ls": [0, 2],
                        "kmin": 0.03, "kmax": 0.2},
                "X": {"path": str(workdir / "data_X.txt"), "ls": [0, 2],
                      "kmin": 0.03, "kmax": 0.15},
            },
            "cov": str(workdir / "cov.txt"),
            "binned": True,
            "marg": {
                "LRG_": {"b3": {"loc": 0, "scale": 2}, "cct": {"loc": 0, "scale": 4}},
                "ELG_": {"b3": {"loc": 0, "scale": 2}},
            },
        }
    return info


@pytest.fixture(scope="module")
def analysis(tmp_path_factory, template_file):
    workdir = tmp_path_factory.mktemp("orch")
    # phase 1: theory-only Analysis to generate mock data at the reference point
    th = Analysis.from_config(make_config(workdir, template_file, with_like=False))
    fid = {"f": 0.8, "alperp": 1.0, "alpara": 1.0,
           "LRG_b1": 2.2, "ELG_b1": 1.3, "X_ce0": 0.0}
    kout = np.arange(0.01, 0.2049, 0.005)
    ndata = 0
    for name in ["LRG", "ELG", "X"]:
        ls, keff, plk = jax.jit(
            lambda: th.nonlinear_Plk_grid(name, fid, binned=True, kout=kout)
        )()
        np.savetxt(workdir / f"data_{name}.txt",
                   np.column_stack([kout, np.asarray(plk[0]), np.asarray(plk[1])]),
                   header="k P0 P2")
        ndata += 2 * kout.size
    cov = np.eye(ndata) * 25.0
    np.savetxt(workdir / "cov.txt", cov)
    return Analysis.from_config(make_config(workdir, template_file))


def test_laplace_init(analysis):
    """Laplace covariance (the Cobaya-covmat analogue) is PD and matched to
    the posterior scale; init_walkers scatters inside the prior support."""
    cov = analysis.laplace_cov()
    n = analysis.space.ndim
    assert cov.shape == (n, n)
    evals = np.linalg.eigvalsh(cov)
    assert np.all(evals > 0)
    x0 = analysis.init_walkers(64, key=3)
    assert x0.shape == (64, n)
    lo, hi = analysis.space.bounds()
    assert np.all(np.asarray(x0) >= lo[None, :] - 1e-12)
    assert np.all(np.asarray(x0) <= hi[None, :] + 1e-12)
    # scatter should be posterior-scale, not the 1e-3 point-ball
    sig = np.sqrt(np.diag(cov))
    std = np.asarray(x0).std(axis=0)
    assert np.all(std > 0.1 * sig)
    # every walker starts at finite logp
    lps = np.asarray(jax.jit(jax.vmap(analysis.logp))(x0))
    assert np.all(np.isfinite(lps))


def test_analysis_structure(analysis):
    assert set(analysis.pipelines) == {"LRG", "ELG", "X"}
    assert analysis.bases["X"].is_cross()
    assert analysis.bases["X"].cross_prefix == ["LRG_", "ELG_"]
    # cross tracer picks up the B-variant normalisation from ELG
    assert analysis.configs["X"].nd_a == 5e-5
    assert analysis.configs["X"].nd_b == 1.85e-4
    assert analysis.space.sampled == ["f", "LRG_b1", "ELG_b1"]


def test_logp_peaks_at_fiducial(analysis):
    theta0 = jnp.asarray(analysis.space.theta0())
    logp = jax.jit(analysis.logp)
    lp0 = logp(theta0)
    assert np.isfinite(lp0)
    # data was generated at the fiducial point with no marginalized params
    # switched on, so chi2 there is ~0 and any shift decreases logp
    for i in range(theta0.size):
        lp = logp(theta0.at[i].add(0.05))
        assert lp < lp0
    # out of prior bounds -> -inf
    assert np.isneginf(logp(theta0.at[0].set(2.0)))


def test_logp_vmap(analysis):
    theta0 = analysis.space.theta0()
    thetas = jnp.asarray(theta0[None, :] * np.array([1.0, 1.001, 0.999])[:, None])
    out = jax.jit(jax.vmap(analysis.logp))(thetas)
    assert out.shape == (3,) and bool(jnp.isfinite(out).all())


def test_products(analysis):
    fid = {"f": 0.8, "LRG_b1": 2.2, "ELG_b1": 1.3}
    ls, k, plk = analysis.nonlinear_Plk_grid("LRG", fid)
    assert ls == [0, 2] and plk.shape == (2, k.size)

    interp = analysis.nonlinear_Plk_interpolator("LRG", fid)
    # interpolator agrees with the grid at interior nodes
    np.testing.assert_allclose(
        np.asarray(interp(0, k[5:10])), np.asarray(plk[0, 5:10]), rtol=1e-6
    )
    both = interp([0, 2], k[5:10])
    assert both.shape == (2, 5)

    ls, k, table = analysis.nonlinear_Plk_gaussian_grid("LRG", fid)
    assert "LRG_b3" in table and "LRG_cct" in table
    assert table["LRG_b3"].shape == (2, k.size)

    ls, k, comp = analysis.bird_component("LRG", fid)
    np.testing.assert_allclose(
        np.asarray(comp.sum()), np.asarray(plk), rtol=1e-10
    )

    snaps = analysis.snapshots("LRG", fid)
    assert "nonlinear" in snaps and "IRresum" in snaps

    vals = analysis.eft_params_values_dict("LRG", fid)
    assert vals["LRG_b1"] == 2.2 and vals["LRG_b3"] == 0.0


def test_gaussian_table_matches_autodiff(analysis):
    """∂P/∂b_G from the analytic table equals jax.grad of the reduced P."""
    fid = {"f": 0.8, "LRG_b1": 2.2}

    def p0_of_b3(b3):
        params = dict(fid, LRG_b3=b3)
        _, _, plk = analysis.nonlinear_Plk_grid("LRG", params)
        return plk[0]

    g = jax.jacfwd(p0_of_b3)(jnp.asarray(0.3))
    _, _, table = analysis.nonlinear_Plk_gaussian_grid("LRG", fid)
    np.testing.assert_allclose(np.asarray(g), np.asarray(table["LRG_b3"][0]),
                               rtol=1e-8, atol=1e-10)


def test_marg_bestfit_derived_columns(analysis):
    """The analytically-marginalized parameters' conditional bestfit values
    are published as ``marg_<param>`` derived chain columns (reference
    likelihood.py:590-593 with marg_param_prefix='marg_'), and equal
    F2⁻¹F1 recomputed independently in float64 numpy at a fixed point."""
    names = analysis.derived_names()
    marg_cols = [n for n in names if n.startswith("marg_")]
    assert marg_cols == ["marg_LRG_b3", "marg_LRG_cct", "marg_ELG_b3"]

    # shift away from truth so the conditional bestfit is O(1), not noise
    theta0 = jnp.asarray(analysis.space.theta0() * np.array([1.1, 1.05, 0.95]))
    vals = np.asarray(jax.jit(analysis.derived)(theta0))
    got = {n: vals[names.index(n)] for n in marg_cols}

    # independent F2/F1 from the pg/png tables and the prior, plain numpy
    lk = analysis.like
    params = analysis.params_dict(theta0)
    inputs = analysis._inputs(params, list(lk.runtimes))
    png, pg = lk.png_and_pg(inputs, params)
    png = np.asarray(png, np.float64)
    pg = np.asarray(pg, np.float64)
    mu, sigma_inv = lk.marginal.mu_sigma_inv(params)
    mu = np.asarray(mu, np.float64)
    sigma_inv = np.asarray(sigma_inv, np.float64)
    res = png - lk.data_vector
    pgc = pg @ lk.invcov
    f2 = pgc @ pg.T + sigma_inv
    f1 = -pgc @ res + sigma_inv @ mu
    bg = np.linalg.solve(f2, f1)
    for p, want in zip(lk.marginal.names, bg):
        np.testing.assert_allclose(got[f"marg_{p}"], want, rtol=1e-5,
                                   err_msg=p)
    # the bestfit is the conditional optimum: nudging any bG away from it
    # increases chi2 + prior penalty
    def penalized_chi2(bgv):
        r = bgv @ pg + png - lk.data_vector
        return r @ lk.invcov @ r + (bgv - mu) @ sigma_inv @ (bgv - mu)

    c0 = penalized_chi2(bg)
    for i in range(bg.size):
        e = np.zeros_like(bg)
        e[i] = 0.1
        assert penalized_chi2(bg + e) > c0

    # global chi2 columns ride along unchanged
    assert "chi2" in names and "fullchi2" in names
    assert np.isfinite(vals[names.index("chi2")])


def test_computed_params():
    """Cobaya-style lambda-valued ('derived input') params evaluate inside
    the parameter dict — the production configs' c2/c4 -> b2/b4 mapping."""
    space = ParamSpace.from_config({
        "c2": {"prior": {"min": -4.0, "max": 4.0}, "ref": 1.2},
        "c4": 0.0,
        "b2": {"value": "lambda c2, c4: (c2 + c4) / np.sqrt(2.)"},
        "b4": "lambda c2, c4: (c2 - c4) / np.sqrt(2.)",
        "bsq": {"value": "lambda b2: b2 ** 2"},  # computed-on-computed
    })
    assert space.sampled == ["c2"]
    d = space.to_dict(np.array([1.2]))
    np.testing.assert_allclose(float(d["b2"]), 1.2 / np.sqrt(2.0))
    np.testing.assert_allclose(float(d["b4"]), 1.2 / np.sqrt(2.0))
    np.testing.assert_allclose(float(d["bsq"]), (1.2 / np.sqrt(2.0)) ** 2)

    with pytest.raises(ValueError, match="unresolvable"):
        ParamSpace.from_config({
            "x": {"value": "lambda missing: missing"},
        }).to_dict(np.zeros(0))


def test_compat_keeps_b2_b4_lambdas():
    from pathlib import Path
    from eftpipe_tpu.compat import convert_cobaya_config

    yaml = Path("/root/reference/cobaya/yamls/"
                "DR16_noric_LEX_NS_LP024_kmax0.20_EQ02_kmax0.20_XP024_kmax0.20_xnost.yaml")
    if not yaml.exists():
        pytest.skip("reference production yaml missing")
    info = convert_cobaya_config(yaml)
    p = info["params"]
    assert isinstance(p["LRG_NGC_b2"], dict) and "value" in p["LRG_NGC_b2"]
    assert "LRG_NGC_c2" in p and "prior" in p["LRG_NGC_c2"]
    assert "As" not in p  # references renamed logA -> dropped
    # end to end: the computed b2/b4 flow into the parameter dict
    space = ParamSpace.from_config(p)
    theta0 = space.theta0()
    d = space.to_dict(theta0)
    i = space.sampled.index("LRG_NGC_c2")
    np.testing.assert_allclose(
        float(d["LRG_NGC_b2"]), theta0[i] / np.sqrt(2.0), rtol=1e-12
    )


def test_yaml_relative_paths_resolve_against_config_dir(tmp_path, template_file):
    """Relative data paths in a YAML config resolve against the YAML's own
    directory, whatever the process cwd (reference PathContext semantics)."""
    import os
    import yaml as _yaml

    workdir = tmp_path
    info = make_config(workdir, template_file, with_like=False)
    th = Analysis.from_config(info)
    fid = {"f": 0.8, "LRG_b1": 2.2, "ELG_b1": 1.3}
    kout = np.arange(0.02, 0.1949, 0.005)
    for name in ["LRG", "ELG", "X"]:
        ls, keff, plk = jax.jit(
            lambda: th.nonlinear_Plk_grid(name, fid, binned=True, kout=kout)
        )()
        np.savetxt(workdir / f"data_{name}.txt",
                   np.column_stack([kout, *np.asarray(plk)]), header="k P0 P2")
    np.savetxt(workdir / "cov.txt", np.eye(6 * kout.size) * 25.0)

    full = make_config(workdir, template_file)
    # make every path RELATIVE to the config dir
    for t, d in full["likelihood"]["data"].items():
        d["path"] = f"data_{t}.txt"
    full["likelihood"]["cov"] = "cov.txt"
    full["theory"]["tracers"]["default"]["boltzmann"]["path"] = "plin.txt"
    np.savetxt(workdir / "plin.txt", np.loadtxt(template_file))
    yml = workdir / "run.yaml"
    yml.write_text(_yaml.safe_dump(full))

    old = os.getcwd()
    os.chdir("/")  # anywhere that is NOT the config dir
    try:
        an = Analysis.from_config(yml)
    finally:
        os.chdir(old)
    lp = jax.jit(an.logp)(jnp.asarray(an.space.theta0()))
    assert np.isfinite(float(lp))


def test_per_tracer_list_forms(tmp_path, template_file):
    """chained/binned/binning accept scalar, list (by tracer order), or dict
    forms, mirroring the reference's or_list_to_dict (likelihood.py:309-335)."""
    workdir = tmp_path
    info = make_config(workdir, template_file, with_like=False)
    th = Analysis.from_config(info)
    fid = {"f": 0.8, "LRG_b1": 2.2, "ELG_b1": 1.3}
    kout = np.arange(0.02, 0.1949, 0.005)
    for name in ["LRG", "ELG", "X"]:
        ls, keff, plk = jax.jit(
            lambda: th.nonlinear_Plk_grid(name, fid, binned=True, kout=kout)
        )()
        np.savetxt(workdir / f"data_{name}.txt",
                   np.column_stack([kout, *np.asarray(plk)]), header="k P0 P2")
    np.savetxt(workdir / "cov.txt", np.eye(6 * kout.size) * 25.0)

    full = make_config(workdir, template_file)
    full["likelihood"]["binned"] = [True, True, True]
    full["likelihood"]["chained"] = [False, False, False]
    full["likelihood"]["binning"] = [{}, {}, {}]
    an = Analysis.from_config(full)
    lp = jax.jit(an.logp)(jnp.asarray(an.space.theta0()))
    assert np.isfinite(float(lp))

    bad = make_config(workdir, template_file)
    bad["likelihood"]["binned"] = [True, True]  # wrong length
    with pytest.raises(ValueError, match="per-tracer list"):
        Analysis.from_config(bad)


def test_dotted_path_boltzmann_provider(tmp_path, template_file):
    """boltzmann: name may be a dotted path, mirroring the reference's
    find_boltzmann_extractor (boltzmann.py:351-363)."""
    info = make_config(tmp_path, template_file, with_like=False)
    info["theory"]["tracers"]["default"]["boltzmann"] = {
        "name": "eftpipe_tpu.boltzmann.eh98.EisensteinHuProvider",
        "da_fid": 1.0, "h_fid": 1.0,
    }
    an = Analysis.from_config(info)
    from eftpipe_tpu.boltzmann.eh98 import EisensteinHuProvider

    assert all(isinstance(p, EisensteinHuProvider) for p in an.providers.values())
