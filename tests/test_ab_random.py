"""Randomized end-to-end A/B harness vs the reference (the ``diffbird``
pattern, reference tests/compare/eftpair.py:260-312): random cosmology+bias
draws run through the FULL chain on both sides — one-loop engine →
shot-noise subtraction → IR resummation → AP projection → window convolution
(with the integral-constraint coupling) → k-binning → chained multipoles →
bias reduction → analytic marginalization — and both the bird tensors and the
final marginalized log-posterior are compared (logp at 1e-6 abs).

The per-stage parity tests pin each component; this gate pins their
composition and ordering.  The reference side is golden-backed
(refbridge.golden_oracle): computed live against /root/reference when
mounted, replayed from the committed tests/goldens/*.npz otherwise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.pipeline import TracerPipeline, CosmoInputs
from eftpipe_tpu.models.transforms import apply_binning
from eftpipe_tpu.likelihood.likelihood import EFTLikelihood, TracerSpec, parse_kmask
from eftpipe_tpu.likelihood.parambasis import WestCoastBasis
from eftpipe_tpu.utils.tools import RandomParams
from eftpipe_tpu.boltzmann.eh98 import eh98_pk

from refbridge import golden_oracle, reference_available

NDRAWS = 10
NL = 3
KOUT = np.arange(0.01, 0.205, 0.01)
LS = [0, 2]
KMIN, KMAX = 0.02, 0.18
PSHOT = 3000.0
MARG = {
    "b3": {"loc": 0.0, "scale": 2.0},
    "cct": {"loc": 0.0, "scale": 4.0},
    "cr1": {"scale": 8.0},
    "ce0": {"scale": 4.0},
    "cequad": {"scale": 2.0},
}


@pytest.fixture(scope="module")
def draws():
    rp = RandomParams(
        mean={"omega_cdm": 0.12, "h": 0.6777, "ln10As": 3.044, "f": 0.8,
              "qperp": 1.0, "qpar": 1.0,
              "b1": 2.0, "b2": 0.6, "b4": 0.4},
        scale={"omega_cdm": 0.004, "h": 0.01, "ln10As": 0.03, "f": 0.04,
               "qperp": 0.01, "qpar": 0.01,
               "b1": 0.15, "b2": 0.2, "b4": 0.2},
        seed=11,
    )
    return rp.draw(NDRAWS)


def _plin_of(p, kin):
    return np.asarray(
        eh98_pk(jnp.asarray(kin), 0.02237, p["omega_cdm"], p["h"],
                p["ln10As"], 0.9649, 0.7)[0]
    )


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    """Deterministic synthetic survey artifacts: mask multipoles Q_q(s),
    squared-window SN multipoles, separable IC table, data file, covariance.
    All generated from fixed seeds so the golden replay sees identical
    inputs."""
    tmp = tmp_path_factory.mktemp("abrand")
    s = np.geomspace(1.0, 4000.0, 600)
    roll = 1.0 / (1.0 + (s / 350.0) ** 3)
    mask = tmp / "mask.txt"
    np.savetxt(mask, np.column_stack([s, roll, 0.06 * roll, 0.02 * roll]))
    sn = tmp / "sn.txt"
    np.savetxt(sn, np.column_stack([s, roll**2, 0.05 * roll**2, 0.02 * roll**2]))
    sgrid = np.geomspace(2.0, 1500.0, 60)
    g = 1.0 / (1.0 + (sgrid / 300.0) ** 2)
    rows = []
    for il1, l1 in enumerate((0.0, 2.0, 4.0)):
        for il2, l2 in enumerate((0.0, 2.0, 4.0)):
            amp = 1.0 / (1.0 + il1 + il2)
            for i, s1 in enumerate(sgrid):
                for j, s2 in enumerate(sgrid):
                    rows.append([l1, l2, s1, s2, amp * g[i] * g[j]])
    ic = tmp / "ic.npy"
    np.save(ic, np.asarray(rows))

    return dict(mask=mask, sn=sn, ic=ic, tmp=tmp)


@pytest.fixture(scope="module")
def ours(files):
    cfg = EFTConfig(nl=NL, no=NL)
    pipe = TracerPipeline.build(
        cfg, zeff=0.7, with_irresum=True,
        apeffect=dict(om_ap=0.31, z_ap=0.7),
        window=dict(window_configspace_file=files["mask"], nmax=1024),
        icc=dict(pshot=PSHOT, icc_configspace_sn_file=files["sn"],
                 icc_configspace_ic_file=files["ic"], nmax=1024,
                 nxmax=512, nymax=512),
    )
    # data = the chained+binned theory at the mean draw point, so chi2 at the
    # randomized draws is O(1-100) and the 1e-6 abs logp criterion is
    # meaningful (an arbitrary data vector makes |logp| ~ 1e12 and the abs
    # tolerance vacuous).  Deterministic, so golden record/replay see the
    # same likelihood.
    mean = {"omega_cdm": 0.12, "h": 0.6777, "ln10As": 3.044, "f": 0.8,
            "qperp": 1.0, "qpar": 1.0, "b1": 2.0, "b2": 0.6, "b4": 0.4}
    bt_full = pipe.binning_tables(KOUT)
    inputs_mean = _inputs_of(mean, cfg)

    @jax.jit
    def theory_mean(ci):
        bird = pipe.compute_bird(ci)
        _, _, product = pipe.product(bird, chained=True, binning=bt_full)
        basis = WestCoastBasis(prefix="LRG_")
        return basis.reduce_plk(
            cfg, product,
            {"LRG_b1": mean["b1"], "LRG_b2": mean["b2"], "LRG_b4": mean["b4"]},
        ).sum()

    plk = np.asarray(theory_mean(inputs_mean))
    data = files["tmp"] / "data.txt"
    np.savetxt(data, np.column_stack([KOUT] + [plk[l // 2] for l in LS]),
               header="k " + " ".join(f"Q{l}" for l in LS))
    # covariance scaled to ~7% of the data magnitude with mild random
    # correlations: chi2 at the draws is then O(10-100), so the 1e-6 abs
    # logp criterion tests ~1e-8 relative agreement
    rng = np.random.default_rng(7)
    n = 2 * KOUT.size
    a = rng.normal(size=(n, n + 30))
    corr = a @ a.T
    dinv = 1.0 / np.sqrt(np.diag(corr))
    corr = corr * dinv[:, None] * dinv[None, :]
    sd = 0.07 * np.abs(np.hstack([plk[l // 2] for l in LS])) + 1.0
    cov = corr * sd[:, None] * sd[None, :]
    cov_path = files["tmp"] / "cov.txt"
    np.savetxt(cov_path, cov)
    files["data"], files["cov"] = data, cov_path

    like = EFTLikelihood(
        tracers={
            "LRG": TracerSpec(
                pipeline=pipe,
                basis=WestCoastBasis(prefix="LRG_"),
                data=dict(path=files["data"], ls=LS, kmin=KMIN, kmax=KMAX),
                chained=True,
                with_binning=True,
            )
        },
        cov=files["cov"],
        marg={"LRG_": MARG},
    )
    return cfg, pipe, like


@pytest.fixture(scope="module")
def ref_outputs(files, draws, ours):
    """Reference-side outputs per draw: post-window binned bird tensors and
    the marginalized log-posterior — golden-backed."""
    cfg, pipe, like = ours
    marg_names = list(like.marginal.names)
    mu = np.array([MARG[n.split("_", 1)[1]].get("loc", 0.0) for n in marg_names])
    scales = np.array([MARG[n.split("_", 1)[1]]["scale"] for n in marg_names])
    sigma_inv = np.diag(1.0 / scales**2)
    data_vec = np.asarray(like.data_vector)
    invcov = np.asarray(like.invcov)

    def compute():
        from refbridge import load_reference

        ref_pb = load_reference("pybird.pybird")
        ref_icc = load_reference("icc")
        ref_window = load_reference("window")
        ref_binning = load_reference("binning")
        ref_chained = load_reference("chained")
        ref_parambasis = load_reference("parambasis")

        co = ref_pb.Common(Nl=NL, No=NL)
        nonlinear = ref_pb.NonLinear(load=False, save=False, co=co)
        resum = ref_pb.Resum(co=co)
        ap = ref_pb.APeffect(Om_AP=0.31, z_AP=0.7, co=co)
        icc_ref = ref_icc.IntegralConstraint(
            Pshot=PSHOT, icc_configspace_SN_file=files["sn"],
            icc_configspace_IC_file=files["ic"], co=co,
            load=False, save=False, Nmax=1024, Nxmax=512, Nymax=512,
        )
        win = ref_window.Window(
            window_configspace_file=files["mask"], co=co,
            load=False, save=False, Nmax=1024, icc=icc_ref,
        )
        kmask = parse_kmask(KOUT, LS, KMIN, KMAX)
        lo = min(s.start for s in kmask.values())
        hi = max(s.stop for s in kmask.values())
        kout_used = KOUT[lo:hi]
        kout_mask = parse_kmask(kout_used, LS, KMIN, KMAX)
        binning = ref_binning.Binning(kout_used, co=co)
        chained = ref_chained.Chained()
        basis = ref_parambasis.WestCoastBasis(prefix="LRG_")

        def flatten(plk):
            return np.hstack([plk[l // 2, kout_mask[l]] for l in LS])

        kin = np.asarray(cfg.kin)
        out = {}
        for i, p in enumerate(draws):
            plin = _plin_of(p, kin)
            bird = ref_pb.Bird(kin, plin, p["f"], co=co)
            nonlinear.PsCf(bird)
            bird.setPsCfl()
            resum.Ps(bird)
            ap.AP(bird, q=(p["qperp"], p["qpar"]))
            win.Window(bird)
            binned = binning.transform(bird)
            for name in ("P11l", "Ploopl", "Pctl", "Pstl", "Picc"):
                out[f"draw{i}_{name}"] = np.asarray(getattr(binned, name))
            birdlike = chained.transform(binned)
            pdict = {"LRG_b1": p["b1"], "LRG_b2": p["b2"], "LRG_b4": p["b4"]}
            png = flatten(basis.reduce_Plk(birdlike, pdict).sum())
            table = basis.reduce_Plk_gaussian_table(birdlike, pdict)
            pg = np.stack([flatten(table[n]) for n in marg_names])
            res = png - data_vec
            f2 = pg @ invcov @ pg.T + sigma_inv
            f1 = -pg @ invcov @ res + sigma_inv @ mu
            f0 = res @ invcov @ res + mu @ sigma_inv @ mu
            bg = np.linalg.solve(f2, f1)
            chi2 = -f1 @ bg + f0 + np.linalg.slogdet(f2 / (2 * np.pi))[1]
            out[f"draw{i}_logp"] = np.asarray(-0.5 * chi2)
            out[f"draw{i}_chi2"] = np.asarray(res @ invcov @ res)
        return out

    return golden_oracle("ab_random_full_chain", compute)


def _inputs_of(p, cfg):
    return CosmoInputs(
        plin=jnp.asarray(_plin_of(p, np.asarray(cfg.kin))),
        f=jnp.asarray(p["f"]), qperp=jnp.asarray(p["qperp"]),
        qpar=jnp.asarray(p["qpar"]),
    )


def test_full_chain_tensors_match_reference(ours, draws, ref_outputs):
    """Post-window binned bird tensors, every draw."""
    cfg, pipe, like = ours
    bt = like.runtimes["LRG"].binning_tables
    compute = jax.jit(lambda ci: apply_binning(bt, pipe.compute_bird(ci)))
    for i, p in enumerate(draws):
        got = compute(_inputs_of(p, cfg))
        for ref_name, our_name in [
            ("P11l", "p11l"), ("Ploopl", "ploopl"), ("Pctl", "pctl"),
            ("Pstl", "pstl"), ("Picc", "picc"),
        ]:
            a = ref_outputs[f"draw{i}_{ref_name}"]
            b = np.asarray(getattr(got, our_name))
            np.testing.assert_allclose(
                b, a, rtol=5e-6, atol=1e-8 * np.abs(a).max(),
                err_msg=f"draw {i}: {ref_name}",
            )


def test_full_chain_logp_matches_reference(ours, draws, ref_outputs):
    """End-to-end marginalized log-posterior at 1e-6 abs, every draw
    (VERDICT r1 item 6 done-criterion)."""
    cfg, pipe, like = ours

    @jax.jit
    def logp_of(ci, b1, b2, b4):
        params = {"LRG_b1": b1, "LRG_b2": b2, "LRG_b4": b4}
        res = like.logp({"LRG": ci}, params)
        return res["logp"], res["chi2"]

    for i, p in enumerate(draws):
        lp, chi2 = logp_of(
            _inputs_of(p, cfg), jnp.asarray(p["b1"]), jnp.asarray(p["b2"]),
            jnp.asarray(p["b4"]),
        )
        np.testing.assert_allclose(
            float(lp), float(ref_outputs[f"draw{i}_logp"]), rtol=0, atol=1e-6,
            err_msg=f"draw {i} logp",
        )


def test_full_chain_vmap_over_draws(ours, draws):
    """The same chain vmapped over the draw batch equals per-draw calls —
    exercises the walker-grouped quad_form dispatch end-to-end."""
    cfg, pipe, like = ours
    bt = like.runtimes["LRG"].binning_tables
    kin = np.asarray(cfg.kin)

    plins = np.stack([_plin_of(p, kin) for p in draws])
    fs = np.array([p["f"] for p in draws])
    qps = np.array([p["qperp"] for p in draws])
    qls = np.array([p["qpar"] for p in draws])

    def one(plin, f, qperp, qpar):
        ci = CosmoInputs(plin=plin, f=f, qperp=qperp, qpar=qpar)
        return apply_binning(bt, pipe.compute_bird(ci)).p11l

    batched = jax.jit(jax.vmap(one))(
        jnp.asarray(plins), jnp.asarray(fs), jnp.asarray(qps), jnp.asarray(qls)
    )
    for i in (0, NDRAWS - 1):
        single = one(jnp.asarray(plins[i]), jnp.asarray(fs[i]),
                     jnp.asarray(qps[i]), jnp.asarray(qls[i]))
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), rtol=1e-9,
            atol=1e-12 * float(jnp.abs(single).max()),
        )
