import numpy as np
import jax.numpy as jnp
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
from eftpipe_tpu.models.bird import build_bird_tables, assemble_bird
from eftpipe_tpu.models.resum import build_resum_tables, resum_ps
from eftpipe_tpu.models.ap import build_ap_tables, ap_transform, ap_params, lcdm_da, lcdm_hubble

from refbridge import golden_oracle, load_reference
from test_fftlog import smooth_positive


def test_lcdm_background_matches_reference():
    def compute():
        ref_pybird = load_reference("pybird.pybird")
        return {"hubble": np.asarray(ref_pybird.Hubble(0.31, 0.7)),
                "da": np.asarray(ref_pybird.DAfunc(0.31, 0.7))}

    gold = golden_oracle("ap_lcdm_background", compute)
    assert lcdm_hubble(0.31, 0.7) == pytest.approx(float(gold["hubble"]), rel=1e-12)
    assert lcdm_da(0.31, 0.7) == pytest.approx(float(gold["da"]), rel=1e-10)


@pytest.mark.parametrize("nl,ap_st", [(2, False), (3, True)])
def test_ap_matches_reference(nl, ap_st):
    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=31)
    f = 0.8
    q = (1.03, 0.96)

    def compute():
        ref_pybird = load_reference("pybird.pybird")
        co = ref_pybird.Common(Nl=nl, No=nl)
        nonlinear = ref_pybird.NonLinear(load=False, save=False, co=co)
        resum = ref_pybird.Resum(co=co)
        ap = ref_pybird.APeffect(Om_AP=0.31, z_AP=0.7, APst=ap_st, co=co)
        bird = ref_pybird.Bird(kin, plin, f, co=co)
        nonlinear.PsCf(bird)
        bird.setPsCfl()
        resum.Ps(bird)
        ap.AP(bird, q=q)
        out = {"P11l": bird.P11l, "Pctl": bird.Pctl, "Ploopl": bird.Ploopl}
        if ap_st:
            out["Pstl"] = bird.Pstl
        return out

    gold = golden_oracle(f"ap_spectra_nl{nl}_st{int(ap_st)}", compute)

    class _G:
        def __getattr__(self, name):
            return gold[name]

    bird = _G()

    cfg = EFTConfig(nl=nl, no=nl)
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)
    rt = build_resum_tables(cfg)
    at = build_ap_tables(cfg, om_ap=0.31, z_ap=0.7, ap_st=ap_st)
    out = nonlinear_pscf(nt, cfg, jnp.asarray(plin))
    state = assemble_bird(bt, cfg, out, jnp.asarray(plin), jnp.asarray(f))
    state = resum_ps(rt, cfg, state, jnp.asarray(plin))
    state = ap_transform(at, cfg, state, jnp.asarray(q[0]), jnp.asarray(q[1]))

    def check(a, b, label):
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=5e-6, atol=1e-7 * np.abs(b).max(), err_msg=label
        )

    check(state.p11l, bird.P11l, "P11l")
    check(state.pctl, bird.Pctl, "Pctl")
    check(state.ploopl, bird.Ploopl, "Ploopl")
    if ap_st:
        check(state.pstl, bird.Pstl, "Pstl")


def _bird_after_resum(cfg, plin, f, dtype):
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)
    rt = build_resum_tables(cfg)
    out = nonlinear_pscf(nt, cfg, jnp.asarray(plin, dtype))
    state = assemble_bird(bt, cfg, out, jnp.asarray(plin, dtype),
                          jnp.asarray(f, dtype))
    return resum_ps(rt, cfg, state, jnp.asarray(plin, dtype))


def test_ap_gauss_quadrature_matches_trapezoid():
    """The f32 production path swaps the reference's 200-pt trapezoid
    µ-quadrature for Gauss–Legendre nodes (12x less HBM traffic in the AP
    stage).  Gate the quadrature swap in ISOLATION (float64 bird, GL nodes
    forced): the default GL rule must sit within the trapezoid rule's own
    discretization error and agree with GL-64 three orders below that
    (measured: GL-16 vs GL-64 ≤ 2.3e-7 of max; trapezoid error 2.5e-4)."""
    import jax

    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=31)
    cfg = EFTConfig(nl=3, no=3)
    state = _bird_after_resum(cfg, plin, 0.8, jnp.float64)
    q = (jnp.asarray(1.03), jnp.asarray(0.96))

    at = build_ap_tables(cfg, om_ap=0.31, z_ap=0.7)
    assert at["mu_gl"] is not None and at["mu_gl"].size == 16

    def with_nodes(mu, proj):
        forced = dict(at)
        forced["mu"], forced["proj"] = mu, proj       # f64 path reads these
        forced["mu_gl"] = forced["proj_gl"] = None
        return ap_transform(forced, cfg, state, *q)

    trap = with_nodes(at["mu"], at["proj"])            # reference quadrature
    gl_def = with_nodes(at["mu_gl"], at["proj_gl"])    # the production nodes
    at64 = build_ap_tables(cfg, om_ap=0.31, z_ap=0.7)
    x, w = np.polynomial.legendre.leggauss(64)
    import eftpipe_tpu.models.ap as ap_mod
    legw = np.stack([(4 * i + 1) / 2.0 * ap_mod.legendre_even(i, 0.5 * (x + 1))
                     for i in range(at["nlmax"])])
    gl64 = with_nodes(0.5 * (x + 1.0), 2.0 * legw * (0.5 * w)[None, :])

    for name in ("p11l", "pctl", "ploopl"):
        a, b, c = (np.asarray(getattr(s, name)) for s in (trap, gl_def, gl64))
        scale = np.abs(a).max()
        # the default GL rule is internally converged (vs GL-64) three
        # orders below its distance to the trapezoid rule — i.e. the
        # trap↔GL difference IS the 200-pt trapezoid's own O(h²) error
        # (measured ~2.5e-4 of max)
        assert np.abs(b - c).max() < 1e-6 * scale, name
        assert np.abs(a - b).max() < 1e-3 * scale, name


def test_ap_f32_dispatches_gauss_and_stays_accurate():
    """float32 evaluation uses the GL nodes (dispatch check) and lands within
    f32-rounding distance of the float64 trapezoid truth."""
    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=31)
    cfg = EFTConfig(nl=2, no=2)
    state64 = _bird_after_resum(cfg, plin, 0.8, jnp.float64)
    q = (1.03, 0.96)

    at = build_ap_tables(cfg, om_ap=0.31, z_ap=0.7)
    truth = ap_transform(at, cfg, state64, jnp.asarray(q[0]), jnp.asarray(q[1]))

    import jax
    state32 = jax.tree.map(lambda x: x.astype(jnp.float32), state64)
    got = ap_transform(at, cfg, state32,
                       jnp.asarray(q[0], jnp.float32),
                       jnp.asarray(q[1], jnp.float32))
    from eftpipe_tpu.models.ap import ap_quadrature
    assert ap_quadrature(at, jnp.float32)[0].size == at["mu_gl"].size
    assert ap_quadrature(at, jnp.float64)[0].size == at["mu"].size

    for name in ("p11l", "pctl", "ploopl"):
        a, b = np.asarray(getattr(truth, name)), np.asarray(getattr(got, name))
        assert np.abs(a - b).max() < 2e-4 * np.abs(a).max(), name


def test_ap_params():
    cfg = EFTConfig()
    at = build_ap_tables(cfg, om_ap=0.31, z_ap=0.7)

    def compute():
        ref_pybird = load_reference("pybird.pybird")
        ap = ref_pybird.APeffect(Om_AP=0.31, z_AP=0.7)

        class FakeBird:
            DA, H = 0.41, 1.52

        qperp_ref, qpar_ref = ap.get_AP_param(FakeBird())
        return {"q": np.array([qperp_ref, qpar_ref])}

    gold = golden_oracle("ap_params", compute)
    qperp, qpar = ap_params(at, 0.41, 1.52)
    assert float(qperp) == pytest.approx(float(gold["q"][0]), rel=1e-10)
    assert float(qpar) == pytest.approx(float(gold["q"][1]), rel=1e-10)
