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
