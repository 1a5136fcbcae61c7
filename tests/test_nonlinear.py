import numpy as np
import jax.numpy as jnp
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
from eftpipe_tpu.models.bird import build_bird_tables, assemble_bird

from refbridge import golden_oracle, load_reference
from test_fftlog import smooth_positive


def allclose(a, b, rtol=1e-7, atol_scale=1e-9, label=""):
    b = np.asarray(b)
    atol = atol_scale * np.abs(b).max()
    np.testing.assert_allclose(np.asarray(a), b, rtol=rtol, atol=atol, err_msg=label)


def make_reference_bird(nl, with_nnlo, f, kin, plin, assembled=False):
    ref_pybird = load_reference("pybird.pybird")
    co = ref_pybird.Common(Nl=nl, No=nl, with_NNLO=with_nnlo)
    nonlinear = ref_pybird.NonLinear(load=False, save=False, co=co)
    bird = ref_pybird.Bird(kin, plin, f, co=co)
    nonlinear.PsCf(bird)
    if assembled:
        bird.setPsCfl()
    return bird


@pytest.mark.parametrize("nl,with_nnlo", [(2, False), (3, True)])
def test_nonlinear_raw_outputs_match_reference(nl, with_nnlo):
    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=11)
    f = 0.85

    def compute():
        bird = make_reference_bird(nl, with_nnlo, f, kin, plin)
        out = {
            "P22": bird.P22, "P13": bird.P13, "P11": bird.P11,
            "C11": bird.C11, "Cct": bird.Cct,
            "C22": bird.C22, "C13": bird.C13,
        }
        if with_nnlo:
            out["CctNNLO"] = bird.CctNNLO
        return out

    gold = golden_oracle(f"nonlinear_raw_nl{nl}", compute)

    cfg = EFTConfig(nl=nl, no=nl, with_nnlo=with_nnlo)
    nt = build_nonlinear_tables(cfg)
    out = nonlinear_pscf(nt, cfg, jnp.asarray(plin))

    allclose(out["p22"], gold["P22"], label="P22")
    bt = build_bird_tables(cfg)
    p11 = plin @ bt["s_kin_to_k"].T
    allclose(out["p13_kernel"] * p11, gold["P13"], label="P13")
    allclose(p11, gold["P11"], label="P11")
    allclose(out["c11"], gold["C11"], label="C11")
    allclose(out["cct"], gold["Cct"], label="Cct")
    if with_nnlo:
        allclose(out["cct_nnlo"], gold["CctNNLO"], label="CctNNLO")
    allclose(out["c22"], gold["C22"], rtol=1e-6, atol_scale=1e-8, label="C22")
    allclose(out["c13"], gold["C13"], rtol=1e-6, atol_scale=1e-8, label="C13")


@pytest.mark.parametrize("nl,with_nnlo", [(2, False), (3, True)])
def test_bird_assembly_matches_reference(nl, with_nnlo):
    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=13)
    f = 0.73

    def compute():
        bird = make_reference_bird(nl, with_nnlo, f, kin, plin, assembled=True)
        out = {
            "P11l": bird.P11l, "Pctl": bird.Pctl, "Ploopl": bird.Ploopl,
            "Cloopl": bird.Cloopl, "Pstl": bird.Pstl, "C11": bird.C11,
        }
        if with_nnlo:
            out["PctNNLOl"] = bird.PctNNLOl
        return out

    gold = golden_oracle(f"bird_assembly_nl{nl}", compute)

    cfg = EFTConfig(nl=nl, no=nl, with_nnlo=with_nnlo)
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)
    out = nonlinear_pscf(nt, cfg, jnp.asarray(plin))
    state = assemble_bird(bt, cfg, out, jnp.asarray(plin), jnp.asarray(f))

    allclose(state.p11l, gold["P11l"], label="P11l")
    allclose(state.pctl, gold["Pctl"], label="Pctl")
    if with_nnlo:
        allclose(state.pct_nnlo_l, gold["PctNNLOl"], label="PctNNLOl")
    allclose(state.ploopl, gold["Ploopl"], rtol=1e-6, atol_scale=1e-8, label="Ploopl")
    allclose(state.cloopl, gold["Cloopl"], rtol=1e-6, atol_scale=1e-8, label="Cloopl")
    allclose(state.pstl, gold["Pstl"], label="Pstl")
    allclose(state.c11, gold["C11"], label="C11")


def test_bird_assembly_vmap_consistency():
    import jax

    kin = np.logspace(-5, 0, 200)
    plins = np.stack([smooth_positive(kin, seed=s) for s in range(3)])
    fs = np.array([0.7, 0.8, 0.9])

    cfg = EFTConfig(nl=2, no=2)
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)

    def single(plin, f):
        out = nonlinear_pscf(nt, cfg, plin)
        return assemble_bird(bt, cfg, out, plin, f)

    batched = single(jnp.asarray(plins), jnp.asarray(fs))
    mapped = jax.vmap(single)(jnp.asarray(plins), jnp.asarray(fs))
    for a, b, name in zip(batched, mapped, batched._fields):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10 * max(1.0, np.abs(np.asarray(b)).max()),
            err_msg=name,
        )
