import numpy as np
import jax.numpy as jnp
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
from eftpipe_tpu.models.bird import build_bird_tables, assemble_bird

from refbridge import load_reference
from test_fftlog import smooth_positive


def allclose(a, b, rtol=1e-7, atol_scale=1e-9, label=""):
    b = np.asarray(b)
    atol = atol_scale * np.abs(b).max()
    np.testing.assert_allclose(np.asarray(a), b, rtol=rtol, atol=atol, err_msg=label)


@pytest.fixture(scope="module")
def ref_pybird():
    return load_reference("pybird.pybird")


def make_reference_bird(ref_pybird, nl, with_nnlo, f, kin, plin):
    co = ref_pybird.Common(Nl=nl, No=nl, with_NNLO=with_nnlo)
    nonlinear = ref_pybird.NonLinear(load=False, save=False, co=co)
    bird = ref_pybird.Bird(kin, plin, f, co=co)
    nonlinear.PsCf(bird)
    return co, bird


@pytest.mark.parametrize("nl,with_nnlo", [(2, False), (3, True)])
def test_nonlinear_raw_outputs_match_reference(ref_pybird, nl, with_nnlo):
    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=11)
    f = 0.85

    co, bird = make_reference_bird(ref_pybird, nl, with_nnlo, f, kin, plin)

    cfg = EFTConfig(nl=nl, no=nl, with_nnlo=with_nnlo)
    nt = build_nonlinear_tables(cfg)
    out = nonlinear_pscf(nt, cfg, jnp.asarray(plin))

    allclose(out["p22"], bird.P22, label="P22")
    bt = build_bird_tables(cfg)
    p11 = plin @ bt["s_kin_to_k"].T
    allclose(out["p13_kernel"] * p11, bird.P13, label="P13")
    allclose(p11, bird.P11, label="P11")
    allclose(out["c11"], bird.C11, label="C11")
    allclose(out["cct"], bird.Cct, label="Cct")
    if with_nnlo:
        allclose(out["cct_nnlo"], bird.CctNNLO, label="CctNNLO")
    allclose(out["c22"], bird.C22, rtol=1e-6, atol_scale=1e-8, label="C22")
    allclose(out["c13"], bird.C13, rtol=1e-6, atol_scale=1e-8, label="C13")


@pytest.mark.parametrize("nl,with_nnlo", [(2, False), (3, True)])
def test_bird_assembly_matches_reference(ref_pybird, nl, with_nnlo):
    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=13)
    f = 0.73

    co, bird = make_reference_bird(ref_pybird, nl, with_nnlo, f, kin, plin)
    bird.setPsCfl()

    cfg = EFTConfig(nl=nl, no=nl, with_nnlo=with_nnlo)
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)
    out = nonlinear_pscf(nt, cfg, jnp.asarray(plin))
    state = assemble_bird(bt, cfg, out, jnp.asarray(plin), jnp.asarray(f))

    allclose(state.p11l, bird.P11l, label="P11l")
    allclose(state.pctl, bird.Pctl, label="Pctl")
    if with_nnlo:
        allclose(state.pct_nnlo_l, bird.PctNNLOl, label="PctNNLOl")
    allclose(state.ploopl, bird.Ploopl, rtol=1e-6, atol_scale=1e-8, label="Ploopl")
    allclose(state.cloopl, bird.Cloopl, rtol=1e-6, atol_scale=1e-8, label="Cloopl")
    allclose(state.pstl, bird.Pstl, label="Pstl")
    allclose(state.c11, bird.C11, label="C11")


def test_bird_assembly_vmap_consistency(ref_pybird):
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
