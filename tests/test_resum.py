import numpy as np
import jax.numpy as jnp
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
from eftpipe_tpu.models.bird import build_bird_tables, assemble_bird
from eftpipe_tpu.models.resum import build_resum_tables, resum_ps, ir_filters

from refbridge import golden_oracle, load_reference
from test_fftlog import smooth_positive


def run_reference(nl, with_nnlo, optiresum, f, kin, plin):
    ref_pybird = load_reference("pybird.pybird")
    co = ref_pybird.Common(Nl=nl, No=nl, with_NNLO=with_nnlo, optiresum=optiresum)
    nonlinear = ref_pybird.NonLinear(load=False, save=False, co=co)
    resum = ref_pybird.Resum(co=co)
    bird = ref_pybird.Bird(kin, plin, f, co=co)
    nonlinear.PsCf(bird)
    bird.setPsCfl()
    resum.Ps(bird)
    return co, bird, resum


def run_ours(nl, with_nnlo, optiresum, f, plin):
    cfg = EFTConfig(nl=nl, no=nl, with_nnlo=with_nnlo, optiresum=optiresum)
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)
    rt = build_resum_tables(cfg)
    out = nonlinear_pscf(nt, cfg, jnp.asarray(plin))
    bird = assemble_bird(bt, cfg, out, jnp.asarray(plin), jnp.asarray(f))
    bird = resum_ps(rt, cfg, bird, jnp.asarray(plin))
    return cfg, bird


def test_ir_filters_match_reference():
    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=21)

    def compute():
        co, bird, resum = run_reference(2, False, False, 0.8, kin, plin)
        x_ref, y_ref = resum.IRFilters(bird)
        return {"x": np.asarray(x_ref), "y": np.asarray(y_ref)}

    gold = golden_oracle("resum_ir_filters", compute)
    x_ref, y_ref = gold["x"], gold["y"]

    cfg = EFTConfig(nl=2, no=2)
    rt = build_resum_tables(cfg)
    x, y = ir_filters(rt, jnp.asarray(plin))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-7, atol=1e-10 * np.abs(x_ref).max())
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-7, atol=1e-10 * np.abs(y_ref).max())


@pytest.mark.parametrize(
    "nl,with_nnlo,optiresum",
    [(2, False, False), (3, True, False), (2, False, True)],
)
def test_resummed_spectra_match_reference(nl, with_nnlo, optiresum):
    kin = np.logspace(-5, 0, 200)
    plin = smooth_positive(kin, seed=23)
    f = 0.77

    def compute():
        co, rbird, _ = run_reference(nl, with_nnlo, optiresum, f, kin, plin)
        out = {"P11l": rbird.P11l, "Pctl": rbird.Pctl, "Ploopl": rbird.Ploopl}
        if with_nnlo:
            out["PctNNLOl"] = rbird.PctNNLOl
        return out

    tag = f"nl{nl}_{'opti' if optiresum else 'full'}"
    rbird_gold = golden_oracle(f"resum_spectra_{tag}", compute)

    class _G:  # attribute view of the golden dict
        def __getattr__(self, name):
            return rbird_gold[name]

    rbird = _G()
    cfg, bird = run_ours(nl, with_nnlo, optiresum, f, plin)

    def check(a, b, label, rtol=2e-6):
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=rtol, atol=1e-8 * np.abs(b).max(), err_msg=label
        )

    check(bird.p11l, rbird.P11l, "P11l")
    check(bird.pctl, rbird.Pctl, "Pctl")
    check(bird.ploopl, rbird.Ploopl, "Ploopl")
    if with_nnlo:
        check(bird.pct_nnlo_l, rbird.PctNNLOl, "PctNNLOl")


def test_resum_vmap_consistency():
    import jax

    kin = np.logspace(-5, 0, 200)
    plins = np.stack([smooth_positive(kin, seed=s) for s in (1, 2)])
    fs = np.array([0.7, 0.9])
    cfg = EFTConfig(nl=2, no=2)
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)
    rt = build_resum_tables(cfg)

    def single(plin, f):
        out = nonlinear_pscf(nt, cfg, plin)
        bird = assemble_bird(bt, cfg, out, plin, f)
        return resum_ps(rt, cfg, bird, plin).p11l

    batched = single(jnp.asarray(plins), jnp.asarray(fs))
    mapped = jax.vmap(single)(jnp.asarray(plins), jnp.asarray(fs))
    np.testing.assert_allclose(np.asarray(batched), np.asarray(mapped), rtol=1e-9,
                               atol=1e-9 * np.abs(np.asarray(mapped)).max())
