"""Gates for the truncated-eigenbasis (low-rank) quadratic form.

The f32 production contraction (ops/pallas_kernels.py `quad_form_lowrank`,
dispatched in models/nonlinear.py `nonlinear_pscf`) replaces the dense
folded quadratic form wᵀM̃w with smat @ (Qw)∘(Qw), where Q stacks the
√|λ|-scaled eigenvectors of sym(M̃) truncated at 1e-8 of each matrix's
spectral radius.  Unlike the Hermitian fold this is an *approximation*, so
the gates here bound it directly: (a) the factorization reproduces the
dense form to the truncation tolerance, (b) vmap grouping and JVP match the
plain path exactly, (c) the end-to-end f32 loop outputs match the exact
f64 dense path to well inside the f32 logp budget, and (d) float64
evaluation ignores the factors entirely (the parity-gate path is exact).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.ops.pallas_kernels import (
    lowrank_enabled, lowrank_factors, qf_lowrank_xla, qf_real_xla,
    quad_form_lowrank,
)

RNG = np.random.default_rng(7)


def _decaying_matrices(bl=6, n=63, decay=0.5):
    """Random symmetric-part-dominant matrices with exponentially decaying
    spectra — the structure of the folded loop matrices."""
    lam = np.exp(-decay * np.arange(n)) * RNG.standard_normal((bl, n))
    qmat = np.linalg.qr(RNG.standard_normal((bl, n, n)))[0]
    sym = np.einsum("bij,bj,bkj->bik", qmat, lam, qmat)
    skew = 1e-3 * RNG.standard_normal((bl, n, n))
    return sym + (skew - np.swapaxes(skew, -1, -2))


def test_factorization_reproduces_dense_form():
    m = _decaying_matrices()
    q, smat = lowrank_factors(m, tol=1e-8)
    assert q.shape[0] % 128 == 0  # MXU-tiled padding
    w = jnp.asarray(RNG.standard_normal((m.shape[-1], 5)))
    dense = qf_real_xla(w, jnp.asarray(m))  # skew part drops out of wᵀMw
    lr = qf_lowrank_xla(w, jnp.asarray(q), jnp.asarray(smat))
    scale = np.abs(np.asarray(dense)).max()
    np.testing.assert_allclose(np.asarray(lr), np.asarray(dense),
                               rtol=0, atol=1e-7 * scale)


def test_truncation_tightens_with_tol():
    m = _decaying_matrices(decay=0.8)
    w = jnp.asarray(RNG.standard_normal((m.shape[-1], 4)))
    dense = np.asarray(qf_real_xla(w, jnp.asarray(m)))
    errs = []
    for tol in (1e-2, 1e-5, 1e-8):
        q, smat = lowrank_factors(m, tol=tol)
        lr = np.asarray(qf_lowrank_xla(w, jnp.asarray(q), jnp.asarray(smat)))
        errs.append(np.abs(lr - dense).max())
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-7 * np.abs(dense).max()


def test_vmap_grouping_and_jvp_match_plain():
    m = _decaying_matrices(bl=4, n=31)
    q, smat = lowrank_factors(m, tol=0.0)  # keep everything: exact
    q, smat = jnp.asarray(q), jnp.asarray(smat)
    w = jnp.asarray(RNG.standard_normal((13, 31, 5)))  # walkers not ÷ group

    plain = jax.vmap(lambda wi: qf_lowrank_xla(wi, q, smat))(w)
    grouped = jax.vmap(lambda wi: quad_form_lowrank(wi, q, smat))(w)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(plain),
                               rtol=1e-12, atol=1e-12)

    def f(wi):
        return quad_form_lowrank(wi, q, smat).sum()

    def f_ref(wi):
        return qf_lowrank_xla(wi, q, smat).sum()

    g = jax.grad(f)(w[0])
    g_ref = jax.grad(f_ref)(w[0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-10, atol=1e-12)


def test_lowrank_dispatch_policy():
    assert lowrank_enabled(jnp.float32)
    assert not lowrank_enabled(jnp.float64)


def test_nonlinear_f32_lowrank_matches_f64_dense(monkeypatch):
    """End-to-end through the loop engine: truncation is invisible next to
    f32 rounding itself.  Gate (i): f32-low-rank vs f32-dense differ at
    op-reordering noise level; gate (ii): f32-low-rank tracks the exact f64
    dense path within f32-rounding tolerance (measured ~5e-5 of max on the
    CPU backend; the dense f32 path shows the same)."""
    from eftpipe_tpu.models.config import EFTConfig
    from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
    from test_fftlog import smooth_positive

    cfg = EFTConfig()
    nt = build_nonlinear_tables(cfg)
    assert nt["lowrank"] is not None
    plin = smooth_positive(cfg.kin, seed=3)

    # the per-structure (ungrouped) low-rank path is what this test gates;
    # the shipping (channel, f-power)-premixed path has its own gates below
    monkeypatch.setenv("EFTPIPE_TPU_CF_PREMIX", "0")
    with jax.default_matmul_precision("highest"):
        out64 = nonlinear_pscf(nt, cfg, jnp.asarray(plin, jnp.float64))
        out32 = nonlinear_pscf(nt, cfg, jnp.asarray(plin, jnp.float32))

    # gate (i): truncation alone, in f64 — run the low-rank contraction
    # directly on the f64 CF w tensor and compare against the f64 dense path
    from eftpipe_tpu.ops.fftlog import fftlog_coef
    from eftpipe_tpu.ops.pallas_kernels import herm_w

    coef = fftlog_coef(nt["plan_cf"], jnp.asarray(plin, jnp.float64))
    w_cf = herm_w(coef, tuple(jnp.asarray(t) for t in nt["spow_half"]),
                  nt["nc"])
    dense64 = np.asarray(qf_real_xla(w_cf, jnp.asarray(nt["mcf_fold"])))
    # (i.a) factorization mechanics at a tight 1e-8 cut
    q8, s8 = lowrank_factors(np.asarray(nt["mcf_fold"]), tol=1e-8)
    lr64 = np.asarray(qf_lowrank_xla(w_cf, jnp.asarray(q8), jnp.asarray(s8)))
    np.testing.assert_allclose(
        lr64, dense64, rtol=0, atol=1e-7 * np.abs(dense64).max(),
        err_msg="truncation error (f64, 1e-8 cut)")
    # (i.b) the SHIPPING default cut must stay below the f32-rounding scale
    # gate (ii) allows — the default cannot silently drift coarser than
    # rounding (measured 7.4e-5 of max at the 1e-5 default)
    lr_def = np.asarray(qf_lowrank_xla(
        w_cf, jnp.asarray(nt["lowrank"]["qcf"]),
        jnp.asarray(nt["lowrank"]["scf"])))
    np.testing.assert_allclose(
        lr_def, dense64, rtol=0, atol=2e-4 * np.abs(dense64).max(),
        err_msg="truncation error (f64, shipping cut)")

    # gate (ii): the dispatched f32 low-rank path tracks the exact f64 dense
    # path within f32-rounding tolerance (the dense f32 path shows the same
    # few-1e-5-of-max error; the end-to-end |Δlogp| budget is the real gate)
    for key in ("p22", "c22", "c13"):
        b = np.asarray(out64[key])
        a = np.asarray(out32[key], np.float64)
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * np.abs(b).max(),
                                   err_msg=f"{key}: lowrank f32 vs exact f64")


def test_f64_path_is_exactly_dense(monkeypatch):
    """float64 evaluation must not touch the truncated factors: poisoning
    them changes nothing in f64 (and would break f32)."""
    from eftpipe_tpu.models.config import EFTConfig
    from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
    from test_fftlog import smooth_positive

    cfg = EFTConfig()
    nt = build_nonlinear_tables(cfg)
    plin = jnp.asarray(smooth_positive(cfg.kin, seed=3), jnp.float64)
    ref = nonlinear_pscf(nt, cfg, plin)
    poisoned = dict(nt, lowrank={k: 0.0 * v for k, v in nt["lowrank"].items()})
    out = nonlinear_pscf(poisoned, cfg, plin)
    np.testing.assert_array_equal(np.asarray(out["c22"]), np.asarray(ref["c22"]))


def test_cf_premix_group_map_is_exact_algebra():
    """cf_group_map folds the Legendre ℓ-weights + the structure→(channel,
    f-power) group sum into the CF matrices BEFORE the spectral cut.  That
    fold is exact linear algebra: contracting the premixed dense matrices
    must equal premixing the dense per-structure outputs (f64, 1e-12)."""
    from eftpipe_tpu.models.bird import cf_group_map
    from eftpipe_tpu.models.config import EFTConfig
    from eftpipe_tpu.models.nonlinear import build_nonlinear_tables

    cfg = EFTConfig()
    nt = build_nonlinear_tables(cfg)
    gmap = cf_group_map(cfg.nl, cfg.n22, cfg.n13)
    mcf = nt["mcf_fold"]
    mcf_grp = (gmap @ mcf.reshape(gmap.shape[1], -1)).reshape(
        (gmap.shape[0],) + mcf.shape[1:])
    w = jnp.asarray(RNG.standard_normal((mcf.shape[-1], 7)))
    dense = np.asarray(qf_real_xla(w, jnp.asarray(mcf)))
    grp = np.asarray(qf_real_xla(w, jnp.asarray(mcf_grp)))
    np.testing.assert_allclose(grp, gmap @ dense, rtol=0,
                               atol=1e-12 * np.abs(grp).max())
    # the premix is why the production contraction shrank: same spectral
    # cut, ~4x fewer stacked eigenpairs than the per-structure factors
    assert nt["lowrank"]["qcfg"].shape[0] <= nt["lowrank"]["qcf"].shape[0] // 2


def test_cf_premix_cloopl_matches_f64_dense():
    """End-to-end through assemble_bird: the shipping f32 premixed path must
    track the exact f64 dense per-structure path within f32 rounding (same
    2e-4-of-max envelope the ungrouped low-rank path is held to), and the
    f^p/one-hot recombination must be exercised at a nonzero growth rate."""
    from eftpipe_tpu.models.bird import assemble_bird, build_bird_tables
    from eftpipe_tpu.models.config import EFTConfig
    from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
    from test_fftlog import smooth_positive

    cfg = EFTConfig()
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)
    plin = smooth_positive(cfg.kin, seed=3)
    f = 0.77

    with jax.default_matmul_precision("highest"):
        out64 = nonlinear_pscf(nt, cfg, jnp.asarray(plin, jnp.float64))
        b64 = assemble_bird(bt, cfg, out64, jnp.asarray(plin, jnp.float64),
                            jnp.asarray(f, jnp.float64))
        out32 = nonlinear_pscf(nt, cfg, jnp.asarray(plin, jnp.float32))
        assert "cloop_grp" in out32  # the premix is the shipping f32 path
        b32 = assemble_bird(bt, cfg, out32, jnp.asarray(plin, jnp.float32),
                            jnp.asarray(f, jnp.float32))

    a = np.asarray(b32.cloopl, np.float64)
    b = np.asarray(b64.cloopl)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * np.abs(b).max(),
                               err_msg="cloopl: premixed f32 vs exact f64")
