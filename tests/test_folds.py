"""Direct unit gates for the round-2 algebraic folds.

The Hermitian fold (ops/pallas_kernels.py:herm_fold/herm_w/quad_form_real)
and the resum back-transform fold (models/resum.py air_fold) are exact
algebraic identities — these tests pin each one in isolation at 1e-12 in
float64, so a future regression is localized to the fold instead of
surfacing as "nonlinear/resum stage parity failed somewhere" (VERDICT r2,
weak item 3).  No reference oracle needed: the identities are self-checking.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.ops.pallas_kernels import (
    herm_fold, herm_fold_matrix, herm_w, quad_form_real,
)
from eftpipe_tpu.ops import cplx


RNG = np.random.default_rng(42)


def _herm_coef(n1: int, lead=()):
    """Random rfft-of-real-input style coefficients: z_{nc-j} = conj(z_{nc+j})
    with z_nc real (n1 = 2 nc + 1 odd)."""
    nc = n1 // 2
    re = RNG.standard_normal(lead + (n1,))
    im = RNG.standard_normal(lead + (n1,))
    im[..., nc] = 0.0
    j = np.arange(1, nc + 1)
    re[..., nc - j] = re[..., nc + j]
    im[..., nc - j] = -im[..., nc + j]
    return re, im


def test_herm_fold_matrix_parametrizes_hermitian_vectors():
    """A @ w runs over exactly the Hermitian-symmetric z's (and back)."""
    n1 = 17
    nc = n1 // 2
    a = herm_fold_matrix(n1)
    w = RNG.standard_normal(n1)
    z = a @ w
    j = np.arange(1, nc + 1)
    np.testing.assert_allclose(z[nc - j], np.conj(z[nc + j]), rtol=0, atol=1e-15)
    assert z[nc].imag == 0.0
    # and the parametrization is faithful: w recovers from z
    np.testing.assert_allclose(z[nc].real, w[0], atol=1e-15)
    np.testing.assert_allclose(z[nc + j].real, w[j], atol=1e-15)
    np.testing.assert_allclose(z[nc + j].imag, w[nc + j], atol=1e-15)


def test_herm_fold_quadratic_identity():
    """Re(zᵀ M z) == wᵀ herm_fold(M) w for every Hermitian-symmetric z and
    ARBITRARY complex M — the core identity behind the 4x FLOP cut."""
    n1 = 33
    bl = 5
    a = herm_fold_matrix(n1)
    m = RNG.standard_normal((bl, n1, n1)) + 1j * RNG.standard_normal((bl, n1, n1))
    m_fold = herm_fold(m)
    assert m_fold.dtype.kind == "f"
    for _ in range(3):
        w = RNG.standard_normal(n1)
        z = a @ w
        lhs = np.real(np.einsum("n,bnm,m->b", z, m, z))
        rhs = np.einsum("n,bnm,m->b", w, m_fold, w)
        np.testing.assert_allclose(rhs, lhs, rtol=1e-12, atol=1e-12)


def test_herm_w_matches_fold_parametrization():
    """herm_w(coef, pw_half, nc) must produce exactly the w with
    A w = z(s) = coef · pw(s) — the per-eval half of the fold."""
    n1 = 21
    nc = n1 // 2
    ns = 7
    cre, cim = _herm_coef(n1)
    pre, pim = _herm_coef(n1, lead=(ns,))
    pw = (pre + 1j * pim).T      # (n1, ns), Hermitian in n
    z = (cre + 1j * cim)[:, None] * pw
    w = np.asarray(herm_w(
        (jnp.asarray(cre), jnp.asarray(cim)),
        (jnp.asarray(pw.real[nc:]), jnp.asarray(pw.imag[nc:])),
        nc,
    ))
    a = herm_fold_matrix(n1)
    z_back = np.einsum("nw,ws->ns", a, w)
    np.testing.assert_allclose(z_back, z, rtol=1e-13, atol=1e-13)


def test_quad_form_real_end_to_end_identity():
    """Full per-eval path: quad_form_real(herm_w(...), herm_fold(M)) equals
    the explicit complex quadratic form Re(z(s)ᵀ M z(s))."""
    n1 = 21
    nc = n1 // 2
    ns, bl = 6, 4
    cre, cim = _herm_coef(n1)
    pre, pim = _herm_coef(n1, lead=(ns,))
    pw = (pre + 1j * pim).T
    z = (cre + 1j * cim)[:, None] * pw          # (n1, ns)
    m = RNG.standard_normal((bl, n1, n1)) + 1j * RNG.standard_normal((bl, n1, n1))
    explicit = np.real(np.einsum("ns,bnm,ms->bs", z, m, z))
    w = herm_w((jnp.asarray(cre), jnp.asarray(cim)),
               (jnp.asarray(pw.real[nc:]), jnp.asarray(pw.imag[nc:])), nc)
    folded = np.asarray(quad_form_real(w, jnp.asarray(herm_fold(m))))
    np.testing.assert_allclose(folded, explicit, rtol=1e-12, atol=1e-12)


def test_quad_form_real_vmap_grouping_and_jvp():
    """The custom_vmap walker-grouped path equals the plain contraction,
    and the custom_jvp matches jax.jacfwd of the explicit einsum."""
    n1, ns, bl, nwalk = 13, 5, 3, 9
    m = jnp.asarray(RNG.standard_normal((bl, n1, n1)))
    wbatch = jnp.asarray(RNG.standard_normal((nwalk, n1, ns)))

    plain = jnp.einsum("wns,bnm,wms->wbs", wbatch, m, wbatch)
    grouped = jax.vmap(lambda w: quad_form_real(w, m))(wbatch)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(plain),
                               rtol=1e-12, atol=1e-12)

    w0 = wbatch[0]
    dw = jnp.asarray(RNG.standard_normal(w0.shape))
    _, jvp = jax.jvp(lambda w: quad_form_real(w, m), (w0,), (dw,))
    explicit = jnp.einsum("ns,bnm,ms->bs", dw, m, w0) + jnp.einsum(
        "ns,bnm,ms->bs", w0, m, dw)
    np.testing.assert_allclose(np.asarray(jvp), np.asarray(explicit),
                               rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# air_fold: the one-matmul resum back-transform
# ---------------------------------------------------------------------------
def test_air_fold_matches_explicit_fftlog_path():
    """The padding-mode FFTLog back-transform is linear in the s-grid
    values, so resample→DFT→Bessel-moments→k-powers folds into one real
    constant matrix: integ @ air_fold == Re(FFTLogCoef(integ) · air)
    (models/resum.py:84-92, reference hot path pybird.py:1409-1462)."""
    from eftpipe_tpu.models.config import EFTConfig
    from eftpipe_tpu.models.resum import build_resum_tables
    from eftpipe_tpu.ops.fftlog import fftlog_coef

    cfg = EFTConfig(nl=2, no=2)
    rt = build_resum_tables(cfg)
    nsr = rt["air_fold"].shape[0]
    integ = jnp.asarray(RNG.standard_normal((rt["nn"], nsr)))

    folded = np.asarray(integ @ jnp.asarray(rt["air_fold"]))

    coef = fftlog_coef(rt["plan"], integ)
    air = (jnp.asarray(rt["air"][0]), jnp.asarray(rt["air"][1]))
    explicit = np.asarray(
        cplx.ceinsum_real("...n,nak->...ak", coef, air)
    ).reshape(rt["nn"], -1)
    np.testing.assert_allclose(folded, explicit, rtol=1e-11, atol=1e-11)
