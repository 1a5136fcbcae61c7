"""Pallas TPU kernels for the hot contractions.

The dominant per-evaluation FLOP cost of the one-loop engine is the
correlation-function-side double contraction (nonlinear.py, mirroring
reference pybird.py:1103-1125):

    C[b, l, s] = Re( Σ_{n,m} z_n(s) z_m(s) M[b, l, n, m] )

with z a walker-dependent complex (N, S) tensor and M a constant complex
(B, L, N, N) tensor (N = NFFT+1 = 257, S = 80, B·L ≈ 60-120).

Since the Hermitian fold (below) the exact path is the real quadratic
form ``quad_form_real`` on 255 real dofs; since round 4 the f32 PRODUCTION
path is its truncated eigenbasis ``quad_form_lowrank`` (two skinny GEMMs,
~3.3x fewer MACs, no V intermediate — see the low-rank section below),
with ``quad_form_real`` kept as the exact f64 parity-gate path.  The dense
form's XLA lowering still
materialises the intermediate V[b, l, n, s] = Σ_m M̃ w in HBM (~75 MB per
8-walker group for the CF stage, written + read back); on TPU the fused
:func:`qf_real_pallas` kernel keeps V in VMEM: each (bl-tile,
walker-group) grid step computes the (N, N) @ (N, g·S) dot on the MXU and
reduces over n on the VPU.  The bl-tile rides the outer grid dimension, so
the M̃ tile is DMA'd once and reused across the whole walker batch, and the
walker grouping (g·S = 640 lanes) keeps the MXU lane dimension full.
Dispatch: Pallas on TPU when ``EFTPIPE_TPU_PALLAS`` is not "0", XLA einsum
otherwise/CPU.

The complex-form kernels (:func:`cf_contract_pallas`, :func:`quad_form`)
are retained for A/B reference against the folded path.
"""

from __future__ import annotations

import functools
import os
import numpy as np
import jax
import jax.numpy as jnp


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def cf_contract_xla(zr, zi, mr, mi):
    """Reference XLA path: two einsums with the V intermediate.

    zr/zi: (..., N, S); mr/mi: (BL, N, N) → (..., BL, S)
    """
    v0 = jnp.einsum("...ms,bnm->...bns", zr, mr) - jnp.einsum(
        "...ms,bnm->...bns", zi, mi)
    v1 = jnp.einsum("...ms,bnm->...bns", zr, mi) + jnp.einsum(
        "...ms,bnm->...bns", zi, mr)
    return jnp.einsum("...ns,...bns->...bs", zr, v0) - jnp.einsum(
        "...ns,...bns->...bs", zi, v1)


def _cf_half_kernel(m_ref, zr_ref, zi_ref, out1_ref, out2_ref):
    """One complex part of M against both parts of z.

    out1 = Σ_n zr⊙(M zr) − zi⊙(M zi),  out2 = Σ_n zr⊙(M zi) + zi⊙(M zr);
    the caller combines C = out1(Mr) − out2(Mi).  The V intermediates live
    only in VMEM/registers.
    """
    t = m_ref.shape[0]
    zr = zr_ref[0]
    zi = zi_ref[0]
    # static unroll over the bl tile: (N, N) @ (N, S) dots on the MXU with
    # the n-reduction fused on the VPU; no unaligned reshapes
    for ti in range(t):
        m = m_ref[ti]
        vr = jnp.dot(m, zr, preferred_element_type=jnp.float32)
        vi = jnp.dot(m, zi, preferred_element_type=jnp.float32)
        out1_ref[0, ti] = jnp.sum(zr * vr - zi * vi, axis=0)
        out2_ref[0, ti] = jnp.sum(zr * vi + zi * vr, axis=0)


def _cf_half(m, zr, zi, tile_bl: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w, n, s = zr.shape
    bl = m.shape[0]
    blp = _cdiv(bl, tile_bl) * tile_bl
    if blp != bl:
        m = jnp.pad(m, [(0, blp - bl), (0, 0), (0, 0)])
    grid = (blp // tile_bl, w)
    out_shape = jax.ShapeDtypeStruct((w, blp, s), zr.dtype)
    out_spec = pl.BlockSpec((1, tile_bl, s), lambda t, wi: (wi, t, 0),
                            memory_space=pltpu.VMEM)
    out1, out2 = pl.pallas_call(
        _cf_half_kernel,
        out_shape=(out_shape, out_shape),
        grid=grid,
        in_specs=[
            # bl-tile of M is the outer grid axis: DMA'd once, reused for the
            # whole walker batch
            pl.BlockSpec((tile_bl, n, n), lambda t, wi: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, s), lambda t, wi: (wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, s), lambda t, wi: (wi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(m, zr, zi)
    return out1[:, :bl, :], out2[:, :bl, :]


@functools.partial(jax.jit, static_argnames=("tile_bl", "interpret"))
def cf_contract_pallas(zr, zi, mr, mi, tile_bl: int = 8,
                       interpret: bool = False):
    """Fused contraction; z may carry one leading walker axis."""
    squeeze = zr.ndim == 2
    if squeeze:
        zr, zi = zr[None], zi[None]
    out1_r, _ = _cf_half(mr, zr, zi, tile_bl, interpret)
    _, out2_i = _cf_half(mi, zr, zi, tile_bl, interpret)
    out = out1_r - out2_i
    return out[0] if squeeze else out


def cf_contract_grouped(zr, zi, mr, mi, group: int = 8):
    """Walker-grouped contraction: concatenate ``group`` walkers' S columns
    into one matmul RHS so the lane dimension hits a multiple of 128 with no
    padding (S = 80 → 8·80 = 640 = 5×128; S = 50 → 400 ≈ 3.1×128).  Measured
    on a v5e: 53.6 → 41.5 ms for the (BL=114, N=257, S=80, W=128) CF stage.

    zr/zi: (W, N, S); mr/mi: (BL, N, N) → (W, BL, S)
    """
    w, n, s = zr.shape
    g = max(1, min(group, w))
    wp = _cdiv(w, g) * g
    if wp != w:
        pad = [(0, wp - w), (0, 0), (0, 0)]
        zr = jnp.pad(zr, pad)
        zi = jnp.pad(zi, pad)

    def grp(z):
        return z.reshape(wp // g, g, n, s).transpose(0, 2, 1, 3).reshape(
            wp // g, n, g * s)

    out = cf_contract_xla(grp(zr), grp(zi), mr, mi)
    bl = mr.shape[0]
    out = out.reshape(wp // g, bl, g, s).transpose(0, 2, 1, 3).reshape(wp, bl, s)
    return out[:w]


@jax.custom_batching.custom_vmap
def _quad_form_primal(zr, zi, mr, mi):
    return cf_contract_xla(zr, zi, mr, mi)


@_quad_form_primal.def_vmap
def _quad_form_vmap(axis_size, in_batched, zr, zi, mr, mi):
    zb, _, mb, _ = in_batched
    if mb or not zb:
        # unusual batching pattern: fall back to the plain batched einsum
        out = cf_contract_xla(zr, zi, mr, mi)
        return out, True
    return cf_contract_grouped(zr, zi, mr, mi), True


def _bilinear(ar, ai, br, bi, mr, mi):
    """Re(aᵀ M b) — the directional derivative building block."""
    v0 = jnp.einsum("...ms,bnm->...bns", br, mr) - jnp.einsum(
        "...ms,bnm->...bns", bi, mi)
    v1 = jnp.einsum("...ms,bnm->...bns", br, mi) + jnp.einsum(
        "...ms,bnm->...bns", bi, mr)
    return jnp.einsum("...ns,...bns->...bs", ar, v0) - jnp.einsum(
        "...ns,...bns->...bs", ai, v1)


@functools.partial(jax.custom_jvp, nondiff_argnums=())
def quad_form(zr, zi, mr, mi):
    """Re(zᵀ M z) over the spectral index pair — the quadratic form behind
    P22 (pybird.py:1074-1078) and the CF-side C22/C13 assembly
    (pybird.py:1103-1125).  Per-evaluation signature zr/zi: (N, S),
    mr/mi: (BL, N, N) → (BL, S).

    Composition of two custom rules: under ``jax.vmap`` the primal batch
    dispatches to the walker-grouped contraction (a layout a vmapped einsum
    cannot express); under autodiff the custom JVP below keeps the op
    differentiable (custom_vmap alone does not compose with grad), with a
    tangent linear in dz so reverse mode transposes automatically."""
    return _quad_form_primal(zr, zi, mr, mi)


@functools.partial(quad_form.defjvp, symbolic_zeros=True)
def _quad_form_jvp(primals, tangents):
    zr, zi, mr, mi = primals
    dzr, dzi, dmr, dmi = tangents
    y = quad_form(zr, zi, mr, mi)
    zero = jnp.zeros_like(zr)
    dzr = zero if isinstance(dzr, jax.custom_derivatives.SymbolicZero) else dzr
    dzi = zero if isinstance(dzi, jax.custom_derivatives.SymbolicZero) else dzi
    dy = _bilinear(dzr, dzi, zr, zi, mr, mi) + _bilinear(zr, zi, dzr, dzi, mr, mi)
    if not isinstance(dmr, jax.custom_derivatives.SymbolicZero) or not isinstance(
        dmi, jax.custom_derivatives.SymbolicZero
    ):
        mzero = jnp.zeros_like(mr)
        dmr = mzero if isinstance(dmr, jax.custom_derivatives.SymbolicZero) else dmr
        dmi = mzero if isinstance(dmi, jax.custom_derivatives.SymbolicZero) else dmi
        dy = dy + cf_contract_xla(zr, zi, dmr, dmi)
    return y, dy


# ---------------------------------------------------------------------------
# Hermitian-folded REAL quadratic form
# ---------------------------------------------------------------------------
#
# The FFTLog coefficients come from an rfft of REAL grid values, so
# z_{nc-j} = conj(z_{nc+j}) at every s (the s-powers are Hermitian in n too).
# Writing z = A w with w the 257 independent real dofs
# (w = [Re z_nc, Re z_{nc+1..}, Im z_{nc+1..}]) turns the complex quadratic
# form into a real one with a REAL constant matrix:
#
#     Re(zᵀ M z) = wᵀ Re(Aᵀ M A) w ≡ wᵀ M̃ w
#
# M̃ is built once in Phase A (models/nonlinear.py); per evaluation the CF/P22
# contraction is then ONE real matmul per bl instead of four — a 4x FLOP cut
# and 4x less HBM traffic for the V intermediate.  This is the "fuse the
# FFTLog into the quad form" optimization done algebraically instead of as a
# Pallas kernel.


def herm_fold_matrix(n1: int) -> np.ndarray:
    """The (N, 2·nc+1) complex map A with z = A w (N = 2nc+1 odd)."""
    nc = n1 // 2
    a = np.zeros((n1, n1), dtype=complex)
    a[nc, 0] = 1.0
    j = np.arange(1, nc + 1)
    a[nc + j, j] = 1.0
    a[nc - j, j] = 1.0
    a[nc + j, nc + j] = 1j
    a[nc - j, nc + j] = -1j
    return a


def herm_fold(m: np.ndarray) -> np.ndarray:
    """Host: fold a (..., N, N) complex quadratic-form matrix to the real
    M̃ = Re(Aᵀ M A) acting on the independent dofs.

    A has at most two nonzeros per column (±1 / ±i pairing the n = nc±j
    rows), so the fold is pure slicing + adds — O(N²) per matrix, not the
    O(N³) dense congruence (measured on the cold DR16 Phase-A build: the
    114 CF fold matrices took 55 s as zgemms, <0.5 s this way)."""
    nc = m.shape[-1] // 2
    n1 = m.shape[-1]
    batch = m.shape[:-2]
    # split real/imag and write every stage into preallocated buffers with
    # out=: only the real part of Aᵀ(MA) survives, and this host fold is
    # bound by page-fault/allocation cost, not FLOPs — each avoided
    # temporary is a first-touch of a ~60 MB block
    mr, mi = m.real, m.imag
    mar = np.empty(batch + (n1, n1))      # Re(MA)
    mai = np.empty(batch + (n1, n1))      # Im(MA)
    # columns of A: w=0 -> e_nc; w=j -> e_{nc+j}+e_{nc-j}; w=nc+j -> i(e_+ - e_-)
    mar[..., :, 0] = mr[..., :, nc]
    np.add(mr[..., :, nc + 1:], mr[..., :, nc - 1::-1],
           out=mar[..., :, 1:nc + 1])
    np.subtract(mi[..., :, nc - 1::-1], mi[..., :, nc + 1:],
                out=mar[..., :, nc + 1:])
    mai[..., :, 0] = mi[..., :, nc]
    np.add(mi[..., :, nc + 1:], mi[..., :, nc - 1::-1],
           out=mai[..., :, 1:nc + 1])
    np.subtract(mr[..., :, nc + 1:], mr[..., :, nc - 1::-1],
                out=mai[..., :, nc + 1:])
    # rows: Re(Aᵀ (MA)) with the same index pattern
    out = np.empty(batch + (n1, n1))
    out[..., 0, :] = mar[..., nc, :]
    np.add(mar[..., nc + 1:, :], mar[..., nc - 1::-1, :],
           out=out[..., 1:nc + 1, :])
    np.subtract(mai[..., nc - 1::-1, :], mai[..., nc + 1:, :],
                out=out[..., nc + 1:, :])
    return out


def herm_w(coef, pw_half, nc: int):
    """Per-eval w(s) from split coefficients and the HALF power table.

    coef: (cre, cim) each (..., N); pw_half: (pr, pi) each (nh, S) —
    the n ≥ nc slice of the k/s-power factors.  With nh = nc+1 this is the
    full 2·nc+1-dof parametrization; with nh = nc the exactly-zero Nyquist
    pair (the spectral window sends c_{±N/2} to exactly 0) is dropped and w
    has 2·nc−1 dofs — the matching fold matrices must be trimmed with
    :func:`trim_nyquist` (MXU lane padding: 257→384 vs 255→256).
    Returns (..., 2·nh−1, S) real.
    """
    pr, pi = pw_half
    nh = pr.shape[-2]
    cr = coef[0][..., nc : nc + nh, None]
    ci = coef[1][..., nc : nc + nh, None]
    zr = cr * pr - ci * pi
    zi = cr * pi + ci * pr
    return jnp.concatenate([zr, zi[..., 1:, :]], axis=-2)


def trim_nyquist(m_fold: np.ndarray, nc: int) -> np.ndarray:
    """Host: drop the two exactly-zero Nyquist dofs (Re index nc, Im index
    2·nc) from a herm-folded (..., 2nc+1, 2nc+1) quadratic-form matrix."""
    keep = np.delete(np.arange(2 * nc + 1), [nc, 2 * nc])
    return np.ascontiguousarray(m_fold[..., keep[:, None], keep[None, :]])


def qf_real_xla(w, m):
    """w: (..., N, S); m: (BL, N, N) → (..., BL, S)."""
    v = jnp.einsum("...ms,bnm->...bns", w, m)
    return jnp.einsum("...ns,...bns->...bs", w, v)


def _qf_real_kernel(mhi_ref, mlo_ref, w_ref, out_ref):
    """Fused wᵀ M w for one (bl-tile, walker-group) grid step: the V = M w
    intermediate lives only in VMEM (the XLA path writes it to HBM —
    ~75 MB per 8-walker group for the CF stage — and reads it back).

    Precision: Mosaic supports only DEFAULT/HIGHEST dots (the ambient
    jax_default_matmul_precision=high raises NotImplementedError), and
    HIGHEST (bf16x6) costs 2x the MXU passes of the XLA path's bf16x3 —
    measured 0.92x vs XLA.  So the 3-pass split is done explicitly: with
    a = a_hi + a_lo (bf16 round + bf16 residual),
    a·b ≈ a_hi·b_hi + a_hi·b_lo + a_lo·b_hi — the same passes XLA's 'high'
    runs, f32-accumulated on the MXU.  The M̃ split arrives precomputed
    (constants); splitting the (tile, N, N) tile in-kernel per walker group
    was measured to eat the fusion win (1.12x → see bench_qf_kernel.py).
    """
    t = mhi_ref.shape[0]
    w = w_ref[0]
    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # static unroll over the bl tile: (N, N) @ (N, G·S) dots on the MXU with
    # the n-reduction fused on the VPU; no unaligned in-kernel reshapes.
    # explicit DEFAULT: bf16 inputs are a single exact MXU pass, and Mosaic
    # rejects the inherited ambient precision (HIGH)
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    for ti in range(t):
        m_hi = mhi_ref[ti]
        m_lo = mlo_ref[ti]
        v = dot(m_hi, w_hi) + dot(m_hi, w_lo) + dot(m_lo, w_hi)
        out_ref[0, ti] = jnp.sum(w * v, axis=0)


@functools.partial(jax.jit, static_argnames=("tile_bl", "interpret"))
def qf_real_pallas(wg, m, tile_bl: int = 16, interpret: bool = False):
    """Fused folded-real contraction: wg (G, N, S·g) grouped walkers,
    m (BL, N, N) f32 → (G, BL, S·g).  The m tile rides the OUTER grid axis
    so it is DMA'd once and reused across the whole walker batch; the bf16
    hi/lo split of m happens here (XLA folds it once — m is constant)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ng, n, gs = wg.shape
    bl = m.shape[0]
    blp = _cdiv(bl, tile_bl) * tile_bl
    if blp != bl:
        m = jnp.pad(m, [(0, blp - bl), (0, 0), (0, 0)])
    m_hi = m.astype(jnp.bfloat16)
    m_lo = (m - m_hi.astype(m.dtype)).astype(jnp.bfloat16)
    dtype_in = wg.dtype  # kernel computes in f32; restore caller dtype (f64 A/B)
    wg = wg.astype(jnp.float32)
    grid = (blp // tile_bl, ng)
    m_spec = pl.BlockSpec((tile_bl, n, n), lambda t, gi: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _qf_real_kernel,
        out_shape=jax.ShapeDtypeStruct((ng, blp, gs), jnp.float32),
        grid=grid,
        in_specs=[
            m_spec, m_spec,
            pl.BlockSpec((1, n, gs), lambda t, gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_bl, gs), lambda t, gi: (gi, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m_hi, m_lo, wg)
    return out[:, :bl, :].astype(dtype_in)


def qf_real_grouped(w, m, group: int = 8, use_pallas: bool | None = None):
    """Walker-grouped real contraction (see cf_contract_grouped).  With
    ``use_pallas`` (default: :func:`pallas_enabled`) the grouped matmul pair
    runs as the fused VMEM kernel instead of two XLA einsums."""
    nw, n, s = w.shape
    g = max(1, min(group, nw))
    wp = _cdiv(nw, g) * g
    if wp != nw:
        w = jnp.pad(w, [(0, wp - nw), (0, 0), (0, 0)])
    wg = w.reshape(wp // g, g, n, s).transpose(0, 2, 1, 3).reshape(
        wp // g, n, g * s)
    if use_pallas is None:
        use_pallas = pallas_enabled()
    out = qf_real_pallas(wg, m) if use_pallas else qf_real_xla(wg, m)
    bl = m.shape[0]
    out = out.reshape(wp // g, bl, g, s).transpose(0, 2, 1, 3).reshape(
        wp, bl, s)
    return out[:nw]


@jax.custom_batching.custom_vmap
def _qf_real_primal(w, m):
    return qf_real_xla(w, m)


@_qf_real_primal.def_vmap
def _qf_real_vmap(axis_size, in_batched, w, m):
    wb, mb = in_batched
    if mb or not wb:
        return qf_real_xla(w, m), True
    return qf_real_grouped(w, m), True


@functools.partial(jax.custom_jvp, nondiff_argnums=())
def quad_form_real(w, m):
    """wᵀ M w over the folded spectral index — the Hermitian-reduced form of
    :func:`quad_form` (same custom_vmap walker grouping + custom_jvp)."""
    return _qf_real_primal(w, m)


@functools.partial(quad_form_real.defjvp, symbolic_zeros=True)
def _qf_real_jvp(primals, tangents):
    w, m = primals
    dw, dm = tangents
    y = quad_form_real(w, m)

    def bil(a, b):
        v = jnp.einsum("...ms,bnm->...bns", b, m)
        return jnp.einsum("...ns,...bns->...bs", a, v)

    zero = jnp.zeros_like(w)
    dw = zero if isinstance(dw, jax.custom_derivatives.SymbolicZero) else dw
    dy = bil(dw, w) + bil(w, dw)
    if not isinstance(dm, jax.custom_derivatives.SymbolicZero):
        dy = dy + qf_real_xla(w, dm)
    return y, dy


# ---------------------------------------------------------------------------
# Low-rank (eigenbasis) REAL quadratic form — the production f32 path
# ---------------------------------------------------------------------------
#
# Only the symmetric part of M̃ enters wᵀ M̃ w, and the folded loop matrices
# are numerically low-rank (smooth rational-function tables: at a 1e-8
# per-matrix spectral cut the 114 CF matrices carry 6,181 of 114·255 = 29,070
# eigenpairs).  Eigendecomposing sym(M̃_b) = Σ_r λ_r u_r u_rᵀ and stacking the
# scaled eigenvectors q_r = √|λ_r|·u_r of ALL matrices into one (R, N) tensor
# turns the whole contraction into two skinny GEMMs with an elementwise
# square in between:
#
#     Y = Q w                      (R, S)   — one MXU pass, no V intermediate
#     C_b = Σ_{r∈b} sign(λ_r) Y_r² = (S Y∘Y)_b
#
# vs the dense path's 2·BL·N²·S MACs this is 2·(R·N + BL·R)·S — a 3.3x FLOP
# cut for the CF stage at a 1e-8 cut (more at the production 1e-5 default,
# models/nonlinear.py) — and the HBM-bound (BL, N, S) V intermediate is gone
# (Y is BL·N/R ≫ 4.7x smaller).  The truncation is an approximation far
# below f32 rounding (flagship |Δlogp| unchanged from 1e-8 through 1e-4
# cuts), so it is dispatched for float32 evaluation only; float64 (the
# parity-gate dtype) keeps the exact dense quadratic form.  Factors are
# built host-side in Phase A (models/nonlinear.py) and persisted with the
# fold cache, keyed by the truncation tol.


def lowrank_factors(m_fold: np.ndarray, tol: float = 1e-8,
                    pad_to: int = 128, whiten: np.ndarray | None = None):
    """Host: eigendecompose sym(M̃) per matrix, truncate at ``tol`` relative
    to each matrix's spectral radius, and stack.

    ``whiten`` (optional, (N,) positive): eigendecompose D·sym(M̃)·D with
    D = diag(whiten) and unscale the kept rows by D⁻¹.  wᵀM̃w = uᵀ(DM̃D)u
    with u = D⁻¹w, so when ``whiten`` carries the typical per-dof magnitude
    of w (the fiducial FFTLog-coefficient decay, models/nonlinear.py) the
    relative spectral cut ranks eigenpairs by their actual contribution to
    the OUTPUT instead of by raw |λ| — same tol keeps ~2.5x fewer pairs at
    ~100x lower output error, because the raw spectrum wastes rank on
    directions w never visits.  The kept subspace is contracted exactly.

    Returns (q, smat): q (R, N) float64 rows √|λ|·uᵀ (·D⁻¹ when whitened),
    smat (BL, R) float64 with sign(λ_r) at (owner(r), r) and 0 elsewhere,
    R zero-padded to a multiple of ``pad_to`` for MXU tiling.
    """
    ms = 0.5 * (m_fold + np.swapaxes(m_fold, -1, -2))
    if whiten is not None:
        ms = ms * (whiten[:, None] * whiten[None, :])
    lam, u = np.linalg.eigh(ms)            # (BL, N), (BL, N, N) columns
    alam = np.abs(lam)
    mask = alam > tol * alam.max(axis=-1, keepdims=True)
    q_all = np.swapaxes(u, -1, -2) * np.sqrt(alam)[..., None]  # (BL, N, N) rows
    q = q_all[mask]                         # (R, N)
    if whiten is not None:
        q = q / whiten[None, :]
    owner = np.nonzero(mask)[0]             # (R,)
    sgn = np.sign(lam[mask])
    r = q.shape[0]
    rp = _cdiv(r, pad_to) * pad_to
    if rp != r:
        q = np.concatenate([q, np.zeros((rp - r, q.shape[1]))], axis=0)
    smat = np.zeros((m_fold.shape[0], rp))
    smat[owner, np.arange(r)] = sgn
    return q, smat


def qf_lowrank_xla(w, q, smat):
    """w: (..., N, S); q: (R, N); smat: (BL, R) → (..., BL, S).

    NOTE an s-major variant (Y kept (…, S, R) so both GEMMs share its
    layout) was measured ~2% SLOWER end-to-end on the v5e flagship —
    XLA's layout assignment already handles the r-major form well."""
    y = jnp.einsum("rn,...ns->...rs", q, w)
    return jnp.einsum("br,...rs->...bs", smat, y * y)


def _qf_lowrank_grouped(w, q, smat, group: int = 8):
    """Walker-grouped low-rank contraction (see cf_contract_grouped): fold
    ``group`` walkers' S columns together so the GEMM lane dimension is a
    multiple of 128 (S = 80 → 640)."""
    nw, n, s = w.shape
    g = max(1, min(group, nw))
    wp = _cdiv(nw, g) * g
    if wp != nw:
        w = jnp.pad(w, [(0, wp - nw), (0, 0), (0, 0)])
    wg = w.reshape(wp // g, g, n, s).transpose(0, 2, 1, 3).reshape(
        wp // g, n, g * s)
    out = qf_lowrank_xla(wg, q, smat)
    bl = smat.shape[0]
    out = out.reshape(wp // g, bl, g, s).transpose(0, 2, 1, 3).reshape(
        wp, bl, s)
    return out[:nw]


@jax.custom_batching.custom_vmap
def _qf_lowrank_primal(w, q, smat):
    return qf_lowrank_xla(w, q, smat)


@_qf_lowrank_primal.def_vmap
def _qf_lowrank_vmap(axis_size, in_batched, w, q, smat):
    wb, qb, sb = in_batched
    if qb or sb or not wb:
        return qf_lowrank_xla(w, q, smat), True
    return _qf_lowrank_grouped(w, q, smat), True


@functools.partial(jax.custom_jvp, nondiff_argnums=())
def quad_form_lowrank(w, q, smat):
    """smat @ (Qw)∘(Qw) — the truncated-eigenbasis form of
    :func:`quad_form_real` (same custom_vmap walker grouping + custom_jvp).
    """
    return _qf_lowrank_primal(w, q, smat)


@functools.partial(quad_form_lowrank.defjvp, symbolic_zeros=True)
def _qf_lowrank_jvp(primals, tangents):
    w, q, smat = primals
    dw, _, _ = tangents
    y = quad_form_lowrank(w, q, smat)
    if isinstance(dw, jax.custom_derivatives.SymbolicZero):
        return y, jnp.zeros_like(y)
    yw = jnp.einsum("rn,...ns->...rs", q, w)
    dyw = jnp.einsum("rn,...ns->...rs", q, dw)
    return y, jnp.einsum("br,...rs->...bs", smat, 2.0 * yw * dyw)


def lowrank_enabled(dtype) -> bool:
    """The low-rank contraction runs for float32 evaluation (the production
    TPU dtype, already covered by the end-to-end |Δlogp| budget); float64 —
    the f64-vs-reference parity-gate dtype — keeps the exact dense form.
    Opt-out: EFTPIPE_TPU_LOWRANK=0."""
    if os.environ.get("EFTPIPE_TPU_LOWRANK", "1") == "0":
        return False
    return jnp.dtype(dtype) == jnp.float32


def pallas_enabled() -> bool:
    """Opt-in (EFTPIPE_TPU_PALLAS=1): the fused kernels are only faster at
    large per-dispatch walker counts.  Measured on a v5e (tools/
    bench_qf_kernel.py + bench.py, 2026-08): the isolated CF contraction at
    W=1024 runs 1.7x faster fused (178 vs 105 effective bf16 TFLOP/s — the
    XLA einsum pair is HBM-bound on the V intermediate), but at the
    flagship's optimal chunk=128 the kernel LOSES end-to-end (5450 vs 5783
    evals/s/chip; larger chunks degrade the non-contraction stages more
    than the fused kernel gains: xla@512 5123, pallas@512 5557, best
    overall xla@128+batch8192 6189)."""
    if os.environ.get("EFTPIPE_TPU_PALLAS", "0") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def cf_contract(zr, zi, mr, mi):
    """Dispatch: fused Pallas kernel on TPU, XLA einsums elsewhere."""
    if pallas_enabled():
        return cf_contract_pallas(zr, zi, mr, mi)
    return cf_contract_xla(zr, zi, mr, mi)
