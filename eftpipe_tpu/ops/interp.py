"""Cubic-spline machinery.

Two flavours are provided:

1. ``spline_matrix(xin, xout)`` — a constant matrix ``M`` with
   ``M @ f == scipy CubicSpline(xin, f)(xout)`` (not-a-knot, with end-segment
   polynomial extrapolation).  Cubic-spline interpolation is *linear* in the
   data values, so whenever the evaluation points are fixed (window p-grid,
   binning quadrature points, FFTLog grid) the whole interpolation collapses
   into one constant matmul in the jitted graph.  This replaces the per-eval
   ``scipy.interpolate.interp1d(..., kind="cubic")`` calls of the reference
   (e.g. /root/reference/eftpipe/window.py:376, binning.py:135,
   pybird/fftlog.py:114).

2. ``SplineTable`` / ``spline_eval`` — a jit/vmap-friendly natural-boundary
   evaluation of a not-a-knot cubic spline at *traced* query points (needed by
   the AP effect where the distorted k' grid depends on sampled parameters,
   cf. /root/reference/eftpipe/pybird/pybird.py:1586-1593).  The second
   derivatives at the nodes are again linear in the data: ``m = M2 @ f`` with
   ``M2`` a constant matrix built on the host.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from dataclasses import dataclass
from scipy.interpolate import CubicSpline


def spline_matrix(xin, xout, log_x: bool = False) -> np.ndarray:
    """Constant matrix form of a not-a-knot cubic spline.

    Parameters
    ----------
    xin : (n,) strictly increasing sample locations
    xout : (m,) evaluation locations (may lie outside [xin[0], xin[-1]];
        end-segment polynomial extrapolation is used, matching
        ``fill_value="extrapolate"``)
    log_x : interpolate in log(x) instead of x

    Returns
    -------
    (m, n) float64 matrix
    """
    xin = np.asarray(xin, dtype=np.float64)
    xout = np.asarray(xout, dtype=np.float64)
    if log_x:
        xin, xout = np.log(xin), np.log(xout)
    n = xin.size
    eye = np.eye(n)
    cs = CubicSpline(xin, eye, axis=0, extrapolate=True)
    return cs(xout)  # (m, n)


def _notaknot_second_derivative_matrix(x: np.ndarray) -> np.ndarray:
    """Matrix M2 with ``m = M2 @ y`` = second derivatives of the not-a-knot
    cubic spline through (x, y) at the nodes."""
    n = x.size
    eye = np.eye(n)
    cs = CubicSpline(x, eye, axis=0)
    # second derivative at the nodes: evaluate cs'' at x
    return cs(x, 2)


@dataclass(frozen=True)
class MatmulInterp:
    """``jnp.interp`` on a FIXED sorted grid with traced queries, with the
    segment gathers recast as one-hot contractions.

    Gathers lower very poorly on TPU when both operand and indices are
    batched: the vmapped 200-query resample of log P(k) onto ``cfg.kin``
    cost 5.5 MB of HBM traffic per eval as ``jnp.interp`` and 7.6 MB as a
    uniform-LUT gather, vs **0.035 MB** in this form (measured on v5e,
    chunk 64) — XLA fuses the comparison mask straight into a small matmul
    that rides the MXU (~0.7 MFLOP, noise on a bandwidth-bound pipeline).

    One-hot matmuls are numerically EXACT (each output is 0·x sums plus one
    1·x term, and a bf16x3 split already carries all 24 f32 mantissa bits),
    so the result is BITWISE equal to ``jnp.interp`` — same segment choice
    (``searchsorted(xp, q, 'right')``), same value association, same
    endpoint clamping; gated by the fuzz test.  Precision is pinned to
    HIGHEST explicitly so exactness cannot depend on the session's default
    (a single-pass bf16 matmul WOULD truncate the data values).
    """

    xp: np.ndarray       # (n,) sorted grid

    @classmethod
    def build(cls, xp) -> "MatmulInterp":
        xp = np.asarray(xp, np.float64)
        if not np.all(np.diff(xp) > 0):
            raise ValueError("MatmulInterp needs a strictly increasing grid")
        return cls(xp=xp)

    def interp(self, q, fp):
        """``jnp.interp(q, self.xp, fp)``, bitwise.

        q : (...,) traced query points; fp : (..., n) traced data values
        (leading axes broadcast).  Clamps to the endpoint values outside
        the grid, like ``jnp.interp`` with default left/right.
        """
        import jax

        xp = jnp.asarray(self.xp, q.dtype)
        n = self.xp.size
        qshape = jnp.shape(q)
        qf = jnp.reshape(q, (-1,))
        # segment index = #{j in [1, n-1): xp[j] <= q}, i.e. exactly
        # clip(searchsorted(xp, q, 'right') - 1, 0, n - 2)
        ge = (qf[:, None] >= xp[None, 1 : n - 1]).astype(jnp.int32)
        idx = jnp.sum(ge, axis=-1)
        onehot = (idx[:, None] == jnp.arange(n - 1)[None, :]).astype(q.dtype)
        hi = jax.lax.Precision.HIGHEST
        x0 = jnp.einsum("qj,j->q", onehot, xp[: n - 1], precision=hi)
        x1 = jnp.einsum("qj,j->q", onehot, xp[1:], precision=hi)
        f0 = jnp.einsum("qj,...j->...q", onehot, fp[..., : n - 1], precision=hi)
        f1 = jnp.einsum("qj,...j->...q", onehot, fp[..., 1:], precision=hi)
        # same association as jnp.interp (f0 + (delta/dx)*df) so the result
        # is BITWISE equal, not just ulp-close (gated by the fuzz test)
        out = f0 + ((qf - x0) / (x1 - x0)) * (f1 - f0)
        out = jnp.where(qf <= xp[0], fp[..., :1], out)
        out = jnp.where(qf >= xp[-1], fp[..., -1:], out)
        return jnp.reshape(out, out.shape[:-1] + qshape)


@dataclass(frozen=True)
class SplineTable:
    """Host-precomputed constants for in-jit cubic-spline evaluation."""

    x: np.ndarray  # (n,) node locations
    m2: np.ndarray  # (n, n) second-derivative operator
    h: np.ndarray  # (n-1,) segment widths

    @classmethod
    def build(cls, x) -> "SplineTable":
        x = np.asarray(x, dtype=np.float64)
        return cls(x=x, m2=_notaknot_second_derivative_matrix(x), h=np.diff(x))


def spline_eval(table: SplineTable, y, xq):
    """Evaluate the not-a-knot cubic spline through (table.x, y) at traced xq.

    TPU-first formulation: the containing-interval lookup is a sum of
    comparisons and the per-query segment data (y0, y1, m0, m1, x0, h) are
    pulled out with an interval one-hot **matmul** instead of gathers — on
    TPU this rides the MXU, where ``jnp.take`` at 10⁴ traced positions per
    channel was the dominant cost of the whole AP stage (pybird.py:1586-1593
    is the reference's scipy interp1d equivalent).

    Parameters
    ----------
    y : (..., n) data values (traced)
    xq : (...q) query points (traced); outside the domain the end-segment
        cubic is extrapolated (scipy ``extrapolate=True`` behaviour)

    Returns
    -------
    (..., *xq.shape) values; leading axes of y broadcast over xq
    """
    x = jnp.asarray(table.x, dtype=y.dtype)
    h = jnp.asarray(table.h, dtype=y.dtype)
    m2 = jnp.asarray(table.m2, dtype=y.dtype)
    m = y @ m2.T  # (..., n) second derivatives

    n = x.shape[0]
    qshape = jnp.shape(xq)
    xq = jnp.reshape(xq, (-1,))
    # interval index = #{j >= 1 : x_j <= xq}, clipped to the last segment —
    # identical to clip(searchsorted(x, xq, 'right') - 1, 0, n - 2)
    ge = (xq[:, None] >= x[None, 1 : n - 1]).astype(jnp.int32)
    idx = jnp.sum(ge, axis=-1)
    onehot = (idx[:, None] == jnp.arange(n - 1)[None, :]).astype(y.dtype)  # (q, n-1)

    x0 = onehot @ x[: n - 1]
    hi = onehot @ h
    t = (xq - x0) / hi
    y0 = jnp.einsum("qj,...j->...q", onehot, y[..., : n - 1])
    y1 = jnp.einsum("qj,...j->...q", onehot, y[..., 1:])
    m0 = jnp.einsum("qj,...j->...q", onehot, m[..., : n - 1])
    m1 = jnp.einsum("qj,...j->...q", onehot, m[..., 1:])
    h2 = hi * hi
    # Hermite form in terms of second derivatives (natural cubic segments):
    # S(t) = y0 (1-t) + y1 t + h^2/6 [ m0 ((1-t)^3-(1-t)) + m1 (t^3-t) ]
    u = 1.0 - t
    out = y0 * u + y1 * t + h2 / 6.0 * (m0 * (u * u * u - u) + m1 * (t * t * t - t))
    return jnp.reshape(out, out.shape[:-1] + qshape)
