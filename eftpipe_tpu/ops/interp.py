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
class LinearLUT:
    """Host-precomputed uniform lookup table for ``jnp.interp`` on a FIXED
    sorted grid with traced queries.

    ``jnp.interp``'s searchsorted lowers very poorly on TPU — on the
    flagship's cosmology stage the 200-query resample of log P(k) onto
    ``cfg.kin`` was 5.5 MB of HBM traffic per eval, ~70% of the whole
    stage.  A uniform LUT reduces the segment search to one ``floor`` plus
    two bounded gather corrections: the LUT cell width is at most the
    smallest grid gap, so the candidate index from the cell's left edge is
    off by at most one knot (plus one more for the conservative -1 cell
    shift that absorbs float rounding in the cell computation).  The result
    index is EXACTLY ``searchsorted(xp, q, side='right')`` and the value
    formula matches ``jnp.interp`` (including endpoint clamping).
    """

    xp: np.ndarray       # (n,) sorted grid
    lut: np.ndarray      # (m,) int32: searchsorted(xp, edge_c, 'right')
    lo: float
    du: float

    @classmethod
    def build(cls, xp, max_cells: int = 1 << 20) -> "LinearLUT":
        xp = np.asarray(xp, np.float64)
        d = np.diff(xp)
        if not np.all(d > 0):
            raise ValueError("LinearLUT needs a strictly increasing grid")
        span = xp[-1] - xp[0]
        m = int(np.ceil(span / d.min())) + 1
        if m > max_cells:
            raise ValueError(
                f"grid needs {m} LUT cells (> {max_cells}); min gap too small")
        du = span / m
        edges = xp[0] + du * np.arange(m)
        lut = np.searchsorted(xp, edges, side="right").astype(np.int32)
        return cls(xp=xp, lut=lut, lo=float(xp[0]), du=float(du))

    def interp(self, q, fp):
        """``jnp.interp(q, self.xp, fp)`` with O(1) segment lookup.

        q : (...,) traced query points; fp : (..., n) traced data values
        (leading axes broadcast).  Clamps to the endpoint values outside
        the grid, like ``jnp.interp`` with default left/right.
        """
        xp = jnp.asarray(self.xp, q.dtype)
        n = self.xp.size
        # +inf sentinel so the correction steps never push i past n
        xp_ext = jnp.concatenate([xp, jnp.full((1,), jnp.inf, q.dtype)])
        c = jnp.clip(
            jnp.floor((q - self.lo) / self.du).astype(jnp.int32) - 1,
            0, self.lut.size - 1)
        i = jnp.asarray(self.lut)[c]
        i = i + (q >= xp_ext[i]).astype(jnp.int32)
        i = i + (q >= xp_ext[i]).astype(jnp.int32)
        i = jnp.clip(i, 1, n - 1)
        x0 = xp[i - 1]
        dx = xp[i] - x0
        f0 = jnp.take_along_axis(
            fp, jnp.broadcast_to(i - 1, fp.shape[:-1] + i.shape), axis=-1)
        f1 = jnp.take_along_axis(
            fp, jnp.broadcast_to(i, fp.shape[:-1] + i.shape), axis=-1)
        # same association as jnp.interp (f0 + (delta/dx)*df) so the result
        # is BITWISE equal, not just ulp-close (gated by the fuzz test)
        out = f0 + ((q - x0) / dx) * (f1 - f0)
        out = jnp.where(q <= xp[0], fp[..., :1], out)
        out = jnp.where(q >= xp[-1], fp[..., -1:], out)
        return out


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
