"""Alcock–Paczyński projection.

Functional replacement for the reference ``APeffect``
(/root/reference/eftpipe/pybird/pybird.py:1467-1628).  The multipoles are
rebuilt into P(k, µ) on a distorted grid (k', µ'), then re-projected onto
Legendre multipoles by a trapezoid over the fixed µ grid.  The distorted grid
depends on the sampled (q⊥, q∥), so the cubic interpolation runs in-jit via
the constant second-derivative spline operator (ops/interp.py); the Legendre
re-projection against the *fixed* µ grid is folded into one constant weight
matrix.  The function is written for a single evaluation; batching over
walkers is done with ``jax.vmap`` at the pipeline level.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..ops.interp import SplineTable
from ..ops.legendre import legendre_even
from .config import EFTConfig
from .bird import BirdState


def lcdm_hubble(om: float, z: float) -> float:
    """Dimensionless H(z)/H0 for flat LCDM (pybird.py:34-36)."""
    return float(np.sqrt(om * (1 + z) ** 3 + (1 - om)))


def lcdm_da(om: float, z: float) -> float:
    """Dimensionless angular-diameter distance H0·DA (pybird.py:39-42)."""
    from scipy.integrate import quad

    r = quad(lambda x: 1.0 / lcdm_hubble(om, x), 0, z)[0]
    return float(r / (1 + z))


def build_ap_tables(
    cfg: EFTConfig,
    z_ap: float | None = None,
    om_ap: float | None = None,
    da_fid: float | None = None,
    h_fid: float | None = None,
    rdrag_ap: float | None = None,
    hubble_ap: float | None = None,
    nbinsmu: int = 200,
    accboost: int = 1,
    nlmax: int | None = None,
    ap_st: bool = False,
) -> dict:
    """Fiducial background + fixed-µ-grid constants.

    Either (da_fid, h_fid) directly or (om_ap, z_ap) to compute them from flat
    LCDM (pybird.py:1522-1530).  ``rdrag_ap``/``hubble_ap`` feed the derived
    α⊥/α∥ (pybird.py:1564-1579).
    """
    if da_fid is None or h_fid is None:
        if om_ap is None or z_ap is None:
            raise ValueError("need (da_fid, h_fid) or (om_ap, z_ap)")
        da_fid = lcdm_da(om_ap, z_ap)
        h_fid = lcdm_hubble(om_ap, z_ap)
    nmu = nbinsmu * accboost
    nlmax = nlmax or cfg.nl

    def nodes_weights(mu, wmu):
        # (2l+1)/2 L_2i(µ) at the nodes, times 2·quadrature weights
        legw = np.stack(
            [(4.0 * i + 1.0) / 2.0 * legendre_even(i, mu) for i in range(nlmax)]
        )  # (nlmax, nmu)
        return mu, 2.0 * legw * wmu[None, :]

    # reference quadrature: nbinsmu-point trapezoid on [0, 1]
    # (pybird.py:1581-1596) — the f64 parity path
    mu = np.linspace(0.0, 1.0, nmu)
    wmu = np.full(nmu, mu[1] - mu[0])
    wmu[0] *= 0.5
    wmu[-1] *= 0.5
    mu, proj = nodes_weights(mu, wmu)
    # Gauss–Legendre quadrature — the f32 PRODUCTION path.  The µ integrand
    # is C² (even polynomials of µ' times a cubic spline along k'(k,µ)), so
    # a handful of GL nodes already sit far below the 200-pt trapezoid's own
    # O(h²) discretization error (measured on the AP parity bird: GL-16 vs
    # GL-64 ≤ 2.3e-7 of max, vs the trapezoid's 2.5e-4) — and the AP stage's
    # per-eval (nk, nmu, n) spline/one-hot tensors were 61% of the
    # flagship's HBM traffic at nmu=200 (53 MB/eval, measured by
    # tools/bench_stage_cost.py); GL-16 scales all of it by 16/200
    # (12382 → 13279 evals/s/chip vs GL-32 on the v5e flagship).  Exact
    # trapezoid parity is kept for f64 (the reference-gate dtype); the
    # end-to-end f32 error stays far inside the |Δlogp| < 0.02 bench/test
    # budget (r5 4-seed max 0.0019 with the per-stage 'highest' default of
    # ops/precision.py; GL-32 buys nothing once that is on).
    n_gl = int(os.environ.get("EFTPIPE_TPU_AP_GL", "16"))
    if n_gl > 0:
        x_gl, w_gl = np.polynomial.legendre.leggauss(n_gl)
        mu_gl, proj_gl = nodes_weights(0.5 * (x_gl + 1.0), 0.5 * w_gl)
    else:
        mu_gl = proj_gl = None
    return dict(
        da_fid=float(da_fid),
        h_fid=float(h_fid),
        rdrag_ap=rdrag_ap,
        h_ap=hubble_ap,
        mu=mu,
        proj=proj,
        mu_gl=mu_gl,
        proj_gl=proj_gl,
        nlmax=nlmax,
        ap_st=ap_st,
        spline=SplineTable.build(cfg.k),
        k=cfg.k,
    )


def ap_params(at: dict, da, h):
    """(q⊥, q∥) from the sampled background (pybird.py:1554-1562)."""
    return da / at["da_fid"], at["h_fid"] / h


def alperp_alpara(at: dict, da, h, rdrag, hubble):
    """Derived (α⊥, α∥) including the rdrag·h rescaling (pybird.py:1564-1579)."""
    qperp, qpar = ap_params(at, da, h)
    if at["rdrag_ap"] is None or at["h_ap"] is None:
        return qperp, qpar
    ratio = (at["rdrag_ap"] * at["h_ap"]) / (rdrag * hubble)
    return qperp * ratio, qpar * ratio


def ap_quadrature(at: dict, dtype):
    """(µ nodes, projection weights) for the evaluation dtype: Gauss–Legendre
    for float32 (production; ~6x less HBM traffic than the 200-pt trapezoid,
    accuracy bounded by the end-to-end |Δlogp| budget), the reference's
    trapezoid for float64 (the parity-gate dtype).  Opt-out:
    EFTPIPE_TPU_AP_GL=0 at table-build time."""
    if jnp.dtype(dtype) == jnp.float32 and at.get("mu_gl") is not None:
        return at["mu_gl"], at["proj_gl"]
    return at["mu"], at["proj"]


def _project(at: dict, proj, plk, kp, leg_mup, dtype):
    """Interpolate multipoles to (k', µ), rebuild P(k,µ), re-project
    (pybird.py:1581-1596) — algebraically contracted into one small
    per-evaluation operator.

    Cubic-spline interpolation is linear in the data, so the whole chain
    spline(k'(k,µ)) → ×L_l(µ') → Σ_µ (trapezoid×Legendre weights) collapses
    to ``out[a,p,k] = Σ_{l,j} T[a,l,k,j]·plk[l,p,j]`` with T built by
    contracting the spline's segment one-hot against the µ weights FIRST.
    The (channels × nk·nmu) interpolants of the naive order (the reference's
    per-array interp1d loop) never materialize: per walker the largest
    intermediate drops from ~(P·nk·nmu) to (nk·nmu·n) — independent of the
    channel count — and the per-channel work is one (nl·n → nl·nk) matmul.
    Exact same not-a-knot spline + trapezoid math as ops/interp.spline_eval.
    """
    table = at["spline"]
    x = jnp.asarray(table.x, dtype)
    h = jnp.asarray(table.h, dtype)
    m2 = jnp.asarray(table.m2, dtype)
    n = table.x.size
    nk, nmu = kp.shape

    # containing segment (identical to spline_eval: clip to [0, n-2])
    ge = (kp[..., None] >= x[1 : n - 1]).astype(jnp.int32)
    idx = jnp.sum(ge, axis=-1)                               # (nk, nmu)
    oh = (idx[..., None] == jnp.arange(n - 1)).astype(dtype)  # (nk, nmu, n-1)
    x0 = oh @ x[: n - 1]
    hi = oh @ h
    t = (kp - x0) / hi
    u = 1.0 - t
    h26 = hi * hi / 6.0

    pad_r = [(0, 0), (0, 0), (0, 1)]
    pad_l = [(0, 0), (0, 0), (1, 0)]

    def seg_weights(c0, c1):
        # W[k,m,i] = c0·[idx=i] + c1·[idx+1=i], shape (nk, nmu, n)
        return (jnp.pad(c0[..., None] * oh, pad_r)
                + jnp.pad(c1[..., None] * oh, pad_l))

    # NOTE a value-first variant (one-hot contracted against stacked knot
    # values, no pads) was measured SLOWER end-to-end on TPU (10.0k vs
    # 12.4k evals/s at GL-32): the per-walker batched (nk·nmu, n)×(n, 4c+2)
    # GEMM and its layout transposes cost more than these pad/select
    # tensors, which XLA keeps small at nmu = 32.
    wy = seg_weights(u, t)
    wm = seg_weights(h26 * (u * u * u - u), h26 * (t * t * t - t))

    a_w = jnp.asarray(proj, dtype)[:, None, :] * leg_mup[None, :, :]
    ty = jnp.einsum("alm,kmi->alki", a_w, wy)
    tm = jnp.einsum("alm,kmi->alki", a_w, wm)
    t_op = ty + jnp.einsum("alki,ij->alkj", tm, m2)
    return jnp.einsum("alkj,lpj->apk", t_op, plk)


def ap_transform(at: dict, cfg: EFTConfig, bird: BirdState, qperp, qpar) -> BirdState:
    """Apply the AP distortion to all multipole tensors (pybird.py:1598-1621).

    ``qperp``/``qpar`` are traced scalars (single evaluation; vmap for batch).
    """
    dtype = bird.p11l.dtype
    mu_nodes, proj = ap_quadrature(at, dtype)
    mu = jnp.asarray(mu_nodes, dtype)
    k = jnp.asarray(at["k"], dtype)
    finv2 = (qperp / qpar) ** 2
    warp = jnp.sqrt(1.0 + mu * mu * (finv2 - 1.0))  # (nmu,)
    kp = k[:, None] / qperp * warp[None, :]          # (nk, nmu)
    mup = mu / (qpar / qperp) / warp                  # (nmu,)
    leg_mup = jnp.stack([legendre_even(i, mup) for i in range(at["nlmax"])])
    coef = 1.0 / (qperp * qperp * qpar)

    # one fused projection for all structure channels: the spline/one-hot
    # work is shared instead of repeated per array
    fields = ["p11l", "pctl", "ploopl"]
    if cfg.with_nnlo:
        fields.append("pct_nnlo_l")
    if at["ap_st"]:
        fields.append("pstl")
    sizes = [getattr(bird, f).shape[-2] for f in fields]
    stacked = jnp.concatenate([getattr(bird, f) for f in fields], axis=-2)
    projected = coef * _project(at, proj, stacked, kp, leg_mup, dtype)
    splits = np.cumsum(sizes)[:-1]
    parts = jnp.split(projected, splits, axis=-2)
    return bird._replace(**dict(zip(fields, parts)))
