"""Bird state: multipole-weighted spectra and bias-channel regrouping.

Functional replacement for the reference ``Bird`` container + ``setPsCfl`` /
``reducePsCfl`` / ``setPstl`` / ``subtractShotNoise``
(/root/reference/eftpipe/pybird/pybird.py:635-866).  The f-power regrouping of
the 28 + 10 loop structures into 12 bias-independent channels is tensorised
into constant (channel, structure) exponent masks so the whole assembly is a
pair of einsums, batched over walkers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from typing import NamedTuple

from ..ops.interp import spline_matrix
from ..tables.loop_matrices import legendre_weights
from .config import EFTConfig


class BirdState(NamedTuple):
    """Per-evaluation pipeline state (all jnp arrays; leading axes = batch).

    Power-spectrum side on cfg.k, correlation-function side on cfg.s.
    ``pct_nnlo_l`` / ``cct_nnlo`` are zeros when cfg.with_nnlo is off, so all
    downstream transforms can act unconditionally.
    """

    f: jnp.ndarray          # (...,) growth rate
    p11l: jnp.ndarray       # (..., nl, 3, nk)
    ploopl: jnp.ndarray     # (..., nl, 12, nk)
    pctl: jnp.ndarray       # (..., nl, 6, nk)
    pct_nnlo_l: jnp.ndarray # (..., nl, 3, nk)
    pstl: jnp.ndarray       # (..., nl, 3, nk)
    picc: jnp.ndarray       # (..., nl, nk)
    c11: jnp.ndarray        # (..., nl, ns)
    cct: jnp.ndarray        # (..., nl, ns)
    cct_nnlo: jnp.ndarray   # (..., nl, ns)
    cloopl: jnp.ndarray     # (..., nl, 12, ns)


# (channel, structure, f-power) triples of the bias regrouping
# (pybird.py:762-803); channels ordered [1, b1, b2, b3, b4, b1², b1b2, b1b3,
# b1b4, b2², b2b4, b4²]
_R22 = [
    (0, 20, 2), (0, 23, 3), (0, 24, 3), (0, 25, 4), (0, 26, 4), (0, 27, 4),
    (1, 9, 1), (1, 14, 2), (1, 15, 2), (1, 21, 3), (1, 22, 3),
    (2, 10, 1), (2, 16, 2), (2, 17, 2),
    (4, 11, 1), (4, 18, 2), (4, 19, 2),
    (5, 0, 0), (5, 6, 1), (5, 12, 2), (5, 13, 2),
    (6, 1, 0), (6, 7, 1),
    (8, 2, 0), (8, 8, 1),
    (9, 3, 0), (10, 4, 0), (11, 5, 0),
]
_R13 = [
    (0, 7, 2), (0, 8, 3), (0, 9, 3),
    (1, 3, 1), (1, 5, 2), (1, 6, 2),
    (3, 4, 1),
    (5, 0, 0), (5, 2, 1),
    (7, 1, 0),
]


def _exponent_tables(triples, nchan, nstruct):
    mask = np.zeros((nchan, nstruct))
    expo = np.zeros((nchan, nstruct))
    for c, b, p in triples:
        mask[c, b] = 1.0
        expo[c, b] = p
    return mask, expo


def loop_cp_groups():
    """(channel, f-power) regrouping of the 28+10 loop structures.

    Each structure enters exactly one channel with one fixed f-power
    (pybird.py:762-803), so the regrouping factorizes into a per-structure
    diagonal f^p followed by a CONSTANT structure→(c,p)-group sum.  Folding
    that constant sum (and the Legendre ℓ-weights) into the CF quadratic-form
    matrices BEFORE eigendecomposition collapses their stacked rank ~7x
    (models/nonlinear.py): the per-matrix spectral cut then acts on the
    physically-summed channels, where individual structures' high-order tails
    cancel.

    Returns (keys, onehot, pexp, members):
      keys    — sorted list of (channel, power) pairs (G = 22 for nl>=1)
      onehot  — (nloop, G) 0/1 map group → channel
      pexp    — (G,) float f-power of each group
      members — {key: ([b22 indices], [b13 indices])}
    """
    members: dict[tuple, tuple[list, list]] = {}
    for c, b, p in _R22:
        members.setdefault((c, p), ([], []))[0].append(b)
    for c, b, p in _R13:
        members.setdefault((c, p), ([], []))[1].append(b)
    keys = sorted(members)
    nchan = 1 + max(c for c, _, _ in _R22)
    onehot = np.zeros((nchan, len(keys)))
    pexp = np.empty(len(keys))
    for g, (c, p) in enumerate(keys):
        onehot[c, g] = 1.0
        pexp[g] = p
    return keys, onehot, pexp, members


def cf_group_map(nl: int, n22: int = 28, n13: int = 10) -> np.ndarray:
    """Constant (G·nl, (n22+n13)·nl) premix matrix for the CF loop.

    Row (g, ℓ) sums the structures of (channel, f-power) group ``g`` with
    their Legendre ℓ-weights; columns follow the b-major/ℓ-minor stacking of
    the folded CF quadratic-form matrices (models/nonlinear.py ``mcf_fold``,
    P22 block first).  Applying this map to ``mcf_fold`` BEFORE the spectral
    truncation is exact algebra — only the f^p diagonal and the
    group→channel one-hot remain per evaluation (see :func:`assemble_bird`).
    """
    keys, _, _, members = loop_cp_groups()
    lw = legendre_weights(nl)
    gmap = np.zeros((len(keys) * nl, (n22 + n13) * nl))
    for g, key in enumerate(keys):
        b22s, b13s = members[key]
        for l in range(nl):
            for b in b22s:
                gmap[g * nl + l, b * nl + l] = lw["l22"][l, b]
            for b in b13s:
                gmap[g * nl + l, (n22 + b) * nl + l] = lw["l13"][l, b]
    return gmap


def build_bird_tables(cfg: EFTConfig) -> dict:
    ltab = legendre_weights(cfg.nl)
    mask22, expo22 = _exponent_tables(_R22, cfg.nloop, cfg.n22)
    mask13, expo13 = _exponent_tables(_R13, cfg.nloop, cfg.n13)
    pstl = np.zeros((cfg.nl, 3, cfg.nk))
    pstl[0, 0] = 1.0
    pstl[0, 1] = cfg.k**2
    if cfg.nl >= 2:
        pstl[1, 2] = cfg.k**2
    _, cp_onehot, cp_pexp, _ = loop_cp_groups()
    return dict(
        cp_onehot=cp_onehot,
        cp_pexp=cp_pexp,
        s_kin_to_k=spline_matrix(cfg.kin, cfg.k),
        k=cfg.k,
        k2=cfg.k**2,
        k4=cfg.k**4,
        mask22=mask22,
        expo22=expo22,
        mask13=mask13,
        expo13=expo13,
        pstl=pstl,
        **ltab,
    )


def _loop_weights(bt, f, dtype):
    """(..., 12, 28) and (..., 12, 10) f-power weights."""
    fb = f[..., None, None]
    w22 = fb ** jnp.asarray(bt["expo22"], dtype) * jnp.asarray(bt["mask22"], dtype)
    w13 = fb ** jnp.asarray(bt["expo13"], dtype) * jnp.asarray(bt["mask13"], dtype)
    return w22, w13


def assemble_bird(bt: dict, cfg: EFTConfig, nl_out: dict, plin_kin, f) -> BirdState:
    """setPsCfl + reducePsCfl + setPstl + subtractShotNoise, batched.

    Parameters
    ----------
    nl_out : output of :func:`eftpipe_tpu.models.nonlinear.nonlinear_pscf`
    plin_kin : (..., nkin) linear P on cfg.kin
    f : (...,) growth rate
    """
    dtype = plin_kin.dtype
    p11 = plin_kin @ jnp.asarray(bt["s_kin_to_k"], dtype).T  # (..., nk)
    l11 = jnp.asarray(bt["l11"], dtype)
    lct = jnp.asarray(bt["lct"], dtype)
    lct_nnlo = jnp.asarray(bt["lct_nnlo"], dtype)
    l22 = jnp.asarray(bt["l22"], dtype)
    l13 = jnp.asarray(bt["l13"], dtype)

    p11l = jnp.einsum("...x,ln->...lnx", p11, l11)
    pctl = jnp.einsum("...x,ln->...lnx", jnp.asarray(bt["k2"], dtype) * p11, lct)
    if cfg.with_nnlo:
        pct_nnlo_l = jnp.einsum(
            "...x,ln->...lnx", jnp.asarray(bt["k4"], dtype) * p11, lct_nnlo
        )
    else:
        pct_nnlo_l = jnp.zeros(p11.shape[:-1] + (cfg.nl, 3, cfg.nk), dtype)

    p13 = nl_out["p13_kernel"] * p11[..., None, :]
    p22l = jnp.einsum("...bx,lb->...lbx", nl_out["p22"], l22)
    p13l = jnp.einsum("...bx,lb->...lbx", p13, l13)

    w22, w13 = _loop_weights(bt, f, dtype)
    ploopl = jnp.einsum("...cb,...lbx->...lcx", w22, p22l) + jnp.einsum(
        "...cb,...lbx->...lcx", w13, p13l
    )
    if "cloop_grp" in nl_out:
        # (channel, f-power)-premixed CF loop (cf_group_map folded into the
        # quadratic-form matrices before eigendecomposition,
        # models/nonlinear.py): apply f^p and the group→channel one-hot
        cgrp = nl_out["cloop_grp"]  # (..., G, nl, ns)
        fpow = f[..., None] ** jnp.asarray(bt["cp_pexp"], dtype)
        cloopl = jnp.einsum("cg,...g,...gls->...lcs",
                            jnp.asarray(bt["cp_onehot"], dtype), fpow, cgrp)
    else:
        c22l = nl_out["c22"] * l22[:, :, None]
        c13l = nl_out["c13"] * l13[:, :, None]
        cloopl = jnp.einsum("...cb,...lbx->...lcx", w22, c22l) + jnp.einsum(
            "...cb,...lbx->...lcx", w13, c13l
        )
    # constant stochastic contribution removed from the loops (pybird.py:861-866)
    ploopl = ploopl - ploopl[..., :1]

    pstl = jnp.broadcast_to(
        jnp.asarray(bt["pstl"], dtype), p11.shape[:-1] + (cfg.nl, 3, cfg.nk)
    )
    picc = jnp.zeros(p11.shape[:-1] + (cfg.nl, cfg.nk), dtype)

    return BirdState(
        f=jnp.asarray(f, dtype),
        p11l=p11l,
        ploopl=ploopl,
        pctl=pctl,
        pct_nnlo_l=pct_nnlo_l,
        pstl=pstl,
        picc=picc,
        c11=nl_out["c11"],
        cct=nl_out["cct"],
        cct_nnlo=nl_out["cct_nnlo"] if cfg.with_nnlo else jnp.zeros_like(nl_out["cct"]),
        cloopl=cloopl,
    )
