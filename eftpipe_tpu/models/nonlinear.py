"""One-loop engine: FFTLog of P_lin → P22/P13 and CF-side transforms.

Phase A (`build_nonlinear_tables`) assembles, on the host in complex128, the
constant tensors of the FFT-PT formalism — the analogue of the reference's
``NonLinear`` precomputation (/root/reference/eftpipe/pybird/pybird.py:870-1064)
— fusing wherever a contraction is linear in the FFTLog coefficients:

* ``a13[n, b, k]`` = k³ · k^{ν_n} · M13_{b,n}   →  P13 = P11 · Re[c @ a13]
* ``a11 / act / act_nnlo[n, l, s]`` = s-powers · MPC moments (incl. the s⁻²
  and s⁻⁴ counterterm factors)                  →  one real matvec each
* ``kpow22[n, k]`` = k^{ν_n + 3/2} (the k³ prefactor split across the two
  coefficient factors), ``m22[b, n, m]``        →  P22 quadratic contraction
* ``mcf22/mcf13[b, l, n, m]`` = Bessel-moment matrices ``Ml`` times the loop
  matrices (pybird.py:1040-1046)                →  CF quadratic contractions

Phase B (`nonlinear_pscf`) is pure jnp on (re, im) pairs: one FFTLog (two real
matmuls) plus the contractions above — batched over arbitrary leading axes of
the input P_lin.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..ops.fftlog import HostFFTLog, make_plan, fftlog_coef
from ..ops import cplx
from ..tables.loop_matrices import m13_matrices, m22_matrices, mpc
from ..utils.io import atomic_save_npz
from .config import EFTConfig


def _loop_fft(cfg: EFTConfig) -> HostFFTLog:
    # reference fftsettings: pybird.py:919
    return HostFFTLog(n=cfg.nfft_loop, xmin=1.5e-5, xmax=1000.0, bias=-1.6)


def _fid_coef_mag(plan, kin_plan: np.ndarray) -> np.ndarray:
    """Fiducial |c_n| profile for the whitened spectral cut (host numpy —
    no device call, so Phase A can't trip the axon D2H latency mode).

    The per-dof dynamic range of the quadratic-form input w is entirely the
    FFTLog-coefficient decay (|s^{-ν_n-3}| is n-independent: Re ν is the
    constant bias), set by the taper window and the smoothness of P_lin —
    any smooth positive spectrum gives the same profile, so a BBKS shape
    stands in for all cosmologies.  Whitening only reorders WHICH eigenpairs
    the cut keeps (lowrank_factors); the kept contraction stays exact."""
    q = kin_plan / 0.15
    tk = (np.log1p(2.34 * q) / (2.34 * q)
          * (1 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3
             + (6.71 * q) ** 4) ** -0.25)
    f = kin_plan * tk ** 2
    parts = []
    if plan.ileft > 0:
        if plan.extrap_lo:
            slope = (np.log(f[1]) - np.log(f[0])) / plan.lo_dlog
            parts.append(f[0] * np.exp(slope * plan.lo_logx) * plan.lo_fac)
        else:
            parts.append(np.zeros(plan.ileft))
    parts.append(f @ plan.smid.T)
    if plan.iright < plan.n:
        if plan.extrap_hi:
            slope = (np.log(f[-1]) - np.log(f[-2])) / plan.hi_dlog
            parts.append(f[-1] * np.exp(slope * plan.hi_logx) * plan.hi_fac)
        else:
            parts.append(np.zeros(plan.n - plan.iright))
    fx = np.concatenate(parts)
    c = np.hypot(fx @ plan.gre, fx @ plan.gim)
    return np.maximum(c, 1e-8 * c.max())


def _whiten_dofs(cmag: np.ndarray, nc: int) -> np.ndarray:
    """Map the (n+1,) coefficient profile to the 2·nc−1 trimmed real dofs of
    herm_w (zr rows n ∈ [nc, 2nc), then zi rows n ∈ (nc, 2nc))."""
    half = cmag[nc:-1]
    return np.concatenate([half, half[1:]])


_TABLE_MEMO: dict[tuple, dict] = {}


def build_nonlinear_tables(cfg: EFTConfig, cache_dir=None) -> dict:
    """Host-side constant tensors for the loop engine (complex128/float64).

    Memoized on the fields that actually enter the tables (the FFTLog
    settings and the k/s/kin grids — NOT km/kr/nd, which only scale the
    per-eval bias contraction): a multi-tracer build recomputes the ~100 MB
    fold tensors once instead of once per tracer.  With ``cache_dir`` the
    two expensive fold tensors additionally persist across processes
    (uncompressed npz, hash-keyed like the window cache)."""
    # 1e-5 spectral cut: a later 4-seed attribution (r5) showed the cut is
    # NOT what drives the end-to-end f32 logp error (1e-8 vs 1e-6 cuts all
    # land within 5e-4 of the same |dlogp|; the error lives in the
    # post-loop stages' bf16x3 matmuls, see ops/precision.py) while the
    # 1e-5 cut drops Y-intermediate traffic ~25% (15.0k -> 16.0k
    # evals/s/chip; 1e-4 gains ~2% more but eats the test margins)
    lowrank_tol = float(os.environ.get("EFTPIPE_TPU_LOWRANK_TOL", "1e-5"))
    # the truncation tol is part of the identity of the cached factors: a
    # retuned EFTPIPE_TPU_LOWRANK_TOL must not silently reuse a cache/memo
    # built at another cut
    memo_key = (cfg.nl, cfg.kmax, cfg.optiresum, cfg.ir_cutoff, cfg.k_ir,
                cfg.nfft_loop, cfg.kin_min, cfg.kin_max, cfg.nkin,
                lowrank_tol)
    if memo_key in _TABLE_MEMO:
        return dict(_TABLE_MEMO[memo_key])
    fold_cache = None
    if cache_dir is not None:
        import hashlib
        from pathlib import Path

        digest = hashlib.sha256(repr(memo_key).encode()).hexdigest()[:16]
        fold_cache = Path(cache_dir) / f"loopfold_{digest}.npz"
    fft = _loop_fft(cfg)
    kin = cfg.kin
    # FFTLog plans; IR-cutoff modes truncate the input grid below k_ir and
    # switch the low end to zero-padding (pybird.py:1127-1160)
    plan_full = make_plan(fft, kin, extrap="extrap", window=0.2)
    if cfg.ir_cutoff:
        idx = int(np.searchsorted(kin, cfg.k_ir))
        plan_cut = make_plan(fft, kin[idx:], extrap=("padding", "extrap"), window=0.2)
        kin_cut_index = idx
    else:
        plan_cut = None
        kin_cut_index = 0
    if cfg.ir_cutoff == "all":
        plan_pk = plan_cf = plan_cut
    elif cfg.ir_cutoff == "loop":
        plan_pk, plan_cf = plan_cut, plan_full
    elif cfg.ir_cutoff == "resum":
        plan_pk, plan_cf = plan_full, plan_cut
    else:
        plan_pk = plan_cf = plan_full

    pw = fft.pow  # (n+1,) complex exponents
    ns = -0.5 * pw
    k = cfg.k
    s = cfg.s
    ells = 2 * np.arange(cfg.nl)

    m13 = m13_matrices(pw)  # (10, n+1)

    kpow = k[None, :] ** pw[:, None]  # (n+1, nk)
    kpow22 = k[None, :] ** (pw[:, None] + 1.5)  # k³ split across both factors
    a13 = np.einsum("nk,bn->nbk", kpow * k[None, :] ** 3, m13)

    spow = s[None, :] ** (-pw[:, None] - 3.0)  # (n+1, ns)
    mcf11 = mpc(ells[:, None], ns[None, :])  # (nl, n+1)
    mcfct = mpc(ells[:, None], ns[None, :] - 1.0)
    mcfct_nnlo = mpc(ells[:, None], ns[None, :] - 2.0)
    a11 = np.einsum("ns,ln->nls", spow, mcf11)
    act = np.einsum("ns,ln->nls", spow * s[None, :] ** -2.0, mcfct)
    act_nnlo = np.einsum("ns,ln->nls", spow * s[None, :] ** -4.0, mcfct_nnlo)

    # Hermitian fold: the quadratic-form matrices act on the 2·nc+1
    # independent REAL dofs of the rfft coefficients (pallas_kernels.py) —
    # one real matmul per bl at evaluation time instead of four.  The
    # spectral window (0.2 taper, pybird fftsettings) sends the ±Nyquist
    # coefficients to EXACTLY zero, so those two dofs are dropped: the
    # contraction runs on 255 ≤ 2×128 dofs instead of 257, which cuts the
    # MXU lane padding of the dominant matmuls from 384 to 256 lanes.
    from ..ops.pallas_kernels import herm_fold, trim_nyquist

    n1 = pw.size
    nl = len(ells)
    nc = n1 // 2
    n22, n13 = cfg.n22, cfg.n13
    m22_fold = mcf_fold = lowrank = None
    _LR_KEYS = ("q22", "s22", "qcf", "scf", "qcfg", "scfg")
    _LR_VERSION = 2  # v2: whitened cut + (channel, f-power) premix factors
    if fold_cache is not None and fold_cache.exists():
        with np.load(fold_cache) as z:
            m22_fold, mcf_fold = z["m22_fold"], z["mcf_fold"]
            if ("lr_version" in z and int(z["lr_version"]) == _LR_VERSION
                    and all(k in z for k in _LR_KEYS)):
                lowrank = {k: z[k] for k in _LR_KEYS}
        if m22_fold.shape[0] != n22 or mcf_fold.shape[0] != (n22 + n13) * nl:
            m22_fold = mcf_fold = lowrank = None  # stale layout: recompute
    if mcf_fold is None:
        m22 = m22_matrices(pw)  # (28, n+1, n+1)
        # Bessel moments for the loop CF: Ml[l,n,m] = MPC(2l, ns_n+ns_m-3/2)
        ml = mpc(ells[:, None, None],
                 ns[None, :, None] + ns[None, None, :] - 1.5)
        m22_fold = trim_nyquist(herm_fold(m22), nc)
        # write the (b, l) CF quadratic-form matrices straight into one
        # preallocated block: einsum+concatenate would first-touch ~3 extra
        # 100 MB temporaries, the dominant cost of this Phase-A step on a
        # page-fault-bound host
        mcf_all = np.empty(((n22 + n13) * nl, n1, n1), dtype=complex)
        np.multiply(m22[:, None], ml[None, :],
                    out=mcf_all[: n22 * nl].reshape(n22, nl, n1, n1))
        np.multiply(m13[:, None, :, None], ml[None, :],
                    out=mcf_all[n22 * nl:].reshape(n13, nl, n1, n1))
        mcf_fold = trim_nyquist(herm_fold(mcf_all), nc)
    if lowrank is None:
        # truncated eigenbasis of the folded matrices — the f32 production
        # contraction (ops/pallas_kernels.py `quad_form_lowrank`); the
        # spectral truncation sits below the f32 rounding the |Δlogp|
        # budget already gates end-to-end
        from ..ops.pallas_kernels import lowrank_factors

        kin_pk = kin[kin_cut_index:] if plan_pk is plan_cut else kin
        kin_cf = kin[kin_cut_index:] if plan_cf is plan_cut else kin
        wh_pk = _whiten_dofs(_fid_coef_mag(plan_pk, kin_pk), nc)
        wh_cf = _whiten_dofs(_fid_coef_mag(plan_cf, kin_cf), nc)
        q22, s22 = lowrank_factors(m22_fold, tol=lowrank_tol, whiten=wh_pk)
        qcf, scf = lowrank_factors(mcf_fold, tol=lowrank_tol, whiten=wh_cf)
        # (channel, f-power) CF premix: folding the Legendre ℓ-weights and
        # the structure→group sum (bird.cf_group_map) into the matrices
        # BEFORE eigendecomposition lets the per-matrix spectral cut act on
        # the physically-summed channels, where the individual structures'
        # high-order tails cancel — the stacked rank drops ~7.6x (4864→640
        # at the 1e-5 default on the production grids), shrinking the hot
        # Y=Qw intermediate by the same factor.  Exact algebra before the
        # cut; dispatched for f32 only (nonlinear_pscf).
        from .bird import cf_group_map

        gmap = cf_group_map(nl, n22, n13)
        mcf_grp = (gmap @ mcf_fold.reshape(gmap.shape[1], -1)).reshape(
            (gmap.shape[0],) + mcf_fold.shape[1:])
        qcfg, scfg = lowrank_factors(mcf_grp, tol=lowrank_tol, whiten=wh_cf)
        lowrank = dict(q22=q22, s22=s22, qcf=qcf, scf=scf,
                       qcfg=qcfg, scfg=scfg)
        if fold_cache is not None:
            atomic_save_npz(fold_cache, m22_fold=m22_fold, mcf_fold=mcf_fold,
                            lr_version=np.array(_LR_VERSION), **lowrank)
    # the trim is exact only because the tapered DFT zeroes c_{±N/2}
    for plan in {id(plan_pk): plan_pk, id(plan_cf): plan_cf}.values():
        assert not plan.gre[:, 0].any() and not plan.gre[:, -1].any()
        assert not plan.gim[:, 0].any() and not plan.gim[:, -1].any()

    def c(x):
        return cplx.split(x)

    def half(x):
        # n ∈ [nc, 2nc) — the Nyquist row (exactly-zero coefficient) dropped
        r, i = cplx.split(x)
        return r[nc:-1], i[nc:-1]

    tables = dict(
        plan_pk=plan_pk,
        plan_cf=plan_cf,
        kin_cut_index=kin_cut_index,
        kpow22_half=half(kpow22),
        a13=c(a13),
        a11=c(a11),
        act=c(act),
        act_nnlo=c(act_nnlo),
        m22_fold=m22_fold,
        mcf_fold=mcf_fold,
        lowrank=lowrank,
        n22=n22,
        n13=n13,
        spow_half=half(spow),
        nc=nc,
        k=k,
        s=s,
    )
    _TABLE_MEMO[memo_key] = tables
    return dict(tables)


def _as_pair(t, dtype):
    return jnp.asarray(t[0], dtype), jnp.asarray(t[1], dtype)


def nonlinear_pscf(nt: dict, cfg: EFTConfig, plin_kin):
    """Loop power spectra and correlation functions.

    Parameters
    ----------
    nt : tables from :func:`build_nonlinear_tables`
    plin_kin : (..., nkin) linear power spectrum on cfg.kin (traced)

    Returns
    -------
    dict with
      p22 : (..., 28, nk), p13 : (..., 10, nk), p11 : (..., nk)
      c11 : (..., nl, ns), cct : (..., nl, ns), cct_nnlo : (..., nl, ns)
      c22 : (..., nl, 28, ns), c13 : (..., nl, 10, ns)

    Mirrors ``NonLinear.PsCf`` + the make* contractions
    (pybird.py:1074-1171); reference FFTLog window = 0.2.
    """
    dtype = plin_kin.dtype
    icut = nt["kin_cut_index"]
    f_cut = plin_kin[..., icut:] if icut else plin_kin
    coef_pk = fftlog_coef(nt["plan_pk"], f_cut if cfg.ir_cutoff in ("all", "loop") else plin_kin)
    if nt["plan_cf"] is nt["plan_pk"]:
        coef_cf = coef_pk
    else:
        coef_cf = fftlog_coef(nt["plan_cf"], f_cut if cfg.ir_cutoff == "resum" else plin_kin)

    a13 = _as_pair(nt["a13"], dtype)
    a11 = _as_pair(nt["a11"], dtype)
    act = _as_pair(nt["act"], dtype)
    act_nnlo = _as_pair(nt["act_nnlo"], dtype)
    kpow22_half = _as_pair(nt["kpow22_half"], dtype)
    spow_half = _as_pair(nt["spow_half"], dtype)
    nc = nt["nc"]

    from ..ops.pallas_kernels import (
        herm_w, lowrank_enabled, quad_form_lowrank, quad_form_real,
    )

    use_lr = lowrank_enabled(dtype) and nt.get("lowrank") is not None
    if use_lr:
        lr = {k: jnp.asarray(v, dtype) for k, v in nt["lowrank"].items()}

        def qf(w, which):
            return quad_form_lowrank(w, lr["q" + which], lr["s" + which])
    else:
        m22_fold = jnp.asarray(nt["m22_fold"], dtype)
        mcf_fold = jnp.asarray(nt["mcf_fold"], dtype)

        def qf(w, which):
            return quad_form_real(w, m22_fold if which == "22" else mcf_fold)

    # ---- P-side -----------------------------------------------------------
    # T[..., n, k] = c_n · k^{ν_n + 3/2};  P22_bk = Re Σ_{nm} T_nk T_mk M22_bnm
    # — Hermitian-folded to a REAL quadratic form (one matmul per b, walker-
    # grouped under vmap), or its truncated eigenbasis for f32
    # (ops/pallas_kernels.py)
    w_pk = herm_w(coef_pk, kpow22_half, nc)
    p22 = qf(w_pk, "22")
    p13_kernel = cplx.ceinsum_real("...n,nbk->...bk", coef_pk, a13)

    # ---- CF-side ----------------------------------------------------------
    c11 = cplx.ceinsum_real("...n,nls->...ls", coef_cf, a11)
    cct = cplx.ceinsum_real("...n,nls->...ls", coef_cf, act)
    cct_nnlo = cplx.ceinsum_real("...n,nls->...ls", coef_cf, act_nnlo)
    # Z[..., n, s] = c_n s^{-ν_n - 3} (each factor carries the full s-power,
    # matching the reference contraction pybird.py:1103-1125); C22/C13 are
    # the same folded quadratic form, evaluated in one stacked call
    w_cf = herm_w(coef_cf, spow_half, nc)
    n22b, n13b = nt["n22"], nt["n13"]
    nl = a11[0].shape[1]
    out = dict(
        p22=p22,
        p13_kernel=p13_kernel,
        c11=c11,
        cct=cct,
        cct_nnlo=cct_nnlo,
    )
    if (use_lr and "qcfg" in lr
            and os.environ.get("EFTPIPE_TPU_CF_PREMIX", "1") != "0"):
        # (channel, f-power)-premixed CF contraction (see
        # build_nonlinear_tables): ~7.6x lower stacked rank than the
        # per-structure form; bird.assemble_bird applies f^p + the
        # group→channel one-hot instead of the l22/l13 regroup einsums
        cgrp = quad_form_lowrank(w_cf, lr["qcfg"], lr["scfg"])  # (..., G·nl, ns)
        gnl = int(lr["scfg"].shape[0])
        out["cloop_grp"] = cgrp.reshape(
            cgrp.shape[:-2] + (gnl // nl, nl, cgrp.shape[-1]))
        return out
    c_all = qf(w_cf, "cf")  # (..., (28+10)·nl, ns)
    ns_ = c_all.shape[-1]
    out["c22"] = jnp.swapaxes(
        c_all[..., : n22b * nl, :].reshape(c_all.shape[:-2] + (n22b, nl, ns_)),
        -3, -2,
    )
    out["c13"] = jnp.swapaxes(
        c_all[..., n22b * nl:, :].reshape(c_all.shape[:-2] + (n13b, nl, ns_)),
        -3, -2,
    )
    return out
