"""Survey window convolution.

Phase A builds the Fourier-space window matrix W_{a,l}(k,p) from the
configuration-space window multipoles Q_q(s) exactly as the reference does
(/root/reference/eftpipe/window.py:262-359): Wigner-3j² coupling of the Q_q
into Q_{a,l}(s), a 4096-point kernel-FFTLog with spherical-Bessel j_a(ks)
kernels, the analytic MPC transform on the p side, the |p-k| < windowk mask
and the Δp quadrature weights.  The per-evaluation cubic interpolation from
the internal k grid onto the p grid (window.py:371-387) is itself a constant
matrix, so the whole convolution collapses into a single constant tensor
``wmat[a, l, k, j]`` applied as one einsum in the jitted graph.

The matrix is cached to ``<cache_dir>/window_<hash>.npz`` keyed by a hash of
the build settings, with the settings themselves stored as a ``meta`` JSON
string *inside* the npz (a hash mismatch simply misses the cache, so stale
artifacts can never be loaded).  Reference-format ``window_fourier_file``
matrices (raw ``.npy`` with an optional ``.json`` meta sidecar) are also
accepted, validated against the current settings on load and written back
after a compute — the window.py:204-260 MetaInfoError pattern.

``WindowMatrix`` (precomputed wide-angle style matrices, window.py:472-577)
is provided by :func:`build_window_matrix_tables`.
"""

from __future__ import annotations

import json
import hashlib
import logging
import numpy as np
import jax.numpy as jnp
from pathlib import Path
from scipy.special import spherical_jn

from ..ops.fftlog import HostFFTLog
from ..ops.interp import spline_matrix
from ..tables.loop_matrices import mpc
from ..utils.io import atomic_save_npz
from .config import EFTConfig
from .bird import BirdState
from .transforms import map_pk_fields


log = logging.getLogger("eftpipe_tpu.window")


class MetaInfoError(Exception):
    """Cached/loaded window artifact inconsistent with the current settings
    (reference window.py:36)."""

# Wigner-3j² coupling C_{a,l,q} = (2a+1) (a l q; 0 0 0)² restricted to even
# multipoles a,l,q ∈ {0,2,4,6} (window.py:286-303)
CALQ = np.array([
    [[1, 0, 0, 0],
     [0, 1 / 5, 0, 0],
     [0, 0, 1 / 9, 0],
     [0, 0, 0, 1 / 13]],
    [[0, 1, 0, 0],
     [1, 2 / 7, 2 / 7, 0],
     [0, 2 / 7, 100 / 693, 25 / 143],
     [0, 0, 25 / 143, 14 / 143]],
    [[0, 0, 1, 0],
     [0, 18 / 35, 20 / 77, 45 / 143],
     [1, 20 / 77, 162 / 1001, 20 / 143],
     [0, 45 / 143, 20 / 143, 252 / 2431]],
    [[0, 0, 0, 1],
     [0, 0, 5 / 11, 14 / 55],
     [0, 5 / 11, 20 / 99, 28 / 187],
     [1, 14 / 55, 28 / 187, 400 / 3553]],
])


def window_kgrid(kmax: float = 0.3, accboost: int = 1) -> np.ndarray:
    """Convolution p grid: geometric below 0.015, linear above (window.py:27-33)."""
    return np.concatenate([
        np.geomspace(1e-5, 0.015, 100 * accboost, endpoint=False),
        np.arange(0.015, kmax, 1e-3 / accboost),
    ])


def load_configspace_window(path, nq: int) -> tuple[np.ndarray, np.ndarray]:
    """Read an (s, Q0, Q2, ...) text file, dropping s = 0 rows (window.py:272-283)."""
    raw = np.loadtxt(path)
    while raw[0, 0] == 0.0:
        raw = raw[1:]
    if raw.shape[-1] > 1 + nq:
        raw = raw[:, : 1 + nq]
    return raw[:, 0], raw[:, 1:].T


def compute_wal(
    cfg: EFTConfig,
    sw: np.ndarray,
    qq: np.ndarray,
    p: np.ndarray,
    na: int,
    nl: int,
    nmax: int = 4096,
    xmin_factor: float = 1.0,
    xmax_factor: float = 100.0,
    bias: float = -1.6,
    window_param: float | None = 1.0,
) -> np.ndarray:
    """W_{a,l}(k,p) from config-space multipoles (window.py:262-346)."""
    nq = qq.shape[0]
    qal = np.einsum("alq,qs->als", CALQ[..., :nq], qq)[:na, :nl]

    fft = HostFFTLog(n=nmax, xmin=sw[0] * xmin_factor, xmax=sw[-1] * xmax_factor, bias=bias)
    k = cfg.k
    ells_a = np.arange(na)

    def kernel(x):
        # j_{2a}(k s): shape (na, 1, nk, len(x))
        return spherical_jn(
            2 * ells_a[:, None, None, None],
            x[None, None, None, :] * k[None, None, :, None],
        )

    # the mask multipoles are k-independent — only the j_a(ks) kernel carries
    # k.  A length-1 k axis broadcasts against the kernel inside coef(), so
    # the 10^4-point mask resample runs once per (a,l) instead of nk times
    # (measured: 36 s -> 1 s per tracer at nmax=4096/accboost=4)
    f_in = qal[:, :, None, :]
    coef = fft.coef(sw, f_in, extrap="padding", window=window_param, kernel=kernel)
    phase = np.real((-1j) ** (2 * ells_a))[:, None, None, None] * np.real(
        (1j) ** (2 * np.arange(nl))
    )[None, :, None, None]
    coef = coef * phase

    ppow = p[None, :] ** (-fft.pow[:, None] - 3.0)
    m = 4.0 * np.pi * mpc(2 * np.arange(nl)[:, None], -0.5 * fft.pow[None, :])
    return p**2 * np.real(np.einsum("alkn,np,ln->alkp", coef, ppow, m, optimize=True))


def mask_and_weight(cfg: EFTConfig, wal: np.ndarray, p: np.ndarray,
                    withmask: bool = True, windowk: float = 0.05) -> np.ndarray:
    """|p-k| mask + Δp quadrature weights (window.py:348-359)."""
    out = wal
    if withmask:
        mask = (p[:, None] < cfg.k[None, :] + windowk) & (p[:, None] > cfg.k[None, :] - windowk)
        out = np.einsum("alkp,pk->alkp", out, mask)
    deltap = np.concatenate([[0.0], np.diff(p)])
    return out * deltap


def build_window_tables(
    cfg: EFTConfig,
    window_configspace_file=None,
    window_fourier_file=None,
    cache_dir=None,
    na: int | None = None,
    nl: int | None = None,
    nq: int = 3,
    pmax: float | None = None,
    accboost: int = 1,
    withmask: bool = True,
    windowk: float = 0.05,
    nmax: int = 4096,
    xmin_factor: float = 1.0,
    xmax_factor: float = 100.0,
    bias: float = -1.6,
    window_param: float | None = 1.0,
    window_st: bool = True,
    icc_tables: dict | None = None,
) -> dict:
    """Fused window tensor (+ optional integral-constraint coupling)."""
    na = na or cfg.nl
    nl = nl or cfg.nl
    if na > cfg.nl or nl > cfg.nl:
        raise ValueError(f"na={na}, nl={nl} exceed computed multipoles nl={cfg.nl}")
    if na > nl:
        raise ValueError(f"na={na} > nl={nl} is inconsistent")
    if pmax is None:
        pmax = float(cfg.k.max())
    p = window_kgrid(kmax=pmax, accboost=accboost)

    meta = dict(
        na=na, nl=nl, nq=nq, pmax=pmax, accboost=accboost, nmax=nmax,
        xmin_factor=xmin_factor, xmax_factor=xmax_factor, bias=bias,
        window_param=window_param, k=cfg.k.tolist(),
        window_configspace_file=str(window_configspace_file),
    )
    wal = None
    cache_path = None
    fourier_path = None
    if window_fourier_file is not None:
        # reference-format precomputed Fourier matrix: a raw .npy of
        # Wal[a, l, k, p] (window.py:204-260), with the Nl-suffix retry.
        # Normalize to a '.npy' suffix up front: np.save APPENDS '.npy' to
        # suffix-less paths, so a configured bare path would save to one
        # file and load from another, silently recomputing every run.
        fourier_path = Path(window_fourier_file)
        if fourier_path.suffix != ".npy":
            fourier_path = fourier_path.with_name(fourier_path.name + ".npy")
        wf = fourier_path
        if wf.exists():
            wal = np.load(wf)
            if wal.shape[1] != nl:
                retry = wf.with_name(wf.stem + f"_Nl{nl}.npy")
                if retry.exists():
                    wal, wf = np.load(retry), retry
                else:
                    wal = None
        if wal is not None:
            log.info("window: loaded fourier matrix %s", wf)
        if wal is not None:
            if wal.shape[:2] != (na, nl):
                raise MetaInfoError(
                    f"window fourier matrix shape {wal.shape} does not match "
                    f"(na, nl) = ({na}, {nl})"
                )
            if wal.shape[2:] != (cfg.k.size, p.size):
                raise MetaInfoError(
                    f"window fourier matrix (nk, np) = {wal.shape[2:]} does "
                    f"not match the current grids ({cfg.k.size}, {p.size}) — "
                    "was it built for different k/accboost/pmax settings?"
                )
            # honor a reference-style JSON meta sidecar when present
            # (window.py:233-256): settings drift raises, not silently loads
            meta_file = wf.with_suffix(".json")
            if meta_file.exists():
                with meta_file.open() as fjson:
                    loaded_meta = json.load(fjson)
                check_keys = [
                    key for key in meta
                    if key in loaded_meta and key != "window_configspace_file"
                ]
                mismatch = {
                    key: (loaded_meta[key], meta[key])
                    for key in check_keys if loaded_meta[key] != meta[key]
                }
                if mismatch:
                    raise MetaInfoError(
                        f"window fourier meta {meta_file} inconsistent with "
                        f"current settings: {mismatch}"
                    )
    if wal is None and cache_dir is not None:
        key = hashlib.sha256(json.dumps(meta, sort_keys=True).encode()).hexdigest()[:16]
        cache_path = Path(cache_dir) / f"window_{key}.npz"
        if cache_path.exists():
            wal = np.load(cache_path)["wal"]
            log.info("window: loaded cached matrix %s", cache_path)
    if wal is None:
        if window_configspace_file is None:
            raise ValueError("window_configspace_file required to compute the window")
        log.info(
            "window: computing W_al from %s (na=%d nl=%d nmax=%d, cached -> %s)",
            window_configspace_file, na, nl, nmax, cache_path,
        )
        sw, qq = load_configspace_window(window_configspace_file, nq)
        wal = compute_wal(
            cfg, sw, qq, p, na, nl, nmax=nmax, xmin_factor=xmin_factor,
            xmax_factor=xmax_factor, bias=bias, window_param=window_param,
        )
        if cache_path is not None:
            atomic_save_npz(cache_path, wal=wal, meta=json.dumps(meta))
        if fourier_path is not None:
            # save the computed matrix back to the requested fourier file
            # with its meta sidecar, like the reference's _save_Wal
            # (window.py:361-369), so the next run loads instead of recomputing
            try:
                fourier_path.parent.mkdir(parents=True, exist_ok=True)
                np.save(fourier_path, wal)
                with fourier_path.with_suffix(".json").open("w") as fjson:
                    json.dump(meta, fjson, indent=2)
                log.info("window: saved fourier matrix %s", fourier_path)
            except OSError:
                log.warning(
                    "window: could not write fourier matrix back to %s — "
                    "the next run will recompute", fourier_path, exc_info=True,
                )

    waldk = mask_and_weight(cfg, wal, p, withmask=withmask, windowk=windowk)
    # fuse the per-eval cubic interpolation co.k -> p into the window tensor
    interp = spline_matrix(cfg.k, p)  # (np, nk)
    wmat = np.einsum("alkp,pj->alkj", waldk, interp)
    return dict(
        wmat=wmat, wal=wal, p=p, na=na, nl=nl, window_st=window_st,
        icc=icc_tables, meta=meta,
    )


def apply_window(wt: dict, cfg: EFTConfig, bird: BirdState) -> BirdState:
    """Convolve all P-side tensors (window.py:389-415), including the
    integral-constraint subtraction when configured."""
    dtype = bird.p11l.dtype
    wmat = jnp.asarray(wt["wmat"], dtype)
    icc = wt.get("icc")
    if icc is not None:
        icc_mat = jnp.asarray(icc["wmat"], dtype)
        conv = lambda x: jnp.einsum("alkj,...lnj->...ank", wmat - icc_mat, x)
    else:
        conv = lambda x: jnp.einsum("alkj,...lnj->...ank", wmat, x)

    out = bird._replace(
        p11l=conv(bird.p11l),
        pctl=conv(bird.pctl),
        ploopl=conv(bird.ploopl),
        pct_nnlo_l=conv(bird.pct_nnlo_l),
        pstl=conv(bird.pstl) if wt["window_st"] else bird.pstl,
    )
    if icc is not None:
        psn = jnp.asarray(icc["psn"], dtype)
        out = out._replace(picc=bird.picc - psn)
    return out


# ---------------------------------------------------------------------------
# precomputed window matrices ("Florian" format, window.py:418-577)
# ---------------------------------------------------------------------------

def rearrange_window_matrix(
    matrix, in_ells, in_kmin, in_kmax, in_nbins,
    out_ells, out_kmin, out_kmax, out_nbins,
    sel_in_ells, sel_in_kmax, sel_out_ells, sel_out_kmin, sel_out_kmax,
):
    """Mask and reshape a flat window matrix into (a, l, k_out, k_in)
    (window.py:426-469)."""
    kedges = np.linspace(in_kmin, in_kmax, in_nbins + 1)
    kin = (kedges[1:] + kedges[:-1]) / 2
    mask_in = np.zeros(in_nbins * len(in_ells), dtype=bool)
    ileft, iright = 0, int(np.searchsorted(kin, sel_in_kmax))
    for ell in in_ells:
        if ell in sel_in_ells:
            mask_in[ileft:iright] = True
        ileft, iright = ileft + in_nbins, iright + in_nbins

    kedges = np.linspace(out_kmin, out_kmax, out_nbins + 1)
    kout = (kedges[1:] + kedges[:-1]) / 2
    mask_out = np.zeros(out_nbins * len(out_ells), dtype=bool)
    ileft = int(np.searchsorted(kout, sel_out_kmin))
    iright = int(np.searchsorted(kout, sel_out_kmax))
    for ell in out_ells:
        if ell in sel_out_ells:
            mask_out[ileft:iright] = True
        ileft, iright = ileft + out_nbins, iright + out_nbins

    matrix = matrix[np.ix_(mask_out, mask_in)]
    nk_out = matrix.shape[0] // len(sel_out_ells)
    nk_in = matrix.shape[1] // len(sel_in_ells)
    out = np.zeros((len(sel_out_ells), len(sel_in_ells), nk_out, nk_in))
    for i in range(len(sel_out_ells)):
        for j in range(len(sel_in_ells)):
            out[i, j] = matrix[i * nk_out:(i + 1) * nk_out, j * nk_in:(j + 1) * nk_in]
    return out


def build_window_matrix_tables(
    cfg: EFTConfig,
    path,
    ells: list[int],
    kmin: float,
    kmax: float,
    window_st: bool = False,
) -> dict:
    """Load a precomputed (wide-angle style) window matrix and fuse the
    kavg-grid interpolation (window.py:511-563)."""
    matrix = np.loadtxt(path)
    # theory side: 400 bins on [0, 0.4] over ells (0,2,4); data side: 40 bins
    # over ells (0..4) — the hard-coded "Florian" layout (window.py:524-535)
    matrix = rearrange_window_matrix(
        matrix,
        in_ells=(0, 2, 4), in_kmin=0.0, in_kmax=0.4, in_nbins=400,
        out_ells=(0, 1, 2, 3, 4), out_kmin=0.0, out_kmax=0.4, out_nbins=40,
        sel_in_ells=tuple(2 * i for i in range(cfg.nl)), sel_in_kmax=float(cfg.k.max()),
        sel_out_ells=tuple(ells), sel_out_kmin=kmin, sel_out_kmax=kmax,
    )
    kavg = np.linspace(0, 0.4, 400)[:300]  # hard-coded in reference (window.py:548-550)
    interp = spline_matrix(cfg.k, kavg)  # (navg, nk)
    wmat = np.einsum("alkp,pj->alkj", matrix, interp)
    return dict(wmat=wmat, window_st=window_st, na=len(ells), nl=cfg.nl)


def apply_window_matrix(wt: dict, cfg: EFTConfig, bird: BirdState) -> BirdState:
    dtype = bird.p11l.dtype
    wmat = jnp.asarray(wt["wmat"], dtype)
    conv = lambda x: jnp.einsum("alkj,...lnj->...ank", wmat, x)
    out = bird._replace(
        p11l=conv(bird.p11l),
        pctl=conv(bird.pctl),
        ploopl=conv(bird.ploopl),
        pct_nnlo_l=conv(bird.pct_nnlo_l),
        pstl=conv(bird.pstl) if wt["window_st"] else bird.pstl,
        picc=jnp.zeros(bird.picc.shape[:-2] + (wt["na"], wmat.shape[-2]), dtype),
    )
    return out
