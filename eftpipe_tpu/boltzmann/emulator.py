"""JAX-native cosmology emulator — the ``matryoshka`` analogue
(/root/reference/eftpipe/matryoshka.py:67-157).

The reference wraps TensorFlow NN emulators for the transfer function and
growth; here the emulator is a plain JAX MLP (pytree weights, jit/vmap-able,
runs on the TPU inside the sampling graph):

* ``TransferEmulator`` — maps (ω_b, ω_cdm, h, n_s) → log T(k) on a fixed
  log-k grid.  Training data comes from any oracle (CLASS/CAMB tables or the
  built-in Eisenstein–Hu transfer); training runs on-device with optax.
* Growth and background are *not* emulated: the LCDM quadratures in eh98.py
  are exact, cheap and already jit-able (matryoshka.py:129-141 emulates them
  only because its transfer stack lives in TF).
* ``EmulatorProvider`` — assembles P_lin(k, z) = A_s primordial × T²(k) ×
  D²(z) with AP distortions, plugging into the tracer pipeline exactly like
  the EH provider.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Sequence

from ..models.config import EFTConfig
from ..models.pipeline import CosmoInputs
from .eh98 import eh98_transfer, lcdm_growth, lcdm_background, _KPIVOT


# ----------------------------------------------------------------------
# minimal MLP (pytree params; no framework dependency)
# ----------------------------------------------------------------------
def init_mlp(key, sizes: Sequence[int]) -> list[dict]:
    params = []
    for din, dout in zip(sizes[:-1], sizes[1:]):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (din, dout)) * jnp.sqrt(2.0 / din)
        params.append({"w": w, "b": jnp.zeros(dout)})
    return params


def mlp_apply(params, x):
    for layer in params[:-1]:
        x = jnp.tanh(x @ layer["w"] + layer["b"])
    last = params[-1]
    return x @ last["w"] + last["b"]


# ----------------------------------------------------------------------
@dataclass(eq=False)
class TransferEmulator:
    """log T(k) emulator on a fixed k grid [1/Mpc]."""

    params: Any
    kgrid: np.ndarray           # Mpc^-1
    x_mean: jnp.ndarray
    x_std: jnp.ndarray
    y_mean: jnp.ndarray
    y_std: jnp.ndarray
    input_names: tuple = ("omega_b", "omega_cdm", "h", "ns")

    def __call__(self, x):
        """x: (..., 4) raw inputs → T(k) (..., nk)."""
        xn = (jnp.asarray(x) - self.x_mean) / self.x_std
        y = mlp_apply(self.params, xn)
        return jnp.exp(y * self.y_std + self.y_mean)

    # -- persistence -------------------------------------------------------
    def save(self, path):
        flat = {}
        for i, layer in enumerate(self.params):
            flat[f"w{i}"] = np.asarray(layer["w"])
            flat[f"b{i}"] = np.asarray(layer["b"])
        np.savez(
            path, kgrid=self.kgrid, x_mean=np.asarray(self.x_mean),
            x_std=np.asarray(self.x_std), y_mean=np.asarray(self.y_mean),
            y_std=np.asarray(self.y_std), nlayers=len(self.params), **flat,
        )

    @classmethod
    def load(cls, path) -> "TransferEmulator":
        with np.load(path) as z:
            n = int(z["nlayers"])
            # host copies (see PkEmulator.load: device→host reads of artifact
            # metadata degrade the axon tunnel's per-call latency)
            params = [
                {"w": np.asarray(z[f"w{i}"]), "b": np.asarray(z[f"b{i}"])}
                for i in range(n)
            ]
            return cls(
                params=params, kgrid=z["kgrid"],
                x_mean=np.asarray(z["x_mean"]), x_std=np.asarray(z["x_std"]),
                y_mean=np.asarray(z["y_mean"]), y_std=np.asarray(z["y_std"]),
            )


DEFAULT_BOUNDS = {
    "omega_b": (0.020, 0.024),
    "omega_cdm": (0.09, 0.15),
    "h": (0.60, 0.76),
    "ns": (0.90, 1.02),
}


def train_transfer_emulator(
    kgrid_mpc: np.ndarray,
    bounds: dict = None,
    n_samples: int = 2048,
    width: int = 128,
    depth: int = 3,
    steps: int = 3000,
    lr: float = 3e-3,
    seed: int = 0,
    oracle=None,
) -> TransferEmulator:
    """Train on an oracle (default: Eisenstein–Hu transfer).  To emulate a
    real Boltzmann code, pass ``oracle(x_row) -> T(k)`` backed by CLASS/CAMB
    tables."""
    import optax

    bounds = bounds or DEFAULT_BOUNDS
    names = tuple(bounds)
    rng = np.random.default_rng(seed)
    lo = np.array([bounds[n][0] for n in names])
    hi = np.array([bounds[n][1] for n in names])
    x = lo + (hi - lo) * rng.random((n_samples, len(names)))

    if oracle is None:
        def oracle(row):
            ob, oc, h, _ = row
            t, _ = eh98_transfer(jnp.asarray(kgrid_mpc), ob, ob + oc, h)
            return t

    y = np.log(np.stack([np.asarray(oracle(row)) for row in x]))

    x_mean, x_std = x.mean(0), x.std(0)
    y_mean, y_std = y.mean(0), y.std(0) + 1e-12
    xn = jnp.asarray((x - x_mean) / x_std)
    yn = jnp.asarray((y - y_mean) / y_std)

    key = jax.random.PRNGKey(seed)
    sizes = [len(names)] + [width] * depth + [len(kgrid_mpc)]
    params = init_mlp(key, sizes)

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, xb, yb):
        def loss(p):
            return jnp.mean((mlp_apply(p, xb) - yb) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, l

    batch = min(256, n_samples)
    for i in range(steps):
        idx = rng.integers(0, n_samples, batch)
        params, state, l = step(params, state, xn[idx], yn[idx])

    return TransferEmulator(
        params=params, kgrid=np.asarray(kgrid_mpc),
        x_mean=jnp.asarray(x_mean), x_std=jnp.asarray(x_std),
        y_mean=jnp.asarray(y_mean), y_std=jnp.asarray(y_std),
        input_names=names,
    )


# ----------------------------------------------------------------------
@dataclass(eq=False)
class EmulatorProvider:
    """Cosmology provider backed by a TransferEmulator (matryoshka.py:67-157
    analogue): P_lin = (8π²/25) A_s (k/k_p)^{n_s−1} k T²(k) D²(z) (c/H0)⁴/Ω_m²."""

    cfg: EFTConfig
    zeff: float
    emulator: TransferEmulator
    da_fid: float | None = None
    h_fid: float | None = None
    use_ap: bool = True

    @classmethod
    def load(cls, cfg: EFTConfig, zeff: float, path, om_fid: float = 0.31,
             use_ap: bool = True) -> "EmulatorProvider":
        from ..models.ap import lcdm_da, lcdm_hubble

        return cls(
            cfg=cfg, zeff=zeff, emulator=TransferEmulator.load(path),
            da_fid=lcdm_da(om_fid, zeff), h_fid=lcdm_hubble(om_fid, zeff),
            use_ap=use_ap,
        )

    def inputs(self, params) -> CosmoInputs:
        h = params["h"]
        om = (params["omega_b"] + params["omega_cdm"]) / h**2
        x = jnp.stack([jnp.asarray(params[n], jnp.result_type(float))
                       for n in self.emulator.input_names])
        # emulator grid is in Mpc^-1; pipeline kin is h/Mpc
        t_emu = self.emulator(x)
        k_mpc = jnp.asarray(self.cfg.kin) * h
        logt = jnp.interp(jnp.log(k_mpc), jnp.log(jnp.asarray(self.emulator.kgrid)),
                          jnp.log(t_emu))
        t = jnp.exp(logt)
        d, f = lcdm_growth(om, self.zeff)
        as_ = 1e-10 * jnp.exp(params["ln10As"])
        prim = as_ * (k_mpc / _KPIVOT) ** (params["ns"] - 1.0)
        c_h0 = 2997.92458 / h
        pk = (8.0 * np.pi**2 / 25.0) * prim * k_mpc * (t * d) ** 2 * c_h0**4 / om**2
        pk = pk * h**3
        if self.use_ap and self.da_fid is not None:
            e, da = lcdm_background(om, self.zeff)
            qperp = da / self.da_fid
            qpar = self.h_fid / e
        else:
            qperp = qpar = 1.0
        return CosmoInputs(plin=pk, f=f, qperp=qperp, qpar=qpar)


# ======================================================================
# Boltzmann-solver-backed P(k) emulator
# ======================================================================
#
# The transfer emulator above plays the reference's matryoshka role (EH98 /
# external-table oracles).  The classes below emulate the *on-device
# Einstein-Boltzmann solver* (boltzmann/einstein_boltzmann.py) — the
# Boltzmann-grade path the reference gets from CLASS
# (/root/reference/eftpipe/boltzmann.py:191-243):
#
#   inputs  x = (omega_b, omega_cdm, h)          [m_nu, N_ur, YHe fixed]
#   outputs log T_eff(k, z) for total matter and cb, log r_drag
#
# As and ns never enter the training: the transfer T_eff = |delta(k,z)/zeta|
# is primordial-independent, so P(k) = P_zeta(As, ns, k) x T_eff^2 is exact
# in those directions.  Growth f(z) = dln sigma8/dln a and sigma8(z) are
# *derived* from the emulated spectra on a z grid uniform in ln a, not
# separately emulated.  Dimensionality reduction is a PCA basis fit on the
# training spectra (the standard cosmopower-style recipe), with an MLP
# mapping normalized inputs to PCA coefficients.


def _poly_design(xn, degree: int):
    """Monomial design matrix of the (…, 3) normalized inputs up to
    ``degree`` (fixed deterministic term order).

    The output feeds a (…, nterms) @ (nterms, d) matmul; without the
    optimization barrier XLA's algebraic simplifier distributes that dot
    over this stack's concatenate and emits one broadcast-multiply-add
    rank-1 update PER TERM on the (batch, d≈7.5k) output — measured 23 MB
    of HBM traffic per eval on the flagship (60% of the cosmology stage),
    vs ~60 KB for the single dot the barrier preserves."""
    import jax

    from itertools import combinations_with_replacement

    cols = [jnp.ones(xn.shape[:-1])]
    for d in range(1, degree + 1):
        for combo in combinations_with_replacement(range(xn.shape[-1]), d):
            c = jnp.ones(xn.shape[:-1])
            for j in combo:
                c = c * xn[..., j]
            cols.append(c)
    return jax.lax.optimization_barrier(jnp.stack(cols, axis=-1))


@dataclass(eq=False)
class PkEmulator:
    """Polynomial-ridge emulator of the EB solver's log-transfer outputs.

    The targets log T(k, z) (total matter + cb) and log r_drag are smooth
    low-order functions of (ω_b, ω_cdm, h) — a low-degree polynomial ridge
    on a PCA-compressed basis generalizes to <1e-3 max |Δlog T| from a few
    hundred training solves, an order of magnitude better than an MLP at
    this sample density (measured; the MLP memorizes the Sobol points).
    The whole evaluation is one small matmul: y = pca_mean + design(x) @ B.

    The artifact carries its own provenance: the training box
    (``bounds_lo``/``bounds_hi``) and the fixed physics it was trained at
    (per-species ν mass, degeneracy, N_ur, Y_He, solver kmax).  Providers
    validate a config's requested physics against this metadata at load
    time and reject out-of-box inputs instead of extrapolating.
    """

    coeffs: jnp.ndarray         # (nterms, d) — design → raw outputs
    y_mean: jnp.ndarray         # (d,)
    x_mean: jnp.ndarray
    x_std: jnp.ndarray
    degree: int
    kgrid: np.ndarray           # solver k grid, 1/Mpc
    z_grid: np.ndarray          # output redshifts (uniform in ln a)
    input_names: tuple = ("omega_b", "omega_cdm", "h")
    bounds_lo: np.ndarray | None = None   # training box (input_names order)
    bounds_hi: np.ndarray | None = None
    # optional second (inner-region) ridge, smoothly blended over the
    # inner box: pred = (1-w)·global + w·inner with w a C¹ smoothstep bump
    # that is exactly 1 inside [blend_lo, blend_hi] and 0 outside the
    # margin-expanded box the inner ridge was trained on.  Keeps the
    # posterior-dense region at ~1e-4 |Δlog T| while the global ridge
    # covers the full prior-validity box (gradient-smooth for HMC).
    coeffs_in: jnp.ndarray | None = None
    y_mean_in: jnp.ndarray | None = None
    x_mean_in: jnp.ndarray | None = None
    x_std_in: jnp.ndarray | None = None
    degree_in: int | None = None
    blend_lo: np.ndarray | None = None    # w=1 box (nominal inner bounds)
    blend_hi: np.ndarray | None = None
    blend_margin: np.ndarray | None = None  # band width per input (raw units)
    m_ncdm: float | None = None           # eV per massive species
    deg_ncdm: float | None = None         # massive species count
    n_ur: float | None = None             # massless families
    yhe: float | None = None
    meta: dict | None = None               # kmax, n_train, ...

    def raw(self, x, cols=None):
        """Emulated output vector; ``cols`` (a static host-side index array)
        restricts the prediction to that subset of output columns.  The
        ridge is linear in its coefficients, so slicing ``coeffs``/``y_mean``
        BEFORE the dot is algebraically identical per column to slicing the
        full output — but the (batch, 7489) intermediate (and the downstream
        (nz, nk) exp/log chains) never materialize.  The hot likelihood path
        needs only one species at ~4 z-rows (SolverEmulatorProvider._zplan),
        ~6.5x fewer bytes on the HBM-bound cosmology stage."""
        x = jnp.asarray(x)

        def sl(a):
            a = np.asarray(a)
            return a if cols is None else (
                a[..., cols] if a.ndim == 1 else a[:, cols])

        xn = (x - jnp.asarray(self.x_mean, x.dtype)) / jnp.asarray(
            self.x_std, x.dtype)
        pred = jnp.asarray(sl(self.y_mean), x.dtype) + _poly_design(
            xn, self.degree) @ jnp.asarray(sl(self.coeffs), x.dtype)
        if self.coeffs_in is None:
            return pred
        xi = (x - jnp.asarray(self.x_mean_in, x.dtype)) / jnp.asarray(
            self.x_std_in, x.dtype)
        pred_in = jnp.asarray(sl(self.y_mean_in), x.dtype) + _poly_design(
            xi, self.degree_in) @ jnp.asarray(sl(self.coeffs_in), x.dtype)
        lo = jnp.asarray(self.blend_lo, x.dtype)
        hi = jnp.asarray(self.blend_hi, x.dtype)
        m = jnp.asarray(self.blend_margin, x.dtype)

        def smoothstep(t):
            t = jnp.clip(t, 0.0, 1.0)
            return t * t * (3.0 - 2.0 * t)

        w = jnp.prod(
            smoothstep((x - (lo - m)) / m) * smoothstep(((hi + m) - x) / m),
            axis=-1, keepdims=True,
        )
        return (1.0 - w) * pred + w * pred_in

    def unpack(self, y):
        """y (d,) -> (log T_m (nz, nk), log T_cb (nz, nk), log rdrag)."""
        nz, nk = len(self.z_grid), len(self.kgrid)
        log_tm = y[: nz * nk].reshape(nz, nk)
        log_tcb = y[nz * nk: 2 * nz * nk].reshape(nz, nk)
        return log_tm, log_tcb, y[-1]

    def box(self) -> tuple[np.ndarray, np.ndarray]:
        """Validity box (lo, hi).  Artifacts predating the metadata format
        fall back to the Sobol inference x_mean ± √3·x_std."""
        if self.bounds_lo is not None and self.bounds_hi is not None:
            return np.asarray(self.bounds_lo), np.asarray(self.bounds_hi)
        lo = np.asarray(self.x_mean) - np.sqrt(3.0) * np.asarray(self.x_std)
        hi = np.asarray(self.x_mean) + np.sqrt(3.0) * np.asarray(self.x_std)
        return lo, hi

    def mnu_total(self) -> float | None:
        """Σm_ν [eV] the artifact was trained at (None if unrecorded)."""
        if self.m_ncdm is None:
            return None
        return float(self.m_ncdm) * float(self.deg_ncdm or 1.0)

    def save(self, path):
        extra = {}
        if self.bounds_lo is not None:
            extra["bounds_lo"] = np.asarray(self.bounds_lo)
            extra["bounds_hi"] = np.asarray(self.bounds_hi)
        if self.coeffs_in is not None:
            extra.update(
                coeffs_in=np.asarray(self.coeffs_in),
                y_mean_in=np.asarray(self.y_mean_in),
                x_mean_in=np.asarray(self.x_mean_in),
                x_std_in=np.asarray(self.x_std_in),
                degree_in=int(self.degree_in),
                blend_lo=np.asarray(self.blend_lo),
                blend_hi=np.asarray(self.blend_hi),
                blend_margin=np.asarray(self.blend_margin),
            )
        for name in ("m_ncdm", "deg_ncdm", "n_ur", "yhe"):
            v = getattr(self, name)
            if v is not None:
                extra[name] = float(v)
        for k, v in (self.meta or {}).items():
            if k not in extra and np.isscalar(v):
                extra[f"meta_{k}"] = v
        extra["input_names"] = np.asarray(list(self.input_names))
        np.savez_compressed(
            path, kgrid=self.kgrid, z_grid=self.z_grid,
            coeffs=np.asarray(self.coeffs), y_mean=np.asarray(self.y_mean),
            x_mean=np.asarray(self.x_mean), x_std=np.asarray(self.x_std),
            degree=self.degree, **extra,
        )

    @classmethod
    def load(cls, path) -> "PkEmulator":
        with np.load(path) as z:
            def opt(name):
                return float(z[name]) if name in z.files else None

            meta = {k[5:]: z[k].item() for k in z.files if k.startswith("meta_")}
            # keep HOST copies: metadata reads (box validation at build time)
            # must not touch the device — on the axon tunnel any device→host
            # transfer permanently degrades per-call latency (~25 ms/call)
            return cls(
                coeffs=np.asarray(z["coeffs"]), y_mean=np.asarray(z["y_mean"]),
                x_mean=np.asarray(z["x_mean"]), x_std=np.asarray(z["x_std"]),
                degree=int(z["degree"]), kgrid=z["kgrid"], z_grid=z["z_grid"],
                input_names=(tuple(str(s) for s in z["input_names"])
                             if "input_names" in z.files
                             else ("omega_b", "omega_cdm", "h")),
                bounds_lo=z["bounds_lo"] if "bounds_lo" in z.files else None,
                bounds_hi=z["bounds_hi"] if "bounds_hi" in z.files else None,
                m_ncdm=opt("m_ncdm"), deg_ncdm=opt("deg_ncdm"),
                n_ur=opt("n_ur"), yhe=opt("yhe"), meta=meta or None,
                **({
                    "coeffs_in": np.asarray(z["coeffs_in"]),
                    "y_mean_in": np.asarray(z["y_mean_in"]),
                    "x_mean_in": np.asarray(z["x_mean_in"]),
                    "x_std_in": np.asarray(z["x_std_in"]),
                    "degree_in": int(z["degree_in"]),
                    "blend_lo": np.asarray(z["blend_lo"]),
                    "blend_hi": np.asarray(z["blend_hi"]),
                    "blend_margin": np.asarray(z["blend_margin"]),
                } if "coeffs_in" in z.files else {}),
            )


def _ridge_fit(x, y, degree: int, ridge: float, ncomp: int):
    """One PCA + polynomial-ridge fit.  Returns (coeffs, y_mean, x_mean,
    x_std) with the log-r_drag column (last) refit outside the PCA — it is
    a single scalar with small variance relative to the transfer block and
    the compression would dilute it."""
    import numpy.linalg as la
    from itertools import combinations_with_replacement

    y_mean = y.mean(0)
    yc = y - y_mean
    _, _, vt = np.linalg.svd(yc, full_matrices=False)
    comps = vt[:ncomp]
    c = yc @ comps.T
    x_mean, x_std = x.mean(0), x.std(0) + 1e-12

    xn = (x - x_mean) / x_std
    cols = [np.ones(len(xn))]
    for d in range(1, degree + 1):
        for combo in combinations_with_replacement(range(x.shape[1]), d):
            col = np.ones(len(xn))
            for j in combo:
                col = col * xn[:, j]
            cols.append(col)
    a = np.stack(cols, axis=1)

    gram = a.T @ a + ridge * np.eye(a.shape[1])
    coeffs = la.solve(gram, a.T @ c) @ comps  # (nterms, d)
    coeffs[:, -1] = la.solve(gram, a.T @ yc[:, -1])
    return coeffs, y_mean, x_mean, x_std


def train_pk_emulator(x, y, kgrid, z_grid, ncomp: int = 96,
                      degree: int = 5, ridge: float = 1e-8, seed: int = 0,
                      val_frac: float = 0.1, meta: dict | None = None,
                      inner_bounds=None, degree_in: int = 7,
                      margin_frac: float = 0.15) -> tuple:
    """Fit the PCA + polynomial-ridge emulator on solver outputs.

    x: (n, 3) raw inputs; y: (n, d) raw targets (log transfers + log rdrag).
    ``meta`` carries artifact provenance (bounds_lo/hi, m_ncdm, deg_ncdm,
    n_ur, yhe, solver settings) — stored in the npz and validated at load.
    With ``inner_bounds=(lo, hi)`` a second degree-``degree_in`` ridge is
    fit on the samples inside the margin-expanded inner box and smoothly
    blended in (w=1 over the nominal inner box): the posterior-dense region
    gets ~1e-4 |Δlog T| while the global ridge covers the full box.
    Returns (PkEmulator, dict of validation errors).
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    nval = max(4, int(val_frac * n))
    vi, ti = perm[:nval], perm[nval:]

    coeffs, y_mean, x_mean, x_std = _ridge_fit(
        x[ti], y[ti], degree, ridge, ncomp)

    inner_kw = {}
    if inner_bounds is not None:
        lo_i = np.asarray(inner_bounds[0], np.float64)
        hi_i = np.asarray(inner_bounds[1], np.float64)
        margin = margin_frac * (hi_i - lo_i)
        in_exp = np.all(
            (x >= lo_i - margin) & (x <= hi_i + margin), axis=1)
        ie = ti[in_exp[ti]]
        ci, ymi, xmi, xsi = _ridge_fit(x[ie], y[ie], degree_in, ridge, ncomp)
        inner_kw = dict(
            coeffs_in=ci, y_mean_in=ymi, x_mean_in=xmi, x_std_in=xsi,
            degree_in=degree_in, blend_lo=lo_i, blend_hi=hi_i,
            blend_margin=margin,
        )

    meta = dict(meta or {})
    emu = PkEmulator(
        coeffs=coeffs, y_mean=y_mean, x_mean=x_mean, x_std=x_std,
        degree=degree, kgrid=np.asarray(kgrid), z_grid=np.asarray(z_grid),
        input_names=tuple(meta.get("input_names",
                                   ("omega_b", "omega_cdm", "h"))),
        bounds_lo=meta.pop("bounds_lo", None),
        bounds_hi=meta.pop("bounds_hi", None),
        m_ncdm=meta.pop("m_ncdm", None), deg_ncdm=meta.pop("deg_ncdm", None),
        n_ur=meta.pop("n_ur", None), yhe=meta.pop("yhe", None),
        meta={k: v for k, v in meta.items() if k != "input_names"} or None,
        **inner_kw,
    )
    pred = np.asarray(jax.device_get(emu.raw(x[vi])), np.float64)
    err = np.abs(pred - y[vi])
    report = {
        "val_max_abs_logT": float(err[:, :-1].max()),
        "val_rms_logT": float(np.sqrt((err[:, :-1] ** 2).mean())),
        "val_max_abs_log_rdrag": float(err[:, -1].max()),
        "n_train": int(ti.size), "n_val": int(vi.size),
    }
    if inner_bounds is not None:
        v_in = np.all((x[vi] >= lo_i) & (x[vi] <= hi_i), axis=1)
        if v_in.any():
            report["val_inner_max_abs_logT"] = float(err[v_in, :-1].max())
        report["n_train_inner"] = int(ie.size)
    return emu, report


_ARTIFACT_DIR = Path(__file__).resolve().parent / "artifacts"
DEFAULT_PK_ARTIFACT = _ARTIFACT_DIR / "pk_emulator_mnu06.npz"


@dataclass(eq=False)
class SolverEmulatorProvider:
    """Production cosmology provider: emulated EB-solver spectra, exact
    on-device background (H, D_A from one cumulative quadrature), f and
    sigma8 derived from the emulated spectra on the z grid.

    Sampled parameters: omega_b, omega_cdm, h, ln10As, ns (As/ns enter
    analytically through the primordial spectrum), plus m_ncdm (or the
    total mnu) when the artifact was trained with the neutrino mass as a
    4th input (tools/train_solver_emulator.py --sample-mnu) — matching the
    reference classynu's run-time Σm_ν flexibility (classy.py:12-92).
    Microseconds per evaluation, vmappable — the CLASS-speed bottleneck of
    the reference (classynu.yaml 'speed: 0.2') is gone.

    Validity: the artifact is exact only inside its training box.  Inputs
    are clamped to the box for numerical evaluation, and
    :meth:`validity_logp` returns −inf outside it (``out_of_box="reject"``,
    the default) so out-of-box proposals are explicitly rejected rather
    than silently served the box-edge spectrum — the likelihood graph adds
    this term (Analysis.logp).  ``out_of_box="clamp"`` restores the legacy
    plateau semantics for debugging only.
    """

    cfg: EFTConfig
    zeff: float
    emulator: PkEmulator
    da_fid: float | None = None    # dimensionless H0*DA of the fiducial
    h_fid: float | None = None     # dimensionless H/H0 of the fiducial
    use_cb: bool = False
    use_ap: bool = True
    rdrag_fid: float | None = None
    h0_fid: float | None = None
    out_of_box: str = "reject"     # "reject" (logp=-inf) | "clamp" (legacy)
    # per-species neutrino mass fed to an artifact whose "m_ncdm" input is
    # NOT sampled (set by load(mnu=...) for 4-input artifacts)
    mnu_fixed: float | None = None

    @classmethod
    def load(cls, cfg: EFTConfig, zeff: float, path=None, mnu=None,
             n_ur=None, yhe=None, **kwargs):
        """Load an artifact, validating any requested physics against the
        artifact's training metadata (reference classynu handles arbitrary
        Σm_ν at run time, /root/reference/eftpipe/classy.py:12-92; a trained
        artifact is a fixed-physics object, so a mismatch must fail loudly
        at build time instead of silently serving wrong spectra)."""
        from ..models.window import MetaInfoError

        path = path or DEFAULT_PK_ARTIFACT
        emu = PkEmulator.load(path)
        sampled_mnu = "m_ncdm" in emu.input_names
        requested = {"mnu": mnu, "n_ur": n_ur, "yhe": yhe}
        stored = {"mnu": emu.mnu_total(), "n_ur": emu.n_ur, "yhe": emu.yhe}
        for name, want in requested.items():
            if want is None:
                continue
            if name == "mnu" and sampled_mnu:
                # 4-input artifact: m_ncdm is an emulator DIMENSION — any
                # Σm_ν inside the trained mass range is valid.  The fixed
                # request becomes the per-species input value.
                deg = float(emu.deg_ncdm or 1.0)
                m_per = float(want) / deg
                lo, hi = emu.box()
                i = emu.input_names.index("m_ncdm")
                if not (lo[i] <= m_per <= hi[i]):
                    raise MetaInfoError(
                        f"config requests mnu={want} (m_ncdm={m_per:.4g}/"
                        f"species) but artifact {path} covers m_ncdm in "
                        f"[{lo[i]:.4g}, {hi[i]:.4g}] — retrain with a wider "
                        f"mass range (tools/train_solver_emulator.py "
                        f"--sample-mnu)"
                    )
                kwargs.setdefault("mnu_fixed", m_per)
                continue
            have = stored[name]
            if have is None:
                raise MetaInfoError(
                    f"config requests {name}={want} but artifact {path} "
                    f"records no {name} metadata — retrain with "
                    f"tools/train_solver_emulator.py to stamp it"
                )
            if abs(float(want) - float(have)) > 1e-8 + 1e-6 * abs(float(have)):
                raise MetaInfoError(
                    f"config requests {name}={want} but artifact {path} was "
                    f"trained at {name}={have}; train a matching artifact "
                    f"(tools/train_solver_emulator.py) or drop the request"
                )
        return cls(cfg=cfg, zeff=zeff, emulator=emu, **kwargs)

    # -- validity ------------------------------------------------------------
    def _input_value(self, name, params):
        """Resolve one emulator input from the sampled parameter dict.
        ``m_ncdm`` (per-species ν mass, 4-input artifacts) may come from a
        sampled ``m_ncdm``, a sampled total ``mnu`` (÷ deg_ncdm), or the
        fixed value recorded at load time (``load(mnu=...)``)."""
        if name in params:
            return jnp.asarray(params[name], jnp.result_type(float))
        if name == "m_ncdm":
            deg = float(self.emulator.deg_ncdm or 1.0)
            if "mnu" in params:
                return jnp.asarray(params["mnu"], jnp.result_type(float)) / deg
            if self.mnu_fixed is not None:
                return jnp.asarray(self.mnu_fixed, jnp.result_type(float))
        raise KeyError(
            f"emulator input {name!r} is neither sampled nor fixed — sample "
            f"it, or fix it via SolverEmulatorProvider.load(mnu=...)"
        )

    def _x(self, params):
        return jnp.stack([self._input_value(n, params)
                          for n in self.emulator.input_names])

    def in_box(self, params):
        """True where every emulator input (all of ``emulator.input_names``
        — (ω_b, ω_cdm, h) plus m_ncdm for 4-input sampled-mnu artifacts)
        lies inside the training box."""
        lo, hi = self.emulator.box()
        x = self._x(params)
        return jnp.all((x >= jnp.asarray(lo)) & (x <= jnp.asarray(hi)))

    def validity_logp(self, params):
        """0 inside the training box; −inf outside (when rejecting)."""
        if self.out_of_box != "reject":
            return jnp.asarray(0.0)
        return jnp.where(self.in_box(params), 0.0, -jnp.inf)

    # -- core evaluation ----------------------------------------------------
    def _eval(self, params):
        emu = self.emulator
        lo, hi = emu.box()
        # always clamp for numerical evaluation: out-of-box points are
        # rejected via validity_logp, clamping just keeps the traced values
        # finite so the rest of the graph (AP, window, chi2) stays NaN-free
        x = jnp.clip(self._x(params), jnp.asarray(lo), jnp.asarray(hi))
        log_tm, log_tcb, log_rd = emu.unpack(emu.raw(x))
        rdrag = jnp.exp(log_rd)
        k = jnp.asarray(emu.kgrid)
        as_ = 1e-10 * jnp.exp(params["ln10As"])
        pzeta = 2.0 * jnp.pi**2 / k**3 * as_ * (k / 0.05) ** (params["ns"] - 1.0)
        pk_m = pzeta[None, :] * jnp.exp(2.0 * log_tm)    # (nz, nk) Mpc^3
        pk_cb = pzeta[None, :] * jnp.exp(2.0 * log_tcb)
        return k, pk_m, pk_cb, rdrag

    def _sigma8_f(self, params, k, pk):
        """sigma8(z-grid) + growth f(z-grid) = dln sigma8/dln a (uniform-in-
        ln-a z grid -> central differences)."""
        r8 = 8.0 / params["h"]
        x = k * r8
        w = 3.0 * (jnp.sin(x) - x * jnp.cos(x)) / x**3
        integ = k[None, :] ** 3 * pk * (w * w)[None, :] / (2.0 * jnp.pi**2)
        s8 = jnp.sqrt(jnp.trapezoid(integ, jnp.log(k), axis=-1))
        lna = jnp.log(1.0 / (1.0 + jnp.asarray(self.emulator.z_grid)))
        dl = lna[1] - lna[0]
        ls8 = jnp.log(s8)
        f = jnp.gradient(ls8) / dl
        return s8, f, lna

    def _zinterp(self, lna_grid, table, zeff):
        lna = jnp.log(1.0 / (1.0 + zeff))
        return jnp.interp(lna, lna_grid, table)

    def _background(self, params):
        """Exact flat-LCDM(+nu as matter) background at zeff: H/H0, H0*DA.
        Radiation (photons + the artifact's massless N_ur) is included;
        late-time massive nu (the artifact's Σm_ν) treated as matter (exact
        to <1e-4 at z < 1.1 for mnu = 0.06 eV).  The neutrino setup comes
        from the artifact metadata, not a hardcoded 0.06 eV, so an artifact
        trained at a different Σm_ν keeps spectrum and AP background
        consistent."""
        from .eh98 import _GL_X, _GL_W

        emu = self.emulator
        if "m_ncdm" in emu.input_names:
            # 4-input artifact: Σm_ν tracks the sampled/fixed mass input so
            # spectrum and AP background stay consistent at every proposal
            mnu = self._input_value("m_ncdm", params) * float(
                emu.deg_ncdm or 1.0)
        else:
            # legacy artifacts without metadata: production values (mnu=0.06,
            # the classynu degenerate convention N_ur=0.00641)
            mnu = emu.mnu_total() if emu.mnu_total() is not None else 0.06
        n_ur = emu.n_ur if emu.n_ur is not None else 0.00641
        h2 = params["h"] ** 2
        om_g = 2.47282e-5 / h2 * (1.0 + 0.2271 * n_ur)
        om_m = (params["omega_b"] + params["omega_cdm"] + mnu / 93.14) / h2
        om_l = 1.0 - om_m - om_g

        def e_of_z(z):
            return jnp.sqrt(om_m * (1 + z) ** 3 + om_g * (1 + z) ** 4 + om_l)

        z = self.zeff
        zp = z * (_GL_X + 1.0) / 2.0
        chi = jnp.sum(_GL_W * z / 2.0 / e_of_z(zp))
        return e_of_z(jnp.asarray(z)), chi / (1.0 + z)

    # -- provider interface ---------------------------------------------------
    def _zplan(self):
        """Static (host-side) plan for the hot likelihood path: which
        emulator OUTPUT COLUMNS ``inputs()`` actually consumes, plus the
        z-blend weights.  The zeff z-interpolation needs log T at rows
        {i0, i0+1}; the growth rate f = dln sigma8/dln a at zeff needs the
        jnp.gradient stencils of those two rows (central interior, one-sided
        at the grid edges, clamped-interp semantics of _zinterp).  The ridge
        is linear, so PkEmulator.raw(cols=...) slices the coefficient matrix
        before the dot — exact per column — and the (nz, nk) full-grid
        tensors never materialize (~6.5x fewer cosmology-stage bytes on the
        HBM-bound flagship; opt-out EFTPIPE_TPU_EMU_SLICE=0)."""
        if getattr(self, "_plan", None) is not None:
            return self._plan
        emu = self.emulator
        nz, nk = len(emu.z_grid), len(emu.kgrid)
        lna_g = np.log(1.0 / (1.0 + np.asarray(emu.z_grid, np.float64)))
        dl = lna_g[1] - lna_g[0]
        w = (np.log(1.0 / (1.0 + self.zeff)) - lna_g[0]) / dl
        # the lpk z-blend (possibly extrapolating, matching the legacy code)
        i0 = int(np.clip(np.floor(w), 0, nz - 2))
        ww = float(w - i0)

        def grad_stencil(i):
            # jnp.gradient on the uniform lna grid, / dl
            if i == 0:
                return {0: -1.0 / dl, 1: 1.0 / dl}
            if i == nz - 1:
                return {nz - 2: -1.0 / dl, nz - 1: 1.0 / dl}
            return {i - 1: -0.5 / dl, i + 1: 0.5 / dl}

        # f at zeff: jnp.interp CLAMPS outside the grid (unlike the lpk blend)
        fcoef: dict = {}
        if w <= 0.0:
            pieces = [(grad_stencil(0), 1.0)]
        elif w >= nz - 1:
            pieces = [(grad_stencil(nz - 1), 1.0)]
        else:
            pieces = [(grad_stencil(i0), 1.0 - ww), (grad_stencil(i0 + 1), ww)]
        for st, c in pieces:
            for j, g in st.items():
                fcoef[j] = fcoef.get(j, 0.0) + c * g
        rows = sorted(set(fcoef) | {i0, i0 + 1})
        fvec = np.array([fcoef.get(j, 0.0) for j in rows])
        off = nz * nk if self.use_cb else 0
        cols = (off + np.asarray(rows)[:, None] * nk
                + np.arange(nk)[None, :]).ravel()
        # one-hot-matmul linear interp of log P onto cfg.kin (the h-dependent
        # query grid): jnp.interp's searchsorted was 5.5 MB of HBM per eval
        # and a uniform-LUT gather 7.6 MB; the matmul form is 0.035 MB
        from ..ops.interp import MatmulInterp

        lut = MatmulInterp.build(np.log(np.asarray(emu.kgrid, np.float64)))
        self._plan = (rows, fvec, rows.index(i0), rows.index(i0 + 1), ww,
                      cols, lut)
        return self._plan

    def inputs(self, params) -> CosmoInputs:
        if os.environ.get("EFTPIPE_TPU_EMU_SLICE", "1") == "0":
            return self._inputs_full(params)
        from ..ops.precision import stage_precision

        with stage_precision("emu"):
            return self._inputs_sliced(params)

    def _inputs_sliced(self, params) -> CosmoInputs:
        emu = self.emulator
        rows, fvec, ri0, ri1, ww, cols, lut = self._zplan()
        lo, hi = emu.box()
        x = jnp.clip(self._x(params), jnp.asarray(lo), jnp.asarray(hi))
        log_t = emu.raw(x, cols=cols).reshape(len(rows), len(emu.kgrid))
        k = jnp.asarray(emu.kgrid)
        as_ = 1e-10 * jnp.exp(params["ln10As"])
        pzeta = 2.0 * jnp.pi**2 / k**3 * as_ * (k / 0.05) ** (params["ns"] - 1.0)
        pk = pzeta[None, :] * jnp.exp(2.0 * log_t)        # (nsel, nk) Mpc^3
        # z interpolation of log P (linear in ln a; same blend as legacy)
        lpk = jnp.log(pk)
        lpk_z = lpk[ri0] * (1 - ww) + lpk[ri1] * ww
        h = params["h"]
        kin_mpc = jnp.asarray(self.cfg.kin) * h
        plin = jnp.exp(lut.interp(jnp.log(kin_mpc), lpk_z)) * h**3
        # growth f(zeff) = the clamped-interp of gradient(log sigma8)/dl,
        # contracted to one static stencil over the selected rows
        r8 = 8.0 / h
        xk = k * r8
        wth = 3.0 * (jnp.sin(xk) - xk * jnp.cos(xk)) / xk**3
        integ = k[None, :] ** 3 * pk * (wth * wth)[None, :] / (2.0 * jnp.pi**2)
        ls8 = jnp.log(jnp.sqrt(jnp.trapezoid(integ, jnp.log(k), axis=-1)))
        f = ls8 @ jnp.asarray(fvec, ls8.dtype)
        if self.use_ap and self.da_fid is not None:
            e, da = self._background(params)
            qperp = da / self.da_fid
            qpar = self.h_fid / e
        else:
            qperp = qpar = 1.0
        return CosmoInputs(plin=plin, f=f, qperp=qperp, qpar=qpar)

    def _inputs_full(self, params) -> CosmoInputs:
        """Legacy full-grid path (computes all nz z-rows of both species);
        kept as the EFTPIPE_TPU_EMU_SLICE=0 reference for A/B parity."""
        k, pk_m, pk_cb, _ = self._eval(params)
        pk = pk_cb if self.use_cb else pk_m
        lna_grid = jnp.log(1.0 / (1.0 + jnp.asarray(self.emulator.z_grid)))
        # z interpolation of log P (linear in ln a; grid spacing ~0.03)
        lpk = jnp.log(pk)
        lna = jnp.log(1.0 / (1.0 + self.zeff))
        w = (lna - lna_grid[0]) / (lna_grid[1] - lna_grid[0])
        i0 = jnp.clip(jnp.floor(w).astype(int), 0, lna_grid.size - 2)
        ww = w - i0
        lpk_z = lpk[i0] * (1 - ww) + lpk[i0 + 1] * ww
        # resample onto cfg.kin (h/Mpc) in (Mpc/h)^3
        h = params["h"]
        kin_mpc = jnp.asarray(self.cfg.kin) * h
        plin = jnp.exp(jnp.interp(jnp.log(kin_mpc), jnp.log(k), lpk_z)) * h**3
        s8, fgrid, lna_g = self._sigma8_f(params, k, pk)
        f = self._zinterp(lna_g, fgrid, self.zeff)
        if self.use_ap and self.da_fid is not None:
            e, da = self._background(params)
            qperp = da / self.da_fid
            qpar = self.h_fid / e
        else:
            qperp = qpar = 1.0
        return CosmoInputs(plin=plin, f=f, qperp=qperp, qpar=qpar)

    def derived(self, params) -> dict:
        k, pk_m, pk_cb, rdrag = self._eval(params)
        pk = pk_cb if self.use_cb else pk_m
        s8, fgrid, lna_g = self._sigma8_f(params, k, pk)
        f = self._zinterp(lna_g, fgrid, self.zeff)
        s8z = self._zinterp(lna_g, s8, self.zeff)
        if self.use_ap and self.da_fid is not None:
            e, da = self._background(params)
            qperp = da / self.da_fid
            qpar = self.h_fid / e
        else:
            qperp = qpar = jnp.asarray(1.0)
        if self.rdrag_fid is not None and self.h0_fid is not None:
            ratio = (self.rdrag_fid * self.h0_fid) / (rdrag * params["h"])
            alperp, alpara = qperp * ratio, qpar * ratio
        else:
            alperp, alpara = qperp, qpar
        return dict(fz=f, fsigma8_z=f * s8z, alperp=alperp, alpara=alpara,
                    sigma8_z=s8z, rdrag=rdrag)
