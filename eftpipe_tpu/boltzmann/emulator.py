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
            params = [
                {"w": jnp.asarray(z[f"w{i}"]), "b": jnp.asarray(z[f"b{i}"])}
                for i in range(n)
            ]
            return cls(
                params=params, kgrid=z["kgrid"],
                x_mean=jnp.asarray(z["x_mean"]), x_std=jnp.asarray(z["x_std"]),
                y_mean=jnp.asarray(z["y_mean"]), y_std=jnp.asarray(z["y_std"]),
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
