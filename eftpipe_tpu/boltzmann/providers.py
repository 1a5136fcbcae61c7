"""Cosmology input providers.

The pipeline consumes :class:`~eftpipe_tpu.models.pipeline.CosmoInputs`
(P_lin on the fixed kin grid, growth rate f, AP distortions).  Providers map
sampled parameter dicts to those inputs:

* ``FixedTemplateProvider`` — the template-fit mode of the reference's
  ``LinearPowerFile`` extractor (/root/reference/eftpipe/boltzmann.py:246-315):
  P_lin is fixed from disk (optionally rescaled by a sampled amplitude), and
  f, α⊥, α∥ are sampled directly.
* ``TabulatedProvider`` — per-evaluation P_lin / background passed in as
  arrays (the host-side CLASS/CAMB bridge: run the Boltzmann code outside
  JAX, feed a batch of tables to the vmapped pipeline).
* The JAX-native Eisenstein–Hu provider lives in eh98.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from dataclasses import dataclass

from ..models.config import EFTConfig
from ..models.pipeline import CosmoInputs
from ..ops.interp import spline_matrix


def resample_loglog(kin_src, pin_src, kin_dst) -> np.ndarray:
    """Host: cubic interpolation of log P vs log k with power-law
    extrapolation (reference boltzmann.py:262-276 equivalent)."""
    from scipy.interpolate import CubicSpline

    cs = CubicSpline(np.log(kin_src), np.log(pin_src), extrapolate=True)
    return np.exp(cs(np.log(kin_dst)))


@dataclass
class FixedTemplateProvider:
    """Sampled params: f, alperp, alpara, and optionally a linear amplitude
    rescale ``A`` multiplying the template."""

    cfg: EFTConfig
    plin: np.ndarray  # on cfg.kin

    @classmethod
    def from_file(cls, cfg: EFTConfig, path, with_hubble_unit: bool = True,
                  h: float = 1.0) -> "FixedTemplateProvider":
        raw = np.loadtxt(path)
        k, p = raw[:, 0], raw[:, 1]
        if not with_hubble_unit:
            k, p = k / h, p * h**3
        return cls(cfg=cfg, plin=resample_loglog(k, p, cfg.kin))

    def inputs(self, params) -> CosmoInputs:
        amp = params.get("A", 1.0)
        return CosmoInputs(
            plin=amp * jnp.asarray(self.plin),
            f=params["f"],
            qperp=params.get("alperp", 1.0),
            qpar=params.get("alpara", 1.0),
        )


@dataclass
class TabulatedProvider:
    """Pass-through of externally computed tables (host Boltzmann bridge)."""

    cfg: EFTConfig
    da_fid: float | None = None
    h_fid: float | None = None

    def inputs(self, params) -> CosmoInputs:
        qperp = params.get("qperp", 1.0)
        qpar = params.get("qpar", 1.0)
        return CosmoInputs(plin=params["plin"], f=params["f"], qperp=qperp, qpar=qpar)
