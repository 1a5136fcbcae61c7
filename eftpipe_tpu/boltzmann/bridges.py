"""Host-side Boltzmann bridges — the CLASS/CAMB extractor analogues
(/root/reference/eftpipe/boltzmann.py:159-243 and classy.py:95-183).

CLASS and CAMB are C/Fortran codes that cannot live inside the jitted graph;
the reference isolates them behind the ``BoltzmannExtractor`` protocol and
the TPU build keeps the same boundary (SURVEY.md §2.4).  Three usage modes:

1. **Eager products** — ``OracleProvider.inputs(params)`` runs the code on
   the host and feeds one evaluation (bestfit curves, data generation).
2. **Batched tabulation** — ``OracleProvider.tabulate(list_of_params)``
   produces stacked (P_lin, f, q⊥, q∥) arrays for the vmapped pipeline via
   ``TabulatedProvider``-style pass-through.
3. **Emulation** — ``train_emulator_from_oracle`` fits the JAX MLP transfer
   emulator (boltzmann/emulator.py) on oracle samples, moving the cosmology
   fully on-device.

Both oracles are import-gated: constructing them raises ImportError with
install guidance when the package is absent.
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass, field
from typing import Any, Mapping

from ..models.config import EFTConfig
from ..models.pipeline import CosmoInputs
from .providers import resample_loglog
from .neutrino import neutrino_boltzmann_args

C_KMS = 299792.458


class ClassyOracle:
    """CLASS-backed linear power + background (reference
    CobayaClassyExtractor, boltzmann.py:191-243; classynu neutrino handling,
    classy.py:156-177)."""

    def __init__(self, zmax: float = 3.0, kmax_h: float = 5.0,
                 extra_args: Mapping | None = None, use_cb: bool = False,
                 hierarchy: str = "normal"):
        try:
            import classy  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without classy
            raise ImportError(
                "ClassyOracle requires the 'classy' package (CLASS python "
                "wrapper); install CLASS or use the EH98/emulator provider"
            ) from e
        self.zmax = zmax
        self.kmax_h = kmax_h
        self.extra_args = dict(extra_args or {})
        self.use_cb = use_cb
        self.hierarchy = hierarchy

    def compute(self, params: Mapping, z: float) -> dict:
        """One CLASS run → P_lin(kh)[(Mpc/h)³] on a log grid, f, H/H0, H0·DA,
        rdrag, h, σ8(z)."""
        from classy import Class

        cosmo = Class()
        args = {
            "output": "mPk",
            "P_k_max_h/Mpc": self.kmax_h,
            "z_max_pk": max(self.zmax, z),
            "omega_b": params["omega_b"],
            "omega_cdm": params["omega_cdm"],
            "h": params["h"],
            "A_s": 1e-10 * np.exp(params["ln10As"]),
            "n_s": params["ns"],
        }
        if (mnu := params.get("mnu")) is not None:
            args.update({k: v for k, v in neutrino_boltzmann_args(
                mnu, self.hierarchy).items() if v is not None})
        args.update(self.extra_args)
        cosmo.set(args)
        cosmo.compute()
        h = cosmo.h()
        kh = np.logspace(-5, np.log10(self.kmax_h * 0.999), 400)
        pk_of = cosmo.pk_cb_lin if self.use_cb else cosmo.pk_lin
        pkh = np.array([pk_of(k * h, z) for k in kh]) * h**3
        # scale-independent growth rate (boltzmann.py:231-243)
        f = cosmo.scale_independent_growth_factor_f(z)
        hz = cosmo.Hubble(z) * C_KMS / (100.0 * h)          # H/H0
        da = cosmo.angular_distance(z) * 100.0 * h / C_KMS  # H0·DA
        out = dict(kh=kh, pkh=pkh, f=f, e=hz, da=da, h=h,
                   rdrag=cosmo.rs_drag(), sigma8_z=cosmo.sigma(8.0 / h, z))
        cosmo.struct_cleanup()
        return out


class CambOracle:
    """CAMB-backed oracle (reference CobayaCambExtractor, boltzmann.py:159-188)."""

    def __init__(self, kmax_h: float = 5.0, use_cb: bool = False):
        try:
            import camb  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without camb
            raise ImportError(
                "CambOracle requires the 'camb' package; install camb or use "
                "the EH98/emulator provider"
            ) from e
        self.kmax_h = kmax_h
        self.use_cb = use_cb

    def compute(self, params: Mapping, z: float) -> dict:
        import camb

        pars = camb.set_params(
            ombh2=params["omega_b"], omch2=params["omega_cdm"],
            H0=100.0 * params["h"], As=1e-10 * np.exp(params["ln10As"]),
            ns=params["ns"], mnu=params.get("mnu", 0.06),
            redshifts=[z], kmax=self.kmax_h,
        )
        results = camb.get_results(pars)
        var = "delta_nonu" if self.use_cb else "delta_tot"
        kh, _, pk = results.get_matter_power_spectrum(
            minkh=1e-5, maxkh=self.kmax_h, npoints=400,
            var1=var, var2=var,
        )
        h = params["h"]
        fs8 = results.get_fsigma8()[0]
        s8 = results.get_sigma8()[0]
        hz = results.hubble_parameter(z) / (100.0 * h)
        da = results.angular_diameter_distance(z) * 100.0 * h / C_KMS
        return dict(kh=kh, pkh=pk[0], f=fs8 / s8, e=hz, da=da, h=h,
                    rdrag=results.get_derived_params()["rdrag"], sigma8_z=s8)


@dataclass
class OracleProvider:
    """Cosmology provider backed by a host oracle (eager / tabulated use)."""

    cfg: EFTConfig
    zeff: float
    oracle: Any
    da_fid: float | None = None
    h_fid: float | None = None

    def inputs(self, params: Mapping) -> CosmoInputs:
        res = self.oracle.compute(params, self.zeff)
        plin = resample_loglog(res["kh"], res["pkh"], self.cfg.kin)
        qperp = res["da"] / self.da_fid if self.da_fid else 1.0
        qpar = self.h_fid / res["e"] if self.h_fid else 1.0
        return CosmoInputs(plin=np.asarray(plin), f=res["f"],
                           qperp=qperp, qpar=qpar)

    def tabulate(self, params_list) -> CosmoInputs:
        """Stack a batch of host evaluations for the vmapped pipeline."""
        rows = [self.inputs(p) for p in params_list]
        return CosmoInputs(
            plin=np.stack([np.asarray(r.plin) for r in rows]),
            f=np.array([r.f for r in rows]),
            qperp=np.array([r.qperp for r in rows]),
            qpar=np.array([r.qpar for r in rows]),
        )


def train_emulator_from_oracle(oracle, z: float, kgrid_mpc, bounds,
                               h_of_row=None, **train_kwargs):
    """Fit the JAX transfer emulator on oracle samples: the oracle's P_lin is
    converted to an effective transfer on the requested grid and passed as
    the training target (emulator.py's matryoshka-style path, fully
    on-device afterwards)."""
    from .emulator import train_transfer_emulator

    names = tuple(bounds)

    def target(row):
        params = dict(zip(names, row))
        res = oracle.compute(params, z)
        h = params.get("h", res["h"])
        # effective |T|: sqrt of P over the primordial shape (normalisation
        # is absorbed by the emulator's output scaling)
        kh = kgrid_mpc / h
        p = resample_loglog(res["kh"], res["pkh"], kh)
        prim = (kgrid_mpc / 0.05) ** (params.get("ns", 0.96) - 1.0) * kgrid_mpc
        return np.sqrt(np.maximum(p / prim, 1e-300))

    return train_transfer_emulator(kgrid_mpc, bounds=bounds, oracle=target,
                                   **train_kwargs)
