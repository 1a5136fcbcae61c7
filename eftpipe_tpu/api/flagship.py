"""Flagship analysis: self-contained two-tracer eBOSS-style joint fit.

Builds a complete production-shaped analysis without external data: two
tracers (LRG-like z=0.70 with P0/P2/P4, ELG-like z=0.845 with P0/P2), each
with IR resummation, AP projection, survey-window convolution (synthetic but
realistic mask multipoles), k-binning, and a joint Gaussian-covariance
likelihood with analytic marginalization over the 12 linearly-entering EFT
parameters.  Cosmology runs fully on-device through the Eisenstein–Hu
provider, so the sampled vector is

    theta = (omega_cdm, h, ln10As, LRG_b1, LRG_b2, LRG_b4,
             ELG_b1, ELG_b2, ELG_b4)

and ``FlagshipModel.logp(theta)`` is one jit-compiled scalar function —
vmapped over walkers for ensemble sampling (BASELINE configs 2-5).

The mock data vector is generated from the model itself at the fiducial
parameter point; the covariance is the analytic Gaussian covariance at that
point.  All Phase-A artifacts are cached under ``workdir``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from dataclasses import dataclass
from pathlib import Path
from typing import Callable

from ..models.config import EFTConfig
from ..models.pipeline import TracerPipeline, CosmoInputs
from ..models.ap import lcdm_da, lcdm_hubble
from ..likelihood.likelihood import EFTLikelihood, TracerSpec, parse_kmask
from ..likelihood.parambasis import WestCoastBasis
from ..likelihood.covariance import GaussianCovariance, Multipole
from ..boltzmann.eh98 import EisensteinHuProvider, eh98_pk
from ..boltzmann.background import growth_rate_lcdm

FIDUCIAL = dict(omega_b=0.02237, omega_cdm=0.1200, h=0.6777, ln10As=3.044, ns=0.9649)
TRACERS = {
    "LRG": dict(zeff=0.70, ls=[0, 2, 4], kmin=0.01, kmax=0.20, nd=5e-5,
                b1=2.2, b2=0.8, b4=0.8, smask=350.0),
    "ELG": dict(zeff=0.845, ls=[0, 2], kmin=0.03, kmax=0.20, nd=1.85e-4,
                b1=1.3, b2=0.5, b4=0.5, smask=250.0),
}
COSMO_NAMES = ["omega_cdm", "h", "ln10As"]
BIAS_NAMES = ["b1", "b2", "b4"]


def synthetic_mask_file(path: Path, smask: float) -> Path:
    """Plausible survey-mask multipoles Q_q(s): monopole ~1 at small s with a
    smooth roll-off, small anisotropic Q2/Q4 contributions."""
    s = np.geomspace(3.0, 4000.0, 2000)
    roll = 1.0 / (1.0 + (s / smask) ** 3)
    q0 = roll
    q2 = 0.08 * (s / smask) / (1.0 + (s / smask) ** 4)
    q4 = 0.03 * (s / smask) ** 2 / (1.0 + (s / smask) ** 5)
    np.savetxt(path, np.column_stack([s, q0, q2, q4]), header="s Q0 Q2 Q4")
    return path


@dataclass(eq=False)
class FlagshipModel:
    like: EFTLikelihood
    providers: dict
    param_names: list[str]
    theta0: np.ndarray
    dtype: type

    def params_dict(self, theta) -> dict:
        base = {k: jnp.asarray(v, self.dtype) for k, v in FIDUCIAL.items()}
        for i, name in enumerate(self.param_names):
            base[name] = theta[i]
        return base

    def logp(self, theta):
        """Scalar log-posterior of one parameter vector (jit/vmap-able)."""
        params = self.params_dict(theta)
        inputs = {t: p.inputs(params) for t, p in self.providers.items()}
        inputs = {
            t: CosmoInputs(
                plin=ci.plin.astype(self.dtype),
                f=jnp.asarray(ci.f, self.dtype),
                qperp=jnp.asarray(ci.qperp, self.dtype),
                qpar=jnp.asarray(ci.qpar, self.dtype),
            )
            for t, ci in inputs.items()
        }
        return self.like.logp(inputs, params)["logp"]


def _fiducial_multipoles(pipe: TracerPipeline, provider, params, basis, binning):
    """Theory multipoles at the fiducial point (jitted — eager per-op dispatch
    is prohibitively slow on remote accelerators)."""
    import jax

    @jax.jit
    def compute(p):
        inputs = provider.inputs(p)
        bird = pipe.compute_bird(inputs)
        _, _, product = pipe.product(bird, chained=False, binning=binning)
        return basis.reduce_plk(pipe.cfg, product, p).sum()

    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    ls, kret, _ = pipe.product_info(chained=False, binning=binning)
    return ls, np.asarray(kret), np.asarray(compute(jparams))


def _make_provider(cfg, zeff, om_fid, cosmology: str):
    from ..models.ap import lcdm_da, lcdm_hubble

    da_fid, h_fid = lcdm_da(om_fid, zeff), lcdm_hubble(om_fid, zeff)
    if cosmology == "solver_emulator":
        from ..boltzmann.emulator import SolverEmulatorProvider

        return SolverEmulatorProvider.load(
            cfg=cfg, zeff=zeff, da_fid=da_fid, h_fid=h_fid
        )
    return EisensteinHuProvider(cfg=cfg, zeff=zeff, da_fid=da_fid, h_fid=h_fid)


def _resolve_cosmology(cosmology: str | None) -> str:
    if cosmology is not None:
        return cosmology
    from ..boltzmann.emulator import DEFAULT_PK_ARTIFACT

    # Boltzmann-grade by default when the trained solver-emulator artifact
    # ships; EH98 otherwise (both fully on-device)
    return "solver_emulator" if DEFAULT_PK_ARTIFACT.exists() else "eh98"


def build_flagship(
    workdir, dtype=jnp.float64, with_window: bool = True, window_nmax: int = 2048,
    cosmology: str | None = None,
) -> FlagshipModel:
    import json

    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    cache = workdir / "cache"
    cosmology = _resolve_cosmology(cosmology)

    # mock data/cov are generated from the model itself: a workdir built for
    # a different cosmology provider (or theory version) must regenerate
    meta_file = workdir / "flagship_meta.json"
    meta = {"cosmology": cosmology, "version": 2}
    stale = True
    if meta_file.exists():
        try:
            stale = json.loads(meta_file.read_text()) != meta
        except json.JSONDecodeError:
            stale = True
    if stale:
        for name in TRACERS:
            (workdir / f"data_{name}.txt").unlink(missing_ok=True)
        (workdir / "cov.txt").unlink(missing_ok=True)
        meta_file.write_text(json.dumps(meta))

    om_fid = (FIDUCIAL["omega_b"] + FIDUCIAL["omega_cdm"]) / FIDUCIAL["h"] ** 2

    specs: dict[str, TracerSpec] = {}
    providers: dict = {}
    fid_params = dict(FIDUCIAL)
    kout = {}
    for name, tc in TRACERS.items():
        nl = max(tc["ls"]) // 2 + 1
        cfg = EFTConfig(nl=nl, no=nl, nd_a=tc["nd"])
        window = None
        if with_window:
            mask_file = workdir / f"mask_{name}.txt"
            if not mask_file.exists():
                synthetic_mask_file(mask_file, tc["smask"])
            window = dict(window_configspace_file=mask_file, nmax=window_nmax)
        pipe = TracerPipeline.build(
            cfg,
            zeff=tc["zeff"],
            with_irresum=True,
            apeffect=dict(om_ap=om_fid, z_ap=tc["zeff"], rdrag_ap=147.66,
                          hubble_ap=FIDUCIAL["h"]),
            window=window,
            cache_dir=cache,
        )
        providers[name] = _make_provider(cfg, tc["zeff"], om_fid, cosmology)
        kout[name] = np.arange(0.01, 0.2049, 0.005)
        fid_params.update({f"{name}_{b}": tc[b] for b in BIAS_NAMES})
        specs[name] = TracerSpec(
            pipeline=pipe,
            basis=WestCoastBasis(prefix=f"{name}_"),
            data=dict(path=workdir / f"data_{name}.txt", ls=tc["ls"],
                      kmin=tc["kmin"], kmax=tc["kmax"]),
            with_binning=True,
        )

    # ---- mock data + analytic covariance at the fiducial point -----------
    data_ready = all((workdir / f"data_{n}.txt").exists() for n in TRACERS) and (
        workdir / "cov.txt"
    ).exists()
    if not data_ready:
        cov_blocks = []
        for name, tc in TRACERS.items():
            spec = specs[name]
            binning = spec.pipeline.binning_tables(kout[name])
            ls, keff, plk = _fiducial_multipoles(
                spec.pipeline, providers[name], fid_params, spec.basis, binning
            )
            cols = [kout[name]] + [plk[l // 2] for l in tc["ls"]]
            np.savetxt(
                workdir / f"data_{name}.txt",
                np.column_stack(cols),
                header="k " + " ".join(f"P{l}" for l in tc["ls"]),
            )
            kedges = np.concatenate([binning["binmin"], binning["binmax"][-1:]])
            gcov = GaussianCovariance(kedges, volume=4.0)
            shot = 1.0 / tc["nd"]
            mp = Multipole(
                p0=plk[0] + shot,
                p2=plk[1],
                p4=plk[2] if len(tc["ls"]) > 2 else None,
            )
            cov_blocks.append(gcov(tc["ls"], tc["ls"], "aa->aaaa", mp))
        from scipy.linalg import block_diag

        np.savetxt(workdir / "cov.txt", block_diag(*cov_blocks))

    marg = {
        f"{name}_": {
            "b3": {"loc": 0.0, "scale": 2.0},
            "cct": {"loc": 0.0, "scale": 4.0},
            "cr1": {"loc": 0.0, "scale": 8.0},
            "cr2": {"loc": 0.0, "scale": 4.0},
            "ce0": {"loc": 0.0, "scale": 4.0},
            "cequad": {"loc": 0.0, "scale": 2.0},
        }
        for name in TRACERS
    }
    like = EFTLikelihood(tracers=specs, cov=workdir / "cov.txt", marg=marg)

    param_names = COSMO_NAMES + [f"{n}_{b}" for n in TRACERS for b in BIAS_NAMES]
    theta0 = np.array([fid_params[p] for p in param_names])
    return FlagshipModel(
        like=like, providers=providers, param_names=param_names, theta0=theta0,
        dtype=dtype,
    )
