"""MCMC driver: blocked ensemble sampling with checkpoint/resume and
convergence stopping.

The reference's sampling loop is Cobaya's MCMC: MPI process-per-chain,
R−1 convergence stopping, chain ``.txt`` files plus a ``.progress`` /
checkpoint for resume (consumed by /root/reference/eftpipe/analysis.py:245-261).
Here the ensemble lives on-device: each block of steps is one jitted
``lax.scan`` (parallel/sampler.py), the host only sees thinned chain blocks,
computes split-R̂ over walkers (diagnostics.py), checkpoints atomically, and
stops when R−1 drops below the requested threshold.

Chain output is getdist-compatible: ``<prefix>.1.txt`` with columns
``weight  -logpost  <params...>  <derived...>`` and a ``<prefix>.paramnames``
sidecar — the same convention Cobaya uses, so downstream chain tooling works
unchanged.
"""

from __future__ import annotations

import json
import time
import os
import numpy as np
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import jax
import logging
import jax.numpy as jnp

from .sampler import EnsembleSampler
from .diagnostics import gelman_rubin, integrated_autocorr_time


def _atomic_savez(path: Path, **arrays) -> None:
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


@dataclass
class MCMCResult:
    chain: np.ndarray        # (nsteps, nwalkers, ndim) thinned
    logps: np.ndarray        # (nsteps, nwalkers)
    rminus1: np.ndarray      # per-parameter R̂ − 1 at the end
    accept_rate: float
    converged: bool
    tau: np.ndarray | None = None

    def flat(self, burn_frac: float = 0.3) -> np.ndarray:
        start = int(burn_frac * self.chain.shape[0])
        return self.chain[start:].reshape(-1, self.chain.shape[-1])


@dataclass(eq=False)
class HMCSamplerAdapter:
    """EnsembleSampler-shaped facade over :class:`eftpipe_tpu.parallel.hmc.HMC`.

    Exposes the driver's sampler contract — ``init(key, center)`` and
    ``run(key, walkers, nsteps, thin) -> (chain, logps, accept)`` — so the
    blocked checkpoint/R̂ machinery is sampler-agnostic.  Warmup (dual-
    averaging step size + mass adaptation — a ``(ndim,)`` ``inv_mass0`` seed
    is refined diagonally, a dense ``(ndim, ndim)`` seed such as the full
    Laplace covariance is kept fixed as a whitening metric) runs once,
    lazily, before the first block; the tuned ``(eps, inv_mass)`` ride the
    driver checkpoint so a resumed run skips re-adaptation."""

    logp: Callable
    nwalkers: int
    ndim: int
    n_leapfrog: int = 16
    target_accept: float = 0.8
    warmup_steps: int = 300
    eps0: float = 0.01
    inv_mass0: np.ndarray | None = None
    mesh: Any | None = None

    def __post_init__(self):
        from .hmc import HMC

        self.hmc = HMC(
            logp=self.logp, ndim=self.ndim, n_leapfrog=self.n_leapfrog,
            target_accept=self.target_accept, mesh=self.mesh,
        )
        self.eps = None
        self.inv_mass = None

    def init(self, key, center, scale=1e-3):
        center = jnp.asarray(center)
        noise = jax.random.normal(key, (self.nwalkers, self.ndim), center.dtype)
        return center[None, :] + scale * noise * jnp.maximum(
            jnp.abs(center), 1.0)[None, :]

    def run(self, key, x0, nsteps: int, thin: int = 1):
        from .hmc import HMCState

        x0 = jnp.asarray(x0)
        if self.eps is None:
            key, k_warm = jax.random.split(key)
            inv0 = None if self.inv_mass0 is None else jnp.asarray(
                self.inv_mass0, x0.dtype)
            state, eps, inv_mass, _ = self.hmc.warmup(
                k_warm, x0, self.warmup_steps, self.eps0, inv_mass0=inv0)
            self.eps, self.inv_mass = eps, inv_mass
            x0 = state.q
        lp, grad = jax.jit(self.hmc._lpg)(x0)
        state = HMCState(q=x0, logp=lp, grad=grad)
        return self.hmc.run(key, state, self.eps, self.inv_mass, nsteps, thin)

    # -- checkpointable adaptation state ------------------------------------
    def state_arrays(self) -> dict:
        if self.eps is None:
            return {}
        return {"hmc_eps": np.asarray(self.eps),
                "hmc_inv_mass": np.asarray(self.inv_mass)}

    def restore_state(self, z) -> None:
        if "hmc_eps" in getattr(z, "files", z):
            self.eps = jnp.asarray(z["hmc_eps"])
            self.inv_mass = jnp.asarray(z["hmc_inv_mass"])


@dataclass
class MCMCDriver:
    """Blocked ensemble MCMC with convergence stopping and resume.

    Parameters
    ----------
    logp : scalar log-posterior ``theta -> float`` (jit/vmap-able)
    ndim : parameter dimension
    nwalkers : ensemble size (even)
    rhat_tol : stop when max-over-params (R̂ − 1) < rhat_tol
    block : steps per jitted scan block (host sees the chain between blocks)
    out : optional output prefix; enables checkpointing + chain files
    param_names : column names for the chain files
    derived_fn : optional ``theta_batch -> (nwalkers, nderived)`` evaluated on
        the final ensemble of each block and stored alongside the chain
    """

    logp: Callable
    ndim: int
    nwalkers: int = 256
    a: float = 2.0
    chunk_size: int | None = None
    rhat_tol: float = 0.01
    block: int = 100
    thin: int = 1
    burn_frac: float = 0.5
    out: str | os.PathLike | None = None
    param_names: list[str] | None = None
    derived_names: list[str] | None = None
    derived_fn: Callable | None = None
    min_blocks_before_check: int = 2
    mesh: Any | None = None          # jax.sharding.Mesh: shard the walker axis
    sampler_kind: str = "stretch"    # "stretch" | "hmc"
    # HMC-only knobs (sampler_kind="hmc"); inv_mass0 seeds the warmup metric
    # with a known posterior scale (the diagonal of a Laplace covariance)
    n_leapfrog: int = 16
    target_accept: float = 0.8
    warmup_steps: int = 300
    inv_mass0: np.ndarray | None = None

    def __post_init__(self):
        if self.sampler_kind == "stretch":
            self.sampler = EnsembleSampler(
                logp=self.logp, nwalkers=self.nwalkers, ndim=self.ndim,
                a=self.a, chunk_size=self.chunk_size, mesh=self.mesh,
            )
        elif self.sampler_kind == "hmc":
            self.sampler = HMCSamplerAdapter(
                logp=self.logp, nwalkers=self.nwalkers, ndim=self.ndim,
                n_leapfrog=self.n_leapfrog, target_accept=self.target_accept,
                warmup_steps=self.warmup_steps, inv_mass0=self.inv_mass0,
                mesh=self.mesh,
            )
        else:
            raise ValueError(
                f"unknown sampler_kind {self.sampler_kind!r} (stretch | hmc)")
        self._ckpt = Path(str(self.out) + ".checkpoint.npz") if self.out else None

    def _shard(self, walkers):
        if self.mesh is None:
            return walkers
        from .mesh import shard_walkers

        return shard_walkers(jnp.asarray(walkers), self.mesh)

    # -- persistence ------------------------------------------------------
    def _save_state(self, key, walkers, chain_blocks, logp_blocks, nsteps_done):
        if self._ckpt is None:
            return
        self._ckpt.parent.mkdir(parents=True, exist_ok=True)
        extra = (self.sampler.state_arrays()
                 if hasattr(self.sampler, "state_arrays") else {})
        _atomic_savez(
            self._ckpt,
            key=np.asarray(key),
            walkers=np.asarray(walkers),
            chain=np.concatenate(chain_blocks) if chain_blocks else np.zeros((0, self.nwalkers, self.ndim)),
            logps=np.concatenate(logp_blocks) if logp_blocks else np.zeros((0, self.nwalkers)),
            nsteps_done=nsteps_done,
            **extra,
        )

    def _load_state(self):
        if self._ckpt is None or not self._ckpt.exists():
            return None
        with np.load(self._ckpt) as z:
            if hasattr(self.sampler, "restore_state"):
                self.sampler.restore_state(z)
            return dict(
                key=jnp.asarray(z["key"]),
                walkers=jnp.asarray(z["walkers"]),
                chain=[z["chain"]] if z["chain"].size else [],
                logps=[z["logps"]] if z["logps"].size else [],
                nsteps_done=int(z["nsteps_done"]),
            )

    def write_chains(self, result: MCMCResult, derived: np.ndarray | None = None):
        """getdist/Cobaya-style ``<out>.1.txt`` + ``<out>.paramnames``."""
        if self.out is None:
            raise ValueError("no output prefix configured")
        prefix = Path(self.out)
        prefix.parent.mkdir(parents=True, exist_ok=True)
        names = self.param_names or [f"p{i}" for i in range(self.ndim)]
        dnames = list(self.derived_names or [])
        with open(f"{prefix}.paramnames", "w") as f:
            for n in names + [d + "*" for d in dnames]:
                f.write(f"{n}\t{n}\n")
        flat = result.chain.reshape(-1, self.ndim)
        lp = result.logps.reshape(-1)
        cols = [np.ones_like(lp), -lp, *flat.T]
        if derived is not None:
            cols.extend(np.asarray(derived).reshape(-1, len(dnames)).T)
        np.savetxt(f"{prefix}.1.txt", np.column_stack(cols))
        meta = dict(ndim=self.ndim, nwalkers=self.nwalkers, thin=self.thin,
                    param_names=names, derived_names=dnames)
        with open(f"{prefix}.params.json", "w") as f:
            json.dump(meta, f, indent=1)

    # -- main loop ----------------------------------------------------------
    def run(
        self,
        key: int | jax.Array = 0,
        x0: np.ndarray | None = None,
        max_steps: int = 10_000,
        resume: bool = True,
        progress_fn: Callable | None = None,
    ) -> MCMCResult:
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)

        chain_blocks: list[np.ndarray] = []
        logp_blocks: list[np.ndarray] = []
        nsteps_done = 0
        walkers = None

        if resume and (state := self._load_state()) is not None:
            key = state["key"]
            walkers = state["walkers"]
            chain_blocks = state["chain"]
            logp_blocks = state["logps"]
            nsteps_done = state["nsteps_done"]

        if walkers is None:
            if x0 is None:
                raise ValueError("x0 required for a fresh run")
            x0 = jnp.asarray(x0)
            if x0.ndim == 1:
                key, sub = jax.random.split(key)
                walkers = self.sampler.init(sub, x0)
            else:
                walkers = x0
        walkers = self._shard(walkers)

        converged = False
        rminus1 = np.full(self.ndim, np.inf)
        accepts = []
        blocks_run = len(chain_blocks)
        logger = logging.getLogger("eftpipe_tpu.mcmc")
        while nsteps_done < max_steps:
            block_t0 = time.perf_counter()
            nsteps = min(self.block, max_steps - nsteps_done)
            key, sub = jax.random.split(key)
            chain, chain_logp, acc = self.sampler.run(sub, walkers, nsteps, thin=self.thin)
            chain = np.asarray(chain)
            chain_logp = np.asarray(chain_logp)
            walkers = self._shard(jnp.asarray(chain[-1]))
            chain_blocks.append(chain)
            logp_blocks.append(chain_logp)
            accepts.append(float(acc))
            nsteps_done += nsteps
            blocks_run += 1

            full = np.concatenate(chain_blocks)
            if blocks_run >= self.min_blocks_before_check:
                rminus1 = gelman_rubin(full, burn_frac=self.burn_frac) - 1.0
            self._save_state(key, walkers, chain_blocks, logp_blocks, nsteps_done)
            logger.info(
                "block %d: steps=%d/%d max(R^-1)=%.4g accept=%.3f (%.1fs, "
                "%.1f evals/s)", blocks_run, nsteps_done, max_steps,
                float(np.max(rminus1)), float(acc),
                time.perf_counter() - block_t0,
                nsteps * self.nwalkers / max(time.perf_counter() - block_t0, 1e-9),
            )
            if progress_fn is not None:
                progress_fn(nsteps_done, float(np.max(rminus1)), float(acc))
            if np.max(rminus1) < self.rhat_tol:
                converged = True
                break

        chain = np.concatenate(chain_blocks)
        logps = np.concatenate(logp_blocks)
        if not np.all(np.isfinite(rminus1)) and chain.shape[0] >= 4:
            # resumed with no new blocks: diagnose the stored chain
            rminus1 = gelman_rubin(chain, burn_frac=self.burn_frac) - 1.0
            converged = bool(np.max(rminus1) < self.rhat_tol)
        tau = None
        if chain.shape[0] >= 50:
            tau = integrated_autocorr_time(chain, burn_frac=self.burn_frac)
        result = MCMCResult(
            chain=chain, logps=logps, rminus1=rminus1,
            accept_rate=float(np.mean(accepts)) if accepts else float("nan"),
            converged=converged, tau=tau,
        )
        if self.out is not None:
            derived = None
            if self.derived_fn is not None:
                # chunked: the derived block re-evaluates the theory, and the
                # flat chain can be tens of thousands of points
                from .mesh import chunked_vmap

                flat = chain.reshape(-1, self.ndim)
                n = flat.shape[0]
                chunk = min(1024, n)
                pad = (-n) % chunk
                if pad:
                    flat = np.concatenate([flat, flat[:pad]])
                fn = jax.jit(chunked_vmap(self.derived_fn, chunk_size=chunk))
                derived = np.asarray(fn(jnp.asarray(flat)))[:n]
            self.write_chains(result, derived)
        return result
