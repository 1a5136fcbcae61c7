"""On-device affine-invariant ensemble MCMC (Goodman & Weare stretch move).

Replaces the reference's external Cobaya MCMC + MPI chain parallelism with a
fully jit-compiled sampler: the whole ensemble update (two half-ensemble
stretch moves, each a vmapped log-posterior evaluation) is one XLA program,
scanned over steps with ``lax.scan``, and the walker axis can be sharded over
a device mesh (parallel/mesh.py).  The log-posterior is the vmapped EFT
theory+likelihood graph, so the sampling loop is batched TPU linear algebra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from dataclasses import dataclass
from functools import partial
from typing import Callable

from .mesh import chunked_vmap


def _half_update(key, logp_vmapped, active, active_logp, other, a, dim):
    """Stretch-move update of one half of the ensemble."""
    n = active.shape[0]
    k_z, k_pick, k_accept = jax.random.split(key, 3)
    u = jax.random.uniform(k_z, (n,), dtype=active.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    j = jax.random.randint(k_pick, (n,), 0, other.shape[0])
    partner = other[j]
    proposal = partner + z[:, None] * (active - partner)
    prop_logp = logp_vmapped(proposal)
    log_accept = (dim - 1.0) * jnp.log(z) + prop_logp - active_logp
    accept = jnp.log(jax.random.uniform(k_accept, (n,), dtype=active.dtype)) < log_accept
    new = jnp.where(accept[:, None], proposal, active)
    new_logp = jnp.where(accept, prop_logp, active_logp)
    return new, new_logp, accept


def stretch_step(key, logp_vmapped, walkers, logps, a: float = 2.0):
    """One full ensemble update; walkers (nw, d) with nw even."""
    nw, dim = walkers.shape
    half = nw // 2
    k0, k1 = jax.random.split(key)
    first, second = walkers[:half], walkers[half:]
    lp0, lp1 = logps[:half], logps[half:]
    first, lp0, acc0 = _half_update(k0, logp_vmapped, first, lp0, second, a, dim)
    second, lp1, acc1 = _half_update(k1, logp_vmapped, second, lp1, first, a, dim)
    return (
        jnp.concatenate([first, second]),
        jnp.concatenate([lp0, lp1]),
        jnp.concatenate([acc0, acc1]),
    )


@dataclass(eq=False)  # identity hash: instances are static args to jit
class EnsembleSampler:
    """Vectorised ensemble sampler over a scalar log-posterior ``logp(theta)``.

    With ``mesh`` set, the walker axis is pinned to the mesh via
    ``with_sharding_constraint`` inside the scan carry, so the vmapped
    posterior evaluations run data-parallel over devices and XLA inserts the
    (tiny) collectives for the cross-half partner gathers — the TPU-native
    replacement for the reference's MPI process-per-chain
    (/root/reference/eftpipe/tools.py:24-25)."""

    logp: Callable
    nwalkers: int
    ndim: int
    a: float = 2.0
    chunk_size: int | None = None
    mesh: "jax.sharding.Mesh | None" = None
    mesh_axis: str = "walkers"

    def __post_init__(self):
        if self.nwalkers % 2:
            raise ValueError("nwalkers must be even")
        self._logp_vmapped = chunked_vmap(self.logp, self.chunk_size)
        self._sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.nwalkers % (2 * self.mesh.devices.size):
                raise ValueError(
                    f"nwalkers={self.nwalkers} must be a multiple of twice "
                    f"the mesh size ({self.mesh.devices.size}) so each "
                    f"half-ensemble shards evenly"
                )
            self._sharding = NamedSharding(self.mesh, P(self.mesh_axis))

    def _constrain(self, walkers, logps):
        if self._sharding is None:
            return walkers, logps
        from jax.sharding import NamedSharding, PartitionSpec as P

        lp_sharding = NamedSharding(self.mesh, P(self.mesh_axis))
        return (
            jax.lax.with_sharding_constraint(walkers, self._sharding),
            jax.lax.with_sharding_constraint(logps, lp_sharding),
        )

    def init(self, key, center, scale=1e-3):
        center = jnp.asarray(center)
        noise = jax.random.normal(key, (self.nwalkers, self.ndim), center.dtype)
        return center[None, :] + scale * noise * jnp.maximum(jnp.abs(center), 1.0)[None, :]

    @partial(jax.jit, static_argnames=("self", "nsteps", "thin"))
    def run(self, key, x0, nsteps: int, thin: int = 1):
        """Run ``nsteps`` ensemble updates; returns (chain, logps, accept_rate).

        chain has shape (nsteps // thin, nwalkers, ndim).
        """
        x0, _ = self._constrain(x0, jnp.zeros((self.nwalkers,), x0.dtype))
        logps = self._logp_vmapped(x0)

        def step(carry, k):
            walkers, lps = carry
            walkers, lps, acc = stretch_step(k, self._logp_vmapped, walkers, lps, self.a)
            walkers, lps = self._constrain(walkers, lps)
            return (walkers, lps), (walkers, lps, acc.mean())

        keys = jax.random.split(key, nsteps)
        (walkers, lps), (chain, chain_logp, acc) = jax.lax.scan(step, (x0, logps), keys)
        return chain[::thin], chain_logp[::thin], acc.mean()
