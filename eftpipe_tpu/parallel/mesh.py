"""Device-mesh utilities for walker-parallel sampling.

The reference parallelises MCMC with one MPI process per chain
(/root/reference/eftpipe/tools.py:24-25, log.py:5-12, via Cobaya); here the
distributed axis is the *walker ensemble*: one jitted log-posterior, vmapped
over walkers, sharded over a 1-D ``jax.sharding.Mesh`` so the batch linear
algebra rides the ICI.  There is no hand-written communication — XLA inserts
the (tiny) collectives needed by the ensemble update's cross-half gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def walker_mesh(devices=None, axis: str = "walkers") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def shard_walkers(x, mesh: Mesh, axis: str = "walkers"):
    """Place a (nwalkers, ...) array with its leading axis split over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def chunked_vmap(fn, chunk_size: int | None = None):
    """vmap with sequential chunking to bound peak memory.

    The loop engine's per-walker scratch (the CF quadratic contraction
    intermediates, ~MBs each) makes a flat 1024-walker vmap memory-hungry;
    ``lax.map`` over chunks of an inner vmap trades a little dispatch for a
    flat memory profile.  ``chunk_size`` must divide the batch size.
    """
    inner = jax.vmap(fn)
    if chunk_size is None:
        return inner

    def wrapped(*args):
        batch = jax.tree_util.tree_leaves(args)[0].shape[0]
        if batch % chunk_size:
            raise ValueError(f"batch {batch} not divisible by chunk {chunk_size}")
        nchunks = batch // chunk_size
        reshaped = jax.tree_util.tree_map(
            lambda x: x.reshape((nchunks, chunk_size) + x.shape[1:]), args
        )
        out = jax.lax.map(lambda a: inner(*a), reshaped)
        return jax.tree_util.tree_map(
            lambda x: x.reshape((batch,) + x.shape[2:]), out
        )

    return wrapped
