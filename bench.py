#!/usr/bin/env python
"""Benchmark: full theory+likelihood evaluations/sec/chip (vmapped walkers).

Runs the flagship two-tracer analysis (IR resummation + AP + window + binning
+ analytic marginalization, on-device EH cosmology) on whatever accelerator
JAX exposes, vmapped over a walker batch, and prints ONE JSON line.

The reference implementation evaluates O(1) posterior/sec/process (PyBird
"runs in less than a second" per full P_l evaluation —
/root/reference/eftpipe/pybird/README.md:22, plus likelihood overhead), so
``vs_baseline`` is evals/sec against a 1.0 evals/sec/process baseline.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    dtype_flag = os.environ.get("BENCH_DTYPE", "float32")
    if dtype_flag == "float64":
        jax.config.update("jax_enable_x64", True)
    else:
        # default bf16-pass matmuls lose ~1e-3 relative on the loop
        # contractions; 'high' (bf16x3) restores logp to ~1e-3 absolute of
        # the float64 reference at a modest cost (measured on v5e)
        jax.config.update(
            "jax_default_matmul_precision",
            os.environ.get("BENCH_PRECISION", "high"),
        )
    import jax.numpy as jnp

    from eftpipe_tpu.api.flagship import build_flagship
    from eftpipe_tpu.parallel.mesh import chunked_vmap

    dtype = jnp.float64 if dtype_flag == "float64" else jnp.float32

    workdir = os.environ.get("BENCH_WORKDIR", "bench_assets")
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    chunk = int(os.environ.get("BENCH_CHUNK", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    model = build_flagship(workdir, dtype=dtype)
    logp_batch = jax.jit(chunked_vmap(model.logp, chunk_size=min(chunk, batch)))

    rng = np.random.default_rng(0)
    theta0 = model.theta0.astype(np.float64)
    # one distinct batch per iteration: the TPU tunnel caches identical
    # (executable, inputs) executions, which would make repeated calls free
    batches = [
        jnp.asarray(
            theta0[None, :] * (1.0 + 1e-3 * rng.standard_normal((batch, theta0.size))),
            dtype,
        )
        for _ in range(iters)
    ]

    out = logp_batch(batches[0])
    out.block_until_ready()  # compile + warmup
    if not bool(jnp.isfinite(out).all()):
        print(json.dumps({"metric": "error", "value": 0, "unit": "",
                          "vs_baseline": 0, "detail": "non-finite logp"}))
        sys.exit(1)

    t0 = time.perf_counter()
    for thetas in batches:
        out = logp_batch(thetas)
        out.block_until_ready()
    dt = time.perf_counter() - t0

    n_dev = max(1, len(jax.devices()))
    evals_per_sec = batch * iters / dt
    value = evals_per_sec / n_dev
    print(json.dumps({
        "metric": "full P_l theory+likelihood evals/sec/chip (vmapped walkers)",
        "value": round(value, 2),
        "unit": "evals/s/chip",
        "vs_baseline": round(value / 1.0, 2),
    }))


if __name__ == "__main__":
    main()
