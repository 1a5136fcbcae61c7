#!/usr/bin/env python
"""Micro-benchmark: the folded-real CF/P22 contraction (quad_form_real) —
XLA grouped einsum pair vs the fused Pallas kernel — at production shapes
on the real TPU.  Prints one JSON line per variant.

Timing rules per CLAUDE.md: distinct inputs per call, block per call, no
device→host transfers until all timed sections are done.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("BENCH_PRECISION", "high"),
    )
    import jax.numpy as jnp

    from eftpipe_tpu.ops.pallas_kernels import qf_real_grouped

    w_ = int(os.environ.get("QF_WALKERS", "256"))
    n = int(os.environ.get("QF_N", "255"))
    s = int(os.environ.get("QF_S", "80"))
    bl = int(os.environ.get("QF_BL", "114"))
    iters = int(os.environ.get("QF_ITERS", "8"))

    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.standard_normal((bl, n, n)), jnp.float32)
    m = m + jnp.swapaxes(m, -1, -2)

    # inputs are SYNTHESIZED ON DEVICE from a scalar seed: shipping a
    # (W, N, S) f32 batch over the axon tunnel per call would otherwise
    # dominate/flatten the timing (~21 MB per call at W=256); distinct
    # seeds per call keep the tunnel's execution cache cold
    def make_w(seed):
        # cheap mul/floor hash — transcendentals here would dominate the
        # timing (5M sins/call ≈ the contraction itself)
        i = jnp.arange(w_ * n * s, dtype=jnp.float32).reshape(w_, n, s)
        x = i * 6.180339887e-1 + seed
        return (x - jnp.floor(x)) - 0.5

    seeds = [jnp.asarray(float(q), jnp.float32)
             for q in rng.random(iters + 1)]
    pending = []

    def timed(fn):
        out = fn(seeds[0])
        out.block_until_ready()
        t0 = time.perf_counter()
        for sd in seeds[1:]:
            out = fn(sd)
            out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        pending.append(out)
        return dt

    # algorithmic FLOPs: the (BL,N,N)@(N,S·W) matmul dominates; the second
    # contraction is an elementwise multiply + n-reduction
    flops = 2 * bl * n * n * s * w_ + 2 * bl * n * s * w_
    results = {}
    for name, use_pallas in (("xla", False), ("pallas", True)):
        fn = jax.jit(lambda sd, up=use_pallas: qf_real_grouped(
            make_w(sd), m, use_pallas=up))
        dt = timed(fn)
        results[name] = dt
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 2),
            "shapes": f"W={w_} BL={bl} N={n} S={s}",
        }), flush=True)

    a, b = pending[-2], pending[-1]
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    print(json.dumps({
        "metric": "qf_real pallas speedup",
        "value": round(results["xla"] / results["pallas"], 3),
        "rel_err_xla_vs_pallas": f"{err:.2e}",
    }))


if __name__ == "__main__":
    main()
