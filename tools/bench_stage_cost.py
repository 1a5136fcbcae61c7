#!/usr/bin/env python
"""Per-stage FLOPs/bytes attribution from XLA's cost model.

Compiles each stage-prefix executable of the flagship (plain vmap over one
chunk, the body the chunked bench loops over) and differences the compiled
cost analysis — the byte/FLOP analogue of bench.py's BENCH_PROFILE timing
deltas.  No execution, so the axon-tunnel timing traps don't apply.

Output: one JSON line per stage with cumulative and delta flops/bytes per
eval, plus the HBM-time lower bound each stage's bytes imply at peak BW.
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("BENCH_PRECISION", "high"),
    )
    import jax.numpy as jnp

    from eftpipe_tpu.api.flagship import build_flagship
    from eftpipe_tpu.utils.profiling import likelihood_stage_prefixes

    workdir = os.environ.get("BENCH_WORKDIR", "bench_assets")
    chunk = int(os.environ.get("BENCH_CHUNK", "128"))
    peak_bw = float(os.environ.get("BENCH_PEAK_GBS", "819")) * 1e9

    if os.environ.get("BENCH_CONFIG", "flagship") == "production":
        # the converted DR16 NGC block (VERDICT r4 item 5: the byte diet must
        # target the production config, not just the flagship)
        import bench

        an = bench._build_production(jnp, jnp.float32)
        prefixes = likelihood_stage_prefixes(
            an.providers, an.likes, an.params_dict, jnp.float32
        )
        theta0 = np.asarray(an.space.theta0(), np.float32)
    else:
        model = build_flagship(workdir, dtype=jnp.float32)
        prefixes = likelihood_stage_prefixes(
            model.providers, {"like": model.like}, model.params_dict,
            jnp.float32
        )
        theta0 = np.asarray(model.theta0, np.float32)
    theta = jnp.asarray(np.tile(theta0, (chunk, 1)))

    prev = (0.0, 0.0)
    for stage, fn in prefixes.items():
        compiled = jax.jit(jax.vmap(fn)).lower(theta).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) / chunk
        byts = float(cost.get("bytes accessed", 0.0)) / chunk
        print(json.dumps({
            "stage": stage,
            "flops_per_eval": round(flops),
            "bytes_per_eval": round(byts),
            "d_flops": round(flops - prev[0]),
            "d_bytes": round(byts - prev[1]),
            "d_hbm_us_at_peak": round((byts - prev[1]) / peak_bw * 1e6, 2),
        }), flush=True)
        prev = (flops, byts)


if __name__ == "__main__":
    main()
