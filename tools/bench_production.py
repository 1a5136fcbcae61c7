#!/usr/bin/env python
"""Benchmark the converted DR16 production block (real data, real survey
windows, chained ELG, LRG×ELG cross, Jeffreys marginalization, the
solver-emulator Boltzmann-grade cosmology) on whatever accelerator JAX
exposes, and print ONE JSON line — the production companion of bench.py's
flagship number.

Env knobs: BENCH_BATCH/CHUNK/ITERS/DTYPE/PRECISION, BENCH_BLOCKS=ngc|both,
BENCH_PROFILE=1 for the per-stage timing decomposition, BENCH_WINDOW_NMAX
(default 1024; production caches use 4096).  Timing rules are the same as
bench.py: distinct inputs per call + block per call (the axon tunnel caches
identical executions).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path(os.environ.get("EFTPIPE_REF_ROOT", "/root/reference"))
YAML = REF / ("cobaya/yamls/DR16_noric_LEX_NS_LP024_kmax0.20_EQ02_kmax0.20_"
              "XP024_kmax0.20_xnost.yaml")


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    dtype_flag = os.environ.get("BENCH_DTYPE", "float32")
    if dtype_flag == "float64":
        jax.config.update("jax_enable_x64", True)
    else:
        jax.config.update(
            "jax_default_matmul_precision",
            os.environ.get("BENCH_PRECISION", "high"),
        )
    import jax.numpy as jnp

    from eftpipe_tpu.compat import convert_cobaya_config
    from eftpipe_tpu.api.orchestrate import Analysis
    from eftpipe_tpu.parallel.mesh import chunked_vmap

    dtype = jnp.float64 if dtype_flag == "float64" else jnp.float32
    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))  # re-tuned r4 (see bench.py)
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    nmax = int(os.environ.get("BENCH_WINDOW_NMAX", "1024"))
    cache = os.environ.get("BENCH_CACHE_DIR", "bench_assets/prod_cache")

    t0 = time.perf_counter()
    info = convert_cobaya_config(
        YAML, data_root=REF / "cobaya",
        boltzmann={"name": "solver_emulator", "use_cb": True,
                   "om_fid": 0.307115},
        cache_dir=cache,
    )
    if os.environ.get("BENCH_BLOCKS", "ngc") == "ngc":
        info["likelihood"] = {"LEX_NGC": info["likelihood"]["LEX_NGC"]}
        keep = set(info["likelihood"]["LEX_NGC"]["tracers"]) | {"default"}
        info["theory"]["tracers"] = {
            t: c for t, c in info["theory"]["tracers"].items() if t in keep
        }
    for t, tcfg in info["theory"]["tracers"].items():
        win = tcfg.get("with_window")
        if isinstance(win, dict):
            win.pop("window_fourier_file", None)
            win["accboost"] = 1
            win["nmax"] = nmax
    an = Analysis.from_config(info, dtype=dtype)
    build_s = time.perf_counter() - t0

    theta0 = np.asarray(an.space.theta0(), np.float64)
    rng = np.random.default_rng(0)

    def make_batches(n=None):
        return [
            jnp.asarray(theta0[None, :] * (1.0 + 1e-3 * rng.standard_normal(
                ((n or batch), theta0.size))), dtype)
            for _ in range(iters + 1)
        ]

    # finiteness checks deferred until all timing is done: on the axon
    # tunnel any device→host transfer permanently degrades per-call latency
    # to ~25 ms (see bench.py)
    pending_outs = []

    def run_timed(fn, batches):
        out = fn(batches[0])
        out.block_until_ready()
        t0 = time.perf_counter()
        for thetas in batches[1:]:
            out = fn(thetas)
            out.block_until_ready()
        dt = time.perf_counter() - t0
        pending_outs.append(out)
        return dt

    logp_batch = jax.jit(chunked_vmap(an.logp, chunk_size=min(chunk, batch)))
    dt = run_timed(logp_batch, make_batches())
    n_dev = max(1, len(jax.devices()))
    value = batch * iters / dt / n_dev

    extra = {"build_s": round(build_s, 1), "ndim": theta0.size,
             "ndata": sum(lk.ndata for lk in an.likes.values()),
             "blocks": sorted(an.likes)}

    if os.environ.get("BENCH_GRAD", "0") != "0":
        # value+gradient throughput — the HMC/NUTS leapfrog cost unit
        # (VERDICT r4 item 1: a measured TPU grad-eval number must back the
        # production HMC story).  Same timing rules; the returned tuple's
        # first element is what run_timed blocks on.
        def vag(theta):
            v, g = jax.value_and_grad(an.logp)(theta)
            return v + jnp.sum(g) * 0.0  # one scalar, keeps both live

        grad_batch = jax.jit(chunked_vmap(vag, chunk_size=min(chunk, batch)))
        dt_g = run_timed(grad_batch, make_batches())
        extra["grad_evals_per_sec_chip"] = round(batch * iters / dt_g / n_dev, 2)
        extra["grad_us_per_eval"] = round(dt_g / (batch * iters / n_dev) * 1e6, 2)
        extra["grad_cost_ratio"] = round(dt_g / dt, 2)
    if os.environ.get("BENCH_PROFILE", "0") != "0":  # still no D2H in here
        from eftpipe_tpu.utils.profiling import (
            likelihood_stage_prefixes, run_stage_profile,
        )

        prefixes = likelihood_stage_prefixes(
            an.providers, an.likes, an.params_dict, dtype
        )
        # un-chunked vmap inside the profile: cap the batch to avoid OOM
        pbatch = min(batch, 512)
        extra.update(run_stage_profile(
            prefixes, lambda: make_batches(pbatch), run_timed, pbatch, iters,
        ))

    for out in pending_outs:  # first device→host transfer — after all timing
        if not bool(jnp.isfinite(out).all()):
            print(json.dumps({"metric": "error", "value": 0, "unit": "",
                              "vs_baseline": 0, "detail": "non-finite logp"}))
            sys.exit(1)

    print(json.dumps({
        "metric": "DR16 production theory+likelihood evals/sec/chip",
        "value": round(value, 2),
        "unit": "evals/s/chip",
        "vs_baseline": round(value / 0.2, 2),  # reference classy speed hint
        **extra,
    }))


if __name__ == "__main__":
    main()
