#!/usr/bin/env python
"""Benchmark: full theory+likelihood evaluations/sec/chip (vmapped walkers).

Runs the flagship two-tracer analysis (IR resummation + AP + window + binning
+ analytic marginalization, solver-emulator Boltzmann-grade cosmology —
the trained PCA + polynomial-ridge emulator of the on-device Einstein-
Boltzmann solver) on whatever accelerator JAX exposes, vmapped over a
walker batch, and prints ONE JSON line.

The reference implementation evaluates O(1) posterior/sec/process (PyBird
"runs in less than a second" per full P_l evaluation —
/root/reference/eftpipe/pybird/README.md:22, plus likelihood overhead), so
``vs_baseline`` is evals/sec against a 1.0 evals/sec/process baseline.

Extra modes:
  BENCH_ACCURACY=1 (default) — also computes a float64 CPU reference logp
    for a small seeded batch in a subprocess and reports/enforces the
    production-dtype accuracy budget (|dlogp| < 0.02, the
    tests/test_accuracy_budget.py gate on the real-TPU path).
  BENCH_SHARD=1 — shards the walker batch over all visible devices
    (jax.sharding.Mesh) and reports per-chip scaling efficiency against a
    single-device run of the per-chip batch.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

LOGP_ABS_BUDGET = 0.02  # tightened from 0.05 (r3 measured 0.0119 on TPU)
_ACC_BATCH = 16
# the accuracy gate runs over several DISTINCT seeds: the r4 driver measured
# a ~1.7x seed-to-seed spread (0.0108 vs 0.0179), so one lucky batch must not
# be able to green the budget (VERDICT r4 item 4)
_ACC_SEEDS = (0, 1, 2, 3)


def _make_batches(theta0, batch, n, dtype, jnp, seed: int = 0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(
            theta0[None, :] * (1.0 + 1e-3 * rng.standard_normal((batch, theta0.size))),
            dtype,
        )
        for _ in range(n)
    ]


def _accuracy_batch(theta0, dtype, jnp):
    """One stacked (len(_ACC_SEEDS)·_ACC_BATCH, ndim) batch, seeds 0..3."""
    parts = [
        _make_batches(theta0, _ACC_BATCH, 1, dtype, jnp, seed=s)[0]
        for s in _ACC_SEEDS
    ]
    return jnp.concatenate(parts, axis=0)


def _accuracy_ref() -> None:
    """Subprocess mode: print the float64 CPU logp for the seeded batches."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from eftpipe_tpu.api.flagship import build_flagship

    workdir = os.environ.get("BENCH_WORKDIR", "bench_assets")
    model = build_flagship(workdir, dtype=jnp.float64)
    thetas = _accuracy_batch(model.theta0.astype(np.float64), jnp.float64, jnp)
    out = jax.jit(jax.vmap(model.logp))(thetas)
    print(json.dumps([float(x) for x in np.asarray(out)]))


def main() -> None:
    import jax

    # the axon TPU plugin registers itself and wins unless the config flag is
    # set too (JAX_PLATFORMS env alone is not honored) — needed for the
    # virtual-mesh validation runs
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

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
    # 8192 amortizes the axon tunnel's ~28 ms fixed per-dispatch overhead
    # (measured: 5783 evals/s/chip at 2048 -> 6189 at 8192, chunk 128).
    # chunk re-tuned after the r4 byte cuts (GL-16 AP + low-rank): 32/64/
    # 96/128/256 -> 14575/15029/14722/13279/12726 evals/s — 64 peaks at
    # 92% HBM utilization.
    batch = int(os.environ.get("BENCH_BATCH", "8192"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "4"))

    model = build_flagship(workdir, dtype=dtype)
    logp_batch = jax.jit(chunked_vmap(model.logp, chunk_size=min(chunk, batch)))

    theta0 = model.theta0.astype(np.float64)
    n_dev = max(1, len(jax.devices()))
    shard = os.environ.get("BENCH_SHARD", "0") != "0" and n_dev > 1

    # finiteness checks are DEFERRED until every timed section has run: on
    # the axon tunnel ANY device→host transfer (bool()/np.asarray/float())
    # permanently switches the session into a ~25 ms-per-call latency mode,
    # which would tax every subsequent timed call (measured: trivial jitted
    # call 0.03 ms before a transfer, ~25 ms after, with no way to reset)
    pending_outs = []

    def run_timed(fn, batches):
        # one distinct batch per iteration (plus one warmup-only batch): the
        # TPU tunnel caches identical (executable, inputs) executions, so
        # re-running the warmup batch inside the timed loop would be free
        out = fn(batches[0])
        out.block_until_ready()  # compile + warmup (this batch is never re-timed)
        t0 = time.perf_counter()
        for thetas in batches[1:]:
            out = fn(thetas)
            out.block_until_ready()
        dt = time.perf_counter() - t0
        pending_outs.append(out)
        return dt

    def check_finite():
        for out in pending_outs:
            if not bool(jnp.isfinite(out).all()):
                print(json.dumps({"metric": "error", "value": 0, "unit": "",
                                  "vs_baseline": 0,
                                  "detail": "non-finite logp"}))
                sys.exit(1)
        pending_outs.clear()

    extra = {}
    cost_probe = None  # (jitted fn, example batch) for the roofline numbers
    if shard:
        from eftpipe_tpu.parallel.mesh import walker_mesh, shard_walkers

        mesh = walker_mesh()
        per_chip = max(chunk, batch // n_dev)
        full = per_chip * n_dev
        # plain vmap on both sides: chunked_vmap's sequential lax.map would
        # serialise the per-device chunks and hide the scaling we measure
        logp_plain = jax.jit(jax.vmap(model.logp))
        single_batches = _make_batches(theta0, per_chip, iters + 1, dtype, jnp)
        t_single = run_timed(logp_plain, single_batches)
        shard_batches = [
            shard_walkers(b, mesh)
            for b in _make_batches(theta0, full, iters + 1, dtype, jnp)
        ]
        dt = run_timed(logp_plain, shard_batches)
        value = full * iters / dt / n_dev
        cost_probe = (logp_plain, shard_batches[0], full)
        # perfect scaling: the sharded run of n_dev x per_chip walkers takes
        # the single-device per_chip time.  On a virtual mesh backed by
        # fewer physical cores than devices the ceiling of scaling_eff is
        # (cores / n_dev) — scaling_eff_vs_serial normalizes that out (1.0 =
        # sharding adds no overhead over perfectly serialized per-device
        # work), which is the meaningful number on a single-core host.
        ncores = os.cpu_count() or 1
        extra = {
            "n_devices": n_dev,
            "physical_cores": ncores,
            "scaling_eff": round(t_single / dt, 4),
            "scaling_eff_vs_serial": round(
                t_single * (n_dev / min(n_dev, ncores)) / dt, 4),
            "single_chip_evals_per_sec": round(per_chip * iters / t_single, 2),
        }
    else:
        batches = _make_batches(theta0, batch, iters + 1, dtype, jnp)
        dt = run_timed(logp_batch, batches)
        value = batch * iters / dt / n_dev
        # cost-model probe on a PLAIN vmap over one chunk: XLA's
        # cost_analysis counts a lax.map/while body ONCE (not × trip count),
        # so probing the chunked executable would under-report flops/bytes
        # by batch/chunk.  The chunked executable is exactly a loop over
        # this body, so body-cost / chunk is the honest per-eval number.
        chunk_eff = min(chunk, batch)
        cost_probe = (jax.jit(jax.vmap(model.logp)),
                      batches[0][:chunk_eff], chunk_eff)

    if os.environ.get("BENCH_PROFILE", "0") != "0":
        from eftpipe_tpu.utils.profiling import (
            likelihood_stage_prefixes, run_stage_profile,
        )

        prefixes = likelihood_stage_prefixes(
            model.providers, {"like": model.like}, model.params_dict, dtype
        )
        # the prefixes run un-chunked (plain vmap), so cap the profile batch
        # — at large BENCH_BATCH the full-batch intermediates would OOM
        pbatch = min(batch, 512)
        extra.update(run_stage_profile(
            prefixes,
            lambda: _make_batches(theta0, pbatch, iters + 1, dtype, jnp),
            run_timed, pbatch, iters,
        ))

    # ---- production companion (VERDICT r4 item 5: the DR16 number must be
    # driver-auditable, not a hand-run tool) — the converted DR16 NGC block
    # (real data, real windows, chained ELG, LRG×ELG cross, Jeffreys,
    # solver-emulator cosmology) timed in the same process, same rules.
    # Still before check_finite: no device→host transfer happens in here.
    if not shard and os.environ.get("BENCH_PRODUCTION", "1") != "0":
        try:
            extra.update(_time_production(
                jax, jnp, dtype, chunk, iters, run_timed))
        except Exception as exc:  # reference payload absent / build failure
            extra["production"] = f"skipped ({type(exc).__name__}: {exc})"

    check_finite()  # first device→host transfer — after ALL timing

    if cost_probe is not None:
        extra.update(_roofline(jax, cost_probe, value, n_dev))

    if os.environ.get("BENCH_ACCURACY", "1") != "0" and dtype_flag != "float64":
        acc = _run_accuracy_check(model, jax, jnp, dtype)
        extra.update(acc)
        if acc.get("logp_max_abs_err", 0.0) > LOGP_ABS_BUDGET:
            print(json.dumps({
                "metric": "error", "value": 0, "unit": "", "vs_baseline": 0,
                "detail": f"accuracy budget violated: {acc}",
            }))
            sys.exit(1)

    print(json.dumps({
        "metric": "full P_l theory+likelihood evals/sec/chip (vmapped walkers)",
        "value": round(value, 2),
        "unit": "evals/s/chip",
        "vs_baseline": round(value / 1.0, 2),
        **extra,
    }))


_PROD_YAML = ("/root/reference/cobaya/yamls/DR16_noric_LEX_NS_LP024_"
              "kmax0.20_EQ02_kmax0.20_XP024_kmax0.20_xnost.yaml")


def _build_production(jnp, dtype):
    """Converted DR16 NGC-block Analysis (the tools/bench_production config:
    light nmax=1024 windows, solver-emulator cosmology, use_cb)."""
    from eftpipe_tpu.compat import convert_cobaya_config
    from eftpipe_tpu.api.orchestrate import Analysis

    info = convert_cobaya_config(
        _PROD_YAML, data_root="/root/reference/cobaya",
        boltzmann={"name": "solver_emulator", "use_cb": True,
                   "om_fid": 0.307115},
        cache_dir=os.environ.get("BENCH_CACHE_DIR", "bench_assets/prod_cache"),
    )
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
            win["nmax"] = int(os.environ.get("BENCH_WINDOW_NMAX", "1024"))
    return Analysis.from_config(info, dtype=dtype)


def _time_production(jax, jnp, dtype, chunk, iters, run_timed) -> dict:
    if not os.path.exists(_PROD_YAML):
        return {"production": "skipped (reference payload absent)"}
    from eftpipe_tpu.parallel.mesh import chunked_vmap

    t0 = time.perf_counter()
    an = _build_production(jnp, dtype)
    build_s = time.perf_counter() - t0
    theta0 = np.asarray(an.space.theta0(), np.float64)
    batch = int(os.environ.get("BENCH_PROD_BATCH", "8192"))
    pchunk = int(os.environ.get("BENCH_PROD_CHUNK", str(chunk)))
    fn = jax.jit(chunked_vmap(an.logp, chunk_size=min(pchunk, batch)))
    batches = _make_batches(theta0, batch, iters + 1, dtype, jnp, seed=1)
    dt = run_timed(fn, batches)
    n_dev = max(1, len(jax.devices()))
    return {
        "production_evals_per_sec_chip": round(batch * iters / dt / n_dev, 2),
        "production_us_per_eval": round(dt / (batch * iters / n_dev) * 1e6, 2),
        "production_ndata": sum(lk.ndata for lk in an.likes.values()),
        "production_ndim": int(theta0.size),
        "production_build_s": round(build_s, 1),
    }


# bf16 MXU peak FLOP/s per chip and HBM bandwidth (bytes/s) by device kind.
# The f32 'high' path runs matmuls as bf16x3 passes, so the compiler-counted
# flops ARE executed on the bf16 MXU — achieved/peak_bf16 is the honest MFU.
_PEAKS = {
    "v5 lite": (197e12, 819e9), "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9), "v5": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9), "trillium": (918e12, 1640e9),
}


def _device_peaks(jax) -> tuple[float, float] | None:
    kind = jax.devices()[0].device_kind.lower()
    if float(os.environ.get("BENCH_PEAK_TFLOPS", "0")) > 0:
        return (float(os.environ["BENCH_PEAK_TFLOPS"]) * 1e12,
                float(os.environ.get("BENCH_PEAK_GBS", "819")) * 1e9)
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return None


def _roofline(jax, cost_probe, evals_per_sec_chip, n_dev) -> dict:
    """FLOPs/eval, bytes/eval and achieved-vs-peak from XLA's own cost model
    of the COMPILED benchmark executable (VERDICT r3 item 2: without this,
    round-over-round perf pushes are unfalsifiable).  ``flops`` here is what
    the compiled HLO executes (post-fusion, incl. the bf16x3 triple-pass of
    'high'-precision f32 matmuls), not an algorithmic count.

    Byte-count methodology (VERDICT r4 item 3): ``cost_analysis()``'s "bytes
    accessed" counts LOGICAL accesses — every post-fusion op's operands +
    outputs — which is an UPPER BOUND on DRAM traffic, not a measurement
    (operands re-read by several fusions, or kept VMEM-resident across the
    chunk loop, are counted each time).  The r4 run crossed 115% of the v5e's
    physical bandwidth, proving the bound is not traffic.  We therefore
    report:

    * ``bytes_per_eval_hlo`` — the logical bound (comparable across rounds);
    * ``hbm_logical_bound``  — logical-bytes rate / peak bandwidth (may
      exceed 1; >1 means at least that fraction of the counted bytes never
      hit DRAM);
    * ``hbm_util`` — the PHYSICAL utilization implied by the measurement:
      min(logical bound, 1.0).  When the logical bound saturates (≥ 1) the
      pipeline is at the HBM roofline and the true utilization is high but
      not exactly known — ``hbm_bound_saturated`` flags this.
    """
    fn, example, batch = cost_probe
    try:
        # may compile fresh (the single-chunk probe body); runs after all
        # timed sections so the compile cannot pollute the measurement
        compiled = fn.lower(example).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older JAX: one dict per module
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
    except Exception as exc:  # pragma: no cover — backend-dependent
        return {"roofline": f"unavailable ({type(exc).__name__})"}
    out = {
        "flops_per_eval": round(flops / batch),
        "bytes_per_eval_hlo": round(bytes_acc / batch),
        "us_per_eval": round(1e6 / evals_per_sec_chip, 2),
    }
    achieved_flops = flops / batch * evals_per_sec_chip
    logical_bw = bytes_acc / batch * evals_per_sec_chip
    out["achieved_tflops_per_chip"] = round(achieved_flops / 1e12, 3)
    peaks = _device_peaks(jax)
    if peaks is not None:
        peak_flops, peak_bw = peaks
        bound = logical_bw / peak_bw
        out["mfu"] = round(achieved_flops / peak_flops, 4)
        out["hbm_logical_bound"] = round(bound, 4)
        out["hbm_util"] = round(min(bound, 1.0), 4)
        out["hbm_bound_saturated"] = bool(bound >= 1.0)
    return out


def _run_accuracy_check(model, jax, jnp, dtype) -> dict:
    """f32-on-accelerator vs f64-on-CPU logp over ``len(_ACC_SEEDS)`` seeded
    batches (the budget gates the max over ALL seeds — one lucky batch can't
    green the gate); the reference values come from a subprocess so x64 can
    be enabled cleanly."""
    import jax.numpy as _jnp

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", BENCH_DTYPE="float64")
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--accuracy-ref"],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        ref = np.asarray(json.loads(res.stdout.strip().splitlines()[-1]))
    except Exception as exc:  # pragma: no cover — diagnostics only
        return {"accuracy_check": f"skipped ({type(exc).__name__})"}
    thetas = _accuracy_batch(model.theta0.astype(np.float64), dtype, jnp)
    got = np.asarray(jax.jit(jax.vmap(model.logp))(thetas), np.float64)
    err = np.abs(got - ref).reshape(len(_ACC_SEEDS), _ACC_BATCH)
    return {"logp_max_abs_err": round(float(err.max()), 6),
            "logp_err_by_seed": [round(float(e), 6) for e in err.max(axis=1)],
            "logp_abs_budget": LOGP_ABS_BUDGET}


if __name__ == "__main__":
    if "--accuracy-ref" in sys.argv:
        _accuracy_ref()
    else:
        main()
