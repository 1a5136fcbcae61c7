"""Profiling helpers (SURVEY.md §5.1: the reference only logs per-component
wall times at debug level; here the stages carry ``jax.named_scope``
annotations and a trace context manager wraps the JAX profiler)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir="profile", host: bool = False):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir), create_perfetto_link=False):
        yield


@contextlib.contextmanager
def stage_timer(collect: dict, name: str):
    """Accumulate wall time per stage into ``collect`` (host-side; use around
    block boundaries, not inside jit)."""
    t0 = time.perf_counter()
    yield
    collect[name] = collect.get(name, 0.0) + time.perf_counter() - t0


# ---------------------------------------------------------------------------
# stage-prefix profiling (BENCH_PROFILE)
# ---------------------------------------------------------------------------
PIPE_STAGES = ("nonlinear", "IRresum", "APeffect", "window", "window_matrix",
               "fiber")


def likelihood_stage_prefixes(providers, likes, params_dict, dtype):
    """Ordered {stage: jittable theta→scalar} prefix functions over a full
    theory+likelihood graph.

    Each prefix evaluates the pipeline(s) up to and including the named
    stage and reduces to one scalar (mean-sum checksum, so XLA cannot
    dead-code-eliminate the stage).  Timing prefix k and k−1 on distinct
    inputs and differencing gives an honest per-stage cost even though XLA
    fuses across stage boundaries inside one prefix.

    providers: {tracer: provider}; likes: {name: EFTLikelihood};
    params_dict: theta → full parameter dict (traced).
    """
    import jax.numpy as jnp

    runtimes = {}
    for lk in likes.values():
        runtimes.update({t: rt.spec.pipeline for t, rt in lk.runtimes.items()})
    active = ["cosmo"]
    for stage in PIPE_STAGES:
        attr = {"nonlinear": "nt", "IRresum": "rt", "APeffect": "at",
                "window": "wt", "window_matrix": "wmt", "fiber": "ft"}[stage]
        if any(getattr(p, attr, None) is not None for p in runtimes.values()):
            active.append(stage)
    active += ["png_pg", "logp"]

    def _cast(ci):
        from ..models.pipeline import CosmoInputs

        return CosmoInputs(
            plin=ci.plin.astype(dtype), f=jnp.asarray(ci.f, dtype),
            qperp=jnp.asarray(ci.qperp, dtype), qpar=jnp.asarray(ci.qpar, dtype),
        )

    def make(stage):
        def fn(theta):
            params = params_dict(theta)
            inputs = {t: _cast(p.inputs(params)) for t, p in providers.items()}
            acc = jnp.asarray(0.0, dtype)
            for ci in inputs.values():
                acc = acc + ci.plin.mean() + ci.f + ci.qperp + ci.qpar
            if stage == "cosmo":
                return acc
            if stage in PIPE_STAGES:
                for t, pipe in runtimes.items():
                    bird = pipe.compute_bird(inputs[t], stop_after=stage)
                    # checksum EVERY per-eval array (incl. the s-space CF
                    # channels) or XLA dead-code-eliminates the stage's
                    # most expensive contraction out of the prefix
                    acc = (acc + bird.p11l.mean() + bird.ploopl.mean()
                           + bird.pctl.mean() + bird.pstl.mean()
                           + bird.c11.mean() + bird.cct.mean()
                           + bird.cloopl.mean())
                return acc
            for lk in likes.values():
                sub = {t: inputs[t] for t in lk.runtimes}
                if stage == "png_pg":
                    png, pg = lk.png_and_pg(sub, params)
                    acc = acc + png.mean()
                    if pg is not None:
                        acc = acc + pg.mean()
                else:
                    acc = acc + lk.logp(sub, params)["logp"]
            return acc
        return fn

    return {stage: make(stage) for stage in active}


def run_stage_profile(prefix_fns, make_batches, run_timed, batch, iters) -> dict:
    """Time each prefix on distinct batches; return per-stage ms/eval deltas
    plus the raw cumulative prefix times (negative deltas are XLA-fusion
    noise — read the cumulative column when in doubt)."""
    cum = {}
    for stage, fn in prefix_fns.items():
        import jax

        jfn = jax.jit(jax.vmap(fn))
        dt = run_timed(jfn, make_batches())
        cum[stage] = dt / (batch * iters)
    out, prev = {}, 0.0
    for stage, t in cum.items():
        out[stage] = round((t - prev) * 1e6, 2)  # µs/eval
        prev = t
    return {
        "stage_us_per_eval": out,
        "prefix_us_per_eval": {s: round(t * 1e6, 2) for s, t in cum.items()},
    }
