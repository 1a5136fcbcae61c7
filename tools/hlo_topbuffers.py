#!/usr/bin/env python
"""Dump the largest HLO ops (by output bytes) of a compiled stage prefix.

Attribution companion to bench_stage_cost.py: once that tool names the
expensive stage, this one names the tensors.  Parses the post-fusion
optimized HLO of the chosen stage-prefix executable and prints the top-N
ops by output-buffer size (per eval), with their op names — the metadata
carries the jax source line, which points at the producing einsum.

Usage:
  BENCH_CONFIG=production BENCH_CHUNK=64 python tools/hlo_topbuffers.py IRresum
"""

import os
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_SHAPE = re.compile(r"^\s*(?:ROOT )?%?([\w\.\-]+) = ([a-z0-9]+)\[([\d,]*)\]")
_BYTES = {"f32": 4, "bf16": 2, "f64": 8, "s32": 4, "u32": 4, "pred": 1,
          "s8": 1, "u8": 1, "f16": 2, "c64": 8, "c128": 16, "s64": 8}


def main():
    import jax

    stage_want = sys.argv[1] if len(sys.argv) > 1 else "logp"
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_matmul_precision",
                      os.environ.get("BENCH_PRECISION", "high"))
    import jax.numpy as jnp

    from eftpipe_tpu.utils.profiling import likelihood_stage_prefixes

    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    if os.environ.get("BENCH_CONFIG", "flagship") == "production":
        import bench

        an = bench._build_production(jnp, jnp.float32)
        prefixes = likelihood_stage_prefixes(
            an.providers, an.likes, an.params_dict, jnp.float32)
        theta0 = np.asarray(an.space.theta0(), np.float32)
    else:
        from eftpipe_tpu.api.flagship import build_flagship

        model = build_flagship(os.environ.get("BENCH_WORKDIR", "bench_assets"),
                               dtype=jnp.float32)
        prefixes = likelihood_stage_prefixes(
            model.providers, {"like": model.like}, model.params_dict,
            jnp.float32)
        theta0 = np.asarray(model.theta0, np.float32)
    theta = jnp.asarray(np.tile(theta0, (chunk, 1)))

    fn = prefixes[stage_want]
    compiled = jax.jit(jax.vmap(fn)).lower(theta).compile()
    txt = compiled.as_text()

    rows = []
    for line in txt.splitlines():
        m = _SHAPE.match(line)
        if not m:
            continue
        name, dt, dims = m.groups()
        if dt not in _BYTES:
            continue
        shape = [int(d) for d in dims.split(",") if d] if dims else []
        nbytes = int(np.prod(shape, dtype=np.int64)) * _BYTES[dt] if shape else _BYTES[dt]
        src = ""
        sm = re.search(r'metadata=\{[^}]*source_file="([^"]+)"[^}]*source_line=(\d+)', line)
        if sm:
            src = f"{Path(sm.group(1)).name}:{sm.group(2)}"
        opm = re.search(r'op_name="([^"]+)"', line)
        opn = opm.group(1)[-90:] if opm else ""
        rows.append((nbytes, name, f"{dt}[{dims}]", src, opn))

    rows.sort(reverse=True)
    print(f"# stage={stage_want} chunk={chunk}  (output bytes per eval = bytes/chunk)")
    for nbytes, name, shape, src, opn in rows[:40]:
        print(f"{nbytes/chunk/1e6:9.3f} MB/eval  {shape:28s} {src:28s} {opn}")


if __name__ == "__main__":
    main()
