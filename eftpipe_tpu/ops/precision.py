"""Per-stage matmul-precision overrides for the f32 TPU production path.

XLA's ``jax_default_matmul_precision='high'`` runs every f32 matmul as three
bf16 passes — accurate to ~1e-6 relative, but the loop/window contractions
mix magnitudes ~1e4-1e5 with strong cancellations, so the *absolute* noise
on logp reached 0.018 (r4 driver measurement, budget 0.02).  Upgrading
EVERYTHING to 'highest' (six bf16 passes) cuts that to 0.0024 but costs 22%
end-to-end (18972 → 14733 evals/s/chip, v5e) because a few stages are
MXU-bound even though the pipeline as a whole is HBM-bound.

This module lets each pipeline stage opt into 'highest' individually: the
stage bodies are traced under ``stage_precision(<name>)`` and the env knob
``EFTPIPE_TPU_HIGHEST_STAGES`` (comma list, default measured on v5e) selects
which stages get the extra passes.  Stage names: ``nonlinear`` (FFTLog +
loop contractions), ``IRresum``, ``APeffect``, ``window``, ``fiber``,
``binning``, ``like`` (flatten/chi2/marginal), ``emu`` (P(k) emulator ridge).

Matmul precision binds at TRACE time, so the context manager composes with
jit: entering it inside a traced function changes only the ops traced inside.
"""

from __future__ import annotations

import os
from contextlib import nullcontext

import jax

# Measured attribution on the v5e flagship (4x16 seeded batch vs f64 CPU):
# the 0.018 'high' noise is DISTRIBUTED over the post-loop stages — no
# single-stage upgrade moves the max (nonlinear-only 0.0165, IRresum-only
# 0.0185, APeffect-only 0.0166 vs base 0.0179) — but upgrading everything
# EXCEPT the loop engine cuts it to 0.0019 (global 'highest' gives 0.0024
# at 22% end-to-end cost because the loop contractions are ~93% of the
# pipeline's FLOPs; this complement set doubles only ~46 of 656 MFLOP/eval,
# invisible on an HBM-bound pipeline).
DEFAULT_HIGHEST = "IRresum,APeffect,window,fiber,binning,like,emu"


def highest_stages() -> set[str]:
    return set(filter(None, os.environ.get(
        "EFTPIPE_TPU_HIGHEST_STAGES", DEFAULT_HIGHEST).split(",")))


def stage_precision(name: str):
    """Context manager: 'highest' matmul precision for the named stage when
    selected by EFTPIPE_TPU_HIGHEST_STAGES, no-op otherwise."""
    if name in highest_stages():
        return jax.default_matmul_precision("highest")
    return nullcontext()
