"""float32 accuracy-budget gate (BASELINE.md: multipoles <0.01%, logp budget).

The parity suite proves float64 correctness against the reference; this gate
proves that the *production* dtype (float32 — the TPU path, where matmuls run
at 'high'/bf16x3 precision) stays within an explicit error budget of the
float64 result on identical inputs, so a future kernel change that silently
degrades TPU precision fails CI.  On CPU the float32 matmuls are true f32, a
slightly tighter setting than bf16x3; bench.py enforces the same logp budget
on the real-TPU path (BENCH_ACCURACY).

Reference discipline being mirrored: tests/regression/test_eftlss.py:80
(rtol 1e-8 in f64) and tests/compare/test_theory.py:24-31 (1e-4 abs+rel).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eftpipe_tpu.api.flagship import build_flagship
from eftpipe_tpu.models.pipeline import CosmoInputs

# |logp_f32 - logp_f64| budget, absolute.  Measured on this suite's CPU f32
# path ~5e-3 and on TPU bf16x3 ('high') 0.0119 (BENCH_r03); 0.02 keeps
# honest headroom (~1.7x the measured TPU error) while staying well under
# ~4% of a 1σ logp move — a single-pass bf16 matmul blows it by >1 OOM.
LOGP_ABS_BUDGET = 0.02
# multipole budget: BASELINE.md "<0.01%" relative, on the binned theory
# vector entering the likelihood (weighted by its own magnitude).
MULTIPOLE_REL_BUDGET = 1e-4


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    wd = tmp_path_factory.mktemp("accuracy")
    # window on: the gate must cover the full production pipeline; both
    # models share the workdir so data/cov/window artifacts are identical
    m64 = build_flagship(wd, dtype=jnp.float64, window_nmax=1024)
    m32 = build_flagship(wd, dtype=jnp.float32, window_nmax=1024)
    return m64, m32


def _theory_vector(model, theta):
    params = model.params_dict(jnp.asarray(theta, model.dtype))
    inputs = {t: p.inputs(params) for t, p in model.providers.items()}
    inputs = {
        t: CosmoInputs(
            plin=ci.plin.astype(model.dtype),
            f=jnp.asarray(ci.f, model.dtype),
            qperp=jnp.asarray(ci.qperp, model.dtype),
            qpar=jnp.asarray(ci.qpar, model.dtype),
        )
        for t, ci in inputs.items()
    }
    png, _ = model.like.png_and_pg(inputs, params)
    return png


def _force_gauss_mu(model):
    """Make the f64 pipelines use the f32 production path's Gauss–Legendre
    µ-quadrature so the multipole comparison isolates dtype ROUNDING (the
    deliberate GL↔trapezoid quadrature difference is gated separately in
    test_ap.py and bounded end-to-end by the logp budget below).  Returns an
    undo callable (the fixture is module-scoped: the logp budget test must
    see the real production f64 path, trapezoid included)."""
    saved = []
    for rt in model.like.runtimes.values():
        at = rt.spec.pipeline.at
        if at is not None and at.get("mu_gl") is not None:
            saved.append((rt.spec.pipeline, at))
            rt.spec.pipeline.at = {**at, "mu": at["mu_gl"],
                                   "proj": at["proj_gl"]}

    def undo():
        for pipe, at in saved:
            pipe.at = at

    return undo


def test_float32_multipole_budget(models):
    m64, m32 = models
    theta = m64.theta0
    undo = _force_gauss_mu(m64)
    try:
        png64 = np.asarray(jax.jit(lambda t: _theory_vector(m64, t))(theta))
    finally:
        undo()
    png32 = np.asarray(jax.jit(lambda t: _theory_vector(m32, t))(theta))
    # relative to the typical multipole magnitude per element (the vector
    # spans P0 ~ 1e4 down to P4 zero-crossings, where a pointwise relative
    # error is ill-defined)
    scale = np.maximum(np.abs(png64), 1e-3 * np.abs(png64).max())
    rel = np.abs(png32.astype(np.float64) - png64) / scale
    assert rel.max() < MULTIPOLE_REL_BUDGET, f"max rel err {rel.max():.3e}"


def test_float32_logp_budget(models):
    m64, m32 = models
    rng = np.random.default_rng(0)
    thetas = m64.theta0[None, :] * (
        1.0 + 1e-3 * rng.standard_normal((16, m64.theta0.size))
    )
    lp64 = np.asarray(jax.jit(jax.vmap(m64.logp))(jnp.asarray(thetas)))
    lp32 = np.asarray(jax.jit(jax.vmap(m32.logp))(jnp.asarray(thetas, jnp.float32)))
    assert np.isfinite(lp32).all()
    err = np.abs(lp32.astype(np.float64) - lp64).max()
    assert err < LOGP_ABS_BUDGET, f"max |dlogp| = {err:.3e}"
