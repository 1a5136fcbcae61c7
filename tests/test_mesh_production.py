"""VERDICT r3 item 1: shard the REAL production block, not a toy.

The converted DR16 NGC configuration — real survey windows, chained ELG
multipoles, the LRG×ELG cross tracer, Jeffreys-marginalized nuisances and the
Boltzmann-grade solver-emulator cosmology — is evaluated with the walker axis
sharded over the 8-device virtual CPU mesh (``jax.sharding.NamedSharding``),
and must match the unsharded evaluation to float64 round-off.  Sharding bugs
love the likelihood's gather/scatter patterns (the flatten gather at
likelihood/likelihood.py and the PG ``at[...].set`` rows), which only this
config exercises at production fidelity.

The reference's only distributed axis is MPI process-per-chain
(/root/reference/eftpipe/tools.py:24-25); the walker mesh is its TPU-native
replacement (SURVEY.md §2.5).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from pathlib import Path

from eftpipe_tpu.compat import convert_cobaya_config

REF = Path("/root/reference")
YAML = REF / ("cobaya/yamls/DR16_noric_LEX_NS_LP024_kmax0.20_EQ02_kmax0.20_"
              "XP024_kmax0.20_xnost.yaml")

pytestmark = pytest.mark.skipif(not YAML.exists(),
                                reason="reference production yaml missing")


@pytest.fixture(scope="module")
def production_analysis(tmp_path_factory):
    from eftpipe_tpu.boltzmann.emulator import DEFAULT_PK_ARTIFACT
    from eftpipe_tpu.api.orchestrate import Analysis

    if not DEFAULT_PK_ARTIFACT.exists():
        pytest.skip("trained pk emulator artifact missing")
    tmp = tmp_path_factory.mktemp("mesh_prod")
    info = convert_cobaya_config(
        YAML, data_root=REF / "cobaya",
        boltzmann={"name": "solver_emulator", "use_cb": True,
                   "om_fid": 0.307115},
        cache_dir=tmp / "cache",
    )
    # NGC block only; lighter window quadrature (fidelity is irrelevant here:
    # both evaluation paths share the same Phase-A operators)
    info["likelihood"] = {"LEX_NGC": info["likelihood"]["LEX_NGC"]}
    keep = set(info["likelihood"]["LEX_NGC"]["tracers"]) | {"default"}
    info["theory"]["tracers"] = {
        t: cfg for t, cfg in info["theory"]["tracers"].items() if t in keep
    }
    for t, tcfg in info["theory"]["tracers"].items():
        win = tcfg.get("with_window")
        if isinstance(win, dict):
            win.pop("window_fourier_file", None)
            win["accboost"] = 1
            win["nmax"] = 512
    # float64: the sharded==unsharded gate below is at round-off level
    return Analysis.from_config(info, dtype=jnp.float64)


@pytest.mark.slow
def test_sharded_production_logp_matches_unsharded(production_analysis):
    from eftpipe_tpu.parallel.mesh import walker_mesh, shard_walkers

    an = production_analysis
    assert an.likes["LEX_NGC"].jeffreys is True  # full production features
    assert an.bases["X_NGC"].cross_prefix == ["LRG_NGC_", "ELG_NGC_"]

    theta0 = np.asarray(an.space.theta0(), np.float64)
    rng = np.random.default_rng(11)
    thetas = theta0[None, :] * (
        1.0 + 1e-3 * rng.standard_normal((16, theta0.size)))
    thetas = jnp.asarray(thetas, jnp.float64)

    logp_v = jax.jit(jax.vmap(an.logp))
    plain = np.asarray(logp_v(thetas), np.float64)
    assert np.all(np.isfinite(plain))

    mesh = walker_mesh(jax.devices()[:8])
    sharded_in = shard_walkers(thetas, mesh)
    sharded = np.asarray(logp_v(sharded_in), np.float64)

    # VERDICT done-criterion: sharded == unsharded at 1e-12 for the
    # production config (|logp| ~ 1e2, so this is relative round-off)
    np.testing.assert_allclose(sharded, plain, rtol=0, atol=1e-12 * np.max(
        np.abs(plain)))


@pytest.mark.slow
def test_sharded_production_mcmc_steps(production_analysis, tmp_path):
    """run_mcmc(mesh=...) drives the production posterior with the ensemble
    sharded over the mesh: same keys => the sharded chain matches the
    unsharded one at round-off (the stretch move's cross-half partner
    gathers become collectives under sharding)."""
    from eftpipe_tpu.parallel.mesh import walker_mesh

    an = production_analysis
    mesh = walker_mesh(jax.devices()[:8])
    kw = dict(nwalkers=16, rhat_tol=-1.0, max_steps=4, block=2,
              with_derived=False, init="ball")
    plain = an.run_mcmc(**kw)
    shard = an.run_mcmc(**kw, mesh=mesh)
    scale = np.max(np.abs(plain.logps))
    np.testing.assert_allclose(shard.chain, plain.chain, atol=1e-12)
    np.testing.assert_allclose(shard.logps, plain.logps,
                               atol=1e-12 * scale)
    assert np.all(np.isfinite(shard.logps))
