import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eftpipe_tpu.api.flagship import build_flagship
from eftpipe_tpu.parallel.sampler import EnsembleSampler
from eftpipe_tpu.parallel.mesh import walker_mesh, shard_walkers, chunked_vmap


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    workdir = tmp_path_factory.mktemp("flagship")
    return build_flagship(workdir, dtype=jnp.float64, with_window=False)


def test_logp_finite_and_peaked_at_fiducial(model):
    logp = jax.jit(model.logp)
    theta0 = jnp.asarray(model.theta0)
    lp0 = float(logp(theta0))
    assert np.isfinite(lp0)
    # mock data was generated at the fiducial point: moving away must not
    # improve the posterior (marginalized params shift the peak only slightly)
    lp_off = float(logp(theta0 * 1.05))
    assert lp0 > lp_off


def test_logp_vmap_and_grad(model):
    theta0 = jnp.asarray(model.theta0)
    thetas = jnp.stack([theta0, theta0 * 1.01, theta0 * 0.99])
    lps = jax.jit(jax.vmap(model.logp))(thetas)
    assert np.isfinite(np.asarray(lps)).all()
    g = jax.grad(model.logp)(theta0)
    assert np.isfinite(np.asarray(g)).all()


def test_chunked_vmap_matches_vmap(model):
    theta0 = jnp.asarray(model.theta0)
    rng = np.random.default_rng(0)
    thetas = jnp.asarray(
        model.theta0[None, :] * (1 + 1e-3 * rng.standard_normal((8, model.theta0.size)))
    )
    a = jax.vmap(model.logp)(thetas)
    b = chunked_vmap(model.logp, 4)(thetas)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_ensemble_sampler_runs_and_moves(model):
    sampler = EnsembleSampler(logp=model.logp, nwalkers=8, ndim=model.theta0.size)
    key = jax.random.PRNGKey(1)
    x0 = sampler.init(key, jnp.asarray(model.theta0), scale=1e-3)
    chain, logps, acc = sampler.run(jax.random.PRNGKey(2), x0, nsteps=5)
    assert chain.shape == (5, 8, model.theta0.size)
    assert np.isfinite(np.asarray(logps)).all()
    assert 0.0 < float(acc) <= 1.0


def test_sharded_ensemble_matches_single_device(model):
    mesh = walker_mesh()
    n = len(jax.devices())
    nwalkers = 2 * n
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(
        model.theta0[None, :] * (1 + 1e-3 * rng.standard_normal((nwalkers, model.theta0.size)))
    )
    logp_v = jax.vmap(model.logp)
    lp_plain = jax.jit(logp_v)(x0)
    x0_sharded = shard_walkers(x0, mesh)
    lp_sharded = jax.jit(logp_v)(x0_sharded)
    np.testing.assert_allclose(np.asarray(lp_plain), np.asarray(lp_sharded), rtol=1e-10)
