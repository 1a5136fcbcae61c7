"""MCMC driver + convergence diagnostics, on a cheap analytic posterior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eftpipe_tpu.parallel.diagnostics import (
    gelman_rubin,
    integrated_autocorr_time,
    effective_sample_size,
)
from eftpipe_tpu.parallel.mcmc import MCMCDriver

MEAN = jnp.array([1.0, -2.0, 0.5])
SIGMA = jnp.array([0.3, 0.7, 1.1])


def logp(theta):
    return -0.5 * jnp.sum(((theta - MEAN) / SIGMA) ** 2)


def test_gelman_rubin_iid_converges():
    rng = np.random.default_rng(0)
    chain = rng.standard_normal((400, 16, 3))
    r = gelman_rubin(chain)
    assert r.shape == (3,)
    assert np.all(r - 1.0 < 0.05)


def test_gelman_rubin_detects_disagreement():
    rng = np.random.default_rng(1)
    chain = rng.standard_normal((400, 16, 2))
    chain[:, :8, 0] += 10.0  # half the walkers sit elsewhere
    r = gelman_rubin(chain)
    assert r[0] - 1.0 > 0.5
    assert r[1] - 1.0 < 0.05


def test_autocorr_time_and_ess():
    rng = np.random.default_rng(2)
    # AR(1) with known tau = (1+rho)/(1-rho)
    rho = 0.8
    n, nw = 4000, 8
    x = np.zeros((n, nw, 1))
    eps = rng.standard_normal((n, nw, 1))
    for i in range(1, n):
        x[i] = rho * x[i - 1] + eps[i]
    tau = integrated_autocorr_time(x)
    expected = (1 + rho) / (1 - rho)  # = 9
    assert 0.5 * expected < tau[0] < 1.6 * expected
    ess = effective_sample_size(x)
    assert ess[0] == pytest.approx(n * nw / tau[0])


def test_driver_converges_and_recovers_moments(tmp_path):
    driver = MCMCDriver(
        logp=logp, ndim=3, nwalkers=64, rhat_tol=0.03, block=200,
        out=tmp_path / "chain", param_names=["a", "b", "c"],
    )
    res = driver.run(key=0, x0=np.zeros(3), max_steps=4000)
    assert res.converged
    flat = res.flat(burn_frac=0.5)
    np.testing.assert_allclose(flat.mean(axis=0), np.asarray(MEAN), atol=0.12)
    np.testing.assert_allclose(flat.std(axis=0), np.asarray(SIGMA), rtol=0.25)
    assert 0.1 < res.accept_rate < 0.9
    # chain files
    assert (tmp_path / "chain.1.txt").exists()
    assert (tmp_path / "chain.paramnames").exists()
    cols = np.loadtxt(tmp_path / "chain.1.txt")
    assert cols.shape[1] == 2 + 3  # weight, -logpost, params
    np.testing.assert_allclose(cols[:, 0], 1.0)


def test_driver_checkpoint_resume(tmp_path):
    kw = dict(logp=logp, ndim=3, nwalkers=32, rhat_tol=-1.0, block=50,
              out=tmp_path / "c")
    d1 = MCMCDriver(**kw)
    res1 = d1.run(key=7, x0=np.zeros(3), max_steps=100)
    assert res1.chain.shape[0] == 100

    # resume continues from the checkpoint instead of restarting
    d2 = MCMCDriver(**kw)
    res2 = d2.run(key=7, x0=np.zeros(3), max_steps=200, resume=True)
    assert res2.chain.shape[0] == 200
    np.testing.assert_array_equal(res2.chain[:100], res1.chain)

    # fresh run ignores the checkpoint
    d3 = MCMCDriver(**kw)
    res3 = d3.run(key=7, x0=np.zeros(3), max_steps=100, resume=False)
    assert res3.chain.shape[0] == 100


def test_driver_derived_columns(tmp_path):
    driver = MCMCDriver(
        logp=logp, ndim=3, nwalkers=32, rhat_tol=-1.0, block=40,
        out=tmp_path / "d", param_names=["a", "b", "c"],
        derived_names=["asq"], derived_fn=lambda t: jnp.array([t[0] ** 2]),
    )
    res = driver.run(key=1, x0=np.zeros(3), max_steps=40)
    cols = np.loadtxt(tmp_path / "d.1.txt")
    assert cols.shape[1] == 2 + 3 + 1
    np.testing.assert_allclose(cols[:, -1], cols[:, 2] ** 2, rtol=1e-6)
    names = [l.split()[0] for l in open(tmp_path / "d.paramnames")]
    assert names == ["a", "b", "c", "asq*"]


def test_driver_hmc_converges_and_checkpoints(tmp_path):
    """sampler_kind="hmc" drives parallel/hmc.py through the same blocked
    checkpoint/R̂ machinery; the adapted (eps, inv_mass) ride the checkpoint
    so a resume skips re-warmup (VERDICT r3 item 4)."""
    kw = dict(
        logp=logp, ndim=3, nwalkers=16, rhat_tol=0.01, block=100,
        out=tmp_path / "h", sampler_kind="hmc", n_leapfrog=8,
        warmup_steps=100, inv_mass0=np.asarray(SIGMA) ** 2,
    )
    driver = MCMCDriver(**kw)
    res = driver.run(key=3, x0=np.zeros(3), max_steps=600)
    assert res.converged
    flat = res.flat(burn_frac=0.5)
    np.testing.assert_allclose(flat.mean(axis=0), np.asarray(MEAN), atol=0.1)
    np.testing.assert_allclose(flat.std(axis=0), np.asarray(SIGMA), rtol=0.25)
    # split-R̂ < 1.01: the production criterion HMC makes reachable in short
    # chains (the stretch move's ~40-step autocorrelation cannot)
    assert np.max(res.rminus1) < 0.01
    # the tuned step size is checkpointed and restored on resume
    eps = driver.sampler.eps
    assert eps is not None and float(eps) > 0
    d2 = MCMCDriver(**kw)
    d2.run(key=3, x0=np.zeros(3), max_steps=600, resume=True)
    np.testing.assert_allclose(np.asarray(d2.sampler.eps), np.asarray(eps))


def test_driver_mesh_sharded_matches_unsharded(tmp_path):
    """mesh= shards the walker axis; same keys => identical chains (f64 CPU
    mesh: the sharded program is the same math, so equality is exact up to
    reduction order)."""
    from eftpipe_tpu.parallel.mesh import walker_mesh

    mesh = walker_mesh(jax.devices()[:8])
    kw = dict(logp=logp, ndim=3, nwalkers=32, rhat_tol=-1.0, block=50)
    plain = MCMCDriver(**kw).run(key=5, x0=np.zeros(3), max_steps=100)
    shard = MCMCDriver(**kw, mesh=mesh).run(key=5, x0=np.zeros(3), max_steps=100)
    np.testing.assert_allclose(shard.chain, plain.chain, atol=1e-12)
    np.testing.assert_allclose(shard.logps, plain.logps, atol=1e-12)

    # HMC chains shard the same way.  NOT bitwise: the warmup's cross-walker
    # variance estimate is a cross-device reduction under sharding, so the
    # summation order differs at round-off and the chaotic leapfrog
    # amplifies it — observed ~3e-9 max over 80 steps on the f64 mesh.
    hkw = dict(logp=logp, ndim=3, nwalkers=16, rhat_tol=-1.0, block=40,
               sampler_kind="hmc", n_leapfrog=6, warmup_steps=40)
    hp = MCMCDriver(**hkw).run(key=6, x0=np.zeros(3), max_steps=80)
    hs = MCMCDriver(**hkw, mesh=mesh).run(key=6, x0=np.zeros(3), max_steps=80)
    np.testing.assert_allclose(hs.chain, hp.chain, atol=1e-6)
    assert np.all(np.isfinite(hs.logps))
