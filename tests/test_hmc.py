"""On-device HMC (parallel/hmc.py): adaptation and correctness on analytic
posteriors, plus a smoke test on the differentiable EFT posterior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.parallel.hmc import HMC
from eftpipe_tpu.parallel.diagnostics import gelman_rubin

MEAN = jnp.array([1.0, -2.0, 0.5])
SIGMA = jnp.array([0.3, 0.7, 1.5])


def logp(theta):
    return -0.5 * jnp.sum(((theta - MEAN) / SIGMA) ** 2)


def test_hmc_recovers_gaussian_moments():
    hmc = HMC(logp=logp, ndim=3, n_leapfrog=12)
    q0 = jnp.zeros((16, 3)) + 0.1
    chain, logps, info = hmc.sample(0, q0, n_warmup=400, n_samples=800)
    assert chain.shape == (800, 16, 3)
    # adaptation hits the target acceptance band
    assert 0.6 < info["accept"] <= 1.0
    flat = chain[200:].reshape(-1, 3)
    # tolerance ~ a few MC standard errors of the autocorrelated chain
    np.testing.assert_allclose(flat.mean(0), np.asarray(MEAN),
                               atol=0.15 * float(np.max(SIGMA)))
    np.testing.assert_allclose(flat.std(0), np.asarray(SIGMA), rtol=0.2)
    # the adapted metric tracks the target variances: inv_mass (= M⁻¹, the
    # Stan "metric") ≈ posterior variance, so leapfrog displacements scale
    # with each direction's width (Δq ~ eps·sqrt(inv_mass))
    ratio = info["inv_mass"] / np.asarray(SIGMA) ** 2
    assert np.all(ratio > 0.3) and np.all(ratio < 3.0)
    r = gelman_rubin(chain)
    assert np.max(r - 1.0) < 0.05


def test_hmc_correlated_gaussian():
    cov = jnp.asarray([[1.0, 0.85], [0.85, 1.0]])
    prec = jnp.linalg.inv(cov)

    def lp(theta):
        return -0.5 * theta @ prec @ theta

    hmc = HMC(logp=lp, ndim=2, n_leapfrog=24)
    chain, _, info = hmc.sample(1, jnp.zeros((8, 2)), n_warmup=400,
                                n_samples=1200)
    flat = chain[300:].reshape(-1, 2)
    emp = np.cov(flat.T)
    np.testing.assert_allclose(emp, np.asarray(cov), atol=0.15)


def test_hmc_handles_nan_rejection():
    """Leapfrog divergence (NaN energy) must reject, not propagate."""

    def lp(theta):
        return jnp.where(jnp.all(jnp.abs(theta) < 5.0),
                         -0.5 * jnp.sum(theta**2),
                         jnp.nan)

    hmc = HMC(logp=lp, ndim=2, n_leapfrog=8)
    chain, logps, info = hmc.sample(2, jnp.zeros((4, 2)), n_warmup=100,
                                    n_samples=200)
    assert np.all(np.isfinite(chain))
    assert np.all(np.isfinite(logps))


@pytest.mark.slow
def test_hmc_on_flagship_template(tmp_path):
    """Gradient-based sampling through the full EFT posterior."""
    from eftpipe_tpu.api.orchestrate import Analysis
    from eftpipe_tpu.boltzmann.eh98 import eh98_pk

    k = np.logspace(-5, 0, 200)
    pk = np.asarray(eh98_pk(jnp.asarray(k), 0.02237, 0.12, 0.6777, 3.044,
                            0.9649, 0.7)[0])
    np.savetxt(tmp_path / "plin.txt", np.column_stack([k, pk]))
    cfg = {
        "theory": {"tracers": {"LRG": {
            "z": 0.7, "nd": 5e-5, "ls": [0, 2], "with_IRresum": True,
            "boltzmann": {"name": "fixed_template", "path": str(tmp_path / "plin.txt")},
        }}},
        "params": {
            "f": {"prior": {"min": 0.4, "max": 1.2}, "ref": 0.8},
            "LRG_b1": {"prior": {"min": 1.0, "max": 4.0}, "ref": 2.2},
            "LRG_b2": 0.8, "LRG_b4": 0.8,
        },
    }
    th = Analysis.from_config(cfg)
    kout = np.arange(0.015, 0.2049, 0.01)
    fid = {"f": 0.8, "LRG_b1": 2.2}
    ls, keff, plk = jax.jit(
        lambda: th.nonlinear_Plk_grid("LRG", fid, binned=True, kout=kout)
    )()
    np.savetxt(tmp_path / "data.txt",
               np.column_stack([kout, np.asarray(plk[0]), np.asarray(plk[1])]),
               header="k P0 P2")
    sig = 0.02 * np.abs(np.asarray(plk).reshape(-1))
    np.savetxt(tmp_path / "cov.txt", np.diag(sig**2))
    cfg["likelihood"] = {
        "tracers": ["LRG"],
        "data": {"LRG": {"path": str(tmp_path / "data.txt"), "ls": [0, 2],
                         "kmin": 0.02, "kmax": 0.2}},
        "cov": str(tmp_path / "cov.txt"),
        "binned": True,
    }
    an = Analysis.from_config(cfg)
    hmc = HMC(logp=an.logp, ndim=2, n_leapfrog=8)
    q0 = jnp.asarray(np.tile(an.space.theta0(), (4, 1)))
    chain, logps, info = hmc.sample(3, q0, n_warmup=60, n_samples=60)
    assert np.all(np.isfinite(logps))
    flat = chain[20:].reshape(-1, 2)
    # posterior concentrates near the generating point
    assert abs(flat[:, 0].mean() - 0.8) < 0.1
    assert abs(flat[:, 1].mean() - 2.2) < 0.1
