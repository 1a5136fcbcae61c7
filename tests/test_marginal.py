"""Analytic marginalization unit gates (likelihood/marginal.py): Jeffreys
prior, eval-able string priors, infinite scales, and equivalence with
explicit integration over the linear parameters."""

import numpy as np
import pytest
import jax.numpy as jnp

from eftpipe_tpu.likelihood.marginal import (
    MarginalSetup,
    marginalized_logp,
    bg_bestfit,
)


@pytest.fixture()
def problem():
    rng = np.random.default_rng(0)
    ndata, nmarg = 30, 4
    pg = jnp.asarray(rng.standard_normal((nmarg, ndata)))
    png = jnp.asarray(rng.standard_normal(ndata) * 3.0)
    data = jnp.asarray(rng.standard_normal(ndata) * 3.0)
    a = rng.standard_normal((ndata, ndata + 5))
    cov = a @ a.T + np.eye(ndata) * 5.0
    invcov = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray(rng.standard_normal(nmarg) * 0.1)
    sigma_inv = jnp.asarray(np.diag(1.0 / rng.uniform(1.0, 4.0, nmarg) ** 2))
    return pg, png, data, invcov, mu, sigma_inv


def test_marginalized_equals_brute_force_integral(problem):
    """-2 ln ∫ db exp(-χ²(b)/2 - prior) equals the closed form."""
    pg, png, data, invcov, mu, sigma_inv = problem
    logp, fullchi2, bg = marginalized_logp(pg, png, invcov, data, mu, sigma_inv)

    # brute force: chi2(b) is quadratic, integrate analytically via the
    # normalisation of the exact gaussian in b
    pg_, png_, d_, ic_ = (np.asarray(x) for x in (pg, png, data, invcov))
    mu_, si_ = np.asarray(mu), np.asarray(sigma_inv)

    def chi2_of(b):
        r = png_ + b @ pg_ - d_
        return r @ ic_ @ r + (b - mu_) @ si_ @ (b - mu_)

    # gaussian integral: ∫ db e^{-chi2(b)/2} = e^{-chi2(b*)/2} (2π)^{n/2}/sqrt(det A)
    a_mat = pg_ @ ic_ @ pg_.T + si_
    b_star = np.linalg.solve(a_mat, -(pg_ @ ic_ @ (png_ - d_)) + si_ @ mu_)
    logz = -0.5 * chi2_of(b_star) + 0.5 * len(b_star) * np.log(2 * np.pi) \
        - 0.5 * np.linalg.slogdet(a_mat)[1]
    # the reference convention drops the constant mu-independent pieces:
    # -2 logp = -F1 F2^-1 F1 + F0 + logdet(F2/2pi) == -2 logz + const(=0 here)
    np.testing.assert_allclose(float(logp), logz, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(bg), b_star, rtol=1e-8)

    # fullchi2 = chi2 at the conditional bestfit without the prior terms
    r = png_ + b_star @ pg_ - d_
    np.testing.assert_allclose(float(fullchi2), r @ ic_ @ r, rtol=1e-8)


def test_jeffreys_drops_logdet(problem):
    pg, png, data, invcov, mu, sigma_inv = problem
    lp, _, _ = marginalized_logp(pg, png, invcov, data, mu, sigma_inv)
    lp_j, _, _ = marginalized_logp(pg, png, invcov, data, mu, sigma_inv,
                                   jeffreys=True)
    f2 = np.asarray(pg) @ np.asarray(invcov) @ np.asarray(pg).T + np.asarray(sigma_inv)
    _, logdet = np.linalg.slogdet(f2 / (2 * np.pi))
    np.testing.assert_allclose(float(lp_j) - float(lp), 0.5 * logdet, rtol=1e-10)


def test_string_priors_eval_against_params():
    setup = MarginalSetup.from_config(
        {
            "b3": {"loc": "lambda b1: 0.5 * b1", "scale": 2.0},
            "cct": {"loc": 0.1, "scale": "lambda b1: b1 + 1.0"},
        },
        ordering=["b3", "cct"],
    )
    mu, sigma_inv = setup.mu_sigma_inv({"b1": jnp.asarray(2.0)})
    np.testing.assert_allclose(np.asarray(mu), [1.0, 0.1])
    np.testing.assert_allclose(np.asarray(sigma_inv),
                               np.diag([1 / 4.0, 1 / 9.0]))


def test_infinite_scale_zeroes_sigma_inv():
    setup = MarginalSetup.from_config(
        {"b3": {}, "cct": {"scale": None}}, ordering=["b3", "cct"]
    )
    mu, sigma_inv = setup.mu_sigma_inv({})
    np.testing.assert_allclose(np.asarray(sigma_inv), 0.0)
    # reference parity (marginal.py:69-77): a MIX of finite and infinite
    # scales is accepted, and any single inf zeroes the entire matrix
    setup = MarginalSetup.from_config(
        {"b3": {"scale": 2.0}, "cct": {}}, ordering=["b3", "cct"]
    )
    _, sigma_inv = setup.mu_sigma_inv({})
    np.testing.assert_allclose(np.asarray(sigma_inv), 0.0)
    with pytest.raises(ValueError, match="not marginalizable"):
        MarginalSetup.from_config({"zz": {}}, ordering=["b3"])


def test_degenerate_f2_yields_neg_inf_not_nan(problem):
    """The reference raises on slogdet sign <= 0 (marginal.py:110-116); the
    jitted path must reject the point with -inf rather than emit NaN."""
    import jax

    pg, png, data, invcov, mu, sigma_inv = problem
    # duplicate a PG row with a zero prior: F2 is exactly singular
    pg_deg = jnp.concatenate([pg, pg[:1]], axis=0)
    mu_deg = jnp.concatenate([mu, mu[:1]])
    si_deg = jnp.zeros((pg_deg.shape[0], pg_deg.shape[0]), pg.dtype)
    logp, _, _ = jax.jit(marginalized_logp)(
        pg_deg, png, invcov, data, mu_deg, si_deg
    )
    assert float(logp) == -np.inf
