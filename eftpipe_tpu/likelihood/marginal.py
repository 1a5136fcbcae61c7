"""Analytic marginalization over linearly-entering EFT parameters.

jnp re-implementation of /root/reference/eftpipe/marginal.py:31-232:

    F2_ij = PG_i C⁻¹ PG_j + Σ⁻¹_ij
    F1_i  = -PG_i C⁻¹ (PNG - D) + Σ⁻¹_ij µ_j
    F0    = (PNG - D) C⁻¹ (PNG - D) + µ Σ⁻¹ µ
    -2 ln P = -F1 F2⁻¹ F1 + F0 + ln det(F2 / 2π)   (logdet dropped for Jeffreys)

Prior locations/scales may be floats, callables of the EFT parameter dict, or
strings that eval to such callables (the reference's ``eval_callable``
pattern, marginal.py:13-19) — all evaluated with traced values inside jit.
Everything is batched-friendly: under vmap the solves/slogdets become batched
(nmarg × nmarg) linear algebra.
"""

from __future__ import annotations

import inspect
import numpy as np
import jax.numpy as jnp
from dataclasses import dataclass
from typing import Any, Callable, Mapping


def _compile_prior_entry(x) -> Callable[[Mapping], Any] | float:
    if x is None:
        return 0.0
    if isinstance(x, str):
        # prior loc/scale strings are code (the reference's eval_callable
        # pattern); parsed against an AST whitelist (arithmetic + np/jnp
        # calls only) instead of eval'd — see utils/safe_expr.py
        from ..utils.safe_expr import safe_eval_expr

        fn = safe_eval_expr(x)
        argnames = inspect.getfullargspec(fn).args
        return lambda params: fn(*(params[a] for a in argnames))
    if callable(x):
        return x
    return float(x)


@dataclass
class MarginalSetup:
    """Ordered prior over the marginalized (gaussian) parameters."""

    names: list[str]
    locs: list[Any]
    scales: list[Any]
    jeffreys: bool = False

    @classmethod
    def from_config(cls, prior: Mapping[str, Mapping | None], ordering: list[str],
                    jeffreys: bool = False) -> "MarginalSetup":
        """``prior`` maps param name -> {loc, scale}; sorted by ``ordering``
        (marginal.py:198-232)."""
        for name in prior:
            if name not in ordering:
                raise ValueError(f"parameter {name!r} is not marginalizable")
        items = sorted(prior.items(), key=lambda kv: ordering.index(kv[0]))
        names, locs, scales = [], [], []
        for name, cfgd in items:
            cfgd = cfgd or {}
            loc = cfgd.get("loc")
            scale = cfgd.get("scale")
            if scale is None or scale == np.inf:
                scale = np.inf
            names.append(name)
            locs.append(_compile_prior_entry(loc))
            scales.append(scale if scale == np.inf else _compile_prior_entry(scale))
        return cls(names=names, locs=locs, scales=scales, jeffreys=jeffreys)

    @property
    def nmarg(self) -> int:
        return len(self.names)

    def mu_sigma_inv(self, params: Mapping):
        """(µ_G, Σ⁻¹) with traced parameter values (marginal.py:60-77)."""
        mu = jnp.stack(
            [loc(params) if callable(loc) else jnp.asarray(loc, jnp.result_type(float))
             for loc in self.locs]
        )
        # reference parity (marginal.py:69-77): a single infinite scale zeroes
        # the ENTIRE prior matrix — any mix of finite/infinite is accepted
        if any(s is np.inf or (isinstance(s, float) and np.isinf(s)) for s in self.scales):
            sigma_inv = jnp.zeros((self.nmarg, self.nmarg), mu.dtype)
        else:
            inv = jnp.stack(
                [1.0 / (s(params) if callable(s) else jnp.asarray(s, mu.dtype)) ** 2
                 for s in self.scales]
            )
            sigma_inv = jnp.diag(inv)
        return mu, sigma_inv


def _f2_f1_f0(pg, png, invcov, data, mu, sigma_inv):
    res = png - data
    pgc = pg @ invcov  # (nmarg, ndata)
    f2 = pgc @ pg.T + sigma_inv
    f1 = -pgc @ res + sigma_inv @ mu
    f0 = res @ invcov @ res + mu @ sigma_inv @ mu
    return f2, f1, f0


def marginalized_logp(pg, png, invcov, data, mu, sigma_inv, jeffreys: bool = False):
    """Marginalized log-posterior (marginal.py:79-127).

    Returns (logp, fullchi2, bg_best): the chi² at the analytic best-fit
    nuisance values and those values themselves come for free.
    """
    f2, f1, f0 = _f2_f1_f0(pg, png, invcov, data, mu, sigma_inv)
    sign, logdet = jnp.linalg.slogdet(f2 / (2.0 * jnp.pi))
    bg_best = jnp.linalg.solve(f2, f1)
    chi2 = -f1 @ bg_best + f0
    if not jeffreys:
        chi2 = chi2 + logdet
    res_full = bg_best @ pg + png - data
    fullchi2 = res_full @ invcov @ res_full
    # the reference raises on a non-positive-definite F2 (marginal.py:110-116);
    # under jit we instead return -inf so a degenerate PG matrix rejects the
    # walker instead of poisoning the chain with silent NaNs.  The isfinite
    # clause catches the near-singular case where rounding leaves sign > 0
    # but the solve already produced inf/NaN.
    logp = jnp.where((sign > 0) & jnp.isfinite(chi2), -0.5 * chi2, -jnp.inf)
    return logp, fullchi2, bg_best


def bg_bestfit(pg, png, invcov, data, mu, sigma_inv):
    """Analytic best-fit of the marginalized parameters (marginal.py:155-165)."""
    f2, f1, _ = _f2_f1_f0(pg, png, invcov, data, mu, sigma_inv)
    return jnp.linalg.solve(f2, f1)
