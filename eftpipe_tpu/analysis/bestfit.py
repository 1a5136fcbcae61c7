"""Bestfit theory reconstruction — the ``BestfitModel`` analogue
(/root/reference/eftpipe/analysis.py:726-880).

Given a built :class:`~eftpipe_tpu.api.orchestrate.Analysis` and a chain (or
an explicit parameter point), reconstructs the *full* (un-marginalized)
bestfit model: the analytically-marginalized gaussian EFT parameters are
restored from their conditional bestfit b_G = F2⁻¹F1 (marginal.py analogue of
reference marginal.py:155-165, surfaced through the likelihood's
``bg_bestfit`` output), and theory multipoles are evaluated per tracer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import dataclass, field
from typing import Any, Mapping

from .multipole import Multipole


@dataclass
class BestfitModel:
    analysis: Any                       # api.orchestrate.Analysis
    theta: np.ndarray                   # bestfit sampled vector
    params: dict = field(init=False)    # full named params incl. restored bG

    @classmethod
    def from_chains(cls, analysis, chains) -> "BestfitModel":
        """Bestfit point from a ChainProducts (global fullchi2 rule when
        available, analysis.py:425-445).  Burn-in is applied where the chains
        are loaded (``ChainProducts.from_prefix(burn_in=...)``), not here."""
        best = chains.global_bestfit()
        theta = np.array([best[p] for p in analysis.space.sampled])
        return cls(analysis=analysis, theta=theta)

    def __post_init__(self):
        space = self.analysis.space
        self.params = dict(space.fixed)
        for i, p in enumerate(space.sampled):
            self.params[p] = float(self.theta[i])
        likes = getattr(self.analysis, "likes", None) or (
            {"like": self.analysis.like} if self.analysis.like is not None else {}
        )
        if any(lk.marginal is not None for lk in likes.values()):
            # restore the marginalized parameters: bG = F2⁻¹ F1 (per block)
            res = jax.jit(self.analysis.loglike)(jnp.asarray(self.theta))
            blocks = res.get("blocks", {"like": res})
            for name, lk in likes.items():
                if lk.marginal is None:
                    continue
                bg = np.asarray(blocks[name]["bg_bestfit"])
                for pname, value in zip(lk.marginal.names, bg):
                    self.params[pname] = float(value)

    # -- evaluation -----------------------------------------------------------
    def multipoles(self, tracer: str, chained: bool = False,
                   binned: bool = False, kout=None) -> Multipole:
        ls, k, plk = self.analysis.nonlinear_Plk_grid(
            tracer, self.params, chained=chained, binned=binned, kout=kout
        )
        return Multipole.from_arrays(np.asarray(k), np.asarray(plk), ls)

    def interpolator(self, tracer: str, chained: bool = False):
        return self.analysis.nonlinear_Plk_interpolator(
            tracer, self.params, chained=chained
        )

    def chi2(self) -> dict:
        res = jax.jit(self.analysis.loglike)(jnp.asarray(self.theta))
        return {
            k: float(v)
            for k, v in res.items()
            if not isinstance(v, dict) and np.ndim(v) == 0
        }

    def eft_params(self, tracer: str) -> dict:
        return self.analysis.eft_params_values_dict(tracer, self.params)

    # -- synthetic data / covariance (reference bestfit_reader /
    #    bestfit_cov_reader, reader.py:132-195) -------------------------------
    def write_data(self, tracer: str, path, kout, binned: bool = True):
        """Theory multipoles at the bestfit written as a data file."""
        mp = self.multipoles(tracer, binned=binned, kout=kout if binned else None)
        cols = [np.asarray(kout)] + [mp(ell) for ell in mp.ells]
        header = "k " + " ".join(f"P{ell}" for ell in mp.ells)
        np.savetxt(path, np.column_stack(cols), header=header)
        return mp

    def gaussian_covariance(self, tracer: str, kout, volume: float,
                            shot: float = 0.0, ells=None) -> np.ndarray:
        """Analytic Gaussian covariance around the bestfit theory (the
        bestfit_cov_reader pattern: unwindowed multipoles + shot noise fed to
        GaussianCovariance)."""
        from ..likelihood.covariance import GaussianCovariance, Multipole as CovMultipole

        kout = np.asarray(kout)
        mp = self.multipoles(tracer, binned=True, kout=kout)
        ells = list(ells or mp.ells)
        dk = kout[1] - kout[0]
        kedges = np.concatenate([kout - dk / 2.0, [kout[-1] + dk / 2.0]])
        gcov = GaussianCovariance(kedges, volume=volume)
        cmp = CovMultipole(
            p0=mp(0) + shot,
            p2=mp(2) if 2 in mp.ells else np.zeros_like(kout),
            p4=mp(4) if 4 in mp.ells else None,
        )
        return gcov(ells, ells, "aa->aaaa", cmp)
