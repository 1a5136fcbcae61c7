"""Theory products: the analogue of the reference's provider outputs.

The reference exposes per-tracer products through Cobaya
(/root/reference/eftpipe/theory.py:244-267, 773-799):

* ``nonlinear_Plk_grid``      — (ls, kgrid, plk) on the internal/binned grid
* ``nonlinear_Plk_interpolator`` — cubic interpolator in k·P (theory.py:75-106)
* ``nonlinear_Plk_gaussian_grid`` — ∂P/∂(gaussian param) tables
* ``snapshots``               — intermediate bird states per pipeline stage
* ``bird_component``          — (Plin, Ploop, Pct, Pst, Picc) split

Here the same products are plain functions of (pipeline, basis, params).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.config import EFTConfig
from ..ops.interp import spline_matrix


class PlkInterpolator:
    """Cubic interpolator of multipoles, built on k·P with a (0, 0) point
    prepended (reference theory.py:75-106).

    Parameters
    ----------
    ls : the multipoles the grid rows correspond to
    kgrid : (nk,) grid the theory was evaluated on
    plk : (..., nl, nk) multipole array
    """

    def __init__(self, ls, kgrid, plk):
        self.ls = list(ls)
        self._row = {ell: i for i, ell in enumerate(self.ls)}
        self.kgrid = np.asarray(kgrid)
        self.plk = plk
        self._kp = np.concatenate([[0.0], self.kgrid])

    def __call__(self, ell, k):
        """P_ell(k); ell may be an int or a list of ints."""
        ells = [ell] if isinstance(ell, int) else list(ell)
        for l in ells:
            if l not in self._row:
                raise ValueError(f"ell={l} not available (have {self.ls})")
        k = jnp.atleast_1d(jnp.asarray(k))
        mat = jnp.asarray(spline_matrix(self._kp, np.asarray(k)), self.plk.dtype)
        rows = jnp.asarray([self._row[l] for l in ells])
        kp = jnp.concatenate(
            [jnp.zeros(self.plk.shape[:-1] + (1,), self.plk.dtype),
             self.plk * jnp.asarray(self.kgrid, self.plk.dtype)],
            axis=-1,
        )
        out = (kp[..., rows, :] @ mat.T) / k
        return out[..., 0, :] if isinstance(ell, int) else out


def plk_grid(pipeline, basis, inputs, params, chained=False, binning=None):
    """(ls, kgrid, plk): the ``nonlinear_Plk_grid`` product."""
    bird = pipeline.compute_bird(inputs)
    ls, kret, product = pipeline.product(bird, chained=chained, binning=binning)
    plk = basis.reduce_plk(pipeline.cfg, product, params).sum()
    return ls, kret, plk


def plk_interpolator(pipeline, basis, inputs, params, chained=False):
    ls, kret, plk = plk_grid(pipeline, basis, inputs, params, chained=chained)
    return PlkInterpolator(ls, kret, plk)


def plk_gaussian_grid(pipeline, basis, inputs, params, chained=False,
                      binning=None, requires=None):
    """name → (..., nl, nk) table of ∂P/∂(gaussian param)."""
    bird = pipeline.compute_bird(inputs)
    ls, kret, product = pipeline.product(bird, chained=chained, binning=binning)
    table = basis.gaussian_table(pipeline.cfg, product, params, requires=requires)
    return ls, kret, table


def bird_component(pipeline, basis, inputs, params, chained=False, binning=None):
    """The (Plin, Ploop, Pct, Pst, Picc) split (parambasis.py:30-39)."""
    bird = pipeline.compute_bird(inputs)
    ls, kret, product = pipeline.product(bird, chained=chained, binning=binning)
    return ls, kret, basis.reduce_plk(pipeline.cfg, product, params)


def snapshots(pipeline, inputs):
    """Intermediate bird states per stage (reference BirdSnapshot,
    pybird.py:616-632)."""
    return pipeline.compute_bird(inputs, with_snapshots=True)[1]
