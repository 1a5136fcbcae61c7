"""IR-resummation Q coefficients as Chebyshev tensors (see tools/generate_qcoef.py).

The bulk coefficients Q^{ll'}_{||N-j}(n, α, f) are polynomials in the growth
rate f; here they are dense Chebyshev-coefficient tensors so that the
per-evaluation ``makeQ`` (reference pybird.py:1367-1380, a 4-deep Python loop
over ~4400 lambdas) becomes one einsum — jit/vmap-friendly and batched over
walkers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from functools import lru_cache
from importlib import resources


@lru_cache(maxsize=None)
def load_qcoef(nir: int) -> tuple[np.ndarray, float]:
    """Return (coef[2, nl, nl, nn, deg+1], fmax) for NIR ∈ {8, 16}."""
    if nir not in (8, 16):
        raise NotImplementedError(f"NIR={nir} not available (reference supports 8 and 16)")
    ref = resources.files("eftpipe_tpu.tables") / "data" / f"qcoef_nir{nir}.npz"
    with resources.as_file(ref) as path:
        data = np.load(path)
        return data["coef"], float(data["fmax"])


def chebyshev_t_vector(x, deg: int):
    """[T_0(x), ..., T_deg(x)] for traced scalar/batched x, stacked on axis -1."""
    t0 = jnp.ones_like(x)
    t1 = x
    ts = [t0, t1]
    for _ in range(deg - 1):
        ts.append(2.0 * x * ts[-1] - ts[-2])
    return jnp.stack(ts[: deg + 1], axis=-1)


def make_q(coef: jnp.ndarray, fmax: float, f):
    """Q[a, l, l', u] as a function of traced growth rate f.

    ``f`` may carry leading batch axes; the result gains them in front.
    """
    u = 2.0 * f / fmax - 1.0
    t = chebyshev_t_vector(u, coef.shape[-1] - 1)  # (..., deg+1)
    return jnp.einsum("...d,alpud->...alpu", t, coef)
