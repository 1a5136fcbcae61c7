"""Split-complex helpers.

TPUs have no complex128 (and complex64 hurts precision), so the jitted graph
carries complex tensors as (real, imag) pairs of real arrays.  Constants are
split on the host; the contractions below produce either full complex results
or directly the real part (saving half the work wherever the imaginary part
is discarded — which is everywhere in the loop engine, since the final
spectra are real).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def split(x: np.ndarray):
    """Host-side: complex ndarray -> (re, im) float64 pair."""
    x = np.asarray(x)
    return np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag)


def cmul(a, b):
    """Elementwise complex product of two (re, im) pairs, with broadcasting."""
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def ceinsum(sub: str, a, b):
    """Complex einsum of two split operands -> split result."""
    ar, ai = a
    br, bi = b
    re = jnp.einsum(sub, ar, br) - jnp.einsum(sub, ai, bi)
    im = jnp.einsum(sub, ar, bi) + jnp.einsum(sub, ai, br)
    return re, im


def ceinsum_real(sub: str, a, b):
    """Real part of a complex einsum of two split operands."""
    return jnp.einsum(sub, a[0], b[0]) - jnp.einsum(sub, a[1], b[1])
