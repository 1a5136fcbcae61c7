"""quad_form / grouped / pallas CF-contraction kernels
(ops/pallas_kernels.py): all paths must agree with the plain einsum."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.ops.pallas_kernels import (
    cf_contract_xla,
    cf_contract_grouped,
    cf_contract_pallas,
    quad_form,
)

W, N, S, BL = 12, 33, 10, 7


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    zr = jnp.asarray(rng.standard_normal((W, N, S)))
    zi = jnp.asarray(rng.standard_normal((W, N, S)))
    mr = jnp.asarray(rng.standard_normal((BL, N, N)))
    mi = jnp.asarray(rng.standard_normal((BL, N, N)))
    return zr, zi, mr, mi


def test_xla_matches_dense_quadratic_form(data):
    zr, zi, mr, mi = data
    got = np.asarray(cf_contract_xla(zr, zi, mr, mi))
    z = np.asarray(zr) + 1j * np.asarray(zi)
    m = np.asarray(mr) + 1j * np.asarray(mi)
    expected = np.einsum("wns,bnm,wms->wbs", z, m, z).real
    np.testing.assert_allclose(got, expected, rtol=1e-10)


@pytest.mark.parametrize("group", [1, 4, 5, 8, 16])
def test_grouped_matches_plain(data, group):
    zr, zi, mr, mi = data
    a = np.asarray(cf_contract_xla(zr, zi, mr, mi))
    b = np.asarray(cf_contract_grouped(zr, zi, mr, mi, group=group))
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_quad_form_vmap_dispatch(data):
    zr, zi, mr, mi = data
    # unbatched base call
    a0 = np.asarray(quad_form(zr[0], zi[0], mr, mi))
    np.testing.assert_allclose(
        a0, np.asarray(cf_contract_xla(zr[0], zi[0], mr, mi)), rtol=1e-12
    )
    # vmap triggers the grouped rule
    batched = jax.jit(jax.vmap(lambda a, b: quad_form(a, b, mr, mi)))(zr, zi)
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(cf_contract_xla(zr, zi, mr, mi)),
        rtol=1e-10,
    )


def test_quad_form_grad(data):
    """The base path stays differentiable (products use jacfwd through it)."""
    zr, zi, mr, mi = data

    def scalar(z):
        return jnp.sum(quad_form(z, zi[0], mr, mi))

    g = jax.grad(scalar)(zr[0])
    eps = 1e-6
    d = jnp.zeros_like(zr[0]).at[3, 2].set(1.0)
    fd = (scalar(zr[0] + eps * d) - scalar(zr[0] - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(g[3, 2]), float(fd), rtol=1e-5)


def test_pallas_interpret_matches_xla(data):
    zr, zi, mr, mi = data
    zr = zr.astype(jnp.float32)
    zi = zi.astype(jnp.float32)
    mr = mr.astype(jnp.float32)
    mi = mi.astype(jnp.float32)
    a = np.asarray(cf_contract_xla(zr, zi, mr, mi))
    b = np.asarray(cf_contract_pallas(zr, zi, mr, mi, tile_bl=8, interpret=True))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-3 * np.abs(a).max())


def test_qf_real_pallas_interpret_matches_xla():
    """The fused folded-real kernel (the production CF/P22 contraction when
    EFTPIPE_TPU_PALLAS is on) against the XLA einsum pair, including a
    non-multiple bl (tile padding) and non-128 lane count."""
    from eftpipe_tpu.ops.pallas_kernels import (
        qf_real_grouped, qf_real_pallas, qf_real_xla,
    )

    rng = np.random.default_rng(5)
    nw, n, s, bl, g = 8, 33, 20, 11, 4
    w = jnp.asarray(rng.standard_normal((nw, n, s)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((bl, n, n)), jnp.float32)
    m = m + jnp.swapaxes(m, -1, -2)
    wg = jnp.swapaxes(
        w.reshape(nw // g, g, n, s), 1, 2).reshape(nw // g, n, g * s)
    a = np.asarray(qf_real_xla(wg, m))
    b = np.asarray(qf_real_pallas(wg, m, tile_bl=8, interpret=True))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-3 * np.abs(a).max())
    # the grouped wrapper round-trips the walker axis identically either way
    c = np.asarray(qf_real_grouped(w, m, group=g, use_pallas=False))
    d = np.asarray(jax.vmap(lambda wi: qf_real_xla(wi, m))(w))
    np.testing.assert_allclose(c, d, rtol=2e-4, atol=2e-3 * np.abs(d).max())
