import numpy as np
import jax
import jax.numpy as jnp
from scipy.interpolate import CubicSpline, interp1d

from eftpipe_tpu.ops.interp import spline_matrix, SplineTable, spline_eval


def test_spline_matrix_matches_scipy():
    x = np.geomspace(1e-3, 1.0, 40)
    xq = np.geomspace(5e-4, 2.0, 77)  # includes extrapolation on both sides
    rng = np.random.default_rng(0)
    f = np.exp(rng.normal(size=x.size)).cumsum()
    m = spline_matrix(x, xq)
    expected = CubicSpline(x, f, extrapolate=True)(xq)
    np.testing.assert_allclose(m @ f, expected, rtol=1e-11)


def test_spline_matrix_matches_interp1d_cubic():
    # interp1d(kind="cubic", fill_value="extrapolate") is the reference's
    # hot-path interpolator (window.py:376, binning.py:135)
    x = np.linspace(0.001, 0.3, 50)
    xq = np.linspace(0.0005, 0.35, 123)
    rng = np.random.default_rng(1)
    f = rng.normal(size=(4, x.size)).cumsum(axis=-1)
    m = spline_matrix(x, xq)
    expected = interp1d(x, f, axis=-1, kind="cubic", bounds_error=False, fill_value="extrapolate")(xq)
    np.testing.assert_allclose(f @ m.T, expected, rtol=1e-9, atol=1e-12)


def test_spline_eval_traced_points():
    x = np.linspace(0.001, 0.3, 50)
    rng = np.random.default_rng(2)
    f = rng.normal(size=(3, x.size)).cumsum(axis=-1)
    table = SplineTable.build(x)
    xq = np.array([0.0005, 0.0021, 0.013, 0.149, 0.2999, 0.33])

    got = jax.jit(lambda y, q: spline_eval(table, y, q))(jnp.asarray(f), jnp.asarray(xq))
    expected = interp1d(x, f, axis=-1, kind="cubic", bounds_error=False, fill_value="extrapolate")(xq)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-9, atol=1e-12)


def test_matmul_interp_fuzz_matches_jnp_interp():
    """ADVICE r4: the fixed-grid interpolator must reproduce ``jnp.interp``
    EXACTLY — including queries sitting on knots, ±1 ulp around every knot,
    and outside the grid — on random strictly-increasing non-uniform grids
    (the one-hot contraction form makes this an exactness property of 0/1
    matmuls, see MatmulInterp's docstring)."""
    from eftpipe_tpu.ops.interp import MatmulInterp as LinearLUT

    for seed in range(6):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 60))
        # non-uniform: exponentially-spread positive gaps (ratio up to ~1e3)
        gaps = np.exp(rng.uniform(-3.0, 3.0, size=n - 1))
        xp = np.concatenate([[rng.uniform(-5, 5)], gaps]).cumsum()
        fp = rng.normal(size=xp.size).cumsum()
        lut = LinearLUT.build(xp)

        on = xp.copy()
        up = np.nextafter(xp, np.inf)
        dn = np.nextafter(xp, -np.inf)
        inside = rng.uniform(xp[0], xp[-1], size=200)
        outside = np.array([xp[0] - 1.0, xp[-1] + 1.0,
                            xp[0] - 1e-9, xp[-1] + 1e-9])
        q = np.concatenate([on, up, dn, inside, outside])

        got = jax.jit(lambda qq, ff: lut.interp(qq, ff))(
            jnp.asarray(q), jnp.asarray(fp))
        want = jnp.interp(jnp.asarray(q), jnp.asarray(xp), jnp.asarray(fp))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"seed {seed}")


def test_matmul_interp_batched_and_rejects_bad_grid():
    import pytest

    from eftpipe_tpu.ops.interp import MatmulInterp as LinearLUT

    xp = np.array([0.0, 0.1, 0.5, 1.0])
    lut = LinearLUT.build(xp)
    fp = np.arange(8, dtype=float).reshape(2, 4)
    q = np.array([0.05, 0.7])
    got = np.asarray(lut.interp(jnp.asarray(q), jnp.asarray(fp)))
    want = np.stack([np.interp(q, xp, f) for f in fp])
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="strictly increasing"):
        LinearLUT.build(np.array([0.0, 0.0, 1.0]))
