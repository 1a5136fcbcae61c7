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
