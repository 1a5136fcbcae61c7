"""Native C++ helpers (eftpipe_tpu/native): fast table parser and panel
scatter vs their NumPy fallbacks and vs numpy.loadtxt ground truth."""

import numpy as np
import pytest

from eftpipe_tpu import native
from eftpipe_tpu.models.icc import ic_panel_to_ndarray


@pytest.fixture(scope="module")
def native_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_loadtxt_matches_numpy(native_ok, tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((200, 7)) * 10.0 ** rng.integers(-8, 8, (200, 7))
    path = tmp_path / "t.txt"
    np.savetxt(path, arr, header="a b c d e f g")
    got = native.loadtxt(path)
    expected = np.loadtxt(path)
    np.testing.assert_allclose(got, expected, rtol=0, atol=0)


def test_loadtxt_comments_and_blanks(native_ok, tmp_path):
    path = tmp_path / "c.txt"
    path.write_text("# header\n1 2 3\n\n# mid comment\n  4 5 6\n7 8 9\n")
    got = native.loadtxt(path)
    np.testing.assert_array_equal(got, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])


def test_loadtxt_errors(native_ok, tmp_path):
    with pytest.raises(FileNotFoundError):
        native.loadtxt(tmp_path / "missing.txt")
    ragged = tmp_path / "r.txt"
    ragged.write_text("1 2 3\n4 5\n")
    with pytest.raises(ValueError, match="code 3"):
        native.loadtxt(ragged)


def _panel_table(rng, n1=3, n2=3, n3=20, n4=20):
    l1 = np.arange(0, 2 * n1, 2, dtype=float)
    l2 = np.arange(0, 2 * n2, 2, dtype=float)
    s1 = np.geomspace(1.0, 100.0, n3)
    s2 = np.geomspace(1.0, 100.0, n4)
    grid = np.stack(np.meshgrid(l1, l2, s1, s2, indexing="ij"), axis=-1)
    rows = grid.reshape(-1, 4)
    vals = rng.standard_normal(rows.shape[0])[:, None]
    table = np.hstack([rows, vals])
    rng.shuffle(table)  # scatter must not rely on ordering
    return table


def test_panel_scatter_matches_fallback(native_ok):
    rng = np.random.default_rng(1)
    table = _panel_table(rng)
    out_native, meta_n = native.panel_to_ndarray(table)
    out_py, meta_p = ic_panel_to_ndarray(table)
    np.testing.assert_array_equal(out_native, out_py)
    for k in meta_n:
        np.testing.assert_array_equal(meta_n[k], meta_p[k])


def test_panel_scatter_rejects_incomplete(native_ok):
    rng = np.random.default_rng(2)
    table = _panel_table(rng)[:-3]
    with pytest.raises(ValueError, match="complete grid"):
        native.panel_to_ndarray(table)


def test_loadtxt_speed_on_big_table(native_ok, tmp_path):
    """The native parser should beat np.loadtxt comfortably on a panel-sized
    table (the reference flags this load at minutes, icc.py:90-95)."""
    import time

    rng = np.random.default_rng(3)
    arr = rng.standard_normal((200_000, 5))
    path = tmp_path / "big.txt"
    np.savetxt(path, arr)
    t0 = time.perf_counter()
    got = native.loadtxt(path)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    expected = np.loadtxt(path)
    t_numpy = time.perf_counter() - t0
    np.testing.assert_allclose(got, expected)
    assert t_native < t_numpy  # typically 5-20x faster
