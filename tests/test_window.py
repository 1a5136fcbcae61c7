from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.window import (
    window_kgrid,
    build_window_tables,
    apply_window,
    compute_wal,
    mask_and_weight,
    load_configspace_window,
)

from refbridge import load_reference

WIN_FILE = Path("/root/reference/data/DR16_noric/win_NGC_LRG.txt")


@pytest.fixture(scope="module")
def ref_window_mod():
    return load_reference("window")


def test_window_kgrid_matches_reference(ref_window_mod):
    np.testing.assert_allclose(window_kgrid(0.3, 1), ref_window_mod.window_kgrid(0.3, 1), rtol=1e-15)
    np.testing.assert_allclose(window_kgrid(0.25, 2), ref_window_mod.window_kgrid(0.25, 2), rtol=1e-15)


@pytest.fixture(scope="module")
def ref_window(ref_window_mod):
    if not WIN_FILE.exists():
        pytest.skip("reference window data not available")
    ref_pybird = load_reference("pybird.pybird")
    co = ref_pybird.Common(Nl=2, No=2)
    return ref_window_mod.Window(
        window_fourier_file=None,
        window_configspace_file=WIN_FILE,
        co=co,
        load=False,
        save=False,
    ), co


@pytest.fixture(scope="module")
def our_window():
    cfg = EFTConfig(nl=2, no=2)
    wt = build_window_tables(cfg, window_configspace_file=WIN_FILE)
    return wt, cfg


def test_window_wal_matches_reference(ref_window, our_window):
    (ref, co), (wt, cfg) = ref_window, our_window
    np.testing.assert_allclose(
        wt["wal"], ref.Wal, rtol=1e-6, atol=1e-9 * np.abs(ref.Wal).max()
    )


def test_window_convolution_matches_reference(ref_window, our_window):
    (ref, co), (wt, cfg) = ref_window, our_window
    rng = np.random.default_rng(7)
    p = rng.normal(size=(2, 4, co.Nk)).cumsum(axis=-1)
    expected = ref.integrWindow(p)  # (a, s, k)
    got = np.einsum("alkj,lnj->ank", wt["wmat"], p)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7 * np.abs(expected).max())


def test_window_cache_roundtrip(tmp_path):
    cfg = EFTConfig(nl=2, no=2)
    if not WIN_FILE.exists():
        pytest.skip("reference window data not available")
    wt1 = build_window_tables(cfg, window_configspace_file=WIN_FILE, cache_dir=tmp_path, nmax=512)
    assert list(tmp_path.glob("window_*.npz"))
    wt2 = build_window_tables(cfg, window_configspace_file=WIN_FILE, cache_dir=tmp_path, nmax=512)
    np.testing.assert_allclose(wt1["wal"], wt2["wal"], rtol=0, atol=0)


def test_window_fourier_file_roundtrip(tmp_path, our_window):
    """A reference-format .npy Fourier matrix loads directly and reproduces
    the computed tables (window.py:204-260 load path + Nl-suffix retry)."""
    from eftpipe_tpu.models.window import build_window_tables, MetaInfoError
    import pytest as _pytest

    wt, cfg = our_window
    np.save(tmp_path / "wal.npy", wt["wal"])
    wt2 = build_window_tables(cfg, window_fourier_file=tmp_path / "wal.npy")
    np.testing.assert_allclose(wt2["wmat"], wt["wmat"], rtol=1e-12)

    # Nl-suffix retry: primary file has the wrong Nl -> _Nl<2> file is used
    wrong = np.zeros((wt["wal"].shape[0], wt["wal"].shape[1] + 1) + wt["wal"].shape[2:])
    np.save(tmp_path / "w2.npy", wrong)
    np.save(tmp_path / f"w2_Nl{cfg.nl}.npy", wt["wal"])
    wt3 = build_window_tables(cfg, window_fourier_file=tmp_path / "w2.npy")
    np.testing.assert_allclose(wt3["wmat"], wt["wmat"], rtol=1e-12)

    # inconsistent (na, nl) raises
    np.save(tmp_path / "bad.npy", wt["wal"][:1])
    with _pytest.raises(MetaInfoError, match="does not match"):
        build_window_tables(cfg, window_fourier_file=tmp_path / "bad.npy")
