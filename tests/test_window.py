from pathlib import Path

import numpy as np
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.window import window_kgrid, build_window_tables

from refbridge import golden_oracle, load_reference

WIN_FILE = Path("/root/reference/data/DR16_noric/win_NGC_LRG.txt")


@pytest.fixture(scope="module")
def win_source(tmp_path_factory):
    """Path to the LRG NGC config-space window: the live reference data file
    when mounted, otherwise a copy materialized from the committed golden
    (the raw Q_q(s) table is survey *data*, needed to exercise our Wal
    builder hermetically)."""
    gold = golden_oracle(
        "window_input_lrg_ngc",
        lambda: {"table": np.loadtxt(WIN_FILE)},
    )
    if WIN_FILE.exists():
        return WIN_FILE
    path = tmp_path_factory.mktemp("windata") / "win_NGC_LRG.txt"
    np.savetxt(path, gold["table"])
    return path


def test_window_kgrid_matches_reference():
    def compute():
        ref_window_mod = load_reference("window")
        return {"g1": ref_window_mod.window_kgrid(0.3, 1),
                "g2": ref_window_mod.window_kgrid(0.25, 2)}

    gold = golden_oracle("window_kgrid", compute)
    np.testing.assert_allclose(window_kgrid(0.3, 1), gold["g1"], rtol=1e-15)
    np.testing.assert_allclose(window_kgrid(0.25, 2), gold["g2"], rtol=1e-15)


_P_IN = np.random.default_rng(7).normal(size=(2, 4, 50)).cumsum(axis=-1)


@pytest.fixture(scope="module")
def ref_window_golden():
    def compute():
        ref_window_mod = load_reference("window")
        ref_pybird = load_reference("pybird.pybird")
        co = ref_pybird.Common(Nl=2, No=2)
        ref = ref_window_mod.Window(
            window_fourier_file=None,
            window_configspace_file=WIN_FILE,
            co=co,
            load=False,
            save=False,
        )
        return {"wal": ref.Wal, "conv": ref.integrWindow(_P_IN)}

    return golden_oracle("window_wal_convolution", compute)


@pytest.fixture(scope="module")
def our_window(win_source):
    cfg = EFTConfig(nl=2, no=2)
    wt = build_window_tables(cfg, window_configspace_file=win_source)
    return wt, cfg


def test_window_wal_matches_reference(ref_window_golden, our_window):
    wt, cfg = our_window
    ref_wal = ref_window_golden["wal"]
    np.testing.assert_allclose(
        wt["wal"], ref_wal, rtol=1e-6, atol=1e-9 * np.abs(ref_wal).max()
    )


def test_window_convolution_matches_reference(ref_window_golden, our_window):
    wt, cfg = our_window
    expected = ref_window_golden["conv"]  # (a, s, k)
    got = np.einsum("alkj,lnj->ank", wt["wmat"], _P_IN)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7 * np.abs(expected).max())


def test_window_cache_roundtrip(tmp_path, win_source):
    cfg = EFTConfig(nl=2, no=2)
    wt1 = build_window_tables(cfg, window_configspace_file=win_source, cache_dir=tmp_path, nmax=512)
    assert list(tmp_path.glob("window_*.npz"))
    wt2 = build_window_tables(cfg, window_configspace_file=win_source, cache_dir=tmp_path, nmax=512)
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


def test_window_fourier_suffixless_path_roundtrip(tmp_path, our_window):
    """A configured fourier path WITHOUT a .npy suffix is normalized
    consistently for save and load (np.save appends .npy; previously the
    write-back landed on a path the loader never looked at)."""
    wt, cfg = our_window
    bare = tmp_path / "walcache"
    # nothing exists yet -> computed (from the window file) and written back
    wt1 = build_window_tables(
        cfg, window_fourier_file=bare,
        window_configspace_file=None if not WIN_FILE.exists() else WIN_FILE,
    ) if WIN_FILE.exists() else None
    if wt1 is None:
        # hermetic: seed the normalized path directly, then load via bare
        np.save(bare.with_name(bare.name + ".npy"), wt["wal"])
        wt2 = build_window_tables(cfg, window_fourier_file=bare)
        np.testing.assert_allclose(wt2["wal"], wt["wal"], rtol=0, atol=0)
        return
    assert (tmp_path / "walcache.npy").exists()
    wt2 = build_window_tables(cfg, window_fourier_file=bare)
    np.testing.assert_allclose(wt2["wal"], wt1["wal"], rtol=0, atol=0)
