import numpy as np

from eftpipe_tpu.ops.fftlog import HostFFTLog
from eftpipe_tpu.tables.loop_matrices import (
    m13_matrices,
    m22_matrices,
    mpc,
    legendre_weights,
)
from eftpipe_tpu.models.config import EFTConfig

from refbridge import load_reference


def test_m13_m22_match_reference():
    ref = load_reference("pybird.pybird")
    fft = HostFFTLog(n=256, xmin=1.5e-5, xmax=1000.0, bias=-1.6)
    ns = -0.5 * fft.pow

    m13 = m13_matrices(fft.pow)
    ref_m13 = np.stack([ref.M13a(ns) * ref.M13b[i](ns) for i in range(10)])
    np.testing.assert_allclose(m13, ref_m13, rtol=1e-11)

    m22 = m22_matrices(fft.pow)
    ref_ma = ref.M22a(ns[:, None], ns[None, :])
    for i in range(28):
        ref_i = ref_ma * ref.M22b[i](ns[:, None], ns[None, :])
        np.testing.assert_allclose(m22[i], ref_i, rtol=1e-9, atol=1e-12 * np.abs(ref_i).max())


def test_mpc_matches_reference():
    ref = load_reference("pybird.pybird")
    fft = HostFFTLog(n=256, xmin=1.5e-5, xmax=1000.0, bias=-1.6)
    ns = -0.5 * fft.pow
    for l in (0, 2, 4):
        np.testing.assert_allclose(mpc(l, ns), ref.MPC(l, ns), rtol=1e-12)
        np.testing.assert_allclose(mpc(l, ns - 1.0), ref.MPC(l, ns - 1.0), rtol=1e-12)


def test_grids_and_projection_tables_match_reference():
    ref = load_reference("pybird.pybird")
    for nl in (2, 3):
        co = ref.Common(Nl=nl, No=nl)
        cfg = EFTConfig(nl=nl, no=nl)
        np.testing.assert_allclose(cfg.k, co.k, rtol=1e-15)
        np.testing.assert_allclose(cfg.s, co.s, rtol=1e-15)
        assert cfg.nklow == co.Nklow
        w = legendre_weights(nl)
        np.testing.assert_allclose(w["l11"], co.l11)
        np.testing.assert_allclose(w["lct"], co.lct)
        np.testing.assert_allclose(w["lct_nnlo"], co.lctNNLO)
        np.testing.assert_allclose(w["l22"], co.l22)
        np.testing.assert_allclose(w["l13"], co.l13)


def test_config_hashable_and_cache_key():
    a = EFTConfig(nl=2)
    b = EFTConfig(nl=2)
    c = EFTConfig(nl=3, no=2)
    assert a.cache_key() == b.cache_key()
    assert a.cache_key() != c.cache_key()
