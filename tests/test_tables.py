import numpy as np

from eftpipe_tpu.ops.fftlog import HostFFTLog
from eftpipe_tpu.tables.loop_matrices import (
    m13_matrices,
    m22_matrices,
    mpc,
    legendre_weights,
)
from eftpipe_tpu.models.config import EFTConfig

from refbridge import golden_oracle, load_reference


def test_m13_m22_match_reference():
    fft = HostFFTLog(n=256, xmin=1.5e-5, xmax=1000.0, bias=-1.6)
    ns = -0.5 * fft.pow

    def compute():
        ref = load_reference("pybird.pybird")
        ref_m13 = np.stack([ref.M13a(ns) * ref.M13b[i](ns) for i in range(10)])
        ref_ma = ref.M22a(ns[:, None], ns[None, :])
        ref_m22 = np.stack([
            ref_ma * ref.M22b[i](ns[:, None], ns[None, :]) for i in range(28)
        ])
        return {"m13": ref_m13, "m22": ref_m22}

    gold = golden_oracle("tables_loop_matrices", compute)
    np.testing.assert_allclose(m13_matrices(fft.pow), gold["m13"], rtol=1e-11)
    m22 = m22_matrices(fft.pow)
    for i in range(28):
        ref_i = gold["m22"][i]
        np.testing.assert_allclose(
            m22[i], ref_i, rtol=1e-9, atol=1e-12 * np.abs(ref_i).max()
        )


def test_mpc_matches_reference():
    fft = HostFFTLog(n=256, xmin=1.5e-5, xmax=1000.0, bias=-1.6)
    ns = -0.5 * fft.pow

    def compute():
        ref = load_reference("pybird.pybird")
        out = {}
        for l in (0, 2, 4):
            out[f"mpc_{l}"] = ref.MPC(l, ns)
            out[f"mpc_{l}_m1"] = ref.MPC(l, ns - 1.0)
        return out

    gold = golden_oracle("tables_mpc", compute)
    for l in (0, 2, 4):
        np.testing.assert_allclose(mpc(l, ns), gold[f"mpc_{l}"], rtol=1e-12)
        np.testing.assert_allclose(
            mpc(l, ns - 1.0), gold[f"mpc_{l}_m1"], rtol=1e-12
        )


def test_grids_and_projection_tables_match_reference():
    def compute():
        ref = load_reference("pybird.pybird")
        out = {}
        for nl in (2, 3):
            co = ref.Common(Nl=nl, No=nl)
            out[f"k_{nl}"] = co.k
            out[f"s_{nl}"] = co.s
            out[f"nklow_{nl}"] = np.asarray(co.Nklow)
            for name, tab in (("l11", co.l11), ("lct", co.lct),
                              ("lct_nnlo", co.lctNNLO), ("l22", co.l22),
                              ("l13", co.l13)):
                out[f"{name}_{nl}"] = np.asarray(tab)
        return out

    gold = golden_oracle("tables_grids_projection", compute)
    for nl in (2, 3):
        cfg = EFTConfig(nl=nl, no=nl)
        np.testing.assert_allclose(cfg.k, gold[f"k_{nl}"], rtol=1e-15)
        np.testing.assert_allclose(cfg.s, gold[f"s_{nl}"], rtol=1e-15)
        assert cfg.nklow == int(gold[f"nklow_{nl}"])
        w = legendre_weights(nl)
        np.testing.assert_allclose(w["l11"], gold[f"l11_{nl}"])
        np.testing.assert_allclose(w["lct"], gold[f"lct_{nl}"])
        np.testing.assert_allclose(w["lct_nnlo"], gold[f"lct_nnlo_{nl}"])
        np.testing.assert_allclose(w["l22"], gold[f"l22_{nl}"])
        np.testing.assert_allclose(w["l13"], gold[f"l13_{nl}"])


def test_config_hashable_and_cache_key():
    a = EFTConfig(nl=2)
    b = EFTConfig(nl=2)
    c = EFTConfig(nl=3, no=2)
    assert a.cache_key() == b.cache_key()
    assert a.cache_key() != c.cache_key()
