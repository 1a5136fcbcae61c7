import numpy as np
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.transforms import (
    build_binning_matrix,
    chained_matrix,
    chain_coeff,
)

from refbridge import golden_oracle, load_reference


def test_chain_coeff_and_matrix_match_reference():
    def compute():
        ref_chained = load_reference("chained")
        ref = ref_chained.Chained()
        out = {"coeff": np.array([ref_chained.chain_coeff(ell) for ell in (0, 2, 4)])}
        for nl in (2, 3, 4):
            out[f"matrix_{nl}"] = ref.chained_matrix(nl)
        return out

    gold = golden_oracle("transforms_chained", compute)
    for ell, c_ref in zip((0, 2, 4), gold["coeff"]):
        assert chain_coeff(ell) == pytest.approx(c_ref, rel=1e-14)
    for nl in (2, 3, 4):
        np.testing.assert_allclose(chained_matrix(nl), gold[f"matrix_{nl}"], rtol=1e-14)


@pytest.mark.parametrize("explicit", [False, True])
def test_binning_matrix_matches_reference(explicit):
    cfg = EFTConfig(nl=2, no=2)
    kout = np.arange(0.01, 0.205, 0.01)
    kwargs = dict(kstart=0.0, kend=0.3, nbins=30) if explicit else {}
    rng = np.random.default_rng(5)
    p = rng.normal(size=(2, 3, cfg.k.size)).cumsum(axis=-1)

    def compute():
        ref_binning = load_reference("binning")
        ref_pybird = load_reference("pybird.pybird")
        co = ref_pybird.Common(Nl=2, No=2)
        ref = ref_binning.Binning(kout, co=co, **kwargs)
        return {
            "keff": ref.keff, "binmin": ref.binmin, "binmax": ref.binmax,
            "binned": ref.integrBinning(p),
        }

    gold = golden_oracle(f"transforms_binning_{'explicit' if explicit else 'auto'}",
                         compute)
    bt = build_binning_matrix(cfg, kout, **kwargs)
    np.testing.assert_allclose(bt["keff"], gold["keff"], rtol=1e-10)
    np.testing.assert_allclose(bt["binmin"], gold["binmin"], rtol=1e-12)
    np.testing.assert_allclose(bt["binmax"], gold["binmax"], rtol=1e-12)
    got = p @ bt["matrix"].T
    np.testing.assert_allclose(
        got, gold["binned"], rtol=1e-6, atol=1e-9 * np.abs(gold["binned"]).max()
    )
