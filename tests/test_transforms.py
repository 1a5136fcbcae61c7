import numpy as np
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.transforms import (
    build_binning_matrix,
    chained_matrix,
    chain_coeff,
)

from refbridge import load_reference


def test_chain_coeff_and_matrix_match_reference():
    ref_chained = load_reference("chained")
    for ell in (0, 2, 4):
        assert chain_coeff(ell) == pytest.approx(ref_chained.chain_coeff(ell), rel=1e-14)
    ref = ref_chained.Chained()
    for nl in (2, 3, 4):
        np.testing.assert_allclose(chained_matrix(nl), ref.chained_matrix(nl), rtol=1e-14)


@pytest.mark.parametrize("explicit", [False, True])
def test_binning_matrix_matches_reference(explicit):
    ref_binning = load_reference("binning")
    ref_pybird = load_reference("pybird.pybird")
    co = ref_pybird.Common(Nl=2, No=2)
    cfg = EFTConfig(nl=2, no=2)

    kout = np.arange(0.01, 0.205, 0.01)
    kwargs = dict(kstart=0.0, kend=0.3, nbins=30) if explicit else {}
    ref = ref_binning.Binning(kout, co=co, **kwargs)
    bt = build_binning_matrix(cfg, kout, **kwargs)

    np.testing.assert_allclose(bt["keff"], ref.keff, rtol=1e-10)
    np.testing.assert_allclose(bt["binmin"], ref.binmin, rtol=1e-12)
    np.testing.assert_allclose(bt["binmax"], ref.binmax, rtol=1e-12)

    rng = np.random.default_rng(5)
    p = rng.normal(size=(2, 3, co.Nk)).cumsum(axis=-1)
    expected = ref.integrBinning(p)
    got = p @ bt["matrix"].T
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-9 * np.abs(expected).max())
