import numpy as np
import pytest
from scipy.integrate import quad
from scipy.special import spherical_jn

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.icc import compute_psn, ic_panel_to_ndarray, compute_ic_wal
from eftpipe_tpu.ops.fftlog2d import bessel_matrix, HostFFTLog2D

from refbridge import golden_oracle, load_reference


def test_bessel_matrix_matches_reference_and_quadrature():
    p = np.array([-2.0 + 0.3j, -2.5 - 1.0j, -1.7 + 2.2j])

    def compute():
        ref = load_reference("fftlog2d")
        return {f"l{l}": ref.bessel_matrix(p, l) for l in (0, 2, 4)}

    gold = golden_oracle("icc_bessel_matrix", compute)
    for l in (0, 2, 4):
        np.testing.assert_allclose(bessel_matrix(p, l), gold[f"l{l}"], rtol=1e-12)
    # analytic moment vs direct (damped) quadrature at a real power
    l, pw = 2, -2.3
    got = bessel_matrix(np.array([pw]), l)[0]
    eps = 1e-3
    val = quad(lambda s: s ** (2 + pw) * spherical_jn(l, s) * np.exp(-eps * s), 0, np.inf, limit=500)[0]
    assert got == pytest.approx(val, rel=5e-3)


def test_ic_panel_to_ndarray_matches_reference_fallback():
    rng = np.random.default_rng(0)
    l1 = np.array([0.0, 2.0])
    l2 = np.array([0.0, 2.0, 4.0])
    s1 = np.linspace(1, 10, 4)
    s2 = np.linspace(1, 20, 5)
    rows = []
    for a in l1:
        for b in l2:
            for x in s1:
                for y in s2:
                    rows.append([a, b, x, y, rng.normal()])
    arr = np.array(rows)
    arr_shuffled = arr[rng.permutation(arr.shape[0])]
    ours, meta = ic_panel_to_ndarray(arr_shuffled)

    def compute():
        ref_icc = load_reference("icc")
        theirs, _ = ref_icc.ICpannel_to_ndarray(
            arr_shuffled, inorder=False, info=lambda *a: None)
        return {"panel": theirs}

    gold = golden_oracle("icc_panel_ndarray", compute)
    np.testing.assert_allclose(ours, gold["panel"], rtol=0, atol=0)
    ours2, _ = ic_panel_to_ndarray(arr, inorder=True)
    np.testing.assert_allclose(ours, ours2)


def test_compute_psn_matches_reference():
    cfg = EFTConfig(nl=2, no=2)

    s = np.geomspace(0.1, 3000.0, 300)
    w2 = np.stack([np.exp(-((np.log(s / 300)) ** 2)), 0.3 * np.exp(-((np.log(s / 200)) ** 2))])

    def compute():
        ref_icc = load_reference("icc")
        ref_pybird = load_reference("pybird.pybird")
        co = ref_pybird.Common(Nl=2, No=2)
        data = np.column_stack([s, w2.T])
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            sn_file = os.path.join(d, "sn.txt")
            np.savetxt(sn_file, data)
            ref = ref_icc.IntegralConstraint.__new__(ref_icc.IntegralConstraint)
            ref.set_logger(name="test")
            ref.co = co
            ref.icc_configspace_SN_file = sn_file
            ref.meta = dict(Na=2, Nmax=4096, bias=-2.1, window_param=1.0)
            return {"psn": ref._compute_PSN()}

    expected = golden_oracle("icc_psn", compute)["psn"]
    got = compute_psn(cfg, s, w2, na=2)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-9 * np.abs(expected).max())


def test_fftlog2d_separable_consistency():
    """For a separable input W(s1,s2) = f(s1) g(s2) the 2-D spherical transform
    must factorise into two 1-D spherical transforms (here: gaussian test
    functions against direct quadrature)."""
    s = np.geomspace(0.5, 400.0, 160)
    f = np.exp(-((np.log(s / 50.0)) ** 2) / 0.5)
    table = np.outer(f, f)
    fft2d = HostFFTLog2D(nx=512, ny=512, xmin=1e-3, xmax=s[-1], ymin=1e-3, ymax=s[-1],
                         xbias=-2.0, ybias=-2.0)
    k = np.array([0.05, 0.1])
    got = fft2d.spherical_transform(s, s, table, k1=k, k2=k, l1=0, l2=0, window=1.0)

    def one_d(kk):
        return quad(lambda x: x**2 * np.interp(x, s, f, left=0, right=0) * spherical_jn(0, kk * x),
                    s[0], s[-1], limit=500)[0]

    expected = np.outer([one_d(kk) for kk in k], [one_d(kk) for kk in k])
    # coarse gate: spectral taper + bicubic-vs-linear resampling differences
    np.testing.assert_allclose(got, expected, rtol=1e-2)
