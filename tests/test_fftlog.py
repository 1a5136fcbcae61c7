import numpy as np
import jax
import pytest

from eftpipe_tpu.ops.fftlog import HostFFTLog, make_plan, fftlog_coef, spectral_window

from refbridge import golden_oracle, load_reference


def _key(window, extrap):
    ex = "+".join(extrap) if isinstance(extrap, tuple) else str(extrap)
    return f"w{window}_{ex}"


def smooth_positive(k, seed=0):
    rng = np.random.default_rng(seed)
    amps = rng.uniform(0.5, 1.5, size=4)
    lk = np.log(k)
    return (
        2e4
        * (k / 0.05) ** 0.96
        / (1.0 + (k / 0.05) ** 2.8)
        * (1.0 + 0.05 * amps[0] * np.sin(3 * lk) + 0.02 * amps[1] * np.cos(5 * lk))
    )


CASES = [
    (w, e)
    for w in (1.0, 0.2, None)
    for e in ("extrap", "padding", ("padding", "extrap"))
]


def _host_coef_golden():
    def compute():
        ref_fftlog = load_reference("pybird.fftlog")
        kin = np.logspace(-5, 0, 200)
        f = smooth_positive(kin)
        ref = ref_fftlog.FFTLog(Nmax=256, xmin=1.5e-5, xmax=1000.0, bias=-1.6)
        out = {"x": ref.x, "pow": ref.Pow}
        for window, extrap in CASES:
            out[_key(window, extrap)] = ref.Coef(
                kin, f, extrap=extrap, window=window
            )
        return out

    return golden_oracle("fftlog_host_coef", compute)


@pytest.mark.parametrize("window", [1.0, 0.2, None])
@pytest.mark.parametrize("extrap", ["extrap", "padding", ("padding", "extrap")])
def test_host_fftlog_matches_reference(window, extrap):
    gold = _host_coef_golden()
    kin = np.logspace(-5, 0, 200)
    f = smooth_positive(kin)

    ours = HostFFTLog(n=256, xmin=1.5e-5, xmax=1000.0, bias=-1.6)
    np.testing.assert_allclose(ours.x, gold["x"], rtol=1e-14)
    np.testing.assert_allclose(ours.pow, gold["pow"], rtol=1e-14)

    c_ref = gold[_key(window, extrap)]
    c_ours = ours.coef(kin, f, extrap=extrap, window=window)
    np.testing.assert_allclose(c_ours, c_ref, rtol=1e-9, atol=1e-13 * np.abs(c_ref).max())


def test_host_fftlog_batched_matches_reference():
    sin = np.geomspace(0.5, 900.0, 120)
    rng = np.random.default_rng(3)
    f = np.abs(rng.normal(size=(3, 5, sin.size))) + 0.1

    def compute():
        ref_fftlog = load_reference("pybird.fftlog")
        ref = ref_fftlog.FFTLog(Nmax=192, xmin=0.1, xmax=10000.0, bias=-0.6)
        return {"coef": ref.Coef(sin, f, extrap="padding", window=None)}

    c_ref = golden_oracle("fftlog_batched_coef", compute)["coef"]
    ours = HostFFTLog(n=192, xmin=0.1, xmax=10000.0, bias=-0.6)
    c_ours = ours.coef(sin, f, extrap="padding", window=None)
    np.testing.assert_allclose(c_ours, c_ref, rtol=1e-9, atol=1e-12 * np.abs(c_ref).max())


def test_spectral_window_matches_reference():
    def compute():
        ref_fftlog = load_reference("pybird.fftlog")
        return {
            f"w{window}": ref_fftlog.CoefWindow(256, window=window)
            for window in (1.0, 0.75, 0.2)
        }

    gold = golden_oracle("fftlog_spectral_window", compute)
    for window in (1.0, 0.75, 0.2):
        np.testing.assert_allclose(
            spectral_window(256, window), gold[f"w{window}"], rtol=1e-14
        )


@pytest.mark.parametrize("window", [1.0, 0.2, None])
@pytest.mark.parametrize("extrap", ["extrap", "padding"])
def test_jit_plan_matches_host(window, extrap):
    kin = np.logspace(-5, 0, 200)
    f = smooth_positive(kin, seed=7)
    fft = HostFFTLog(n=256, xmin=1.5e-5, xmax=1000.0, bias=-1.6)
    plan = make_plan(fft, kin, extrap=extrap, window=window)

    cre, cim = jax.jit(lambda x: fftlog_coef(plan, x))(f)
    c_host = fft.coef(kin, f, extrap=extrap, window=window)
    scale = np.abs(c_host).max()
    np.testing.assert_allclose(np.asarray(cre), c_host.real, rtol=1e-10, atol=1e-12 * scale)
    np.testing.assert_allclose(np.asarray(cim), c_host.imag, rtol=1e-10, atol=1e-12 * scale)


def test_jit_plan_batched_and_vmap_consistent():
    kin = np.logspace(-4, 0.5, 150)
    fs = np.stack([smooth_positive(kin, seed=s) for s in range(4)])
    fft = HostFFTLog(n=128, xmin=1.5e-5, xmax=1000.0, bias=-1.6)
    plan = make_plan(fft, kin, extrap="extrap", window=0.5)

    cre_b, cim_b = fftlog_coef(plan, fs)
    cre_v, cim_v = jax.vmap(lambda x: fftlog_coef(plan, x))(fs)
    np.testing.assert_allclose(np.asarray(cre_b), np.asarray(cre_v), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(cim_b), np.asarray(cim_v), rtol=1e-13)

    scale = np.abs(np.asarray(cre_b)).max()
    for i in range(4):
        cre1, cim1 = fftlog_coef(plan, fs[i])
        np.testing.assert_allclose(
            np.asarray(cre_b[i]), np.asarray(cre1), rtol=1e-10, atol=1e-14 * scale
        )
