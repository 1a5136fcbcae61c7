"""EFTModel fluent API (reference model.py:15-460) and utils/tools."""

import numpy as np
import pytest
import jax.numpy as jnp

from eftpipe_tpu.api.model import EFTModel, c2c4_to_b2b4

COSMO = dict(omega_b=0.02237, omega_cdm=0.12, h=0.6777, ln10As=3.044, ns=0.9649)


@pytest.fixture(scope="module")
def model():
    return (
        EFTModel(z=0.7, nd=5e-5)
        .set_cosmology(**COSMO)
        .set_IRresum()
        .set_APeffect(Om_AP=0.31)
        .done(ellmax=2)
    )


def test_c2c4_mapping():
    b2, b4 = c2c4_to_b2b4(1.2, 0.4)
    assert b2 == pytest.approx(1.6 / np.sqrt(2.0))
    assert b4 == pytest.approx(0.8 / np.sqrt(2.0))
    # c2 alone splits evenly
    b2, b4 = c2c4_to_b2b4(1.0)
    assert b2 == pytest.approx(b4)


def test_model_call_returns_interpolator(model):
    interp = model(b1=2.0, c2=1.2, b3=0.5, cct=0.3)
    k = np.array([0.05, 0.1, 0.15])
    p0 = np.asarray(interp(0, k))
    p2 = np.asarray(interp(2, k))
    assert p0.shape == (3,) and np.all(np.isfinite(p0))
    assert np.all(p0 > 0) and p0[0] > p0[-1] * 0.5  # sane magnitude ordering
    assert not np.allclose(p0, p2)


def test_model_c2_equals_b2b4(model):
    """(c2, c4) and the equivalent (b2, b4) give identical spectra."""
    b2, b4 = c2c4_to_b2b4(1.2, 0.0)
    ls, k, via_c = model.Plk_grid(b1=2.0, c2=1.2)
    ls, k, via_b = model.Plk_grid(b1=2.0, b2=b2, b4=b4)
    np.testing.assert_allclose(np.asarray(via_c), np.asarray(via_b), rtol=1e-12)
    with pytest.raises(ValueError, match="not both"):
        model.Plk_grid(b1=2.0, c2=1.0, b2=1.0)


def test_model_bias_dependence(model):
    ls, k, lo = model.Plk_grid(b1=1.5)
    ls, k, hi = model.Plk_grid(b1=2.5)
    # P0 grows with b1 where the quasi-linear term dominates (k <= 0.1)
    sel = np.asarray(k) <= 0.1
    assert np.all(np.asarray(hi)[0][sel] > np.asarray(lo)[0][sel])


def test_model_matter_limit(model):
    mm = model.Plk_mm()
    p0 = np.asarray(mm(0, np.array([0.1])))
    biased = model(b1=2.0)
    assert 0 < p0[0] < np.asarray(biased(0, np.array([0.1])))[0]


def test_model_guards():
    m = EFTModel(z=0.5)
    with pytest.raises(ValueError, match="set_cosmology"):
        m.done()
    m2 = EFTModel(z=0.5).set_cosmology(**COSMO).done()
    with pytest.raises(RuntimeError, match="already finalised"):
        m2.set_IRresum()


def test_model_template_mode(tmp_path):
    from eftpipe_tpu.boltzmann.eh98 import eh98_pk

    k = np.logspace(-5, 0, 200)
    pk = np.asarray(eh98_pk(jnp.asarray(k), COSMO["omega_b"], COSMO["omega_cdm"],
                            COSMO["h"], COSMO["ln10As"], COSMO["ns"], 0.7)[0])
    np.savetxt(tmp_path / "plin.txt", np.column_stack([k, pk]))
    m = (EFTModel(z=0.7, nd=5e-5)
         .set_template(tmp_path / "plin.txt", f=0.8)
         .set_IRresum()
         .done(ellmax=2))
    assert m.pipeline.frozen is not None  # Phase-A freeze active
    interp = m(b1=2.0)
    assert np.isfinite(np.asarray(interp(0, np.array([0.1]))))[0]


# ----------------------------------------------------------------------
def test_random_params():
    from eftpipe_tpu.utils.tools import RandomParams

    rp = RandomParams(mean={"a": 1.0, "b": -2.0}, scale={"a": 0.1, "b": 0.2},
                      seed=4)
    one = rp.draw()
    assert set(one) == {"a", "b"}
    many = rp.draw(2000)
    arr = np.array([[d["a"], d["b"]] for d in many])
    np.testing.assert_allclose(arr.mean(0), [1.0, -2.0], atol=0.02)
    np.testing.assert_allclose(arr.std(0), [0.1, 0.2], rtol=0.1)


def test_random_params_covmat_file(tmp_path):
    from eftpipe_tpu.utils.tools import RandomParams

    f = tmp_path / "ref.covmat"
    f.write_text("# x y\n0.04 0.01\n0.01 0.09\n")
    rp = RandomParams.from_covmat_file(f, mean={"x": 5.0}, seed=1)
    draws = rp.draw(4000)
    arr = np.array([[d["x"], d["y"]] for d in draws])
    np.testing.assert_allclose(np.cov(arr.T), [[0.04, 0.01], [0.01, 0.09]],
                               atol=0.01)
    assert abs(arr[:, 0].mean() - 5.0) < 0.02


def test_path_context_and_timer(tmp_path):
    import os
    from eftpipe_tpu.utils.tools import PathContext, timer

    old = os.getcwd()
    with PathContext(tmp_path):
        assert os.getcwd() == str(tmp_path)
    assert os.getcwd() == old
    with timer("unit-test"):
        pass
