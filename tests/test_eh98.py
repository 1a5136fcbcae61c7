import numpy as np
import jax.numpy as jnp
import pytest

from eftpipe_tpu.boltzmann.eh98 import eh98_pk, lcdm_growth, lcdm_background
from eftpipe_tpu.boltzmann.background import growth_rate_lcdm, growth_factor_lcdm
from eftpipe_tpu.models.ap import lcdm_da, lcdm_hubble

from refbridge import load_reference


def test_growth_matches_reference_quadrature():
    ref = load_reference("pybird.pybird")
    for om, z in [(0.31, 0.7), (0.25, 1.0), (0.35, 0.0)]:
        d, f = lcdm_growth(jnp.asarray(om), jnp.asarray(z))
        assert float(f) == pytest.approx(ref.fN(om, z), rel=1e-8)
        assert float(d) == pytest.approx(growth_factor_lcdm(om, z), rel=1e-8)
        assert growth_rate_lcdm(om, z) == pytest.approx(ref.fN(om, z), rel=1e-10)


def test_background_matches_host_quadrature():
    for om, z in [(0.31, 0.7), (0.27, 1.2)]:
        e, da = lcdm_background(jnp.asarray(om), jnp.asarray(z))
        assert float(e) == pytest.approx(lcdm_hubble(om, z), rel=1e-12)
        assert float(da) == pytest.approx(lcdm_da(om, z), rel=1e-9)


def test_eh98_pk_sane():
    kin = np.logspace(-4, 0, 400)
    pk, f, e, da, rs = eh98_pk(
        jnp.asarray(kin), 0.02237, 0.12, 0.6777, 3.044, 0.9649, 0.7
    )
    pk = np.asarray(pk)
    assert np.isfinite(pk).all() and (pk > 0).all()
    # turnover near the equality scale, amplitude within a factor of a few of
    # Planck-like P(k~0.016 h/Mpc, z=0.7) ~ 1.2e4 (Mpc/h)^3 / D-scaled
    ipk = np.argmax(pk)
    assert 5e-3 < kin[ipk] < 5e-2
    assert 3e3 < pk[ipk] < 6e4
    # BAO wiggles present: P/Psmooth oscillates around 0.05 < k < 0.3
    sel = (kin > 0.05) & (kin < 0.3)
    logp = np.log(pk[sel])
    smooth = np.poly1d(np.polyfit(np.log(kin[sel]), logp, 5))(np.log(kin[sel]))
    assert 0.005 < np.max(np.abs(logp - smooth)) < 0.1
    # sound horizon in the right ballpark
    assert 120.0 < float(rs) < 170.0
    assert 0.7 < float(f) < 0.95
