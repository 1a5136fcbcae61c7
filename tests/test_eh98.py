import numpy as np
import jax.numpy as jnp
import pytest

from eftpipe_tpu.boltzmann.eh98 import eh98_pk, lcdm_growth, lcdm_background
from eftpipe_tpu.boltzmann.background import growth_rate_lcdm, growth_factor_lcdm
from eftpipe_tpu.models.ap import lcdm_da, lcdm_hubble

from refbridge import golden_oracle, load_reference

GROWTH_POINTS = [(0.31, 0.7), (0.25, 1.0), (0.35, 0.0)]


def test_growth_matches_reference_quadrature():
    def compute():
        ref = load_reference("pybird.pybird")
        return {"fn": np.array([ref.fN(om, z) for om, z in GROWTH_POINTS])}

    gold = golden_oracle("eh98_growth_fn", compute)
    for (om, z), fn_ref in zip(GROWTH_POINTS, gold["fn"]):
        d, f = lcdm_growth(jnp.asarray(om), jnp.asarray(z))
        assert float(f) == pytest.approx(fn_ref, rel=1e-8)
        assert float(d) == pytest.approx(growth_factor_lcdm(om, z), rel=1e-8)
        assert growth_rate_lcdm(om, z) == pytest.approx(fn_ref, rel=1e-10)


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


def test_sigma8_and_derived_params():
    """σ8 in the physical ballpark; σ8(z)/σ8(0) = D(z)/D(0) exactly (the
    EH98 shape is z-independent); provider derived columns behave."""
    import jax.numpy as jnp
    from eftpipe_tpu.boltzmann.eh98 import (
        eh98_pk, sigma_r, lcdm_growth, EisensteinHuProvider,
    )
    from eftpipe_tpu.models.config import EFTConfig
    from eftpipe_tpu.models.ap import lcdm_da, lcdm_hubble

    kin = jnp.asarray(np.logspace(-5, 1, 400))
    args = (0.02237, 0.12, 0.6777, 3.044, 0.9649)
    pk0 = eh98_pk(kin, *args, 0.0)[0]
    pkz = eh98_pk(kin, *args, 0.7)[0]
    s80 = float(sigma_r(kin, pk0))
    s8z = float(sigma_r(kin, pkz))
    assert 0.70 < s80 < 0.92
    om = (args[0] + args[1]) / args[2] ** 2
    d0 = float(lcdm_growth(om, 0.0)[0])
    dz = float(lcdm_growth(om, 0.7)[0])
    np.testing.assert_allclose(s8z / s80, dz / d0, rtol=1e-8)

    cfg = EFTConfig()
    prov = EisensteinHuProvider(
        cfg=cfg, zeff=0.7, da_fid=lcdm_da(om, 0.7), h_fid=lcdm_hubble(om, 0.7),
        rdrag_fid=147.66, h0_fid=0.6777,
    )
    params = dict(omega_b=args[0], omega_cdm=args[1], h=args[2],
                  ln10As=args[3], ns=args[4])
    d = prov.derived(params)
    # self-consistent fiducial: q's = 1; alphas differ only via rdrag ratio
    np.testing.assert_allclose(float(d["alperp"]), float(d["alpara"]), rtol=1e-6)
    assert 0.9 < float(d["alperp"]) < 1.1
    assert 0.3 < float(d["fsigma8_z"]) < 0.6
    # shifting omega_cdm moves the alphas
    d2 = prov.derived({**params, "omega_cdm": 0.13})
    assert abs(float(d2["alperp"]) - float(d["alperp"])) > 1e-3
