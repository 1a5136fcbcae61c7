"""Neutrino-hierarchy solver (classynu analogue, reference classy.py:12-92)
and the JAX-native transfer-function emulator (matryoshka analogue)."""

import numpy as np
import pytest
import jax.numpy as jnp

from eftpipe_tpu.boltzmann.neutrino import (
    get_masses,
    minimal_mass_sum,
    neutrino_boltzmann_args,
    DELTA_M21_SQ,
    DELTA_M31_SQ_NH,
    DELTA_M32_SQ_IH,
)


def test_normal_hierarchy_masses():
    m1, m2, m3 = get_masses(0.12, "normal")
    assert m1 + m2 + m3 == pytest.approx(0.12, abs=1e-10)
    assert m1 < m2 < m3
    assert m2**2 - m1**2 == pytest.approx(DELTA_M21_SQ, rel=1e-8)
    assert m3**2 - m1**2 == pytest.approx(DELTA_M31_SQ_NH, rel=1e-8)


def test_inverted_hierarchy_masses():
    m1, m2, m3 = get_masses(0.12, "inverted")
    assert m1 + m2 + m3 == pytest.approx(0.12, abs=1e-10)
    assert m3 < m1 < m2
    assert m2**2 - m1**2 == pytest.approx(DELTA_M21_SQ, rel=1e-6)
    assert m3**2 - m2**2 == pytest.approx(DELTA_M32_SQ_IH, rel=1e-6)


def test_minimal_sums_and_validation():
    nh_min = minimal_mass_sum("normal")
    ih_min = minimal_mass_sum("inverted")
    assert 0.055 < nh_min < 0.065   # ~0.059 eV
    assert 0.095 < ih_min < 0.105   # ~0.100 eV
    with pytest.raises(ValueError, match="below the minimal"):
        get_masses(0.03, "normal")
    # at the floor the lightest state is massless
    m1, _, _ = get_masses(nh_min, "normal")
    assert m1 == pytest.approx(0.0, abs=1e-6)


def test_degenerate_and_zero():
    assert get_masses(0.0) == (0.0, 0.0, 0.0)
    m = get_masses(0.3, "degenerate")
    assert m == pytest.approx((0.1, 0.1, 0.1))


def test_boltzmann_args():
    args = neutrino_boltzmann_args(0.12, "normal")
    assert args["N_ncdm"] == 3
    masses = [float(x) for x in args["m_ncdm"].split(",")]
    assert sum(masses) == pytest.approx(0.12, abs=1e-6)
    assert args["N_ur"] == pytest.approx(0.0, abs=1e-10)
    # massless limit: everything stays ultra-relativistic
    args0 = neutrino_boltzmann_args(0.0)
    assert args0["N_ncdm"] == 0 and args0["N_ur"] == pytest.approx(3.044)


# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def trained_emulator():
    from eftpipe_tpu.boltzmann.emulator import train_transfer_emulator

    k = np.logspace(-4, 0.3, 100)  # Mpc^-1, covers kin·h for h<~1
    return train_transfer_emulator(
        k, n_samples=512, width=64, depth=2, steps=1500, seed=1
    ), k


def test_emulator_accuracy(trained_emulator):
    from eftpipe_tpu.boltzmann.eh98 import eh98_transfer

    emu, k = trained_emulator
    x = np.array([0.0223, 0.118, 0.69, 0.965])  # held-out point
    t_emu = np.asarray(emu(jnp.asarray(x)))
    t_ref = np.asarray(eh98_transfer(jnp.asarray(k), x[0], x[0] + x[1], x[2])[0])
    rel = np.abs(t_emu / t_ref - 1.0)
    assert np.max(rel) < 0.02  # <2% everywhere on a quickly-trained net


def test_emulator_save_load_roundtrip(trained_emulator, tmp_path):
    from eftpipe_tpu.boltzmann.emulator import TransferEmulator

    emu, k = trained_emulator
    path = tmp_path / "emu.npz"
    emu.save(path)
    emu2 = TransferEmulator.load(path)
    x = jnp.asarray([0.0223, 0.118, 0.69, 0.965])
    np.testing.assert_allclose(np.asarray(emu(x)), np.asarray(emu2(x)), rtol=1e-12)


def test_emulator_provider_matches_eh98(trained_emulator, tmp_path):
    """EmulatorProvider's P_lin tracks the direct EH98 provider to ~2%."""
    from eftpipe_tpu.boltzmann.emulator import EmulatorProvider
    from eftpipe_tpu.boltzmann.eh98 import EisensteinHuProvider
    from eftpipe_tpu.models.config import EFTConfig

    emu, k = trained_emulator
    path = tmp_path / "emu.npz"
    emu.save(path)
    cfg = EFTConfig(kin_max=0.9)  # keep kin·h inside the emulator grid
    prov_e = EmulatorProvider.load(cfg, zeff=0.7, path=path, om_fid=0.31)
    prov_d = EisensteinHuProvider(cfg=cfg, zeff=0.7)
    params = {"omega_b": 0.0223, "omega_cdm": 0.118, "h": 0.69,
              "ln10As": 3.05, "ns": 0.965}
    ci_e = prov_e.inputs(params)
    ci_d = prov_d.inputs(params)
    np.testing.assert_allclose(np.asarray(ci_e.f), np.asarray(ci_d.f), rtol=1e-6)
    rel = np.abs(np.asarray(ci_e.plin) / np.asarray(ci_d.plin) - 1.0)
    assert np.max(rel) < 0.05
    assert np.median(rel) < 0.02
