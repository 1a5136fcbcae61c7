"""Einstein–Boltzmann solver gates (boltzmann/thermo.py,
boltzmann/einstein_boltzmann.py).

No Boltzmann oracle is installable in this environment (no classy/camb), so
the validation strategy is layered:

1. *External anchors*: published CLASS outputs for the Planck-2018 base
   cosmology (ω_b=0.02237, ω_cdm=0.1200, h=0.6736, ln10^10As=3.044,
   ns=0.9649, Σm_ν=0.06 eV) — r_drag=147.09 Mpc, z_drag≈1060, conformal age
   ≈14165 Mpc, σ8=0.8120.  These pin the absolute calibration.
2. *Exact internal invariants*: super-horizon conservation of the curvature
   perturbation ζ, adiabaticity of the ICs.
3. *Cross-model consistency*: broadband agreement with the (independent)
   Eisenstein–Hu fit to the few-% level, and the ΛCDM growth-rate
   approximation f ≈ Ω_m(z)^0.55.
4. *Self-convergence*: halving the step schedule moves P(k) by <0.1%.

The solver run is shared across tests through a module fixture (one ~2-4 min
CPU solve).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.boltzmann.thermo import (
    CosmoParams, background_tables, thermo_tables,
)
from eftpipe_tpu.boltzmann import einstein_boltzmann as eb

PLANCK = CosmoParams(
    omega_b=jnp.asarray(0.02237), omega_cdm=jnp.asarray(0.1200),
    h=jnp.asarray(0.6736), ln10As=jnp.asarray(3.044), ns=jnp.asarray(0.9649),
)


# ---------------------------------------------------------------------------
# thermodynamics (fast)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def thermo():
    bg = background_tables(PLANCK)
    th = thermo_tables(PLANCK, bg)
    return bg, th


def test_background_conformal_age(thermo):
    bg, _ = thermo
    # CLASS: conformal age ≈ 14164.8 Mpc for this cosmology
    np.testing.assert_allclose(float(bg.tau0), 14164.8, rtol=2e-3)


def test_drag_epoch_anchors(thermo):
    _, th = thermo
    np.testing.assert_allclose(float(th.rs_drag), 147.09, rtol=3e-3)
    np.testing.assert_allclose(float(th.z_drag), 1059.9, rtol=3e-3)
    # visibility peak (recombination) conformal time ≈ 280.4 Mpc
    np.testing.assert_allclose(float(th.tau_rec), 280.4, rtol=5e-3)


def test_xe_freezeout(thermo):
    _, th = thermo
    xe = np.asarray(th.xe)
    # residual ionization fraction freezes out at a few 1e-4
    assert 1e-4 < xe[-1] < 4e-4
    # fully ionized early (H + both He stages)
    assert abs(xe[0] - (1.0 + 2.0 * 0.2454 / (4 * (1 - 0.2454)))) < 1e-3


# ---------------------------------------------------------------------------
# perturbations (slow, shared solve)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def solution():
    solver = eb.EBSolver(z_out=[0.0, 0.7], kmax=1.2)
    return solver, solver(PLANCK)


@pytest.mark.slow
def test_zeta_normalisation_and_conservation(solution):
    """Exact internal invariant (validation-strategy item 2): on adiabatic
    super-horizon modes the curvature ζ is conserved (ζ̇ = O((kτ)²)) and the
    IC normalization sets |ζ_ini| = 1 (C = 1/2).  Integrates the three
    lowest k-modes with eb.zeta_track and bounds the drift while kτ ≲ 0.3."""
    solver, _ = solution
    bg = background_tables(PLANCK)
    th = thermo_tables(PLANCK, bg)
    tab = eb.make_tables(PLANCK, bg, th)
    for ki in (0, 1, 2):
        k = float(solver.k_mpc[ki])
        for idx, grids, masks, _oidx in solver.buckets:
            pos = np.where(np.asarray(idx) == ki)[0]
            if pos.size:
                grid = np.asarray(grids)[pos[0]]
                mask = np.asarray(masks)[pos[0]]
                break
        zs = np.asarray(eb.zeta_track(
            tab, jnp.asarray(k), jnp.asarray(grid), jnp.asarray(mask)
        ))
        # normalization: ζ_ini is the super-horizon constant, |ζ| = 1
        np.testing.assert_allclose(abs(zs[0]), 1.0, atol=1e-6)
        tau = np.interp(grid, np.asarray(bg.lna), np.asarray(bg.tau))
        sel = k * tau <= 0.3
        drift = np.abs(zs[sel] / zs[0] - 1.0).max()
        # measured ~2e-4 for the lowest modes (kτ_max ≈ 0.07-0.17);
        # 3e-3 bounds the O((kτ)²) tail at the kτ = 0.3 cut
        assert drift < 3e-3, f"k={k:.2e}: zeta drift {drift:.2e}"


@pytest.mark.slow
def test_sigma8_planck_anchor(solution):
    _, lp = solution
    s8 = float(lp.sigma8[lp.z.tolist().index(0.0)])
    # CLASS: σ8 = 0.8120 — an end-to-end integral over the whole spectrum
    np.testing.assert_allclose(s8, 0.8120, rtol=0.01)


@pytest.mark.slow
def test_growth_rate_lcdm(solution):
    _, lp = solution
    i = lp.z.tolist().index(0.7)
    f = float(lp.f[i])
    om0 = (0.02237 + 0.1200 + 0.0006442) / 0.6736**2
    omz = om0 * 1.7**3 / (om0 * 1.7**3 + 1.0 - om0)
    assert abs(f - omz**0.55) < 0.02


@pytest.mark.slow
def test_eh98_broadband(solution):
    """The independent EH98 fit agrees at the few-% level over the EFT range
    (EH98 itself is only ~1-3% accurate and has no massive-ν suppression)."""
    from eftpipe_tpu.boltzmann.eh98 import eh98_pk

    solver, lp = solution
    iz = lp.z.tolist().index(0.0)
    k = np.asarray(lp.k_mpc)
    sel = (k > 1e-3) & (k < 0.6)
    h = float(PLANCK.h)
    pk_eh = np.asarray(
        eh98_pk(jnp.asarray(k[sel] / h), 0.02237, 0.1200, h, 3.044,
                0.9649, 0.0)[0]
    )
    ratio = np.asarray(lp.pk[iz])[sel] * h**3 / pk_eh
    assert 0.90 < ratio.min() and ratio.max() < 1.06, (
        ratio.min(), ratio.max()
    )


@pytest.mark.slow
def test_step_convergence():
    """Halving the phase step and tightening TCA moves P(k) by < 0.1%."""
    ks = np.array([0.005, 0.05, 0.2, 0.6])
    z = [0.7]
    lna_out = np.log(1.0 / (1.0 + np.asarray(z)))
    bg = background_tables(PLANCK)
    th = thermo_tables(PLANCK, bg)
    tab = eb.make_tables(PLANCK, bg, th)

    def solve(**opts):
        grids, masks = eb.build_schedule(ks, bg, th, lna_out, **opts)
        oi = eb.out_indices(grids, lna_out)
        out = eb.solve_perturbations(
            PLANCK, tab, jnp.asarray(ks), jnp.asarray(grids),
            jnp.asarray(masks), jnp.asarray(oi)
        )
        return np.asarray(out.delta_m[0] / out.zeta_ini)

    base = solve()
    fine = solve(phase_acc=0.11, phase_post=0.5, dlna_max=0.02)
    np.testing.assert_allclose(base, fine, rtol=1e-3)
