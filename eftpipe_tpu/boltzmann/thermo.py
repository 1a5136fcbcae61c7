"""Background cosmology + recombination thermodynamics for the on-device
Einstein–Boltzmann solver (:mod:`eftpipe_tpu.boltzmann.einstein_boltzmann`).

This plays the role CLASS's ``background.c`` + ``thermodynamics.c`` play for
the reference (`/root/reference/eftpipe/classy.py:95-183`,
`boltzmann.py:191-243` wrap CLASS as the production cosmology oracle): it
produces the homogeneous expansion history and the free-electron fraction
x_e(a) that the perturbation equations need — fully in JAX, float64,
differentiable and vmappable over cosmologies.

Physics content:

* background: photons, massless neutrinos (N_ur), one optional massive
  neutrino species (degenerate mass, exact Fermi–Dirac momentum integrals on
  a Gauss–Laguerre grid), baryons, CDM, Λ (flat closure);
* recombination: Saha equilibrium for He III/He II/He I and early H, then a
  Peebles three-level-atom ODE for hydrogen with the RECFAST case-B fudge
  (F = 1.14), integrated L-stably (backward Euler is algebraically solvable:
  the update is a scalar quadratic);
* matter temperature via Compton coupling (backward Euler, exact linear
  solve), baryon sound speed c_s²(a);
* derived epochs: optical depth κ(τ), drag depth, r_s(τ), r_drag, τ(a).

All tables are returned on a fixed log-a grid as plain arrays; the
perturbation module interpolates them linearly in ln a.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from typing import NamedTuple

# ---------------------------------------------------------------------------
# physical constants (SI)
# ---------------------------------------------------------------------------
C_SI = 2.99792458e8              # m/s
MPC_M = 3.0856775814913673e22    # m
KB = 1.380649e-23                # J/K
HP = 6.62607015e-34              # J s
ME = 9.1093837015e-31            # kg
MH = 1.6735575e-27               # kg (neutral hydrogen)
SIGMA_T = 6.6524587321e-29       # m²
EV = 1.602176634e-19             # J
A_RAD = 7.565723e-16             # radiation constant, J m⁻³ K⁻⁴
H100_SI = 1.0e5 / MPC_M          # 100 km/s/Mpc in 1/s
RHO_CRIT_H2 = 1.878341616e-26    # critical density / h², kg/m³

TCMB_K = 2.7255
OMEGA_G_H2 = A_RAD * TCMB_K**4 / C_SI**2 / RHO_CRIT_H2  # ≈ 2.4728e-5
# CLASS convention: T_ncdm/T_γ chosen so that ω_ncdm ≈ Σm/93.14 eV
T_NCDM_FAC = 0.71611
# one massless-neutrino family in units of photons: (7/8)(4/11)^(4/3)
UR_FAC = 0.875 * (4.0 / 11.0) ** (4.0 / 3.0)

B1_EV = 13.598434      # H ionization from 1s
B2_EV = B1_EV / 4.0    # from 2s
E21_EV = B1_EV * 0.75  # Lyman-alpha
CHI_HE1_EV = 24.587389
CHI_HE2_EV = 54.417765
LAM_2S1S = 8.2245809            # 2s->1s two-photon rate, 1/s
LAM_ALPHA = HP * C_SI / (E21_EV * EV)   # Lyman-alpha wavelength, m
RECFAST_F = 1.14                # case-B fudge factor

_NQ_BG = 24  # Gauss–Laguerre nodes for the ncdm background integrals
_qbg, _wbg = np.polynomial.laguerre.laggauss(_NQ_BG)
# weights for ∫ q^2 .. q^3 f(q) dq with f = 1/(e^q+1): fold e^{+q} back in
_WQ2 = jnp.asarray(_wbg * _qbg**2 * np.exp(_qbg) / (np.exp(_qbg) + 1.0))
_WQ3 = jnp.asarray(_wbg * _qbg**3 * np.exp(_qbg) / (np.exp(_qbg) + 1.0))
_QBG = jnp.asarray(_qbg)
_RHO_MASSLESS = float(np.sum(_wbg * _qbg**3 * np.exp(_qbg) / (np.exp(_qbg) + 1.0)))
# = 7π⁴/120 ≈ 5.6822


class CosmoParams(NamedTuple):
    """Input cosmology (flat ΛCDM + massive ν).  All jax-traceable.

    ``m_ncdm`` is the PER-SPECIES mass and ``deg_ncdm`` the number of
    degenerate species sharing it (the reference's classynu 'degenerate'
    hierarchy is Σm_ν split over N_ncdm=3 with N_ur=0.00641,
    /root/reference/eftpipe/classy.py:107-128,156-177)."""

    omega_b: jnp.ndarray
    omega_cdm: jnp.ndarray
    h: jnp.ndarray
    ln10As: jnp.ndarray
    ns: jnp.ndarray
    m_ncdm: jnp.ndarray = jnp.asarray(0.06)   # eV per species (0 disables)
    n_ur: jnp.ndarray = jnp.asarray(2.0328)   # massless families
    yhe: jnp.ndarray = jnp.asarray(0.2454)
    deg_ncdm: float = 1.0                     # static degeneracy factor


def ncdm_rho_p(y):
    """(ρ, p) of one massive-ν species relative to its massless limit, as a
    function of y = a m c²/(k_B T_ncdm,0).  Exact Fermi–Dirac integrals."""
    eps = jnp.sqrt(_QBG[:, None] ** 2 + y[None, :] ** 2)
    rho = jnp.sum(_WQ2[:, None] * eps, axis=0) / _RHO_MASSLESS
    p = jnp.sum(_WQ2[:, None] * _QBG[:, None] ** 2 / (3.0 * eps), axis=0) / _RHO_MASSLESS
    return rho, p


class Background(NamedTuple):
    """Homogeneous quantities on the ln-a grid (all Mpc units, ℋ = aH)."""

    lna: jnp.ndarray
    tau: jnp.ndarray        # conformal time, Mpc
    conf_h: jnp.ndarray     # ℋ(a), 1/Mpc
    conf_h_prime: jnp.ndarray  # dℋ/dτ, 1/Mpc²
    # density parameters ρ̂_i(a) ≡ (8πG/3)ρ_i a², 1/Mpc² (so ℋ² = Σ ρ̂_i a²·…)
    rho_g: jnp.ndarray
    rho_ur: jnp.ndarray
    rho_b: jnp.ndarray
    rho_c: jnp.ndarray
    rho_lambda: jnp.ndarray
    rho_ncdm: jnp.ndarray
    p_ncdm: jnp.ndarray
    y_ncdm: jnp.ndarray     # a m / T_ncdm0 on the grid
    tau0: jnp.ndarray       # conformal age, Mpc


def _h0_mpc(h):
    return h / 2997.92458


def background_tables(par: CosmoParams, lna_min: float = -21.0,
                      n_grid: int = 4096) -> Background:
    """Expansion history on a fixed ln-a grid (default a = 7.6e-10 … 1)."""
    lna = jnp.linspace(lna_min, 0.0, n_grid)
    a = jnp.exp(lna)
    h0 = _h0_mpc(par.h)
    h2 = par.h**2

    om_g = OMEGA_G_H2 / h2
    om_ur = par.n_ur * UR_FAC * OMEGA_G_H2 / h2
    om_b = par.omega_b / h2
    om_c = par.omega_cdm / h2

    # massive neutrino: T_ncdm0 in eV-equivalent units; y = a m / T_ncdm0;
    # one fermion family at temperature T_ncdm has (7/8)(T_ncdm/Tγ)⁴ ρ_γ in
    # the massless limit
    t_ncdm0_ev = T_NCDM_FAC * TCMB_K * KB / EV
    y0 = jnp.asarray(par.m_ncdm) / t_ncdm0_ev
    om_ncdm_massless = par.deg_ncdm * 0.875 * T_NCDM_FAC**4 * OMEGA_G_H2 / h2
    rho_fac, p_fac = ncdm_rho_p(y0 * a)
    rho1, _ = ncdm_rho_p(y0[None])
    om_ncdm_today = om_ncdm_massless * rho1[0]

    om_lambda = 1.0 - om_g - om_ur - om_b - om_c - om_ncdm_today

    # ρ̂_i(a)·a² in ℋ² = Σ … (all in units of H0² = h0²)
    e2_a2 = (
        (om_g + om_ur) / a**2
        + (om_b + om_c) / a
        + om_lambda * a**2
        + om_ncdm_massless * rho_fac / a**2
    )
    conf_h = h0 * jnp.sqrt(e2_a2)

    # conformal time: dτ = dlna/ℋ, cumulative trapezoid + exact RD piece
    # below the grid (τ = a/(H0 √Ω_r) in pure radiation domination)
    integrand = 1.0 / conf_h
    dlna = lna[1] - lna[0]
    cumt = jnp.concatenate([
        jnp.zeros(1),
        jnp.cumsum(0.5 * (integrand[1:] + integrand[:-1]) * dlna),
    ])
    om_r_tot = om_g + om_ur + om_ncdm_massless * rho_fac[0]
    tau_start = a[0] / (h0 * jnp.sqrt(om_r_tot))
    tau = tau_start + cumt

    # dℋ/dτ = a·dℋ/da·ℋ/ℋ … use ℋ' = ℋ·dℋ/dlna
    dlnh = jnp.gradient(jnp.log(conf_h), dlna)
    conf_h_prime = conf_h**2 * dlnh

    rho = lambda om, power: h0**2 * om / a**power
    return Background(
        lna=lna, tau=tau, conf_h=conf_h, conf_h_prime=conf_h_prime,
        rho_g=rho(om_g, 4) * a**2, rho_ur=rho(om_ur, 4) * a**2,
        rho_b=rho(om_b, 3) * a**2, rho_c=rho(om_c, 3) * a**2,
        rho_lambda=h0**2 * om_lambda * a**2,
        rho_ncdm=h0**2 * om_ncdm_massless * rho_fac / a**2,
        p_ncdm=h0**2 * om_ncdm_massless * p_fac / a**2,
        y_ncdm=y0 * a,
        tau0=tau[-1],
    )


# ---------------------------------------------------------------------------
# recombination
# ---------------------------------------------------------------------------
def _alpha_b(tm):
    """Case-B recombination coefficient (RECFAST Hummer fit, m³/s) including
    the F = 1.14 fudge."""
    t = tm / 1.0e4
    return RECFAST_F * 4.309e-19 * t**-0.6166 / (1.0 + 0.6703 * t**0.5300)


def _saha_s(t_k, chi_ev):
    """(2π m_e k T / h²)^{3/2} e^{-χ/kT}, m⁻³ (clipped exponent)."""
    pref = (2.0 * jnp.pi * ME * KB * t_k / HP**2) ** 1.5
    return pref * jnp.exp(jnp.clip(-chi_ev * EV / (KB * t_k), -300.0, 0.0))


def _saha_xe(t_k, n_h, f_he):
    """Equilibrium (x_H, x_HeII, x_HeIII) by fixed-point iteration over n_e."""
    s_h = _saha_s(t_k, B1_EV)
    s_he1 = 4.0 * _saha_s(t_k, CHI_HE1_EV)
    s_he2 = _saha_s(t_k, CHI_HE2_EV)

    def body(_, ne):
        ne = jnp.maximum(ne, 1e-20 * n_h)
        x_h = s_h / (s_h + ne)
        r21 = s_he1 / ne
        r32 = s_he2 / ne
        den = 1.0 + r21 + r21 * r32
        x_he2 = r21 / den
        x_he3 = r21 * r32 / den
        return n_h * (x_h + f_he * (x_he2 + 2.0 * x_he3))

    ne = jax.lax.fori_loop(0, 30, body, n_h * (1.0 + 2.0 * f_he))
    ne = jnp.maximum(ne, 1e-20 * n_h)
    x_h = s_h / (s_h + ne)
    r21, r32 = s_he1 / ne, s_he2 / ne
    den = 1.0 + r21 + r21 * r32
    return x_h, r21 / den, r21 * r32 / den


class Thermo(NamedTuple):
    """Thermodynamic history on the background's ln-a grid."""

    lna: jnp.ndarray
    xe: jnp.ndarray          # n_e/n_H (without reionization)
    tm: jnp.ndarray          # matter temperature, K
    dkappa: jnp.ndarray      # dκ/dτ = a n_e σ_T, 1/Mpc
    cs2: jnp.ndarray         # baryon sound speed squared (c=1)
    r_bg: jnp.ndarray        # R ≡ 3ρ_b/(4ρ_γ)
    rs: jnp.ndarray          # sound horizon ∫ c_s dτ, Mpc
    tau_drag: jnp.ndarray    # conformal time of the drag epoch, Mpc
    rs_drag: jnp.ndarray     # r_s(τ_drag), Mpc
    z_drag: jnp.ndarray
    tau_rec: jnp.ndarray     # visibility-peak conformal time (approx), Mpc


def thermo_tables(par: CosmoParams, bg: Background,
                  n_fine: int = 32768) -> Thermo:
    """Thermodynamic history, downsampled onto ``bg``'s grid.

    The recombination scan runs on an internal fine grid (``n_fine``; the
    integrator's leading error is first order in dlna through the stiff
    Saha→Peebles transition, and 4096 points leave a ~0.1% r_drag bias) and
    the results are linearly interpolated onto the caller's grid.  Pass
    ``n_fine=0`` to integrate directly on ``bg``'s grid.
    """
    if n_fine and n_fine > bg.lna.size:
        bg_f = background_tables(par, n_grid=n_fine)
        th_f = _thermo_on_grid(par, bg_f)
        g = lambda t: jnp.interp(bg.lna, th_f.lna, t)
        return Thermo(
            lna=bg.lna, xe=g(th_f.xe), tm=g(th_f.tm), dkappa=g(th_f.dkappa),
            cs2=g(th_f.cs2), r_bg=0.75 * bg.rho_b / bg.rho_g, rs=g(th_f.rs),
            tau_drag=th_f.tau_drag, rs_drag=th_f.rs_drag, z_drag=th_f.z_drag,
            tau_rec=th_f.tau_rec,
        )
    return _thermo_on_grid(par, bg)


def _thermo_on_grid(par: CosmoParams, bg: Background) -> Thermo:
    lna = bg.lna
    a = jnp.exp(lna)
    dlna = lna[1] - lna[0]
    h0_si = par.h * H100_SI
    tg = TCMB_K / a

    f_he = par.yhe / (4.0 * (1.0 - par.yhe))
    n_h0 = (1.0 - par.yhe) * par.omega_b * RHO_CRIT_H2 / MH  # m⁻³ today
    n_h = n_h0 / a**3

    # H(a) in 1/s for the rate equations
    h_si = bg.conf_h / a * (C_SI / MPC_M)

    # --- scan: hydrogen (Saha → Peebles) + T_M ------------------------------
    # Second-order in dlna: the Peebles update is Crank-Nicolson (the
    # implicit half is still a scalar quadratic; the Lyman-alpha C factor is
    # re-iterated once at the provisional root), the matter temperature is an
    # exact exponential step with midpoint coefficients (L-stable — CN would
    # ring in the early Compton-locked regime where Γ/H ~ 1e8).  Backward
    # Euler left an O(dlna) global error that biased z_drag by ~5.
    def peebles_rate(x, tm, tg_i, nh_i, h_i):
        alpha = _alpha_b(tm)
        beta2 = alpha * (2.0 * jnp.pi * ME * KB * tm / HP**2) ** 1.5 * jnp.exp(
            jnp.clip(-B2_EV * EV / (KB * tm), -300.0, 0.0)
        )
        boltz = jnp.exp(jnp.clip(-E21_EV * EV / (KB * tg_i), -300.0, 0.0))
        n1s = jnp.maximum(1.0 - x, 1e-12) * nh_i
        k_ly = LAM_ALPHA**3 / (8.0 * jnp.pi * h_i)
        c_peeb = (1.0 + k_ly * LAM_2S1S * n1s) / (
            1.0 + k_ly * (LAM_2S1S + beta2) * n1s
        )
        g = c_peeb / h_i
        return g * (beta2 * boltz * (1.0 - x) - alpha * nh_i * x**2), \
            (g, alpha, beta2, boltz)

    def t_exp_step(t_prev, xe_mid, tg_m, h_m):
        """Exact exponential step of T' = -λT + s with frozen coefficients."""
        gamma_c = (
            8.0 * SIGMA_T * A_RAD * tg_m**4 * xe_mid
            / (3.0 * ME * C_SI * (1.0 + f_he + xe_mid))
        )
        lam = 2.0 + gamma_c / h_m
        t_eq = (gamma_c / h_m) * tg_m / lam
        return t_eq + (t_prev - t_eq) * jnp.exp(
            -jnp.clip(lam * dlna, 0.0, 300.0)
        )

    def step(carry, inp):
        x_prev, t_prev, xe_prev, was_saha = carry
        (tg_o, tg_i, nh_o, nh_i, h_o, h_i) = inp
        tg_m, h_m = 0.5 * (tg_o + tg_i), 0.5 * (h_o + h_i)

        x_saha, x_he2, x_he3 = _saha_xe(tg_i, nh_i, f_he)

        # provisional T at the new point (x_e lagged) so the implicit half's
        # rate coefficients are evaluated at the NEW temperature — leaving
        # them at T_prev reintroduces an O(dlna) term
        t_star = t_exp_step(t_prev, xe_prev, tg_m, h_m)

        # explicit half at the OLD point (coefficients at T_prev); the first
        # post-Saha step falls back to L-stable backward Euler — CN's
        # marginal stiff-mode damping would ring the handoff offset down
        # only slowly, leaving an O(dlna) tail on the drag epoch
        f_old, _ = peebles_rate(x_prev, t_prev, tg_o, nh_o, h_o)
        theta = jnp.where(was_saha, 1.0, 0.5)  # implicit weight
        f_old = (1.0 - theta) / theta * f_old

        def solve_implicit(x_for_c):
            # implicit part at the NEW point; C factor frozen at x_for_c
            _, (g, alpha, beta2, boltz) = peebles_rate(
                x_for_c, t_star, tg_i, nh_i, h_i
            )
            hd = theta * dlna
            a2 = hd * g * alpha * nh_i
            a1 = 1.0 + hd * g * beta2 * boltz
            a0 = -(x_prev + hd * f_old + hd * g * beta2 * boltz)
            disc = jnp.sqrt(jnp.maximum(a1**2 - 4.0 * a2 * a0, 0.0))
            return jnp.where(a2 > 1e-30, (-a1 + disc) / (2.0 * a2), -a0 / a1)

        x_star = solve_implicit(x_prev)
        x_peebles = solve_implicit(jnp.clip(x_star, 0.0, 1.0))
        use_saha = x_saha > 0.999
        x_h = jnp.clip(jnp.where(use_saha, x_saha, x_peebles), 0.0, 1.0)

        xe = x_h + f_he * (x_he2 + 2.0 * x_he3)

        t_new = t_exp_step(t_prev, 0.5 * (xe_prev + xe), tg_m, h_m)
        return (x_h, t_new, xe, use_saha), (x_h, xe, t_new)

    x0 = jnp.asarray(1.0)
    t0 = tg[0]
    xe0 = 1.0 + 2.0 * f_he
    shift = lambda arr: jnp.concatenate([arr[:1], arr[:-1]])

    (_, _, _, _), (xh, xe, tm) = jax.lax.scan(
        step, (x0, t0, xe0, jnp.asarray(True)),
        (shift(tg), tg, shift(n_h), n_h, shift(h_si), h_si),
    )

    dkappa = a * xe * n_h * SIGMA_T * MPC_M  # 1/Mpc

    # baryon sound speed c_s² = kT/(μ m_H c²)(1 - ⅓ dlnT/dlna), with the
    # mean molecular weight per particle μ = (1+4f_He)/(1+f_He+x_e)
    mu = (1.0 + 4.0 * f_he) / (1.0 + f_he + xe)
    dlntm = jnp.gradient(jnp.log(tm), dlna)
    cs2 = KB * tm / (mu * MH * C_SI**2) * (1.0 - dlntm / 3.0)

    r_bg = 0.75 * bg.rho_b / bg.rho_g

    # sound horizon r_s(τ) = ∫ dτ/sqrt(3(1+R))
    integ = 1.0 / (bg.conf_h * jnp.sqrt(3.0 * (1.0 + r_bg)))
    rs = jnp.concatenate([
        jnp.zeros(1),
        jnp.cumsum(0.5 * (integ[1:] + integ[:-1]) * dlna),
    ])
    # exact RD start: r_s(a0) = τ(a0)/√3 (R → 0)
    rs = rs + bg.tau[0] / jnp.sqrt(3.0)

    # drag depth τ_d(a) = ∫_a^1 (dκ/dτ)/R dτ = ∫ dlna dκ/dτ /(R ℋ).
    # Integrate from the LATE end (suffix sum): the integrand grows ~a⁻¹
    # towards early times, so "total minus prefix" loses ~14 digits to
    # cancellation near the τ_d = 1 crossing (the depth came out quantized
    # in steps of 1/32, putting ±0.2 Mpc of jagged noise on r_drag across
    # cosmologies)
    ointeg = dkappa / (r_bg * bg.conf_h)
    mid = 0.5 * (ointeg[1:] + ointeg[:-1]) * dlna
    drag = jnp.concatenate([
        jnp.cumsum(mid[::-1])[::-1], jnp.zeros(1),
    ])  # from a to today
    # z_drag: where the drag depth crosses 1.  log(drag) is steeply curved
    # (slope ~ -κ'/R/ℋ), so a two-point linear crossing carries an
    # O(Δ²·f'') error that OSCILLATES as the root slides through grid
    # cells — enough to put ~0.1 Mpc of non-smooth jitter on r_drag across
    # cosmologies (it polluted the emulator's rdrag output).  A three-point
    # quadratic root keeps the crossing smooth in the parameters.
    idx = jnp.clip(jnp.searchsorted(-drag, -1.0), 2, lna.size - 1)
    y0 = jnp.log(jnp.maximum(drag[idx - 2], 1e-300))
    y1 = jnp.log(jnp.maximum(drag[idx - 1], 1e-300))
    y2 = jnp.log(jnp.maximum(drag[idx], 1e-300))
    # parabola centred on idx-1: y(s) = y1 + b s + a s², root s ∈ [0, 1]
    # (y1 ≥ 0 > y2 so b < 0); citardauq form is stable in the a → 0 limit
    a_q = 0.5 * (y2 - 2.0 * y1 + y0)
    b_q = 0.5 * (y2 - y0)
    disc = jnp.sqrt(jnp.maximum(b_q**2 - 4.0 * a_q * y1, 0.0))
    s_root = 2.0 * y1 / (-b_q + disc)
    s_root = jnp.clip(jnp.where(jnp.isfinite(s_root), s_root, -y1 / b_q),
                      0.0, 1.0)
    lna_drag = lna[idx - 1] + s_root * (lna[1] - lna[0])
    tau_drag = jnp.interp(lna_drag, lna, bg.tau)
    rs_drag = jnp.interp(lna_drag, lna, rs)
    z_drag = jnp.exp(-lna_drag) - 1.0

    # optical depth to today & visibility peak (approximate recombination τ);
    # suffix sum for the same cancellation reason as the drag depth
    kinteg = dkappa / bg.conf_h
    kmid = 0.5 * (kinteg[1:] + kinteg[:-1]) * dlna
    kappa = jnp.concatenate([jnp.cumsum(kmid[::-1])[::-1], jnp.zeros(1)])
    vis = dkappa * jnp.exp(-jnp.clip(kappa, 0.0, 200.0))
    tau_rec = bg.tau[jnp.argmax(vis)]

    return Thermo(
        lna=lna, xe=xe, tm=tm, dkappa=dkappa, cs2=cs2, r_bg=r_bg, rs=rs,
        tau_drag=tau_drag, rs_drag=rs_drag, z_drag=z_drag, tau_rec=tau_rec,
    )
