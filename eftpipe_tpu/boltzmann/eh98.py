"""JAX-native Eisenstein–Hu (1998) linear power spectrum + LCDM background.

A fully on-device, differentiable cosmology → P_lin map (astro-ph/9709112,
including the baryon-acoustic-oscillation features), playing the role of the
reference's emulator backend (``MatryoshkaCosmo``,
/root/reference/eftpipe/matryoshka.py:67-157) without external dependencies:
every quantity (transfer function, growth factor/rate, comoving distances,
sound horizon) is closed-form or a fixed-node quadrature, so the whole
cosmology→multipoles→likelihood chain stays inside one jitted graph and is
vmap-able over walkers.  For production-accuracy spectra, feed CLASS/CAMB
tables through ``TabulatedProvider`` instead.

Parameters sampled: omega_b (=Ωb h²), omega_cdm (=Ωc h²), h, ln10As, ns.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from dataclasses import dataclass

from ..models.config import EFTConfig
from ..models.pipeline import CosmoInputs

_TCMB = 2.7255
_KPIVOT = 0.05  # 1/Mpc


def _t0_tilde(q, alpha, beta):
    c = 14.2 / alpha + 386.0 / (1.0 + 69.9 * q**1.08)
    lnterm = jnp.log(jnp.e + 1.8 * beta * q)
    return lnterm / (lnterm + c * q * q)


def eh98_transfer(k_mpc, omega_b, omega_m, h):
    """Full EH98 transfer function T(k) with BAO wiggles; k in 1/Mpc.

    Returns (T, s) with s the sound horizon at the drag epoch [Mpc].
    """
    theta = _TCMB / 2.7
    ob_om = omega_b / omega_m
    oc_om = 1.0 - ob_om

    z_eq = 2.50e4 * omega_m * theta**-4
    k_eq = 7.46e-2 * omega_m * theta**-2
    b1 = 0.313 * omega_m**-0.419 * (1.0 + 0.607 * omega_m**0.674)
    b2 = 0.238 * omega_m**0.223
    z_d = 1291.0 * omega_m**0.251 / (1.0 + 0.659 * omega_m**0.828) * (
        1.0 + b1 * omega_b**b2
    )
    r_of_z = lambda z: 31.5 * omega_b * theta**-4 * (z / 1e3) ** -1
    r_d = r_of_z(z_d)
    r_eq = r_of_z(z_eq)
    s = (
        2.0 / (3.0 * k_eq) * jnp.sqrt(6.0 / r_eq)
        * jnp.log((jnp.sqrt(1.0 + r_d) + jnp.sqrt(r_d + r_eq)) / (1.0 + jnp.sqrt(r_eq)))
    )
    k_silk = 1.6 * omega_b**0.52 * omega_m**0.73 * (1.0 + (10.4 * omega_m) ** -0.95)

    q = k_mpc / (13.41 * k_eq)

    a1 = (46.9 * omega_m) ** 0.670 * (1.0 + (32.1 * omega_m) ** -0.532)
    a2 = (12.0 * omega_m) ** 0.424 * (1.0 + (45.0 * omega_m) ** -0.582)
    alpha_c = a1 ** (-ob_om) * a2 ** (-(ob_om**3))
    bb1 = 0.944 / (1.0 + (458.0 * omega_m) ** -0.708)
    bb2 = (0.395 * omega_m) ** -0.0266
    beta_c = 1.0 / (1.0 + bb1 * (oc_om**bb2 - 1.0))
    ks = k_mpc * s
    fk = 1.0 / (1.0 + (ks / 5.4) ** 4)
    t_c = fk * _t0_tilde(q, 1.0, beta_c) + (1.0 - fk) * _t0_tilde(q, alpha_c, beta_c)

    y = (1.0 + z_eq) / (1.0 + z_d)
    sy = jnp.sqrt(1.0 + y)
    g_y = y * (-6.0 * sy + (2.0 + 3.0 * y) * jnp.log((sy + 1.0) / (sy - 1.0)))
    alpha_b = 2.07 * k_eq * s * (1.0 + r_d) ** -0.75 * g_y
    beta_b = 0.5 + ob_om + (3.0 - 2.0 * ob_om) * jnp.sqrt((17.2 * omega_m) ** 2 + 1.0)
    beta_node = 8.41 * omega_m**0.435
    s_tilde = s / (1.0 + (beta_node / ks) ** 3) ** (1.0 / 3.0)
    kst = k_mpc * s_tilde
    j0 = jnp.sin(kst) / kst
    t_b = (
        _t0_tilde(q, 1.0, 1.0) / (1.0 + (ks / 5.2) ** 2)
        + alpha_b / (1.0 + (beta_b / ks) ** 3) * jnp.exp(-((k_mpc / k_silk) ** 1.4))
    ) * j0

    return ob_om * t_b + oc_om * t_c, s


def _gauss_nodes(n: int = 64):
    x, w = np.polynomial.legendre.leggauss(n)
    return jnp.asarray(x), jnp.asarray(w)


_GL_X, _GL_W = _gauss_nodes()


def _e_of_a(om, a):
    return jnp.sqrt(om / a**3 + (1.0 - om))


def lcdm_growth(om, z):
    """(D(z), f(z)) with D normalised to a deep in matter domination
    (fixed-node Gauss–Legendre version of pybird.py:18-31)."""
    a = 1.0 / (1.0 + z)
    # ∫_0^a da' / (a' E(a'))^3 with substitution a' = a(x+1)/2
    ap = a * (_GL_X + 1.0) / 2.0
    w = _GL_W * a / 2.0
    integ = jnp.sum(w / (ap * _e_of_a(om, ap)) ** 3)
    # cH(a) = sqrt(om/a + a²(1-om)) = a·E(a), so D = 5/2 om E(a) ∫ (a'E')⁻³ da'
    d = 2.5 * om * _e_of_a(om, a) * integ
    return d, (om * (5.0 * a - 3.0 * d)) / (2.0 * (a**3 * (1.0 - om) + om) * d)


def lcdm_background(om, z):
    """Dimensionless (H(z)/H0, H0·DA(z)) via fixed-node quadrature."""
    e = _e_of_a(om, 1.0 / (1.0 + z))
    zp = z * (_GL_X + 1.0) / 2.0
    w = _GL_W * z / 2.0
    chi = jnp.sum(w / jnp.sqrt(om * (1.0 + zp) ** 3 + (1.0 - om)))
    return e, chi / (1.0 + z)


def lcdm_growth_f(om, z):
    return lcdm_growth(om, z)[1]


def eh98_pk(cfg_kin_h, omega_b, omega_cdm, h, ln10as, ns, z):
    """P_lin(k, z) in (Mpc/h)³ on a k grid in h/Mpc, plus (f, H/H0, H0·DA,
    rdrag[Mpc])."""
    omega_m = omega_b + omega_cdm
    om = omega_m / h**2
    k_mpc = cfg_kin_h * h
    t, s = eh98_transfer(k_mpc, omega_b, omega_m, h)
    d, f = lcdm_growth(om, z)
    d0, _ = lcdm_growth(om, 0.0)
    as_ = 1e-10 * jnp.exp(ln10as)
    c_h0 = 2997.92458 / h  # c/H0 in Mpc
    # P_m(k) = (8π²/25) As (k/kp)^{ns-1} k T² (D/a·... ) (c/H0)⁴ / Ωm² — with D
    # normalised to a in matter domination the standard EH normalisation reads:
    prim = as_ * (k_mpc / _KPIVOT) ** (ns - 1.0)
    pk_mpc = (8.0 * np.pi**2 / 25.0) * prim * k_mpc * (t * d) ** 2 * c_h0**4 / om**2
    pk_h = pk_mpc * h**3  # (Mpc/h)³ with k in h/Mpc: P_h(k_h) = h³ P(k)
    e, da = lcdm_background(om, z)
    return pk_h, f, e, da, s


def sigma_r(kh, pk, r: float = 8.0):
    """σ(R) from P(k) on a log-spaced grid [h/Mpc, (Mpc/h)³] via the
    top-hat-window integral σ² = ∫ dk k² P W²(kR) / 2π²."""
    x = kh * r
    w = 3.0 * (jnp.sin(x) - x * jnp.cos(x)) / x**3
    integ = kh**3 * pk * w * w / (2.0 * np.pi**2)
    return jnp.sqrt(jnp.trapezoid(integ, jnp.log(kh)))


@dataclass
class EisensteinHuProvider:
    """On-device cosmology provider for a tracer at effective redshift z."""

    cfg: EFTConfig
    zeff: float
    da_fid: float | None = None  # dimensionless H0·DA of the fiducial cosmology
    h_fid: float | None = None   # dimensionless H/H0 of the fiducial cosmology
    use_ap: bool = True
    rdrag_fid: float | None = None  # Mpc: enables the rdrag·h-rescaled α's
    h0_fid: float | None = None     # H0/100 of the fiducial cosmology

    def _background(self, params):
        kin = jnp.asarray(self.cfg.kin)
        return eh98_pk(
            kin, params["omega_b"], params["omega_cdm"], params["h"],
            params["ln10As"], params["ns"], self.zeff,
        )

    def inputs(self, params) -> CosmoInputs:
        pk, f, e, da, _ = self._background(params)
        if self.use_ap and self.da_fid is not None:
            qperp = da / self.da_fid
            qpar = self.h_fid / e
        else:
            qperp = qpar = 1.0
        return CosmoInputs(plin=pk, f=f, qperp=qperp, qpar=qpar)

    def derived(self, params) -> dict:
        """Chain columns (reference theory.py:611-648): fz, fsigma8_z and
        α⊥/α∥ — rescaled by (rdrag_fid·h0_fid)/(rdrag·h) when the fiducial
        sound horizon is configured (pybird.py:1564-1579), else = q's."""
        pk, f, e, da, rdrag = self._background(params)
        s8z = sigma_r(jnp.asarray(self.cfg.kin), pk)
        if self.use_ap and self.da_fid is not None:
            qperp = da / self.da_fid
            qpar = self.h_fid / e
        else:
            qperp = qpar = jnp.asarray(1.0, pk.dtype)
        if self.rdrag_fid is not None and self.h0_fid is not None:
            ratio = (self.rdrag_fid * self.h0_fid) / (rdrag * params["h"])
            alperp, alpara = qperp * ratio, qpar * ratio
        else:
            alperp, alpara = qperp, qpar
        return dict(fz=f, fsigma8_z=f * s8z, alperp=alperp, alpara=alpara)
