"""On-device Hamiltonian Monte Carlo with warmup adaptation.

The reference samples with Cobaya's Metropolis MCMC — gradient-free, because
its theory code is NumPy.  Here the whole posterior is differentiable JAX, so
gradient-based sampling comes for free: a vmapped HMC with leapfrog
integration under ``lax.scan``, dual-averaging step-size adaptation to a
target acceptance rate and diagonal mass-matrix estimation during warmup.
Many chains run as one jit-compiled program; the chain axis shards over the
device mesh exactly like the ensemble walkers (parallel/mesh.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple


class HMCState(NamedTuple):
    q: jnp.ndarray          # (nchains, ndim) positions
    logp: jnp.ndarray       # (nchains,)
    grad: jnp.ndarray       # (nchains, ndim)


class DAState(NamedTuple):
    """Dual-averaging state (Hoffman & Gelman 2014, Algorithm 5)."""

    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    t: jnp.ndarray


def _mass_ops(inv_mass):
    """Kinetic-energy operators for a diagonal ``(ndim,)`` or dense
    ``(ndim, ndim)`` inverse mass matrix (= the metric ≈ posterior
    covariance).

    A DENSE metric whitens correlated posteriors: with Σ the (Laplace)
    posterior covariance as inv_mass, the leapfrog integrates the posterior
    in its own eigenbasis, so a handful of steps decorrelates chains that a
    diagonal metric random-walks through (the DR16 production posterior has
    strong bias/cosmology correlations — diag metric τ ≈ 7 at L=4, dense
    τ ≈ 1).  Momenta are p ~ N(0, Σ⁻¹): with Σ = LLᵀ, p = L⁻ᵀz gives
    cov(p) = L⁻ᵀL⁻¹ = Σ⁻¹ without ever forming the inverse.

    Returns ``(sample_p, velocity, kinetic)`` acting on (nchains, ndim)."""
    if inv_mass.ndim == 1:
        sigma = jnp.sqrt(1.0 / inv_mass)

        def sample_p(z):
            return z * sigma

        def velocity(p):
            return inv_mass * p

        def kinetic(p):
            return 0.5 * jnp.sum(inv_mass * p * p, axis=-1)

    else:
        chol = jnp.linalg.cholesky(inv_mass)  # Σ = L Lᵀ (tiny: ndim ≤ ~20)

        def sample_p(z):
            # solve Lᵀ p = z per chain: p = L⁻ᵀ z
            return jax.scipy.linalg.solve_triangular(
                chol.T, z.T, lower=False).T

        def velocity(p):
            return p @ inv_mass  # Σ symmetric

        def kinetic(p):
            return 0.5 * jnp.sum(p * (p @ inv_mass), axis=-1)

    return sample_p, velocity, kinetic


def _leapfrog(logp_grad_fn, q, p, grad, eps, velocity, n_steps):
    """n_steps leapfrog updates; eps may be per-chain (nchains, 1).

    ``n_steps`` may be a TRACED int32 (the randomized trajectory length) —
    the loop lowers to ``lax.while_loop``, so only the steps actually taken
    are executed (a masked scan would always pay the maximum)."""

    def cond(carry):
        i = carry[0]
        return i < n_steps

    def body(carry):
        i, q, p, grad = carry
        p = p + 0.5 * eps * grad
        q = q + eps * velocity(p)
        _, grad = logp_grad_fn(q)
        p = p + 0.5 * eps * grad
        return (i + 1, q, p, grad)

    _, q, p, grad = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), q, p, grad))
    return q, p, grad


@dataclass(eq=False)
class HMC:
    """Fixed-path-length HMC, vmapped over chains.

    Parameters
    ----------
    logp : scalar log-posterior (jit/grad-able)
    n_leapfrog : leapfrog steps per proposal
    target_accept : dual-averaging target during warmup
    """

    logp: Callable
    ndim: int
    n_leapfrog: int = 16
    target_accept: float = 0.8
    jitter: float = 0.1  # uniform step-size jitter to decorrelate paths
    mesh: "jax.sharding.Mesh | None" = None
    mesh_axis: str = "walkers"

    def __post_init__(self):
        def lp_and_grad(q):
            # pin the value to the chain dtype: a posterior that accumulates
            # its chi2 in f64 (e.g. f64 data constants under an x64 session)
            # would otherwise promote accept probs/dual-averaging state and
            # break the scan carries' dtype invariance
            v, g = jax.value_and_grad(self.logp)(q)
            return v.astype(q.dtype), g

        self._lpg = jax.vmap(lp_and_grad)
        self._sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(self.mesh, P(self.mesh_axis))

    def _constrain(self, state: HMCState) -> HMCState:
        """Pin the chain axis to the device mesh (data-parallel chains)."""
        if self._sharding is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P

        lp_s = NamedSharding(self.mesh, P(self.mesh_axis))
        return HMCState(
            q=jax.lax.with_sharding_constraint(state.q, self._sharding),
            logp=jax.lax.with_sharding_constraint(state.logp, lp_s),
            grad=jax.lax.with_sharding_constraint(state.grad, self._sharding),
        )

    # -- one transition -----------------------------------------------------
    def _transition(self, key, state: HMCState, eps, inv_mass):
        nchains, ndim = state.q.shape
        k_mom, k_acc, k_jit, k_len = jax.random.split(key, 4)
        sample_p, velocity, kinetic = _mass_ops(inv_mass)
        z = jax.random.normal(k_mom, state.q.shape, state.q.dtype)
        p0 = sample_p(z)
        u = jax.random.uniform(k_jit, (nchains, 1), state.q.dtype,
                               1.0 - self.jitter, 1.0 + self.jitter)
        eps_c = eps * u
        # RANDOMIZED trajectory length (Neal 2011 §5.4): a FIXED eps·L makes
        # every posterior direction rotate by the same angle each proposal,
        # so directions whose scale the metric misestimates by a factor r
        # rotate by angle/r and decorrelate slowly (the DR16 production
        # posterior is up to 1.84x wider than its Laplace curvature along
        # two directions — measured tau ~ 4 at fixed L).  Drawing
        # L ~ U{ceil(L/2), ..., L} each step (shared across chains; drawn
        # independently of the state, so detailed balance holds per L)
        # spreads the rotation angles and caps tau near 1.
        n_lo = max(1, (self.n_leapfrog + 1) // 2)
        n_steps = jax.random.randint(k_len, (), n_lo, self.n_leapfrog + 1)
        q, p, grad = _leapfrog(self._lpg, state.q, p0, state.grad, eps_c,
                               velocity, n_steps)
        logp_new, grad_new = self._lpg(q)
        ke0 = kinetic(p0)
        ke1 = kinetic(p)
        log_alpha = (logp_new - ke1) - (state.logp - ke0)
        log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_alpha))
        accept = (
            jnp.log(jax.random.uniform(k_acc, (nchains,), state.q.dtype))
            < log_alpha
        )
        new = HMCState(
            q=jnp.where(accept[:, None], q, state.q),
            logp=jnp.where(accept, logp_new, state.logp),
            grad=jnp.where(accept[:, None], grad_new, state.grad),
        )
        return self._constrain(new), accept_prob

    # -- dual averaging -------------------------------------------------------
    def _da_init(self, eps0):
        return DAState(
            log_eps=jnp.log(eps0),
            log_eps_avg=jnp.log(eps0),
            h_avg=jnp.zeros_like(eps0),
            t=jnp.zeros_like(eps0),
        )

    def _da_update(self, da: DAState, accept_prob, mu):
        gamma, t0, kappa = 0.05, 10.0, 0.75
        t = da.t + 1.0
        h = jnp.mean(self.target_accept - accept_prob)
        h_avg = (1.0 - 1.0 / (t + t0)) * da.h_avg + h / (t + t0)
        log_eps = mu - jnp.sqrt(t) / gamma * h_avg
        w = t ** (-kappa)
        log_eps_avg = w * log_eps + (1.0 - w) * da.log_eps_avg
        return DAState(log_eps=log_eps, log_eps_avg=log_eps_avg,
                       h_avg=h_avg, t=t)

    # -- drivers --------------------------------------------------------------
    def _da_phase(self, key, state, eps0, inv_mass, n_steps: int):
        """One dual-averaging phase at fixed mass; returns averaged eps."""
        mu = jnp.log(10.0 * eps0)
        da = self._da_init(eps0)

        def step(carry, k):
            state, da = carry
            state, acc = self._transition(k, state, jnp.exp(da.log_eps), inv_mass)
            da = self._da_update(da, acc, mu)
            return (state, da), (state.q, acc)

        keys = jax.random.split(key, n_steps)
        (state, da), (qs, accs) = jax.lax.scan(step, (state, da), keys)
        return state, jnp.exp(da.log_eps_avg), qs, accs

    @partial(jax.jit, static_argnames=("self", "n_warmup"))
    def warmup(self, key, q0, n_warmup: int = 300, eps0: float = 0.01,
               inv_mass0=None):
        """Windowed warmup (Stan-style): dual-averaging at the seed mass,
        mass re-estimation from the window's draws, repeated, then a final
        dual-averaging phase at the settled mass — the step size must be
        re-tuned every time the metric changes.

        ``inv_mass0`` seeds the phase-1 metric with a known posterior scale —
        the analogue of the reference's Cobaya ``covmat:`` proposal seeding.
        A ``(ndim,)`` seed (e.g. the Laplace-covariance diagonal) is refined
        by a diagonal variance estimate; a DENSE ``(ndim, ndim)`` seed (the
        full Laplace covariance) is refined by the windows' SAMPLE covariance
        shrunk toward the running metric (0.75/0.25): the Laplace curvature
        misestimates the skewed production posterior's widths by up to 1.8x
        along some eigendirections (measured on the DR16 mock posterior),
        which the sample covariance corrects while the shrinkage damps the
        short-window noise.  Two refinement windows: the second window's
        draws, taken under the once-corrected metric, mix several times
        faster and give a much cleaner estimate than one window alone."""
        q0 = jnp.asarray(q0)
        logp0, grad0 = self._lpg(q0)
        state = self._constrain(HMCState(q=q0, logp=logp0, grad=grad0))
        eps0 = jnp.asarray(eps0, q0.dtype)

        if inv_mass0 is None:
            inv_mass = jnp.ones((self.ndim,), q0.dtype)
        else:
            inv_mass = jnp.asarray(inv_mass0, q0.dtype)

        def refine(inv_mass, qs, n: int):
            # draws from the window's second half (the first half still
            # carries the step-size transient)
            flat = qs[n // 2:].reshape(-1, self.ndim)
            if inv_mass.ndim == 1:
                # diagonal metric ≡ per-parameter posterior variance: keeps
                # the leapfrog conditioned across wildly different scales
                # (b1 ~ 1, omega_cdm ~ 0.01)
                est = jnp.var(flat, axis=0) + 1e-12
            else:
                d = flat - flat.mean(axis=0)
                cov = (d.T @ d) / (flat.shape[0] - 1)
                est = 0.75 * cov + 0.25 * inv_mass  # PD: shrink to running
            return jnp.where(jnp.all(jnp.isfinite(est)), est, inv_mass)

        # window layout: 40% / 40% / 20% (two mass windows + final eps tune)
        n1 = max(1, int(0.4 * n_warmup))
        n2 = max(1, int(0.4 * n_warmup))
        n3 = max(1, n_warmup - n1 - n2)
        k1, k2, k3 = jax.random.split(key, 3)
        state, eps1, qs, _ = self._da_phase(k1, state, eps0, inv_mass, n1)
        inv_mass = refine(inv_mass, qs, n1)
        state, eps2, qs, _ = self._da_phase(k2, state, eps1, inv_mass, n2)
        inv_mass = refine(inv_mass, qs, n2)
        state, eps, _, accs = self._da_phase(k3, state, eps2, inv_mass, n3)
        return state, eps, inv_mass, jnp.mean(accs)

    @partial(jax.jit, static_argnames=("self", "n_samples", "thin"))
    def run(self, key, state: HMCState, eps, inv_mass, n_samples: int,
            thin: int = 1):
        # eps/inv_mass may arrive as f64 host arrays (checkpoint restore,
        # Laplace seeding) while the posterior runs f32 — cast to the chain
        # dtype or the kinetic terms promote the whole transition to f64
        eps = jnp.asarray(eps, state.q.dtype)
        inv_mass = jnp.asarray(inv_mass, state.q.dtype)

        def step(carry, k):
            st, _ = carry
            st, acc = self._transition(k, st, eps, inv_mass)
            return (st, acc), (st.q, st.logp, acc)

        keys = jax.random.split(key, n_samples)
        # carry dtype must match accept_prob's (= logp's): under an x64
        # session a default-dtype zeros() is f64 while an f32 posterior
        # yields f32 probs — lax.scan rejects the mixed carry
        acc0 = jnp.zeros(state.q.shape[0], state.logp.dtype)
        (state, _), (chain, logps, accs) = jax.lax.scan(
            step, (state, acc0), keys
        )
        return chain[::thin], logps[::thin], jnp.mean(accs)

    def sample(self, key: int | jax.Array, q0, n_warmup: int = 300,
               n_samples: int = 1000, eps0: float = 0.01, thin: int = 1):
        """Convenience: warmup + sampling; returns (chain, logps, info)."""
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        k1, k2 = jax.random.split(key)
        state, eps, inv_mass, acc_w = self.warmup(k1, q0, n_warmup, eps0)
        chain, logps, acc = self.run(k2, state, eps, inv_mass, n_samples, thin)
        info = dict(eps=float(jnp.mean(eps)), accept_warmup=float(acc_w),
                    accept=float(acc), inv_mass=np.asarray(inv_mass))
        return np.asarray(chain), np.asarray(logps), info
