#!/usr/bin/env python
"""Train the production P(k) emulator on the Einstein–Boltzmann solver.

Generates solver spectra over a Sobol box in (ω_b, ω_cdm, h) with the
production neutrino setup (Σm_ν = 0.06 eV, degenerate over 3 species,
N_ur = 0.00641 — the reference classynu convention), fits the PCA +
polynomial-ridge emulator and writes the artifact (with its training box,
neutrino setup and solver settings as load-time-validated metadata) to
``eftpipe_tpu/boltzmann/artifacts/pk_emulator_mnu06.npz``.

The sample set is nested: ~60% of the points cover the full (wide) box,
the rest a centered inner box around the DR16 posterior, so the ridge fit
is sharpest where chains actually live while remaining valid over the full
box (out-of-box proposals are rejected by the provider, not clamped).  The
solver uses an *envelope* step schedule built from the box corners so every
cosmology in the box integrates stably (~24 s/solve on one CPU core).

Samples are checkpointed incrementally to ``--workdir`` so the run can be
interrupted and resumed.

Usage:
    python tools/train_solver_emulator.py [--n 512] [--workdir /tmp/ebtrain]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

# force CPU: the axon TPU plugin otherwise hijacks the backend, and the
# solver needs float64 (assignment, not setdefault — the session may pre-set
# JAX_PLATFORMS=axon)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BOUNDS = {
    # wide box: covers the FULL production priors (VERDICT r4 item 2 /
    # missing #3 — the DR16 yamls sample omega_cdm in [0.03, 0.7] and h in
    # [0.4, 1.0]; the reference's CLASS backend evaluates any prior point,
    # boltzmann.py:191-243, so the emulator box must too).  omega_b's
    # production prior is the BBN gaussian loc 0.02237 sigma 0.00037 —
    # ±5 sigma sits well inside (0.017, 0.029).  Out-of-box proposals are
    # still rejected with logp = -inf; with this box that can only happen
    # for priors wider than the production ones.
    "omega_b": (0.017, 0.029),
    "omega_cdm": (0.03, 0.70),
    "h": (0.40, 1.00),
}
INNER_BOUNDS = {
    # dense region around the DR16 posterior (the round-2 box)
    "omega_b": (0.0195, 0.0255),
    "omega_cdm": (0.075, 0.175),
    "h": (0.55, 0.80),
}
NEUTRINO = dict(m_ncdm=0.02, deg_ncdm=3.0, n_ur=0.00641, yhe=0.2454)
# --sample-mnu mode: the per-species mass becomes a 4th emulator input
# (Σm_ν = 3·m_ncdm ∈ [0, 0.3] eV — covers the usual LSS Σm_ν priors;
# the reference's classynu takes arbitrary Σm_ν at run time,
# /root/reference/eftpipe/classy.py:12-92 — a trained artifact gets the
# same flexibility by sampling the mass dimension)
MNU_BOUNDS = (0.0, 0.10)
MNU_INNER = (0.01, 0.04)   # dense around the production Σm_ν = 0.06 (0.02/sp)
SOLVER_KMAX = 1.6
# z grid uniform in ln a over the survey range, plus z=0 for sigma8(0)
Z_GRID = np.exp(-np.linspace(np.log(1.0 / 2.05), 0.0, 13))[::-1] - 1.0
# -> 13 nodes from z=0 to z=1.05


def sobol(n, dim, seed=7):
    from scipy.stats import qmc

    return qmc.Sobol(d=dim, scramble=True, seed=seed).random(n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--inner-frac", type=float, default=0.4,
                    help="fraction of samples drawn from INNER_BOUNDS")
    ap.add_argument("--workdir", default="/tmp/ebtrain")
    ap.add_argument("--out", default=None)
    ap.add_argument("--ncomp", type=int, default=96)
    ap.add_argument("--degree", type=int, default=6)
    ap.add_argument("--degree-in", type=int, default=7,
                    help="degree of the blended inner-box ridge")
    ap.add_argument("--train-only", action="store_true",
                    help="skip generation, fit on existing samples")
    ap.add_argument("--sample-mnu", action="store_true",
                    help="add the per-species neutrino mass as a 4th "
                         "emulator input (artifact: pk_emulator_mnu4d.npz)")
    args = ap.parse_args()

    import itertools

    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from eftpipe_tpu.boltzmann.thermo import CosmoParams
    from eftpipe_tpu.boltzmann.einstein_boltzmann import EBSolver

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)

    bounds = dict(BOUNDS)
    inner = dict(INNER_BOUNDS)
    if args.sample_mnu:
        bounds["m_ncdm"] = MNU_BOUNDS
        inner["m_ncdm"] = MNU_INNER
    names = list(bounds)
    n_in = int(round(args.inner_frac * args.n))
    n_out = args.n - n_in
    lo = np.array([bounds[n][0] for n in names])
    hi = np.array([bounds[n][1] for n in names])
    lo_i = np.array([inner[n][0] for n in names])
    hi_i = np.array([inner[n][1] for n in names])
    x = np.concatenate([
        lo + (hi - lo) * sobol(n_out, len(names), seed=7),
        lo_i + (hi_i - lo_i) * sobol(n_in, len(names), seed=11),
    ])
    if args.sample_mnu:
        # interleave wide/inner so an interrupted run still fits on a
        # balanced prefix (the run is resumable but may be trained early)
        x = x[np.random.default_rng(3).permutation(len(x))]
    # the workdir's x.npy is the ONLY source of truth for the sample inputs:
    # the stored sample_*.npz files are aligned to it by index.  Never
    # overwrite an existing one — a later invocation with different
    # n/inner-frac (e.g. a --train-only call relying on defaults) would
    # silently misalign x and y and poison the fit (caught the hard way:
    # val rms 0.27 in log T from exactly this).
    # sampling_meta.json travels WITH x.npy: a --train-only invocation whose
    # CLI flags disagree with the stored samples (e.g. forgetting
    # --sample-mnu on a 4D workdir) must not stamp the artifact with
    # bounds/input_names derived from the wrong flags (ADVICE r3).
    meta_path = wd / "sampling_meta.json"
    if (wd / "x.npy").exists():
        x_stored = np.load(wd / "x.npy")
        if meta_path.exists():
            stored = json.loads(meta_path.read_text())
            cur = dict(input_names=names,
                       bounds_lo=[float(v) for v in lo],
                       bounds_hi=[float(v) for v in hi],
                       inner_lo=[float(v) for v in lo_i],
                       inner_hi=[float(v) for v in hi_i])
            if any(stored[k] != cur[k] for k in cur):
                if not args.train_only:
                    raise SystemExit(
                        f"{meta_path} disagrees with this invocation's "
                        f"sampling flags — refusing to mix sample sets "
                        f"(delete the workdir to start fresh)"
                    )
                print(f"restoring sampling metadata from {meta_path} "
                      f"(CLI sampling flags ignored in --train-only mode)")
                names = list(stored["input_names"])
                lo = np.asarray(stored["bounds_lo"])
                hi = np.asarray(stored["bounds_hi"])
                lo_i = np.asarray(stored["inner_lo"])
                hi_i = np.asarray(stored["inner_hi"])
                args.sample_mnu = "m_ncdm" in names
        elif x_stored.shape != x.shape or not np.allclose(x_stored, x):
            # legacy workdir without metadata: a shape-compatible silent
            # mismatch cannot be detected — hard-fail on ANY disagreement
            raise SystemExit(
                f"{wd}/x.npy was generated with different n/inner-frac/"
                f"bounds than this invocation and carries no "
                f"sampling_meta.json — refusing to guess (delete the "
                f"workdir or rerun once without --train-only to stamp it)"
            )
        x = x_stored
    else:
        np.save(wd / "x.npy", x)
    if not meta_path.exists():
        meta_path.write_text(json.dumps(dict(
            input_names=names,
            bounds_lo=[float(v) for v in lo],
            bounds_hi=[float(v) for v in hi],
            inner_lo=[float(v) for v in lo_i],
            inner_hi=[float(v) for v in hi_i],
        )))

    def make_par(ob, oc, h, m_ncdm=None):
        return CosmoParams(
            omega_b=jnp.asarray(ob), omega_cdm=jnp.asarray(oc),
            h=jnp.asarray(h),
            ln10As=jnp.asarray(3.044), ns=jnp.asarray(0.9649),
            m_ncdm=jnp.asarray(NEUTRINO["m_ncdm"] if m_ncdm is None
                               else m_ncdm),
            n_ur=jnp.asarray(NEUTRINO["n_ur"]),
            yhe=jnp.asarray(NEUTRINO["yhe"]),
            deg_ncdm=NEUTRINO["deg_ncdm"],
        )

    z_grid = Z_GRID
    solver = None

    if not args.train_only:
        corners = [make_par(*c) for c in
                   itertools.product(*(bounds[n] for n in names))]
        solver = EBSolver(z_out=z_grid.tolist(), kmax=SOLVER_KMAX,
                          growth_stencil=False, envelope=corners)
        kgrid = solver.k_mpc
        np.save(wd / "kgrid.npy", kgrid)
        np.save(wd / "zgrid.npy", np.sort(z_grid)[::-1])

        for i in range(args.n):
            out_i = wd / f"sample_{i:04d}.npz"
            if out_i.exists():
                continue
            par = make_par(*x[i])
            t0 = time.time()
            lp = solver(par)
            # store log transfers: P = Pzeta * T^2 with As/ns of the run —
            # divide the primordial back out so the stored T is As/ns-free
            k = np.asarray(lp.k_mpc)
            as_ = 1e-10 * np.exp(3.044)
            pzeta = 2 * np.pi**2 / k**3 * as_ * (k / 0.05) ** (0.9649 - 1.0)
            log_tm = 0.5 * np.log(np.asarray(lp.pk) / pzeta[None, :])
            log_tcb = 0.5 * np.log(np.asarray(lp.pk_cb) / pzeta[None, :])
            np.savez(out_i, log_tm=log_tm, log_tcb=log_tcb,
                     log_rdrag=np.log(float(lp.rs_drag)))
            print(f"[{i + 1}/{args.n}] {time.time() - t0:.1f}s "
                  f"x={x[i].round(4)}", flush=True)

    # ---- fit ---------------------------------------------------------------
    kgrid = np.load(wd / "kgrid.npy")
    zgrid = np.load(wd / "zgrid.npy")
    ys, xs = [], []
    for i in range(args.n):
        f = wd / f"sample_{i:04d}.npz"
        if not f.exists():
            continue
        with np.load(f) as z:
            ys.append(np.concatenate([
                z["log_tm"].ravel(), z["log_tcb"].ravel(),
                [float(z["log_rdrag"])],
            ]))
            xs.append(x[i])
    print(f"fitting on {len(ys)} samples")

    from eftpipe_tpu.boltzmann.emulator import train_pk_emulator

    emu, report = train_pk_emulator(
        np.asarray(xs), np.asarray(ys), kgrid, zgrid,
        ncomp=args.ncomp, degree=args.degree,
        inner_bounds=(lo_i, hi_i), degree_in=args.degree_in,
        meta=dict(
            bounds_lo=lo, bounds_hi=hi, input_names=names,
            # sampled-mnu artifacts record no fixed mass: m_ncdm is an input
            **({} if args.sample_mnu else {"m_ncdm": NEUTRINO["m_ncdm"]}),
            deg_ncdm=NEUTRINO["deg_ncdm"],
            n_ur=NEUTRINO["n_ur"], yhe=NEUTRINO["yhe"],
            kmax=SOLVER_KMAX, n_train=len(ys),
        ),
    )
    print("validation:", report)

    default_name = ("pk_emulator_mnu4d.npz" if args.sample_mnu
                    else "pk_emulator_mnu06.npz")
    out = Path(args.out) if args.out else (
        Path(__file__).resolve().parent.parent
        / f"eftpipe_tpu/boltzmann/artifacts/{default_name}"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    emu.save(out)
    print("saved", out)


if __name__ == "__main__":
    main()
