"""Command-line interface — the ``script/`` analogue of the reference
(mkbestfit.py, plot_window.py, zeff.py) plus run/bench drivers.

Usage: ``python -m eftpipe_tpu <command> ...``

Commands
--------
run          build an Analysis from a YAML config and run ensemble MCMC
             (checkpoint/resume, R−1 stopping, getdist-style chain output)
bestfit      evaluate/plot the bestfit theory of a finished run
             (reference script/mkbestfit.py:1-179)
plot-window  visual QA of a survey window matrix
             (reference script/plot_window.py:1-133)
zeff         pair-weighted effective redshift from a randoms catalogue
             (reference script/zeff.py:1-116)
bench        single-line JSON throughput benchmark (bench.py scenario)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def cmd_run(args) -> int:
    from .api.orchestrate import Analysis

    an = Analysis.from_config(args.config)
    print(f"sampled params ({an.space.ndim}): {an.space.sampled}")
    res = an.run_mcmc(
        nwalkers=args.walkers, out=args.out, rhat_tol=args.rhat,
        max_steps=args.max_steps, block=args.block, key=args.key,
    )
    print(json.dumps({
        "steps": int(res.chain.shape[0]), "walkers": int(res.chain.shape[1]),
        "converged": bool(res.converged), "accept_rate": round(res.accept_rate, 3),
        "max_rminus1": float(np.max(res.rminus1)),
        "tau": None if res.tau is None else [round(float(t), 1) for t in res.tau],
    }))
    return 0


def cmd_bestfit(args) -> int:
    from .api.orchestrate import Analysis
    from .analysis import ChainProducts, BestfitModel

    an = Analysis.from_config(args.config)
    cp = ChainProducts.from_prefix(args.chains, burn_in=args.burn_in)
    bf = BestfitModel.from_chains(an, cp)
    print("bestfit point:", {p: round(float(v), 5) for p, v in bf.params.items()})
    print("chi2:", {k: round(v, 3) for k, v in bf.chi2().items()})
    tracers = args.tracer or list(an.pipelines)
    for tracer in tracers:
        mp = bf.multipoles(tracer)
        out = args.output or f"bestfit_{tracer}.txt"
        cols = [mp.k] + [mp(ell) for ell in mp.ells]
        np.savetxt(out, np.column_stack(cols),
                   header="k " + " ".join(f"P{l}" for l in mp.ells))
        print(f"{tracer}: multipoles written to {out}")
        if args.plot:
            import matplotlib

            matplotlib.use("Agg")
            ax = mp.plot()
            fig = ax.get_figure()
            png = args.plot if len(tracers) == 1 else f"{tracer}_{args.plot}"
            fig.savefig(png, dpi=150, bbox_inches="tight")
            print(f"{tracer}: plot written to {png}")
    return 0


def cmd_plot_window(args) -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from .models.config import EFTConfig
    from .models.window import build_window_tables

    cfg = EFTConfig(nl=args.nl, no=args.nl)
    wt = build_window_tables(
        cfg, window_configspace_file=args.mask, nmax=args.nmax,
    )
    wal = np.asarray(wt["wal"]) if "wal" in wt else None
    fig, axes = plt.subplots(1, cfg.nl, figsize=(5 * cfg.nl, 4), squeeze=False)
    mat = np.asarray(wt["wmat"])  # (na, nl, nk, p)
    for l in range(cfg.nl):
        ax = axes[0][l]
        im = ax.imshow(mat[:, l].reshape(-1, mat.shape[-1]), aspect="auto",
                       cmap="RdBu_r")
        fig.colorbar(im, ax=ax)
        ax.set_title(f"W(a, k; p), l={2 * l}")
        ax.set_xlabel("p index")
        ax.set_ylabel("(a, k) index")
    fig.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"window QA plot written to {args.output}")
    return 0


def cmd_zeff(args) -> int:
    from .analysis.zeff import effective_redshift

    table = np.loadtxt(args.randoms)
    ra, dec, z = table[:, 0], table[:, 1], table[:, 2]
    w = table[:, 3] if table.shape[1] > 3 and not args.unit_weights else None
    if args.subsample and table.shape[0] > args.subsample:
        rng = np.random.default_rng(0)
        idx = rng.choice(table.shape[0], args.subsample, replace=False)
        ra, dec, z = ra[idx], dec[idx], z[idx]
        w = w[idx] if w is not None else None
    zeff = effective_redshift(ra, dec, z, weight=w, omegam=args.omegam,
                              smin=args.smin, smax=args.smax)
    print(json.dumps({"zeff": round(float(zeff), 6), "npoints": int(z.size
          if not args.subsample else min(z.size, args.subsample))}))
    return 0


def cmd_bench(args) -> int:
    import runpy
    from pathlib import Path

    bench = Path(__file__).resolve().parent.parent / "bench.py"
    sys.argv = [str(bench)]
    runpy.run_path(str(bench), run_name="__main__")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="eftpipe_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("run", help="run ensemble MCMC from a YAML config")
    p.add_argument("config")
    p.add_argument("--walkers", type=int, default=256)
    p.add_argument("--max-steps", type=int, default=10_000)
    p.add_argument("--block", type=int, default=100)
    p.add_argument("--rhat", type=float, default=0.01)
    p.add_argument("--out", default="chains/run")
    p.add_argument("--key", type=int, default=0)
    p.set_defaults(func=cmd_run)

    p = sub.add_parser("bestfit", help="bestfit theory from a finished run")
    p.add_argument("config")
    p.add_argument("--chains", required=True)
    p.add_argument("--tracer", action="append")
    p.add_argument("--burn-in", type=float, default=0.3)
    p.add_argument("-o", "--output")
    p.add_argument("--plot")
    p.set_defaults(func=cmd_bestfit)

    p = sub.add_parser("plot-window", help="survey window QA plot")
    p.add_argument("mask", help="config-space mask multipole file Q_q(s)")
    p.add_argument("-o", "--output", default="window.png")
    p.add_argument("--nl", type=int, default=2)
    p.add_argument("--nmax", type=int, default=1024)
    p.set_defaults(func=cmd_plot_window)

    p = sub.add_parser("zeff", help="effective redshift from randoms")
    p.add_argument("randoms", help="text table: RA DEC z [weight]")
    p.add_argument("--omegam", type=float, default=0.31)
    p.add_argument("--smin", type=float, default=25.0)
    p.add_argument("--smax", type=float, default=150.0)
    p.add_argument("--subsample", type=int, default=0)
    p.add_argument("--unit-weights", action="store_true")
    p.set_defaults(func=cmd_zeff)

    p = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    p.set_defaults(func=cmd_bench)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
