"""Per-tracer theory pipeline: compose the stages into one jittable chain.

The analogue of the reference's ``EFTLeafKernel.calculate_power_spectrum``
(/root/reference/eftpipe/theory.py:557-609): cosmology inputs → bird →
IR resummation → AP → window (+icc) → fiber → per-(chained, binned) products.
All Phase-A tables are built once in :meth:`TracerPipeline.build`; the
per-evaluation :meth:`compute_bird` / :meth:`products` methods are pure jnp
for a *single* evaluation — wrap in ``jax.vmap`` for a walker batch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from dataclasses import dataclass, field
from typing import Any, NamedTuple

from .config import EFTConfig
from .nonlinear import build_nonlinear_tables, nonlinear_pscf
from .bird import build_bird_tables, assemble_bird, BirdState
from .resum import build_resum_tables, resum_ps, ir_filters, _xpyp
from .ap import build_ap_tables, ap_transform, ap_params
from .window import build_window_tables, apply_window, build_window_matrix_tables, apply_window_matrix
from .icc import build_icc_tables
from .fiber import build_fiber_tables, apply_fiber
from .transforms import build_binning_matrix, apply_binning, apply_chained
from ..ops.precision import stage_precision


class CosmoInputs(NamedTuple):
    """Per-evaluation cosmology inputs for one tracer.

    ``plin`` must be sampled on the pipeline's fixed ``cfg.kin`` grid.
    ``qperp``/``qpar`` are the AP distortion parameters (DA/DA_fid and
    H_fid/H); pass 1.0 to disable distortion.  The template-fit mode
    (reference ``LinearPowerFile``, boltzmann.py:246-315) feeds sampled
    α's directly as q's.
    """

    plin: Any
    f: Any
    qperp: Any = 1.0
    qpar: Any = 1.0


@dataclass
class TracerPipeline:
    cfg: EFTConfig
    nt: dict
    bt: dict
    rt: dict | None = None
    at: dict | None = None
    wt: dict | None = None
    wmt: dict | None = None
    ft: dict | None = None
    with_rsd: bool = True
    zeff: float | None = None
    frozen: dict | None = None

    @classmethod
    def build(
        cls,
        cfg: EFTConfig,
        zeff: float | None = None,
        with_irresum: bool | dict = True,
        apeffect: dict | None = None,
        window: dict | None = None,
        window_matrix: dict | None = None,
        icc: dict | None = None,
        fiber: dict | None = None,
        with_rsd: bool = True,
        cache_dir=None,
    ) -> "TracerPipeline":
        nt = build_nonlinear_tables(cfg, cache_dir=cache_dir)
        bt = build_bird_tables(cfg)
        rt = None
        if with_irresum:
            kwargs = with_irresum if isinstance(with_irresum, dict) else {}
            rt = build_resum_tables(cfg, **kwargs)
        at = build_ap_tables(cfg, **apeffect) if apeffect else None
        icc_tables = build_icc_tables(cfg, cache_dir=cache_dir, **icc) if icc else None
        wt = None
        if window:
            window = dict(window)
            builder = build_window_tables
            dotted = window.pop("builder", None)
            if dotted:
                # dotted-path window extension point, mirroring the
                # reference's window-class lookup (theory.py:62-72); the
                # target must share build_window_tables' signature and
                # return the same table dict consumed by apply_window
                import importlib

                module_name, fn_name = dotted.rsplit(".", 1)
                builder = getattr(importlib.import_module(module_name), fn_name)
            wt = builder(cfg, cache_dir=cache_dir, icc_tables=icc_tables, **window)
        wmt = build_window_matrix_tables(cfg, **window_matrix) if window_matrix else None
        ft = build_fiber_tables(cfg, **fiber) if fiber else None
        return cls(cfg=cfg, nt=nt, bt=bt, rt=rt, at=at, wt=wt, wmt=wmt, ft=ft,
                   with_rsd=with_rsd, zeff=zeff)

    # ------------------------------------------------------------------
    def freeze_template(self, plin) -> "TracerPipeline":
        """Template-fit fast path (reference ``LinearPowerFile`` mode,
        boltzmann.py:246-315): everything that depends only on P_lin — the
        one-loop FFTLog/M-matrix contractions and the IR filter powers — is
        precomputed ONCE on the host, so per-evaluation work reduces to the
        f- and AP-dependent contractions.  Also avoids XLA constant-folding
        the loop engine at compile time when P_lin is a jit constant."""
        import jax

        plin = jnp.asarray(plin)

        def compute(p):
            frozen = {"nl_out": nonlinear_pscf(self.nt, self.cfg, p)}
            if self.rt is not None:
                x, y = ir_filters(self.rt, p)
                frozen["xpyp"] = _xpyp(self.rt, x, y)
            return frozen

        frozen = jax.jit(compute)(plin)
        self.frozen = jax.tree.map(lambda a: np.asarray(a), frozen)
        return self

    def compute_bird(self, inputs: CosmoInputs, with_snapshots: bool = False,
                     stop_after: str | None = None):
        """Full bird pipeline; with ``with_snapshots`` also returns the
        intermediate state after each enabled stage (reference BirdSnapshot,
        pybird.py:616-632).  ``stop_after`` truncates the pipeline after the
        named stage — the stage-prefix hook used by the BENCH_PROFILE timing
        decomposition (utils/profiling.py)."""
        import jax

        cfg = self.cfg
        plin = inputs.plin
        f = inputs.f if self.with_rsd else jnp.zeros_like(jnp.asarray(inputs.f))
        snaps: dict[str, BirdState] = {}
        with jax.named_scope("nonlinear"), stage_precision("nonlinear"):
            if self.frozen is not None:
                dtype = jnp.asarray(plin).dtype
                out = {k: jnp.asarray(v, dtype) for k, v in self.frozen["nl_out"].items()}
            else:
                out = nonlinear_pscf(self.nt, cfg, plin)
            bird = assemble_bird(self.bt, cfg, out, plin, f)
        snaps["nonlinear"] = bird
        if stop_after == "nonlinear":
            return bird
        if self.rt is not None:
            xpyp = self.frozen.get("xpyp") if self.frozen is not None else None
            with jax.named_scope("IRresum"), stage_precision("IRresum"):
                bird = resum_ps(self.rt, cfg, bird, plin, xpyp=xpyp)
            snaps["IRresum"] = bird
        if stop_after == "IRresum":
            return bird
        if self.at is not None:
            with jax.named_scope("APeffect"), stage_precision("APeffect"):
                bird = ap_transform(self.at, cfg, bird, inputs.qperp, inputs.qpar)
            snaps["APeffect"] = bird
        if stop_after == "APeffect":
            return bird
        if self.wt is not None:
            with jax.named_scope("window"), stage_precision("window"):
                bird = apply_window(self.wt, cfg, bird)
            snaps["window"] = bird
        if stop_after == "window":
            return bird
        if self.wmt is not None:
            with jax.named_scope("window_matrix"):
                bird = apply_window_matrix(self.wmt, cfg, bird)
            snaps["window_matrix"] = bird
        if stop_after == "window_matrix":
            return bird
        if self.ft is not None:
            with jax.named_scope("fiber"), stage_precision("fiber"):
                bird = apply_fiber(self.ft, cfg, bird)
            snaps["fiber"] = bird
        if with_snapshots:
            return bird, snaps
        return bird

    def binning_tables(self, kout, **binning_opts) -> dict:
        return build_binning_matrix(self.cfg, kout, **binning_opts)

    def product_info(self, chained: bool = False, binning: dict | None = None):
        """Static (ls, kgrid, nk) of a product combination, without tracing."""
        cfg = self.cfg
        kret = binning["keff"] if binning is not None else cfg.k
        ls = [2 * i for i in range(cfg.no - 1 if chained else cfg.no)]
        return ls, kret, len(kret)

    def product(self, bird: BirdState, chained: bool = False,
                binning: dict | None = None) -> tuple[list[int], np.ndarray, BirdState]:
        """(ls, kgrid, birdlike) for one (chained, binned) combination
        (theory.py:590-604)."""
        cfg = self.cfg
        out = bird
        if binning is not None:
            with stage_precision("binning"):
                out = apply_binning(binning, out)
            kret = binning["keff"]
        else:
            kret = cfg.k
        if chained:
            out = apply_chained(cfg, out)
            ls = [2 * i for i in range(cfg.no - 1)]
        else:
            ls = [2 * i for i in range(cfg.no)]
        return ls, kret, out
