"""Chain loading / introspection — the ``CobayaProducts`` analogue
(/root/reference/eftpipe/analysis.py:119-454).

Reads the getdist-style output of :class:`eftpipe_tpu.parallel.mcmc.MCMCDriver`
(``<prefix>.<i>.txt`` + ``<prefix>.paramnames`` + ``<prefix>.params.json``),
with multi-chain concatenation, burn-in removal, sampled/derived splits,
bestfit extraction and weighted summary statistics.
"""

from __future__ import annotations

import glob
import json
import numpy as np
import pandas as pd
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class ChainProducts:
    root: str
    samples: pd.DataFrame = field(repr=False)
    param_names: list[str]
    derived_names: list[str]
    meta: dict

    COLUMNS_PREFIX = ["weight", "minuslogpost"]

    # -- loading ----------------------------------------------------------
    @classmethod
    def from_prefix(cls, prefix, burn_in: float = 0.0) -> "ChainProducts":
        """Load ``<prefix>.<i>.txt`` chains (analysis.py:137-186 analogue).

        burn_in: fraction (0-1) of each chain file dropped from the front.
        """
        prefix = str(prefix)
        names, derived = cls._read_paramnames(prefix)
        files = sorted(glob.glob(f"{prefix}.[0-9]*.txt"))
        if not files:
            raise FileNotFoundError(f"no chain files found for prefix {prefix}")
        frames = []
        cols = cls.COLUMNS_PREFIX + names + derived
        for fn in files:
            arr = np.atleast_2d(np.loadtxt(fn))
            if burn_in:
                arr = arr[int(burn_in * arr.shape[0]):]
            frames.append(pd.DataFrame(arr, columns=cols[: arr.shape[1]]))
        samples = pd.concat(frames, ignore_index=True)
        meta = {}
        meta_file = Path(f"{prefix}.params.json")
        if meta_file.exists():
            meta = json.loads(meta_file.read_text())
        return cls(root=prefix, samples=samples, param_names=names,
                   derived_names=derived, meta=meta)

    @classmethod
    def from_cobaya(cls, src, burn_in: float = 0.0) -> "ChainProducts":
        """Ingest an existing **reference-format Cobaya run** — the last
        migration gap for users post-processing their old chains here
        (reference ``analysis.py:119-271``).

        ``src`` is either the run prefix (``path/to/run``) or any of its
        YAML files (``run.input.yaml`` / ``run.updated.yaml`` / the original
        launch yaml containing an ``output:`` entry).  Reads:

        - ``<root>.<i>.txt`` chains, column names from the ``#`` header line
          (Cobaya writes no ``.paramnames``; the header is the source of
          truth, reference ``analysis.py:128-133``),
        - ``<root>.updated.yaml`` (fallback ``.input.yaml``) for the
          sampled / fixed / derived parameter split
          (reference ``analysis.py:157-190``),
        - ``<root>.progress`` convergence history and the ``.minimum``
          minimizer bestfit lazily via :meth:`progress` / :meth:`bestfit`.
        """
        import yaml

        src = str(src)
        if src.endswith((".input.yaml", ".updated.yaml")):
            base = src[: -len(".input.yaml")] if src.endswith(".input.yaml") \
                else src[: -len(".updated.yaml")]
            prefix = Path(base)
        elif src.endswith((".yaml", ".yml")):
            info = yaml.safe_load(Path(src).read_text())
            out = info.get("output")
            if out is None:
                raise ValueError(f"{src} has no 'output' entry")
            out = Path(out)
            prefix = out if out.is_absolute() else (
                Path(src).resolve().parent / out)
        else:
            prefix = Path(src)
        prefix = str(prefix)

        files = sorted(glob.glob(f"{prefix}.[0-9]*.txt"))
        if not files:
            raise FileNotFoundError(f"no Cobaya chain files for {prefix}")
        with open(files[0]) as f:
            header = f.readline()
        if not header.lstrip().startswith("#"):
            raise ValueError(
                f"{files[0]} has no '#' header line — not a Cobaya chain")
        cols = header.lstrip("# ").split()
        frames = []
        for fn in files:
            arr = np.atleast_2d(np.loadtxt(fn))
            if burn_in:
                arr = arr[int(burn_in * arr.shape[0]):]
            frames.append(pd.DataFrame(arr, columns=cols[: arr.shape[1]]))
        samples = pd.concat(frames, ignore_index=True)

        updated, input_info = {}, {}
        for suffix, target in ((".updated.yaml", "updated"),
                               (".input.yaml", "input")):
            p = Path(prefix + suffix)
            if p.exists():
                loaded = yaml.safe_load(p.read_text()) or {}
                if target == "updated":
                    updated = loaded
                else:
                    input_info = loaded
        params_info = (updated or input_info).get("params", {}) or {}
        sampled = [p for p, c in params_info.items()
                   if isinstance(c, dict) and "prior" in c]
        fixed = {
            p: c["value"] for p, c in params_info.items()
            if isinstance(c, dict) and "value" in c
            and not c.get("derived", False)
            and not isinstance(c["value"], str)  # lambdas are derived inputs
        }
        # everything in the chain beyond (weight, minuslogpost, sampled) is a
        # derived column: Cobaya's minuslogprior/chi2 bookkeeping plus the
        # likelihood's marg_*/*_fullchi2 extras
        names = [c for c in cols if c in sampled]
        derived = [c for c in cols[2:] if c not in sampled]
        meta = dict(
            format="cobaya", nchains=len(files),
            input_info=input_info, updated_info=updated,
            sampled_param_specs={p: params_info[p] for p in sampled},
            fixed_params=fixed,
        )
        if not names:  # no YAML found: fall back to positional split
            names, derived = cols[2:], []
        return cls(root=prefix, samples=samples, param_names=names,
                   derived_names=derived, meta=meta)

    # -- Cobaya sidecar files ------------------------------------------------
    def progress(self) -> pd.DataFrame:
        """``<root>.progress`` convergence history (N, acceptance rate,
        R−1; consumed by the reference at ``analysis.py:245-261``)."""
        path = Path(f"{self.root}.progress")
        if not path.exists():
            raise FileNotFoundError(path)
        with open(path) as f:
            header = f.readline().lstrip("# ").split()
        arr = np.atleast_2d(np.loadtxt(path))
        return pd.DataFrame(arr, columns=header[: arr.shape[1]])

    def minimum(self) -> pd.Series | None:
        """Bestfit from a Cobaya ``.minimum`` minimizer file when present
        (reference ``analysis.py:393-424``: three header rows, then
        ``idx value name [latex]`` lines; a blank line separates the sampled
        block from derived entries)."""
        path = Path(f"{self.root}.minimum")
        if not path.exists():
            return None
        values: dict[str, float] = {}
        with open(path) as f:
            for i, line in enumerate(f):
                if i < 3 or not line.strip():
                    continue
                _idx, value, name, *_latex = line.split()
                values[name] = float(value)
        return pd.Series(values)

    def fixed_params(self) -> dict[str, float]:
        return dict(self.meta.get("fixed_params", {}))

    @staticmethod
    def _read_paramnames(prefix: str) -> tuple[list[str], list[str]]:
        names, derived = [], []
        with open(f"{prefix}.paramnames") as f:
            for line in f:
                if not line.strip():
                    continue
                n = line.split()[0]
                (derived if n.endswith("*") else names).append(n.rstrip("*"))
        return names, derived

    # -- introspection ------------------------------------------------------
    def sampled_params(self) -> list[str]:
        return list(self.param_names)

    def all_params(self) -> list[str]:
        return self.param_names + self.derived_names

    def __getitem__(self, name: str) -> np.ndarray:
        return self.samples[name].to_numpy()

    @property
    def weights(self) -> np.ndarray:
        return self.samples["weight"].to_numpy()

    # -- statistics ---------------------------------------------------------
    def mean(self, params=None) -> pd.Series:
        params = params or self.all_params()
        w = self.weights
        return pd.Series(
            {p: np.average(self[p], weights=w) for p in params}
        )

    def std(self, params=None) -> pd.Series:
        params = params or self.all_params()
        w = self.weights
        out = {}
        for p in params:
            m = np.average(self[p], weights=w)
            out[p] = np.sqrt(np.average((self[p] - m) ** 2, weights=w))
        return pd.Series(out)

    def cov(self, params=None) -> pd.DataFrame:
        params = params or self.sampled_params()
        x = np.column_stack([self[p] for p in params])
        c = np.cov(x, rowvar=False, aweights=self.weights)
        return pd.DataFrame(np.atleast_2d(c), index=params, columns=params)

    def bestfit(self, params=None) -> pd.Series:
        """Bestfit: a Cobaya ``.minimum`` minimizer file when present
        (reference analysis.py:393-414), else the sample with minimal
        -logpost (:415-424)."""
        mini = self.minimum()
        if mini is not None:
            return mini if params is None else mini[
                [p for p in params if p in mini.index]]
        i = int(self.samples["minuslogpost"].idxmin())
        params = params or self.all_params()
        return self.samples.loc[i, params]

    def global_bestfit(self, chi2_cols: list[str] | None = None) -> pd.Series:
        """Bestfit by minimal summed full-chi2 columns when present
        (analysis.py:425-454); falls back to minuslogpost."""
        cols = chi2_cols or [c for c in self.samples.columns if c.endswith("fullchi2")]
        if not cols:
            return self.bestfit()
        i = int(self.samples[cols].sum(axis=1).idxmin())
        return self.samples.loc[i]

    def to_getdist(self):
        """Optional getdist MCSamples view (gated import)."""
        from getdist import MCSamples  # pragma: no cover

        return MCSamples(
            samples=self.samples[self.all_params()].to_numpy(),
            weights=self.weights,
            loglikes=self.samples["minuslogpost"].to_numpy(),
            names=self.all_params(),
        )
