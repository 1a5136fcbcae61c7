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
        """Sample with minimal -logpost (analysis.py:393-424 analogue; the
        reference also supports minimizer ``.minimum`` files)."""
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
