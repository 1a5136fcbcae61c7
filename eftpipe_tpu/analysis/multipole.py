"""DataFrame-backed multipole container with covariance-aware errorbars —
the ``Multipole`` analogue (/root/reference/eftpipe/analysis.py:457-698).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from dataclasses import dataclass


@dataclass
class Multipole:
    df: pd.DataFrame          # index k, columns like P0/P2/P4
    symbol: str = "P"

    # -- construction ------------------------------------------------------
    @classmethod
    def from_arrays(cls, k, plk, ls, symbol: str = "P") -> "Multipole":
        data = {f"{symbol}{ell}": np.asarray(plk)[i] for i, ell in enumerate(ls)}
        df = pd.DataFrame(data, index=np.asarray(k))
        df.index.name = "k"
        return cls(df=df, symbol=symbol)

    @classmethod
    def loadtxt(cls, path, symbol: str = "P") -> "Multipole":
        from ..likelihood.reader import read_pkl

        df = read_pkl(path)
        sym = df.columns[1][0] if len(df.columns) > 1 else symbol
        return cls(df=df.drop(columns=df.columns[0]), symbol=sym)

    # -- introspection -------------------------------------------------------
    @property
    def k(self) -> np.ndarray:
        return self.df.index.to_numpy()

    @property
    def ells(self) -> list[int]:
        out = []
        for c in self.df.columns:
            if c.startswith(self.symbol) and c[len(self.symbol):].isdigit():
                out.append(int(c[len(self.symbol):]))
        return sorted(out)

    def __call__(self, ell: int) -> np.ndarray:
        return self.df[f"{self.symbol}{ell}"].to_numpy()

    # -- covariance → errorbars (analysis.py:571) ----------------------------
    def errorbars(self, cov: np.ndarray) -> dict[int, np.ndarray]:
        """Split a joint (nl·nk × nl·nk) covariance diagonal per multipole."""
        sig = np.sqrt(np.diag(np.asarray(cov)))
        nk = self.k.size
        out = {}
        for i, ell in enumerate(self.ells):
            out[ell] = sig[i * nk : (i + 1) * nk]
        return out

    # -- plotting (gated matplotlib; pk-style k·P vs k, analysis.py:581-647) --
    def plot(self, ax=None, cov=None, style: str = "pk", **kwargs):
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        k = self.k
        weight = k if style == "pk" else 1.0
        errs = self.errorbars(cov) if cov is not None else {}
        for ell in self.ells:
            y = weight * self(ell)
            if ell in errs:
                ax.errorbar(k, y, yerr=weight * errs[ell],
                            label=f"$\\ell={ell}$", **kwargs)
            else:
                ax.plot(k, y, label=f"$\\ell={ell}$", **kwargs)
        ax.set_xlabel(r"$k\ [h\,\mathrm{Mpc}^{-1}]$")
        ax.set_ylabel(
            r"$k\,P_\ell(k)$" if style == "pk" else r"$P_\ell(k)$"
        )
        ax.legend()
        return ax
