"""Data readers (reference /root/reference/eftpipe/reader.py:13-62).

``read_pkl`` reads a commented-header whitespace table into a DataFrame
indexed by k, auto-naming columns P0/P2/... when no header is present.
Custom readers are resolved by dotted path.
"""

from __future__ import annotations

import importlib
import numpy as np
import pandas as pd
from pathlib import Path


class NoHeaderError(ValueError):
    pass


def read_commented_csv(path, names=None, **kwargs) -> pd.DataFrame:
    if not names:
        with open(path) as f:
            header = f.readline()
            if header.startswith("#"):
                names = header[1:].strip().split()
    if not names:
        raise NoHeaderError(f"no commented header found in {path}")
    opts = dict(comment="#", sep=r"\s+", names=names)
    opts.update(kwargs)
    return pd.read_csv(path, **opts)


def read_pkl(path, **kwargs) -> pd.DataFrame:
    try:
        df = read_commented_csv(path, **kwargs)
    except NoHeaderError:
        ncols = np.loadtxt(path).shape[1]
        names = ["k"] + [f"P{2 * i}" for i in range(ncols - 1)]
        df = read_commented_csv(path, names=names, **kwargs)
    df.set_index(df.columns[0], drop=False, inplace=True)
    return df


def find_reader(name: str | None, default, **kwargs):
    if not name or name == "default":
        return default
    module_name, fn_name = name.rsplit(".", 1)
    fn = getattr(importlib.import_module(module_name), fn_name)
    return lambda path: fn(path, **kwargs)


def average_reader(paths, **kwargs) -> pd.DataFrame:
    """Mean multipoles over a set of mock files — the ``elephant_reader``
    pattern (reference reader.py:65-131: average EZmock measurements into a
    data vector).  ``paths``: list of files or a glob pattern."""
    import glob as _glob

    if isinstance(paths, (str, Path)):
        paths = sorted(_glob.glob(str(paths)))
    if not paths:
        raise FileNotFoundError("average_reader: no files matched")
    dfs = [read_pkl(p, **kwargs) for p in paths]
    out = dfs[0].copy()
    for df in dfs[1:]:
        if not np.allclose(df.index.to_numpy(), out.index.to_numpy()):
            raise ValueError("average_reader: mock files have different k grids")
        out += df.to_numpy()
    out /= len(dfs)
    out[out.columns[0]] = dfs[0][dfs[0].columns[0]]
    return out


def mock_cov_reader(paths, ls=None, rescale_mean: float = 1.0, **kwargs):
    """Sample covariance of the flattened (ℓ-stacked) multipole vectors over
    mock files — the ``elephant_cov_reader`` pattern (reader.py:65-131).

    Returns (cov, nmocks); feed nmocks as ``Nreal`` for the Hartlap factor.
    """
    import glob as _glob

    if isinstance(paths, (str, Path)):
        paths = sorted(_glob.glob(str(paths)))
    if len(paths) < 2:
        raise ValueError("mock_cov_reader needs at least two mock files")
    vecs = []
    for p in paths:
        df = read_pkl(p, **kwargs)
        cols = [c for c in df.columns[1:]]
        if ls is not None:
            sym = cols[0][0]
            cols = [f"{sym}{ell}" for ell in ls]
        vecs.append(np.hstack([df[c].to_numpy() for c in cols]))
    x = np.stack(vecs)
    cov = np.cov(x, rowvar=False) / rescale_mean
    return cov, x.shape[0]


def load_covariance(spec) -> tuple[np.ndarray, dict]:
    """Covariance from a path / list of paths / config dict
    (likelihood.py:337-363).  Returns (cov, options)."""
    from scipy.linalg import block_diag

    if not isinstance(spec, dict):
        spec = {"path": spec}
    reader = find_reader(spec.get("reader"), np.loadtxt, **spec.get("reader_kwargs", {}))
    path = spec["path"]
    if isinstance(path, (list, tuple)):
        cov = block_diag(*[reader(Path(p)) for p in path])
    else:
        cov = reader(Path(path))
    return np.asarray(cov, dtype=np.float64), spec
