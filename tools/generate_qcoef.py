"""Generate the IR-resummation Q coefficient tensors.

The IR-resummation bulk coefficients Q^{ll'}_{||N-j}(n, α, f) are closed-form
polynomials in the growth rate f (PyBird, arXiv 2003.07956 app. C).  The
reference ships them as ~4400 generated Python lambdas
(/root/reference/eftpipe/pybird/pybird.py:179-469 for NIR=8 and
/root/reference/eftpipe/pybird/resumfactor.py for NIR=16), evaluated in a
Python loop per posterior call (pybird.py:1367-1380) — unusable inside a
jitted/vmapped TPU graph.

This script tensorises them once: each polynomial is sampled at Chebyshev
nodes on f ∈ [0, FMAX] and represented exactly by its Chebyshev coefficients
(the functions are true polynomials of degree ≤ 20, so interpolation through
DEG+1 nodes is exact up to roundoff; the Chebyshev basis keeps the fit
perfectly conditioned, unlike a monomial Vandermonde).  At runtime ``makeQ``
becomes a single einsum against a vector of Chebyshev polynomials of f.

Output: eftpipe_tpu/tables/data/qcoef_nir{8,16}.npz with
    coef : (2, nl, nl, nn, deg+1) float64 — index [a, l/2, l'/2, u, d]
           matching the runtime layout Q[a, l, l', u] used by Resum.Ps
           (reference fills Q[a][l][lpr][u] = table[1-a][2l][2lpr][u](f))
    fmax : scalar, Chebyshev domain is [0, fmax]

Run from the repo root with the reference tree mounted; the npz artifacts are
committed so the framework never needs the reference at runtime.
"""

import sys
from pathlib import Path

import numpy as np
from numpy.polynomial import chebyshev as C

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from refbridge import load_reference, reference_available  # noqa: E402

FMAX = 3.0
DEG = 40


def tensorize(table, nl: int, nn: int) -> np.ndarray:
    nodes = np.cos(np.pi * (np.arange(DEG + 1) + 0.5) / (DEG + 1))  # Chebyshev pts on [-1,1]
    fvals = 0.5 * FMAX * (nodes + 1.0)
    u_dom = nodes  # chebfit in the mapped variable u = 2f/fmax - 1
    coef = np.zeros((2, nl, nl, nn, DEG + 1))
    for a in range(2):
        for il in range(nl):
            for ilp in range(nl):
                for u in range(nn):
                    fn = table[1 - a][2 * il][2 * ilp][u]
                    y = np.array([float(fn(f)) for f in fvals])
                    if np.all(y == 0.0):
                        continue
                    c = C.chebfit(u_dom, y, DEG)
                    # trim numerically-zero tail for cleanliness
                    scale = np.abs(c).max()
                    c[np.abs(c) < 1e-13 * scale] = 0.0
                    coef[a, il, ilp, u] = c
    return coef


def main() -> None:
    assert reference_available(), "reference tree required to (re)generate Q tables"
    pybird = load_reference("pybird.pybird")
    resumfactor = load_reference("pybird.resumfactor")
    outdir = Path(__file__).resolve().parent.parent / "eftpipe_tpu" / "tables" / "data"
    outdir.mkdir(parents=True, exist_ok=True)

    coef8 = tensorize(pybird.Qa, nl=2, nn=32)
    np.savez_compressed(outdir / "qcoef_nir8.npz", coef=coef8, fmax=FMAX)
    print("qcoef_nir8:", coef8.shape, "nonzero:", int(np.any(coef8 != 0, axis=-1).sum()))

    coef16 = tensorize(resumfactor.Qawithhex, nl=3, nn=96)
    np.savez_compressed(outdir / "qcoef_nir16.npz", coef=coef16, fmax=FMAX)
    print("qcoef_nir16:", coef16.shape, "nonzero:", int(np.any(coef16 != 0, axis=-1).sum()))


if __name__ == "__main__":
    main()
