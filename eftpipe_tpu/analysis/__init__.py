"""Post-analysis tooling: chain products, multipole containers, bestfit
models, Kaiser fits and BAO/RSD parameter conversions.

The analogue of /root/reference/eftpipe/analysis.py (CobayaProducts,
Multipole, BestfitModel, KaiserModel, LssConvertor) for chains produced by
:mod:`eftpipe_tpu.parallel.mcmc`.
"""

from .chains import ChainProducts
from .multipole import Multipole
from .bestfit import BestfitModel
from .kaiser import KaiserModel, kaiser_multipoles
from .convert import LssConvertor

__all__ = [
    "ChainProducts", "Multipole", "BestfitModel", "KaiserModel",
    "kaiser_multipoles", "LssConvertor",
]
