from .parambasis import WestCoastBasis, EastCoastBasis, find_param_basis, BirdComponent
from .marginal import MarginalSetup, marginalized_logp, bg_bestfit
