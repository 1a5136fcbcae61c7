from .providers import FixedTemplateProvider, TabulatedProvider
from .eh98 import EisensteinHuProvider, eh98_pk, lcdm_growth_f, lcdm_background
from .background import growth_rate_lcdm, growth_factor_lcdm
