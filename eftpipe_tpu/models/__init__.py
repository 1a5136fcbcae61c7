from .config import EFTConfig, kbird_grid, SBIRD
