"""Migration helpers for users of the reference (Cobaya-based) eftpipe."""

from .cobaya import convert_cobaya_config

__all__ = ["convert_cobaya_config"]
