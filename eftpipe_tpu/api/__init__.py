from .flagship import build_flagship, FlagshipModel
