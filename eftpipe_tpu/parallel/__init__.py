from .mesh import walker_mesh, shard_walkers, chunked_vmap
from .sampler import EnsembleSampler, stretch_step
