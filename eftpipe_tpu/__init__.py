"""eftpipe_tpu — a TPU-native EFT-of-LSS theory + likelihood framework.

A ground-up JAX/XLA re-design of the capabilities of ``zhaoruiyang98/eftpipe``
(arXiv 2308.06206; PyBird core from arXiv 2003.07956), built TPU-first:

* All expensive survey-geometry and loop-integral matrices are precomputed
  once on the host ("Phase A") into a frozen pytree of constant tensors.
* The per-evaluation path — FFTLog of the linear power spectrum, one-loop
  M-matrix contractions, IR resummation, Alcock-Paczynski projection, window
  convolution, binning, bias contraction and Gaussian(-marginalized)
  likelihood — is a single jit-compiled function of the sampled parameters,
  ``vmap``-able over an ensemble of MCMC walkers and shardable over a
  ``jax.sharding.Mesh``.
* Complex arithmetic is carried as explicit (real, imag) pairs so the jitted
  graph runs on TPU (which has no complex128 support); FFTs over the small
  FFTLog grids are expressed as dense DFT matmuls that map onto the MXU.

Reference parity: every numerical component cites the eftpipe file:line it
reproduces, and the test-suite A/B-compares against the reference NumPy
implementation where available.
"""

__version__ = "0.1.0"

_LAZY = {
    "EFTModel": "eftpipe_tpu.api.model",
    "Analysis": "eftpipe_tpu.api.orchestrate",
    "EFTConfig": "eftpipe_tpu.models.config",
    "TracerPipeline": "eftpipe_tpu.models.pipeline",
    "CosmoInputs": "eftpipe_tpu.models.pipeline",
    "EFTLikelihood": "eftpipe_tpu.likelihood.likelihood",
    "EnsembleSampler": "eftpipe_tpu.parallel.sampler",
    "MCMCDriver": "eftpipe_tpu.parallel.mcmc",
    "PlkInterpolator": "eftpipe_tpu.api.products",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["__version__", *sorted(_LAZY)]
