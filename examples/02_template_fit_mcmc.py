"""Template-fit analysis (the reference's LinearPowerFile mode) end to end:
fixed P_lin from disk, sampled (f, alphas, biases), self-generated mock data,
on-device ensemble MCMC with checkpoint/resume, chain post-processing.

Run:  python examples/02_template_fit_mcmc.py   (~2 min on CPU)
"""

import numpy as np
import jax
import jax.numpy as jnp
from pathlib import Path

from eftpipe_tpu.api.orchestrate import Analysis
from eftpipe_tpu.analysis import ChainProducts, BestfitModel
from eftpipe_tpu.boltzmann.eh98 import eh98_pk

work = Path("example_template_fit")
work.mkdir(exist_ok=True)

# --- template P_lin on disk -------------------------------------------------
k = np.logspace(-5, 0, 300)
pk = np.asarray(eh98_pk(jnp.asarray(k), 0.02237, 0.12, 0.6777, 3.044,
                        0.9649, 0.7)[0])
np.savetxt(work / "plin.txt", np.column_stack([k, pk]))

config = {
    "theory": {"tracers": {"LRG": {
        "z": 0.70, "nd": 5e-5, "ls": [0, 2], "with_IRresum": True,
        "boltzmann": {"name": "fixed_template", "path": str(work / "plin.txt")},
    }}},
    "params": {
        "f":      {"prior": {"min": 0.4, "max": 1.2}, "ref": 0.8},
        "alperp": {"prior": {"min": 0.9, "max": 1.1}, "ref": 1.0},
        "alpara": {"prior": {"min": 0.9, "max": 1.1}, "ref": 1.0},
        "LRG_b1": {"prior": {"min": 1.0, "max": 4.0}, "ref": 2.2},
        "LRG_b2": 0.8, "LRG_b4": 0.8,
    },
}

# --- mock data from the model itself ----------------------------------------
th = Analysis.from_config(config)
kout = np.arange(0.015, 0.2049, 0.01)
fid = {"f": 0.8, "alperp": 1.0, "alpara": 1.0, "LRG_b1": 2.2}
ls, keff, plk = jax.jit(
    lambda: th.nonlinear_Plk_grid("LRG", fid, binned=True, kout=kout)
)()
rng = np.random.default_rng(1)
sigma = 0.02 * np.abs(np.asarray(plk))
noisy = np.asarray(plk) + sigma * rng.standard_normal(plk.shape)
np.savetxt(work / "data.txt", np.column_stack([kout, *noisy]), header="k P0 P2")
np.savetxt(work / "cov.txt", np.diag(sigma.reshape(-1) ** 2))

config["likelihood"] = {
    "tracers": ["LRG"],
    "data": {"LRG": {"path": str(work / "data.txt"), "ls": [0, 2],
                     "kmin": 0.02, "kmax": 0.2}},
    "cov": str(work / "cov.txt"),
    "binned": True,
    "marg": {"LRG_": {"b3": {"scale": 2.0}, "cct": {"scale": 4.0}}},
}

# --- sample ------------------------------------------------------------------
an = Analysis.from_config(config)
# with_derived=False keeps this CPU example quick — the derived chain
# columns (fz, alphas, chi2) re-evaluate the theory per sample
result = an.run_mcmc(nwalkers=64, out=work / "chains/run", rhat_tol=0.05,
                     max_steps=600, block=100, key=0, with_derived=False)
print(f"converged={result.converged}  accept={result.accept_rate:.2f}  "
      f"max R-1={float(np.max(result.rminus1)):.3f}")

# --- post-process --------------------------------------------------------------
cp = ChainProducts.from_prefix(work / "chains/run", burn_in=0.4)
print("posterior means:", dict(cp.mean(["f", "alperp", "alpara", "LRG_b1"]).round(4)))
bf = BestfitModel.from_chains(an, cp)
print("bestfit chi2:", {kk: round(v, 2) for kk, v in bf.chi2().items()})
print("restored marginalized:", {p: round(bf.params[p], 3)
                                 for p in ("LRG_b3", "LRG_cct")})
