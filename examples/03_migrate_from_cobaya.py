"""Migrate a reference (Cobaya) eftpipe run config to this framework.

Point this at any reference-style YAML — the converter maps the eftlss
tracer blocks, eftlike likelihood blocks (incl. multiple NGC/SGC blocks) and
the Cobaya params block onto the native schema; see
eftpipe_tpu/compat/cobaya.py for exactly what is and is not translated.

Run:  python examples/03_migrate_from_cobaya.py <reference.yaml> <data_root>
"""

import sys
import json

import jax
import jax.numpy as jnp

from eftpipe_tpu.compat import convert_cobaya_config
from eftpipe_tpu.api.orchestrate import Analysis

yaml_path = sys.argv[1]
data_root = sys.argv[2] if len(sys.argv) > 2 else None

info = convert_cobaya_config(yaml_path, data_root=data_root,
                             boltzmann={"name": "eh98"})
print("tracers:", [t for t in info["theory"]["tracers"] if t != "default"])
print("sampled params:", [p for p, s in info["params"].items()
                          if isinstance(s, dict) and "prior" in s])

an = Analysis.from_config(info)
theta0 = jnp.asarray(an.space.theta0())
res = jax.jit(an.loglike)(theta0)
print(json.dumps({k: float(v) for k, v in res.items()
                  if k in ("logp", "chi2", "fullchi2")}, indent=1))
# next: an.run_mcmc(nwalkers=256, out="chains/run") on a TPU host
