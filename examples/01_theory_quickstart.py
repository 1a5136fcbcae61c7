"""Quickstart: one-loop EFT multipoles through the fluent EFTModel API.

Run:  python examples/01_theory_quickstart.py
"""

import numpy as np

from eftpipe_tpu.api.model import EFTModel

model = (
    EFTModel(z=0.7, nd=5e-5)
    .set_cosmology(omega_b=0.02237, omega_cdm=0.120, h=0.6777,
                   ln10As=3.044, ns=0.9649)
    .set_IRresum()
    .set_APeffect(Om_AP=0.31)
    .done(ellmax=4)
)

# bias parameters in the westcoast convention; (c2, c4) map to (b2, b4)
interp = model(b1=2.0, c2=1.2, b3=0.4, cct=0.3, cr1=-0.5, ce0=0.1)

k = np.linspace(0.01, 0.25, 25)
for ell in (0, 2, 4):
    p = np.asarray(interp(ell, k))
    print(f"P{ell}(k=0.1) = {np.interp(0.1, k, p):,.1f} (Mpc/h)^3")

# matter-limit multipoles for quick sanity checks
mm = model.Plk_mm()
print(f"matter P0(0.1) = {float(np.asarray(mm(0, np.array([0.1]))).squeeze()):,.1f}")
