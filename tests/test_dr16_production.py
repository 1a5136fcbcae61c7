"""The reference's production headline analysis, end to end on real data:
DR16 LRG+ELG+X NGC with real survey windows, chained ELG multipoles,
Jeffreys-marginalized nuisances — converted straight from the production
YAML (/root/reference/cobaya/yamls/DR16_noric_LEX_*_xnost.yaml) and
evaluated through the jitted pipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from pathlib import Path

from eftpipe_tpu.compat import convert_cobaya_config

REF = Path("/root/reference")
YAML = REF / "cobaya/yamls/DR16_noric_LEX_NS_LP024_kmax0.20_EQ02_kmax0.20_XP024_kmax0.20_xnost.yaml"

pytestmark = pytest.mark.skipif(not YAML.exists(),
                                reason="reference production yaml missing")


def test_production_config_converts_with_two_blocks():
    info = convert_cobaya_config(YAML, data_root=REF / "cobaya")
    lk = info["likelihood"]
    assert set(lk) == {"LEX_NGC", "LEX_SGC"}
    ngc = lk["LEX_NGC"]
    assert ngc["tracers"] == ["LRG_NGC", "ELG_NGC", "X_NGC"]
    assert ngc["chained"] == {"LRG_NGC": False, "ELG_NGC": True, "X_NGC": False}
    assert ngc["jeffreys"] is True
    # empty scales in the production marg == infinite (Jeffreys) priors
    assert ngc["marg"]["LRG_NGC_"]["b3"]["scale"] is None
    tracers = info["theory"]["tracers"]
    assert tracers["X_NGC"]["cross"] == ["LRG_NGC", "ELG_NGC"]
    assert tracers["default"]["with_APeffect"]["rdrag_AP"] == 147.66
    assert Path(tracers["LRG_NGC"]["with_window"]["window_configspace_file"]).exists()


@pytest.mark.slow
def test_production_ngc_block_on_real_data(tmp_path):
    info = convert_cobaya_config(YAML, data_root=REF / "cobaya",
                                 boltzmann={"name": "eh98"},
                                 cache_dir=tmp_path / "cache")
    # NGC block only (Phase-A windows for all six tracers would double the
    # runtime without adding coverage) and a lighter window quadrature
    info["likelihood"] = {"LEX_NGC": info["likelihood"]["LEX_NGC"]}
    keep = set(info["likelihood"]["LEX_NGC"]["tracers"]) | {"default"}
    info["theory"]["tracers"] = {
        t: cfg for t, cfg in info["theory"]["tracers"].items() if t in keep
    }
    for t, tcfg in info["theory"]["tracers"].items():
        win = tcfg.get("with_window")
        if isinstance(win, dict):
            win.pop("window_fourier_file", None)  # not shipped in the payload
            win["accboost"] = 1
            win["nmax"] = 1024

    from eftpipe_tpu.api.orchestrate import Analysis

    an = Analysis.from_config(info)

    # chained-Nl negotiation: ELG data is Q0/Q2 -> internal multipoles to l=4
    assert an.configs["ELG_NGC"].nl == 3
    assert an.bases["X_NGC"].cross_prefix == ["LRG_NGC_", "ELG_NGC_"]
    # production nuisances marginalize with infinite scales + Jeffreys
    lk = an.likes["LEX_NGC"]
    assert lk.jeffreys is True
    assert lk.marginal is not None and lk.marginal.nmarg == 12
    assert 100 < lk.ndata < 160

    theta0 = jnp.asarray(an.space.theta0())
    res = jax.jit(an.loglike)(theta0)
    chi2 = float(res["fullchi2"])
    assert np.isfinite(float(res["logp"]))
    assert np.isfinite(chi2)
    # EH98 at the production reference point vs real DR16 data: the
    # conditional-bestfit chi2/dof must be O(1), not garbage
    assert chi2 / lk.ndata < 10.0

    # vmapped evaluation for the sampler path
    thetas = jnp.stack([theta0, theta0 * 1.001, theta0 * 0.999])
    out = jax.jit(jax.vmap(an.logp))(thetas)
    assert out.shape == (3,) and bool(jnp.isfinite(out).all())
