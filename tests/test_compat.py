"""Cobaya-config migration (eftpipe_tpu/compat): convert the reference's own
run YAMLs and evaluate a likelihood on the real eBOSS DR16 data shipped with
the reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from pathlib import Path

from eftpipe_tpu.compat import convert_cobaya_config

REF = Path("/root/reference")
YAML_ALL = REF / "tests/yamls/mock_eBOSS_LRG_ELG_NGC_all_like.yaml"
YAML_X = REF / "tests/yamls/mock_eBOSS_LRGxELG_NGC_like.yaml"

pytestmark = pytest.mark.skipif(not YAML_ALL.exists(),
                                reason="reference tree not available")


def test_convert_mixed_yaml_structure():
    info = convert_cobaya_config(YAML_ALL, data_root=REF / "cobaya")
    tracers = info["theory"]["tracers"]
    assert set(tracers) == {"LRG_NGC", "ELG_NGC", "default"}
    lrg = tracers["LRG_NGC"]
    assert lrg["prefix"] == "LRG_NGC_" and lrg["z"] == 0.7
    assert lrg["nd"] == pytest.approx(7.65e-5)
    assert lrg["with_APeffect"]["z_AP"] == 0.7
    assert "window_configspace_file" in lrg["with_window"]
    elg = tracers["ELG_NGC"]
    assert elg["basis"] == "eastcoast"
    assert elg["with_fiber"]["Dfc"] == 0.7 and elg["with_fiber"]["fiberst"] is True
    default = tracers["default"]
    assert default["with_NNLO"] is True
    assert default["with_APeffect"]["Om_AP"] == 0.307
    assert default["with_APeffect"]["rdrag_AP"] == 147.74

    lk = info["likelihood"]
    assert lk["tracers"] == ["LRG_NGC", "ELG_NGC"]
    assert lk["chained"] == {"LRG_NGC": False, "ELG_NGC": True}
    assert lk["cov"]["rescale"] == 9 and lk["cov"]["Nreal"] == 1000
    assert lk["data"]["LRG_NGC"]["kmax"] == [0.25, 0.25, 0.20]
    assert lk["marg"]["LRG_NGC_b3"]["scale"] == 2

    params = info["params"]
    # cosmology renames + H0 -> h scaling
    assert params["omega_b"] == pytest.approx(0.02214)
    assert params["h"]["prior"] == {"min": 0.4, "max": 1.0}
    assert params["h"]["ref"] == pytest.approx(0.6777)
    assert params["ln10As"]["ref"] == pytest.approx(3.0513)
    assert params["ns"] == pytest.approx(0.9611)
    assert params["LRG_NGC_b1"]["prior"] == {"min": 0.0, "max": 4.0}
    # lambda params over RENAMED inputs survive with the args rewritten
    # (VERDICT r4 item 7: As(logA) must become As(ln10As), not be dropped)
    assert params["As"] == {"value": "lambda ln10As: 1e-10 * np.exp(ln10As)"}
    # latex-only derived params (no value) are still dropped
    assert "sigma8" not in params


def test_convert_cross_yaml_structure():
    info = convert_cobaya_config(YAML_X, data_root=REF / "cobaya")
    tracers = info["theory"]["tracers"]
    assert tracers["x_NGC"]["cross"] == ["LRG_NGC", "ELG_NGC"]
    assert tracers["x_NGC"]["prefix"] == "x_NGC_"


@pytest.fixture(scope="module")
def real_data_analysis():
    """Single-tracer analysis on the real eBOSS DR16 LRG NGC multipoles
    (window files are not in the data payload, so the survey mask stays
    off — this gates data/cov ingestion + masking + binning + theory)."""
    from eftpipe_tpu.api.orchestrate import Analysis

    cobaya_style = {
        "theory": {"eftpipe.eftlss": {"tracers": {
            "LRG_NGC": {
                "prefix": "LRG_NGC_",
                "z": 0.70,
                "km": 0.7, "kr": 0.25, "nd": 7.65e-5,
                "basis": "westcoast",
                "with_IRresum": True,
                "with_APeffect": True,
                "APeffect": {"Om_AP": 0.307, "z_AP": 0.7},
            },
        }}},
        "likelihood": {"eBOSS_LRG": {
            "tracers": ["LRG_NGC"],
            "data": {"LRG_NGC": {
                "path": "data/noric/NGC_LRG_P.txt",
                "ls": [0, 2, 4], "kmin": 0.02, "kmax": [0.20, 0.20, 0.15],
            }},
            "cov": {"path": "data/ric/cov_NGC_L024_P.txt", "Nreal": 1000},
            "with_binning": True,
            "marg": {
                "LRG_NGC_b3": {"scale": 2.0}, "LRG_NGC_cct": {"scale": 2.0},
                "LRG_NGC_cr1": {"scale": 4.0}, "LRG_NGC_ce0": {"scale": 2.0},
                "LRG_NGC_cequad": {"scale": 2.0},
            },
        }},
        "params": {
            "omegabh2": {"value": 0.02214},
            "omegach2": {"prior": {"min": 0.05, "max": 0.25}, "ref": 0.1189},
            "H0": {"prior": {"min": 50.0, "max": 90.0}, "ref": 67.77},
            "logA": {"prior": {"min": 1.0, "max": 5.0}, "ref": 3.05},
            "ns": {"value": 0.9611},
            "LRG_NGC_b1": {"prior": {"min": 0.0, "max": 4.0}, "ref": 2.3},
            "LRG_NGC_c2": {"prior": {"min": -4.0, "max": 4.0}, "ref": 0.8},
            "LRG_NGC_b4": 0.0,
        },
    }
    info = convert_cobaya_config(cobaya_style, data_root=REF)
    # westcoast samples c2 -> map to b2/b4 on the fly is an EFTModel nicety;
    # here sample b2 directly instead
    info["params"]["LRG_NGC_b2"] = info["params"].pop("LRG_NGC_c2")
    return Analysis.from_config(info)


def test_real_ebolss_data_likelihood(real_data_analysis):
    an = real_data_analysis
    assert an.like.ndata == an.like.data_vector.size
    # ls [0,2,4] masked at [0.02, 0.2/0.2/0.15]: bins ~ (18, 18, 13)
    assert 40 < an.like.ndata < 60
    # Hartlap factor applied
    assert an.like.hartlap is not None and 0.9 < an.like.hartlap < 1.0

    theta0 = jnp.asarray(an.space.theta0())
    res = jax.jit(an.loglike)(theta0)
    chi2 = float(res["chi2"])
    assert np.isfinite(chi2)
    # EH98 theory vs real eBOSS data at a reasonable point: chi2/dof sane
    assert chi2 / an.like.ndata < 20.0

    lp = jax.jit(an.logp)(theta0)
    assert np.isfinite(float(lp))


def test_real_data_posterior_moves_toward_fit(real_data_analysis):
    """A short ensemble run improves the fit (sanity of gradients/geometry
    on real data)."""
    an = real_data_analysis
    res = an.run_mcmc(nwalkers=16, max_steps=30, block=15, rhat_tol=-1.0,
                      key=2, with_derived=False)
    start = float(res.logps[0].max())
    end = float(res.logps[-1].max())
    assert end >= start  # best walker should not get worse
    assert np.isfinite(res.logps).all()
