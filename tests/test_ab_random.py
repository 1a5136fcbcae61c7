"""Randomized end-to-end A/B harness vs the reference (the ``diffbird``
pattern, reference tests/compare/eftpair.py:260-312): random parameter draws
run through the FULL chain on both sides — one-loop engine → shot-noise
subtraction → IR resummation → AP projection → k-binning — and every bird
tensor is compared.  The per-stage parity tests pin each component; this
gate pins their composition and ordering."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.pipeline import TracerPipeline, CosmoInputs
from eftpipe_tpu.models.transforms import build_binning_matrix, apply_binning
from eftpipe_tpu.utils.tools import RandomParams
from eftpipe_tpu.boltzmann.eh98 import eh98_pk

from refbridge import load_reference

NDRAWS = 3
KOUT = np.arange(0.01, 0.205, 0.01)


@pytest.fixture(scope="module")
def draws():
    rp = RandomParams(
        mean={"omega_cdm": 0.12, "h": 0.6777, "ln10As": 3.044, "f": 0.8,
              "qperp": 1.0, "qpar": 1.0},
        scale={"omega_cdm": 0.004, "h": 0.01, "ln10As": 0.03, "f": 0.04,
               "qperp": 0.01, "qpar": 0.01},
        seed=11,
    )
    return rp.draw(NDRAWS)


@pytest.fixture(scope="module")
def stack(request):
    ref_pybird = load_reference("pybird.pybird")
    ref_binning = load_reference("binning")
    nl = 3
    co = ref_pybird.Common(Nl=nl, No=nl)
    nonlinear = ref_pybird.NonLinear(load=False, save=False, co=co)
    resum = ref_pybird.Resum(co=co)
    ap = ref_pybird.APeffect(Om_AP=0.31, z_AP=0.7, co=co)
    binning = ref_binning.Binning(KOUT, co=co)

    cfg = EFTConfig(nl=nl, no=nl)
    pipe = TracerPipeline.build(
        cfg, zeff=0.7, with_irresum=True,
        apeffect=dict(om_ap=0.31, z_ap=0.7),
    )
    bt = pipe.binning_tables(KOUT)
    return ref_pybird, co, nonlinear, resum, ap, binning, cfg, pipe, bt


def test_full_chain_matches_reference(stack, draws):
    ref_pybird, co, nonlinear, resum, ap, binning, cfg, pipe, bt = stack
    kin = np.asarray(cfg.kin)

    for i, p in enumerate(draws):
        plin = np.asarray(
            eh98_pk(jnp.asarray(kin), 0.02237, p["omega_cdm"], p["h"],
                    p["ln10As"], 0.9649, 0.7)[0]
        )
        f, qperp, qpar = p["f"], p["qperp"], p["qpar"]

        # ---- reference chain ------------------------------------------
        bird = ref_pybird.Bird(kin, plin, f, co=co)
        nonlinear.PsCf(bird)
        bird.setPsCfl()
        resum.Ps(bird)
        ap.AP(bird, q=(qperp, qpar))
        ref = binning.kbinning(bird)

        # ---- ours -------------------------------------------------------
        inputs = CosmoInputs(plin=jnp.asarray(plin), f=jnp.asarray(f),
                             qperp=jnp.asarray(qperp), qpar=jnp.asarray(qpar))
        ours = jax.jit(
            lambda ci: apply_binning(bt, pipe.compute_bird(ci))
        )(inputs)

        for ref_name, our_name in [
            ("P11l", "p11l"), ("Ploopl", "ploopl"), ("Pctl", "pctl"),
            ("Pstl", "pstl"),
        ]:
            a = getattr(ref, ref_name)
            b = np.asarray(getattr(ours, our_name))
            np.testing.assert_allclose(
                b, a, rtol=2e-6, atol=1e-8 * np.abs(a).max(),
                err_msg=f"draw {i}: {ref_name}",
            )


def test_full_chain_vmap_over_draws(stack, draws):
    """The same chain vmapped over the draw batch equals per-draw calls —
    exercises the walker-grouped quad_form dispatch end-to-end."""
    _, _, _, _, _, _, cfg, pipe, bt = stack
    kin = np.asarray(cfg.kin)

    plins, fs, qps, qls = [], [], [], []
    for p in draws:
        plins.append(np.asarray(
            eh98_pk(jnp.asarray(kin), 0.02237, p["omega_cdm"], p["h"],
                    p["ln10As"], 0.9649, 0.7)[0]
        ))
        fs.append(p["f"])
        qps.append(p["qperp"])
        qls.append(p["qpar"])

    def one(plin, f, qperp, qpar):
        ci = CosmoInputs(plin=plin, f=f, qperp=qperp, qpar=qpar)
        return apply_binning(bt, pipe.compute_bird(ci)).p11l

    batched = jax.jit(jax.vmap(one))(
        jnp.asarray(np.stack(plins)), jnp.asarray(fs), jnp.asarray(qps),
        jnp.asarray(qls),
    )
    for i in range(NDRAWS):
        single = one(jnp.asarray(plins[i]), jnp.asarray(fs[i]),
                     jnp.asarray(qps[i]), jnp.asarray(qls[i]))
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), rtol=1e-9,
            atol=1e-12 * float(jnp.abs(single).max()),
        )
