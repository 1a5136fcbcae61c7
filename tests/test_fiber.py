import numpy as np
import jax.numpy as jnp

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.fiber import build_fiber_tables, apply_fiber, dp_uncorr
from eftpipe_tpu.models.bird import BirdState

from refbridge import golden_oracle, load_reference

_PS = np.random.default_rng(9).normal(size=(3, 4, 50)).cumsum(axis=-1)


def _fiber_golden():
    def compute():
        ref_pybird = load_reference("pybird.pybird")
        co = ref_pybird.Common(Nl=3, No=3)
        fib = ref_pybird.FiberCollision(
            fs=0.6, Dfc=0.43 / 0.6777, ktrust=0.25, co=co
        )
        return {
            "k": co.k,
            "dpcorr": fib.dPcorr(co.k, co.k, _PS, ktrust=0.25, fs=0.6,
                                 Dfc=0.43 / 0.6777),
            "dpuncorr": fib.dPuncorr(co.k, 0.6, 0.43 / 0.6777),
        }

    return golden_oracle("fiber_corrections", compute)


def test_dpcorr_matches_reference():
    gold = _fiber_golden()
    cfg = EFTConfig(nl=3, no=3)
    ft = build_fiber_tables(cfg, fs=0.6, dfc=0.43 / 0.6777, ktrust=0.25)
    got = np.einsum("apkj,pnj->ank", ft["fmat"], _PS)
    expected = gold["dpcorr"]
    np.testing.assert_allclose(
        got, expected, rtol=1e-7, atol=1e-10 * np.abs(expected).max()
    )


def test_dp_uncorr_matches_reference():
    gold = _fiber_golden()
    np.testing.assert_allclose(
        dp_uncorr(gold["k"], 0.6, 0.43 / 0.6777), gold["dpuncorr"], rtol=1e-12
    )


def test_apply_fiber_updates_fields():
    cfg = EFTConfig(nl=2, no=2)
    ft = build_fiber_tables(cfg, fs=0.6, dfc=0.63)
    rng = np.random.default_rng(1)
    shape = (cfg.nl, 3, cfg.nk)
    z = jnp.asarray(rng.normal(size=shape))
    bird = BirdState(
        f=jnp.asarray(0.8), p11l=z, ploopl=jnp.asarray(rng.normal(size=(cfg.nl, 12, cfg.nk))),
        pctl=jnp.asarray(rng.normal(size=(cfg.nl, 6, cfg.nk))), pct_nnlo_l=z, pstl=z,
        picc=jnp.zeros((cfg.nl, cfg.nk)), c11=z, cct=z, cct_nnlo=z,
        cloopl=jnp.zeros((cfg.nl, 12, cfg.ns)),
    )
    out = apply_fiber(ft, cfg, bird)
    assert not np.allclose(np.asarray(out.p11l), np.asarray(bird.p11l))
    np.testing.assert_allclose(np.asarray(out.pstl), np.asarray(bird.pstl))  # fiber_st off
