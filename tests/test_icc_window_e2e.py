"""End-to-end integral-constraint + window coupling vs the reference
(window.py:389-415: W − W_icc convolution and the P_icc shot-noise column).
The per-component icc tests (tests/test_icc.py) pin PSN / FFTLog2D; this
gate pins the full coupled application inside the window stage."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.icc import build_icc_tables
from eftpipe_tpu.models.window import build_window_tables, apply_window
from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
from eftpipe_tpu.models.bird import build_bird_tables, assemble_bird
from eftpipe_tpu.boltzmann.eh98 import eh98_pk

from refbridge import golden_oracle, load_reference

NL = 2
PSHOT = 3000.0
F = 0.8


def synthetic_files(tmp_path):
    """Mask multipoles Q_q(s), squared-window SN multipoles W²_ℓ(s), and a
    separable (l1, l2, s1, s2) IC table (all deterministic — identical in
    live and hermetic runs)."""
    s = np.geomspace(1.0, 4000.0, 600)
    roll = 1.0 / (1.0 + (s / 350.0) ** 3)
    mask = tmp_path / "mask.txt"
    np.savetxt(mask, np.column_stack([s, roll, 0.06 * roll, 0.02 * roll]))

    sn = tmp_path / "sn.txt"
    w2 = np.column_stack([s, roll**2, 0.05 * roll**2])
    np.savetxt(sn, w2)

    sgrid = np.geomspace(2.0, 1500.0, 60)
    g = 1.0 / (1.0 + (sgrid / 300.0) ** 2)
    rows = []
    for il1, l1 in enumerate((0.0, 2.0)):
        for il2, l2 in enumerate((0.0, 2.0)):
            amp = 1.0 / (1.0 + il1 + il2)
            for i, s1 in enumerate(sgrid):
                for j, s2 in enumerate(sgrid):
                    rows.append([l1, l2, s1, s2, amp * g[i] * g[j]])
    # .npy: the reference's text path uses the removed pandas
    # delim_whitespace kwarg (icc.py:92) and cannot run on pandas >= 2
    ic = tmp_path / "ic.npy"
    np.save(ic, np.asarray(rows))
    return mask, sn, ic


def _plin(cfg):
    kin = np.asarray(cfg.kin)
    return kin, np.asarray(eh98_pk(jnp.asarray(kin), 0.02237, 0.12, 0.6777,
                                   3.044, 0.9649, 0.7)[0])


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("iccwin")
    mask, sn, ic = synthetic_files(tmp_path)

    cfg = EFTConfig(nl=NL, no=NL)
    kin, plin = _plin(cfg)

    def compute():
        ref_pybird = load_reference("pybird.pybird")
        ref_icc = load_reference("icc")
        ref_window = load_reference("window")

        co = ref_pybird.Common(Nl=NL, No=NL)
        icc_ref = ref_icc.IntegralConstraint(
            Pshot=PSHOT,
            icc_configspace_SN_file=sn,
            icc_configspace_IC_file=ic,
            co=co, load=False, save=False, Nmax=1024, Nxmax=512, Nymax=512,
        )
        win_ref = ref_window.Window(
            window_configspace_file=mask, co=co, load=False, save=False,
            Nmax=1024, icc=icc_ref,
        )
        bird = ref_pybird.Bird(kin, plin, F, co=co)
        nl_ref = ref_pybird.NonLinear(load=False, save=False, co=co)
        nl_ref.PsCf(bird)
        bird.setPsCfl()
        win_ref.Window(bird)
        return {n: np.asarray(getattr(bird, n))
                for n in ("P11l", "Ploopl", "Pctl", "Pstl", "Picc")}

    gold = golden_oracle("icc_window_e2e", compute)

    icc_tables = build_icc_tables(
        cfg, pshot=PSHOT, icc_configspace_sn_file=sn,
        icc_configspace_ic_file=ic, nmax=1024, nxmax=512, nymax=512,
    )
    wt = build_window_tables(
        cfg, window_configspace_file=mask, nmax=1024, icc_tables=icc_tables,
    )
    return gold, cfg, wt


def test_window_with_icc_matches_reference(setup):
    gold, cfg, wt = setup
    kin, plin = _plin(cfg)

    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)

    @jax.jit
    def ours(plin_j, f_j):
        out = nonlinear_pscf(nt, cfg, plin_j)
        b = assemble_bird(bt, cfg, out, plin_j, f_j)
        return apply_window(wt, cfg, b)

    got = ours(jnp.asarray(plin), jnp.asarray(F))

    for ref_name, our_name in [
        ("P11l", "p11l"), ("Ploopl", "ploopl"), ("Pctl", "pctl"),
        ("Pstl", "pstl"), ("Picc", "picc"),
    ]:
        a = gold[ref_name]
        b = np.asarray(getattr(got, our_name))
        np.testing.assert_allclose(
            b, a, rtol=5e-6, atol=1e-8 * np.abs(a).max(),
            err_msg=ref_name,
        )
