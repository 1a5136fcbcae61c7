"""Precomputed window-matrix path (reference window.py:418-577) and the
IR-cutoff modes of the loop engine (pybird.py IRcutoff 'all'/'loop'/'resum')
vs the reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.window import (
    build_window_matrix_tables,
    apply_window_matrix,
    rearrange_window_matrix,
)
from eftpipe_tpu.models.nonlinear import build_nonlinear_tables, nonlinear_pscf
from eftpipe_tpu.models.bird import build_bird_tables, assemble_bird

from refbridge import golden_oracle, load_reference
from test_fftlog import smooth_positive

KIN = np.logspace(-5, 0, 200)
PLIN = smooth_positive(KIN, seed=55)
F = 0.8


@pytest.fixture(scope="module")
def florian_matrix(tmp_path_factory):
    """Synthetic Florian-format flat matrix: (5 ells × 40 bins) rows,
    (3 ells × 400 bins) cols, smooth and k-localised."""
    rng = np.random.default_rng(3)
    kout = (np.linspace(0, 0.4, 41)[1:] + np.linspace(0, 0.4, 41)[:-1]) / 2
    kin = (np.linspace(0, 0.4, 401)[1:] + np.linspace(0, 0.4, 401)[:-1]) / 2
    rows = []
    for lo in range(5):
        for ko in kout:
            row = []
            for li in range(3):
                amp = 1.0 if lo == 2 * li else 0.05 / (1 + abs(lo - 2 * li))
                row.append(amp * np.exp(-((kin - ko) ** 2) / (2 * 0.01**2)))
            rows.append(np.hstack(row))
    matrix = np.asarray(rows) * (1 + 0.01 * rng.standard_normal((200, 1200)))
    path = tmp_path_factory.mktemp("wm") / "florian.txt"
    np.savetxt(path, matrix)
    return path


def test_window_matrix_matches_reference(florian_matrix):
    nl = 3
    ells, kmin, kmax = [0, 2], 0.01, 0.2

    def compute():
        ref_pb = load_reference("pybird.pybird")
        ref_window = load_reference("window")
        co = ref_pb.Common(Nl=nl, No=nl)
        wm_ref = ref_window.WindowMatrix.load(
            str(florian_matrix), ells=ells, kmin=kmin, kmax=kmax, co=co,
            window_st=True,
        )
        bird = ref_pb.Bird(KIN, PLIN, F, co=co)
        nl_ref = ref_pb.NonLinear(load=False, save=False, co=co)
        nl_ref.PsCf(bird)
        bird.setPsCfl()
        wm_ref.Window(bird)
        return {n: np.asarray(getattr(bird, n))
                for n in ("P11l", "Ploopl", "Pctl", "Pstl")}

    gold = golden_oracle("window_matrix_convolved", compute)

    class _G:
        def __getattr__(self, name):
            return gold[name]

    bird = _G()

    cfg = EFTConfig(nl=nl, no=nl)
    wmt = build_window_matrix_tables(
        cfg, path=florian_matrix, ells=ells, kmin=kmin, kmax=kmax,
        window_st=True,
    )
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)

    @jax.jit
    def ours(plin, f):
        out = nonlinear_pscf(nt, cfg, plin)
        b = assemble_bird(bt, cfg, out, plin, f)
        return apply_window_matrix(wmt, cfg, b)

    got = ours(jnp.asarray(PLIN), jnp.asarray(F))
    for ref_name, our_name in [("P11l", "p11l"), ("Ploopl", "ploopl"),
                               ("Pctl", "pctl"), ("Pstl", "pstl")]:
        a = np.asarray(getattr(bird, ref_name))
        b = np.asarray(getattr(got, our_name))
        np.testing.assert_allclose(b, a, rtol=5e-6,
                                   atol=1e-8 * np.abs(a).max(),
                                   err_msg=ref_name)


def test_rearrange_matches_reference_helper(florian_matrix):
    matrix = np.loadtxt(florian_matrix)

    def compute():
        ref_window = load_reference("window")
        return {"expected": ref_window.to_window_matrix(
            matrix,
            ref_window.PInfo(ells=(0, 2, 4), kmin=0, kmax=0.4, nbins=400),
            ref_window.PInfo(ells=(0, 1, 2, 3, 4), kmin=0, kmax=0.4, nbins=40),
            ells_in=(0, 2), kmax_in=0.3, ells_out=(0, 2), kmin_out=0.02,
            kmax_out=0.18,
        )}

    expected = golden_oracle("window_matrix_rearrange", compute)["expected"]
    got = rearrange_window_matrix(
        matrix,
        in_ells=(0, 2, 4), in_kmin=0.0, in_kmax=0.4, in_nbins=400,
        out_ells=(0, 1, 2, 3, 4), out_kmin=0.0, out_kmax=0.4, out_nbins=40,
        sel_in_ells=(0, 2), sel_in_kmax=0.3, sel_out_ells=(0, 2),
        sel_out_kmin=0.02, sel_out_kmax=0.18,
    )
    np.testing.assert_array_equal(got, expected)


# ----------------------------------------------------------------------
@pytest.mark.parametrize("mode", ["all", "loop", "resum"])
def test_ir_cutoff_modes_match_reference(mode):
    """The kIR low-k cut applied to the FFTLog inputs (pybird.py Coef,
    'all' | 'loop' | 'resum')."""
    def compute():
        ref_pb = load_reference("pybird.pybird")
        co = ref_pb.Common(Nl=2, No=2, IRcutoff=mode, kIR=1e-3)
        bird = ref_pb.Bird(KIN, PLIN, F, co=co)
        nl_ref = ref_pb.NonLinear(load=False, save=False, co=co)
        nl_ref.PsCf(bird)
        bird.setPsCfl()
        return {n: np.asarray(getattr(bird, n))
                for n in ("P11l", "Ploopl", "Pctl")}

    gold = golden_oracle(f"ir_cutoff_{mode}", compute)

    class _G:
        def __getattr__(self, name):
            return gold[name]

    bird = _G()

    cfg = EFTConfig(nl=2, no=2, ir_cutoff=mode, k_ir=1e-3)
    nt = build_nonlinear_tables(cfg)
    bt = build_bird_tables(cfg)

    @jax.jit
    def ours(plin, f):
        out = nonlinear_pscf(nt, cfg, plin)
        return assemble_bird(bt, cfg, out, plin, f)

    got = ours(jnp.asarray(PLIN), jnp.asarray(F))
    for ref_name, our_name in [("P11l", "p11l"), ("Ploopl", "ploopl"),
                               ("Pctl", "pctl")]:
        a = np.asarray(getattr(bird, ref_name))
        b = np.asarray(getattr(got, our_name))
        np.testing.assert_allclose(b, a, rtol=1e-8,
                                   atol=1e-10 * np.abs(a).max(),
                                   err_msg=f"{mode}:{ref_name}")
