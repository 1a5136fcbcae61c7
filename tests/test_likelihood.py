"""End-to-end likelihood parity: full pipeline (loop + resum + AP [+binning /
interp / chained]) → bias reduction → flatten/mask → (marginalized) logp,
A/B against the reference modules assembled step by step."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.interpolate import interp1d

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.pipeline import TracerPipeline, CosmoInputs
from eftpipe_tpu.likelihood.likelihood import EFTLikelihood, TracerSpec
from eftpipe_tpu.likelihood.parambasis import WestCoastBasis

from refbridge import load_reference, golden_oracle
from test_fftlog import smooth_positive

KIN = np.logspace(-5, 0, 200)
PLIN = smooth_positive(KIN, seed=41)
F = 0.78
Q = (1.02, 0.97)
KOUT = np.arange(0.01, 0.205, 0.01)

PARAMS = {
    "LRG_b1": 1.9, "LRG_b2": 0.6, "LRG_b4": 0.4,
    "ELG_b1": 1.2, "ELG_b2": 0.3, "ELG_b4": 0.2,
}
MARG = {
    "LRG_": {"b3": {"loc": 0.0, "scale": 2.0}, "cct": {"loc": 0.0, "scale": 4.0},
             "cr1": {"scale": 8.0}, "ce0": {"scale": 4.0}, "cequad": {"scale": 2.0}},
    "ELG_": {"b3": {"loc": 0.0, "scale": 2.0}, "cct": {"loc": 0.0, "scale": 4.0}},
}


def reference_bird(nl):
    ref_pb = load_reference("pybird.pybird")
    co = ref_pb.Common(Nl=nl, No=nl)
    nonlinear = ref_pb.NonLinear(load=False, save=False, co=co)
    resum = ref_pb.Resum(co=co)
    ap = ref_pb.APeffect(Om_AP=0.31, z_AP=0.7, co=co)
    bird = ref_pb.Bird(KIN, PLIN, F, co=co)
    nonlinear.PsCf(bird)
    bird.setPsCfl()
    resum.Ps(bird)
    ap.AP(bird, q=Q)
    return co, bird


def our_pipeline(nl):
    cfg = EFTConfig(nl=nl, no=nl)
    return TracerPipeline.build(
        cfg, with_irresum=True, apeffect=dict(om_ap=0.31, z_ap=0.7)
    )


def write_data(tmp_path, name, kgrid, ells, seed):
    rng = np.random.default_rng(seed)
    cols = [kgrid] + [2e4 * np.exp(-kgrid / 0.15) / (1 + 10 * kgrid) * (1 + 0.1 * rng.normal(size=kgrid.size))
                      for _ in ells]
    path = tmp_path / f"{name}.txt"
    header = "k " + " ".join(f"P{l}" for l in ells)
    np.savetxt(path, np.column_stack(cols), header=header)
    return path


def make_cov(ndata_full, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(ndata_full, ndata_full + 10)) * 50
    return a @ a.T + np.eye(ndata_full) * 1e3


def ref_flatten(ls, plk, kout_mask=None):
    idx = [l // 2 for l in ls]
    if kout_mask is None:
        return plk[idx, :].ravel()
    return np.hstack([plk[i, kout_mask[l]] for i, l in zip(idx, ls)])


def test_single_tracer_binned_marginalized(tmp_path):
    from eftpipe_tpu.likelihood.likelihood import parse_kmask

    ls = [0, 2]
    kmin, kmax = 0.02, 0.18
    path = write_data(tmp_path, "LRG", KOUT, ls, seed=1)
    cov = make_cov(len(KOUT) * 2, seed=2)
    cov_path = tmp_path / "cov.txt"
    np.savetxt(cov_path, cov)

    # ---- ours ----
    pipe = our_pipeline(2)
    like = EFTLikelihood(
        tracers={
            "LRG": TracerSpec(
                pipeline=pipe,
                basis=WestCoastBasis(prefix="LRG_"),
                data=dict(path=path, ls=ls, kmin=kmin, kmax=kmax),
                with_binning=True,
            )
        },
        cov=dict(path=cov_path, rescale=1.0, Nreal=1000),
        marg=MARG["LRG_"] and {"LRG_": MARG["LRG_"]},
    )
    inputs = {"LRG": CosmoInputs(plin=jnp.asarray(PLIN), f=jnp.asarray(F),
                                 qperp=jnp.asarray(Q[0]), qpar=jnp.asarray(Q[1]))}
    result = like.logp(inputs, PARAMS)

    # ---- reference (golden-backed: live when mounted, replayed otherwise) --
    marg_names = ["LRG_b3", "LRG_cct", "LRG_cr1", "LRG_ce0", "LRG_cequad"]

    def compute():
        ref_parambasis = load_reference("parambasis")
        ref_binning = load_reference("binning")
        co, bird = reference_bird(2)
        kmask_ = parse_kmask(KOUT, ls, kmin, kmax)
        lo = min(s.start for s in kmask_.values())
        hi = max(s.stop for s in kmask_.values())
        kout_used = KOUT[lo:hi]
        kout_mask = parse_kmask(kout_used, ls, kmin, kmax)
        birdlike = ref_binning.Binning(kout_used, co=co).transform(bird)
        basis = ref_parambasis.WestCoastBasis(prefix="LRG_")
        png_plk = basis.reduce_Plk(birdlike, PARAMS).sum()
        table = basis.reduce_Plk_gaussian_table(birdlike, PARAMS)
        return dict(
            png=ref_flatten(ls, png_plk, kout_mask),
            pg=np.stack([ref_flatten(ls, table[p], kout_mask)
                         for p in marg_names]),
        )

    gold = golden_oracle("likelihood_single_tracer_marg", compute)
    png, pg = gold["png"], gold["pg"]
    mu = np.zeros(len(marg_names))
    scales = np.array([2.0, 4.0, 8.0, 4.0, 2.0])
    sigma_inv = np.diag(1.0 / scales**2)
    kmask = parse_kmask(KOUT, ls, kmin, kmax)

    data_vec = np.asarray(like.data_vector)
    invcov = np.asarray(like.invcov)
    res = png - data_vec
    f2 = pg @ invcov @ pg.T + sigma_inv
    f1 = -pg @ invcov @ res + sigma_inv @ mu
    f0 = res @ invcov @ res + mu @ sigma_inv @ mu
    sign, logdet = np.linalg.slogdet(f2 / (2 * np.pi))
    chi2 = -f1 @ np.linalg.solve(f2, f1) + f0 + logdet
    expected_logp = -0.5 * chi2

    np.testing.assert_allclose(float(result["logp"]), expected_logp, rtol=2e-6)
    # data vector parity against a direct reading
    import pandas as pd

    df = pd.read_csv(path, comment="#", sep=r"\s+", names=["k", "P0", "P2"])
    expected_dv = np.hstack(
        [df[f"P{l}"].to_numpy()[kmask[l]] for l in ls]
    )
    np.testing.assert_allclose(data_vec, expected_dv)


def test_two_tracer_chained_interp_chi2(tmp_path):
    """Two tracers, no marginalization: one chained+binned, one interp."""
    from eftpipe_tpu.likelihood.likelihood import parse_kmask

    params = dict(PARAMS)
    params.update({
        "LRG_b3": 0.2, "LRG_cct": -0.3, "LRG_cr1": -2.0, "LRG_cr2": 0.1,
        "LRG_ce0": 0.5, "LRG_cemono": 0.0, "LRG_cequad": 0.2,
        "ELG_b3": -0.1, "ELG_cct": 0.2, "ELG_cr1": 1.0, "ELG_cr2": 0.0,
        "ELG_ce0": 0.1, "ELG_cemono": 0.05, "ELG_cequad": -0.1,
    })

    ls_lrg = [0, 2]
    path_lrg = write_data(tmp_path, "LRG", KOUT, ls_lrg, seed=3)
    ls_elg = [0, 2]
    path_elg = write_data(tmp_path, "ELG", KOUT, ls_elg, seed=4)
    cov = make_cov(len(KOUT) * 4, seed=5)
    cov_path = tmp_path / "cov2.txt"
    np.savetxt(cov_path, cov)

    pipe_lrg = our_pipeline(3)  # chained [0,2] needs one extra internal multipole
    pipe_elg = our_pipeline(2)
    like = EFTLikelihood(
        tracers={
            "LRG": TracerSpec(
                pipeline=pipe_lrg,
                basis=WestCoastBasis(prefix="LRG_"),
                data=dict(path=path_lrg, ls=ls_lrg, kmin=0.02, kmax=0.18),
                chained=True,
                with_binning=True,
            ),
            "ELG": TracerSpec(
                pipeline=pipe_elg,
                basis=WestCoastBasis(prefix="ELG_"),
                data=dict(path=path_elg, ls=ls_elg, kmin=0.03, kmax=0.15),
                with_binning=False,
                with_interp=True,
            ),
        },
        cov=cov_path,
    )
    inputs = {
        "LRG": CosmoInputs(plin=jnp.asarray(PLIN), f=jnp.asarray(F),
                           qperp=jnp.asarray(Q[0]), qpar=jnp.asarray(Q[1])),
        "ELG": CosmoInputs(plin=jnp.asarray(PLIN), f=jnp.asarray(F),
                           qperp=jnp.asarray(Q[0]), qpar=jnp.asarray(Q[1])),
    }
    result = like.logp(inputs, params)

    def compute():
        ref_binning = load_reference("binning")
        ref_chained = load_reference("chained")
        # reference: LRG chained+binned
        co3, bird3 = reference_bird(3)
        kmask = parse_kmask(KOUT, ls_lrg, 0.02, 0.18)
        lo, hi = (min(s.start for s in kmask.values()),
                  max(s.stop for s in kmask.values()))
        kout_lrg = KOUT[lo:hi]
        kout_mask_lrg = parse_kmask(kout_lrg, ls_lrg, 0.02, 0.18)
        birdlike = ref_binning.Binning(kout_lrg, co=co3).transform(bird3)
        birdlike = ref_chained.Chained().transform(birdlike)
        basis = load_reference("parambasis").WestCoastBasis(prefix="LRG_")
        plk_lrg = basis.reduce_Plk(birdlike, params).sum()
        png_lrg = ref_flatten(ls_lrg, plk_lrg, kout_mask_lrg)

        # reference: ELG interp
        co2, bird2 = reference_bird(2)
        kmask_e = parse_kmask(KOUT, ls_elg, 0.03, 0.15)
        lo, hi = (min(s.start for s in kmask_e.values()),
                  max(s.stop for s in kmask_e.values()))
        kout_elg = KOUT[lo:hi]
        kout_mask_elg = parse_kmask(kout_elg, ls_elg, 0.03, 0.15)
        basis_e = load_reference("parambasis").WestCoastBasis(prefix="ELG_")

        class Plain:
            f = bird2.f
            co = co2
            P11l, Ploopl, Pctl = bird2.P11l, bird2.Ploopl, bird2.Pctl
            Pstl, Picc, PctNNLOl = bird2.Pstl, bird2.Picc, bird2.PctNNLOl

        plk_elg = basis_e.reduce_Plk(Plain(), params).sum()
        kgrid0 = np.hstack([[0.0], co2.k])
        plk0 = np.insert(plk_elg, 0, 0, axis=-1)
        interp = interp1d(kgrid0, kgrid0 * plk0, kind="cubic", axis=-1,
                          bounds_error=False, fill_value="extrapolate")
        plk_kout = interp(kout_elg) / kout_elg
        png_elg = ref_flatten(ls_elg, plk_kout, kout_mask_elg)
        return dict(png=np.hstack([png_lrg, png_elg]))

    png = golden_oracle("likelihood_two_tracer_chained_interp", compute)["png"]
    res = png - np.asarray(like.data_vector)
    expected_chi2 = res @ np.asarray(like.invcov) @ res
    np.testing.assert_allclose(float(result["chi2"]), expected_chi2, rtol=2e-6)
