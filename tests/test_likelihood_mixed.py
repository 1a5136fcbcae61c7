"""Mixed-basis multi-tracer likelihood parity — the reference's hardest
regression scenario (tests/yamls/mock_eBOSS_LRG_ELG_NGC_all_like.yaml:
westcoast + NNLO + fiber on one tracer, eastcoast on the other, plus a
cross tracer with the B-variant normalisations).  PNG, the PG rows and the
marginalized logp are A/B'd against the reference modules assembled by
hand."""

import numpy as np
import jax.numpy as jnp
import pytest

from eftpipe_tpu.models.config import EFTConfig
from eftpipe_tpu.models.pipeline import TracerPipeline, CosmoInputs
from eftpipe_tpu.likelihood.likelihood import EFTLikelihood, TracerSpec, parse_kmask
from eftpipe_tpu.likelihood.parambasis import WestCoastBasis, EastCoastBasis

from refbridge import golden_oracle, load_reference
from test_fftlog import smooth_positive

KIN = np.logspace(-5, 0, 200)
PLIN = smooth_positive(KIN, seed=77)
F = 0.75
Q = (1.01, 0.98)
KOUT = np.arange(0.01, 0.205, 0.01)

PARAMS = {
    # LRG: westcoast with NNLO
    "LRG_b1": 2.0, "LRG_b2": 0.7, "LRG_b4": 0.5, "LRG_b3": 0.2,
    "LRG_cct": 0.3, "LRG_cr1": -0.4, "LRG_cr2": 0.1,
    "LRG_ce0": 0.05, "LRG_cemono": 0.0, "LRG_cequad": 0.02,
    "LRG_cr4": 0.3, "LRG_cr6": -0.2,
    # ELG: eastcoast
    "ELG_b1": 1.3, "ELG_b2": 0.4, "ELG_bG2": 0.1, "ELG_bGamma3": 0.05,
    "ELG_c0": 0.2, "ELG_c2": -0.3, "ELG_c4": 0.1, "ELG_Pshot": 0.04,
    "ELG_a0": 0.02, "ELG_a2": 0.01,
    # westcoast-named ELG params consumed by the cross tracer's basis (the
    # cross spectrum is westcoast; these coexist with the eastcoast names)
    "ELG_b3": 0.15, "ELG_b4": 0.35, "ELG_cct": 0.2, "ELG_cr1": -0.1,
    "ELG_cr2": 0.05,
    # cross stochastic (X_)
    "X_ce0": 0.01, "X_cemono": 0.0, "X_cequad": 0.005,
}

FIBER = dict(fs=0.6, dfc=0.43 / 0.6777, ktrust=0.25)
ND = dict(LRG=4e-4, ELG=1.8e-4)


def build_reference(tracer):
    ref_pb = load_reference("pybird.pybird")
    if tracer == "LRG":
        co = ref_pb.Common(Nl=3, No=3, ndA=ND["LRG"], with_NNLO=True)
    elif tracer == "ELG":
        co = ref_pb.Common(Nl=2, No=2, ndA=ND["ELG"], counterform="eastcoast")
    else:  # cross
        co = ref_pb.Common(Nl=2, No=2, ndA=ND["LRG"], ndB=ND["ELG"])
    nonlinear = ref_pb.NonLinear(load=False, save=False, co=co)
    resum = ref_pb.Resum(co=co)
    ap = ref_pb.APeffect(Om_AP=0.31, z_AP=0.7, co=co)
    bird = ref_pb.Bird(KIN, PLIN, F, co=co)
    nonlinear.PsCf(bird)
    bird.setPsCfl()
    resum.Ps(bird)
    ap.AP(bird, q=Q)
    if tracer == "LRG":
        fib = ref_pb.FiberCollision(
            fs=FIBER["fs"], Dfc=FIBER["dfc"], ktrust=FIBER["ktrust"], co=co
        )
        fib.fibcolWindow(bird)
    return co, bird


def build_ours(tracer):
    if tracer == "LRG":
        cfg = EFTConfig(nl=3, no=3, nd_a=ND["LRG"], with_nnlo=True)
        fiber = FIBER
    elif tracer == "ELG":
        cfg = EFTConfig(nl=2, no=2, nd_a=ND["ELG"], counterform="eastcoast")
        fiber = None
    else:
        cfg = EFTConfig(nl=2, no=2, nd_a=ND["LRG"], nd_b=ND["ELG"])
        fiber = None
    pipe = TracerPipeline.build(
        cfg, with_irresum=True, apeffect=dict(om_ap=0.31, z_ap=0.7),
        fiber=fiber,
    )
    return pipe


def write_data(tmp_path, name, ells, seed):
    rng = np.random.default_rng(seed)
    cols = [KOUT] + [
        2e4 * np.exp(-KOUT / 0.15) * (1 + 0.1 * rng.normal(size=KOUT.size))
        for _ in ells
    ]
    path = tmp_path / f"{name}.txt"
    np.savetxt(path, np.column_stack(cols),
               header="k " + " ".join(f"P{l}" for l in ells))
    return path


@pytest.mark.slow
def test_mixed_basis_three_tracer_parity(tmp_path):
    ls = {"LRG": [0, 2, 4], "ELG": [0, 2], "X": [0, 2]}
    kmin = {"LRG": 0.02, "ELG": 0.03, "X": 0.03}
    kmax = {"LRG": 0.20, "ELG": 0.18, "X": 0.15}

    paths = {t: write_data(tmp_path, t, ls[t], seed=i)
             for i, t in enumerate(ls)}
    ndata_full = sum(len(ls[t]) * KOUT.size for t in ls)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(ndata_full, ndata_full + 20)) * 40
    cov = a @ a.T + np.eye(ndata_full) * 1e3
    np.savetxt(tmp_path / "cov.txt", cov)

    marg = {
        "LRG_": {"b3": {"scale": 2.0}, "cct": {"scale": 4.0},
                 "cr4": {"scale": 4.0}},
        "ELG_": {"bGamma3": {"scale": 2.0}, "c0": {"scale": 4.0},
                 "Pshot": {"scale": 1.0}},
        "X_": {"ce0": {"scale": 2.0}},
    }

    pipes = {t: build_ours(t) for t in ls}
    bases = {
        "LRG": WestCoastBasis(prefix="LRG_"),
        "ELG": EastCoastBasis(prefix="ELG_"),
        "X": WestCoastBasis(prefix="X_", cross_prefix=["LRG_", "ELG_"]),
    }
    like = EFTLikelihood(
        tracers={
            t: TracerSpec(pipeline=pipes[t], basis=bases[t],
                          data=dict(path=paths[t], ls=ls[t], kmin=kmin[t],
                                    kmax=kmax[t]),
                          with_binning=True)
            for t in ls
        },
        cov=dict(path=tmp_path / "cov.txt", rescale=1.2, Nreal=2000),
        marg=marg,
    )
    ci = CosmoInputs(plin=jnp.asarray(PLIN), f=jnp.asarray(F),
                     qperp=jnp.asarray(Q[0]), qpar=jnp.asarray(Q[1]))
    inputs = {t: ci for t in ls}
    png, pg = like.png_and_pg(inputs, PARAMS)
    result = like.logp(inputs, PARAMS)

    # ---- reference assembly (golden-backed) -----------------------------
    marg_names = [p for p in like.marginal.names]

    def compute():
        ref_parambasis = load_reference("parambasis")
        ref_binning = load_reference("binning")
        ref_bases = {
            "LRG": ref_parambasis.WestCoastBasis(prefix="LRG_"),
            "ELG": ref_parambasis.EastCoastBasis(prefix="ELG_"),
            "X": ref_parambasis.WestCoastBasis(prefix="X_",
                                               cross_prefix=["LRG_", "ELG_"]),
        }
        png_ref_parts, pg_rows = [], {}
        offsets = {}
        off = 0
        for t in ls:
            co, bird = build_reference(t)
            kmask = parse_kmask(KOUT, ls[t], kmin[t], kmax[t])
            lo = min(s.start for s in kmask.values())
            hi = max(s.stop for s in kmask.values())
            kout_used = KOUT[lo:hi]
            kout_mask = parse_kmask(kout_used, ls[t], kmin[t], kmax[t])
            binning = ref_binning.Binning(kout_used, co=co)
            birdlike = binning.transform(bird)
            basis = ref_bases[t]
            full_params = {**basis.default(), **PARAMS}
            plk = basis.reduce_Plk(birdlike, full_params).sum()
            flat_rows = [plk[l // 2, kout_mask[l]] for l in ls[t]]
            seg = np.hstack(flat_rows)
            offsets[t] = (off, off + seg.size)
            off += seg.size
            png_ref_parts.append(seg)
            table = basis.reduce_Plk_gaussian_table(birdlike, full_params)
            for p, row in table.items():
                if p in marg_names:
                    flat = np.hstack([row[l // 2, kout_mask[l]] for l in ls[t]])
                    pg_rows.setdefault(p, []).append((offsets[t], flat))
        png_ref = np.hstack(png_ref_parts)
        ndata = png_ref.size
        pg_ref = np.zeros((len(marg_names), ndata))
        for p, entries in pg_rows.items():
            i = marg_names.index(p)
            for (s0, s1), flat in entries:
                pg_ref[i, s0:s1] = flat
        return {"png": png_ref, "pg": pg_ref}

    gold = golden_oracle("likelihood_mixed_three_tracer", compute)
    png_ref, pg_ref = gold["png"], gold["pg"]
    ndata = png_ref.size

    np.testing.assert_allclose(np.asarray(png), png_ref, rtol=5e-6,
                               atol=1e-8 * np.abs(png_ref).max())
    np.testing.assert_allclose(np.asarray(pg), pg_ref, rtol=5e-6,
                               atol=1e-8 * np.abs(pg_ref).max())

    # marginalized logp against a manual reference computation
    data_vec = np.asarray(like.data_vector)
    invcov = np.asarray(like.invcov)
    # Hartlap + rescale applied by the likelihood; reproduce on the raw cov
    kmasks = []
    for t in ls:
        kmasks += [ls[t], ls[t], KOUT, kmin[t], kmax[t]]
    from eftpipe_tpu.likelihood.likelihood import mask_covariance, hartlap

    cov_expected = cov / 1.2 / hartlap(2000, ndata)
    invcov_expected = np.linalg.inv(mask_covariance(cov_expected, *kmasks))
    np.testing.assert_allclose(invcov, invcov_expected, rtol=1e-10)

    mu = np.zeros(len(marg_names))
    scales = []
    for pre, d in marg.items():
        for p, spec in d.items():
            scales.append((pre + p, spec["scale"]))
    scale_map = dict(scales)
    sig = np.array([scale_map[p] for p in marg_names])
    sigma_inv = np.diag(1.0 / sig**2)
    res = png_ref - data_vec
    f2 = pg_ref @ invcov @ pg_ref.T + sigma_inv
    f1 = -pg_ref @ invcov @ res
    f0 = res @ invcov @ res
    _, logdet = np.linalg.slogdet(f2 / (2 * np.pi))
    expected_logp = -0.5 * (-f1 @ np.linalg.solve(f2, f1) + f0 + logdet)
    np.testing.assert_allclose(float(result["logp"]), expected_logp, rtol=2e-6)
