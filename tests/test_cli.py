"""CLI (eftpipe_tpu/cli.py), zeff pair kernel, and domain readers."""

import json
import numpy as np
import pytest
import jax.numpy as jnp

from eftpipe_tpu.cli import main
from eftpipe_tpu import native


# ----------------------------------------------------------------------
# zeff
# ----------------------------------------------------------------------
def _brute_zeff(x, y, z, red, w, smin, smax):
    num = den = 0.0
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2 + (z[i] - z[j]) ** 2
            if smin**2 < d2 < smax**2:
                ww = w[i] * w[j]
                num += ww * 0.5 * (red[i] + red[j])
                den += ww
    return num, den


def test_pair_zeff_matches_bruteforce():
    rng = np.random.default_rng(0)
    n = 300
    x, y, z = (rng.uniform(0, 200, n) for _ in range(3))
    red = rng.uniform(0.5, 0.9, n)
    w = rng.uniform(0.5, 1.5, n)
    num, den = native.pair_zeff(x, y, z, red, w, smin=25.0, smax=150.0)
    bnum, bden = _brute_zeff(x, y, z, red, w, 25.0, 150.0)
    assert num == pytest.approx(bnum, rel=1e-12)
    assert den == pytest.approx(bden, rel=1e-12)


def test_effective_redshift_sane():
    from eftpipe_tpu.analysis.zeff import effective_redshift

    rng = np.random.default_rng(1)
    n = 500
    ra = rng.uniform(140, 150, n)
    dec = rng.uniform(10, 20, n)
    z = rng.uniform(0.6, 0.8, n)
    zeff = effective_redshift(ra, dec, z, smin=1.0, smax=1e5)
    # with an all-inclusive window, zeff -> unweighted pair mean = sample mean
    assert zeff == pytest.approx(z.mean(), abs=1e-6)


# ----------------------------------------------------------------------
# domain readers
# ----------------------------------------------------------------------
def test_average_and_mock_cov_readers(tmp_path):
    from eftpipe_tpu.likelihood.reader import average_reader, mock_cov_reader

    rng = np.random.default_rng(2)
    k = np.linspace(0.01, 0.2, 10)
    base = np.stack([1e4 * np.exp(-k), 2e3 * np.exp(-k)])
    files = []
    draws = []
    for i in range(50):
        noise = rng.standard_normal(base.shape) * 50.0
        draws.append(base + noise)
        f = tmp_path / f"mock_{i:03d}.txt"
        np.savetxt(f, np.column_stack([k, *(base + noise)]), header="k P0 P2")
        files.append(str(f))
    avg = average_reader(files)
    expected = np.mean(draws, axis=0)
    np.testing.assert_allclose(avg["P0"].to_numpy(), expected[0], rtol=1e-10)

    cov, nmocks = mock_cov_reader(str(tmp_path / "mock_*.txt"))
    assert nmocks == 50 and cov.shape == (20, 20)
    flat = np.stack([d.reshape(-1) for d in draws])
    np.testing.assert_allclose(cov, np.cov(flat, rowvar=False), rtol=1e-10)

    with pytest.raises(ValueError, match="at least two"):
        mock_cov_reader([files[0]])


# ----------------------------------------------------------------------
# CLI commands
# ----------------------------------------------------------------------
def test_cli_zeff(tmp_path, capsys):
    rng = np.random.default_rng(3)
    n = 400
    table = np.column_stack([
        rng.uniform(140, 150, n), rng.uniform(10, 20, n),
        rng.uniform(0.6, 0.8, n), np.ones(n),
    ])
    f = tmp_path / "randoms.txt"
    np.savetxt(f, table)
    rc = main(["zeff", str(f), "--smin", "1", "--smax", "100000"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["zeff"] == pytest.approx(table[:, 2].mean(), abs=1e-5)


def test_cli_plot_window(tmp_path, capsys):
    s = np.geomspace(3.0, 4000.0, 500)
    roll = 1.0 / (1.0 + (s / 300.0) ** 3)
    mask = tmp_path / "mask.txt"
    np.savetxt(mask, np.column_stack([s, roll, 0.05 * roll, 0.01 * roll]),
               header="s Q0 Q2 Q4")
    out = tmp_path / "win.png"
    rc = main(["plot-window", str(mask), "-o", str(out), "--nmax", "256"])
    assert rc == 0 and out.exists() and out.stat().st_size > 1000


@pytest.fixture(scope="module")
def tiny_yaml(tmp_path_factory):
    """Minimal single-tracer template config for CLI run/bestfit."""
    import jax
    from eftpipe_tpu.boltzmann.eh98 import eh98_pk
    from eftpipe_tpu.api.orchestrate import Analysis

    wd = tmp_path_factory.mktemp("cliruns")
    k = np.logspace(-5, 0, 200)
    pk = np.asarray(eh98_pk(jnp.asarray(k), 0.02237, 0.12, 0.6777, 3.044,
                            0.9649, 0.7)[0])
    np.savetxt(wd / "plin.txt", np.column_stack([k, pk]))
    cfgdict = {
        "theory": {"tracers": {"LRG": {
            "z": 0.7, "nd": 5e-5, "ls": [0, 2], "with_IRresum": True,
            "boltzmann": {"name": "fixed_template", "path": str(wd / "plin.txt")},
        }}},
        "params": {
            "f": {"prior": {"min": 0.4, "max": 1.2}, "ref": 0.8},
            "LRG_b1": {"prior": {"min": 1.0, "max": 4.0}, "ref": 2.2},
            "LRG_b2": 0.8, "LRG_b4": 0.8,
        },
    }
    th = Analysis.from_config(cfgdict)
    kout = np.arange(0.015, 0.2049, 0.01)
    fid = {"f": 0.8, "LRG_b1": 2.2}
    ls, keff, plk = jax.jit(
        lambda: th.nonlinear_Plk_grid("LRG", fid, binned=True, kout=kout)
    )()
    np.savetxt(wd / "data.txt",
               np.column_stack([kout, np.asarray(plk[0]), np.asarray(plk[1])]),
               header="k P0 P2")
    np.savetxt(wd / "cov.txt", np.eye(2 * kout.size) * (0.01 * np.abs(
        np.asarray(plk).reshape(-1)))**2)
    cfgdict["likelihood"] = {
        "tracers": ["LRG"],
        "data": {"LRG": {"path": str(wd / "data.txt"), "ls": [0, 2],
                         "kmin": 0.02, "kmax": 0.2}},
        "cov": str(wd / "cov.txt"),
        "binned": True,
    }
    import yaml

    yml = wd / "run.yaml"
    yml.write_text(yaml.safe_dump(cfgdict))
    return wd, yml


def test_cli_run_and_bestfit(tiny_yaml, capsys):
    wd, yml = tiny_yaml
    rc = main(["run", str(yml), "--walkers", "16", "--max-steps", "20",
               "--block", "10", "--rhat", "-1", "--out", str(wd / "ch/run")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["steps"] == 20 and out["walkers"] == 16
    assert (wd / "ch/run.1.txt").exists()

    rc = main(["bestfit", str(yml), "--chains", str(wd / "ch/run"),
               "--tracer", "LRG", "-o", str(wd / "bf.txt")])
    assert rc == 0
    bf = np.loadtxt(wd / "bf.txt")
    assert bf.shape[1] == 3 and np.all(np.isfinite(bf))
