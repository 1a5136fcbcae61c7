import numpy as np

from eftpipe_tpu.likelihood.covariance import (
    GaussianCovariance,
    Multipole,
    legendre4_integral,
    parse_subscripts,
)

from refbridge import golden_oracle, load_reference

SUBSCRIPTS = ("aa->aaaa", "aa,bb,ab->aabb", "aa,bb,ab->abab", "aa,bb,ab->bbba")


def test_legendre4_matches_reference_table():
    def compute():
        ref_cov = load_reference("covariance")
        keys = np.array(sorted(ref_cov.Gabcd))
        vals = np.array([ref_cov.Gabcd[tuple(k)] for k in keys])
        return {"keys": keys, "vals": vals}

    gold = golden_oracle("covariance_gabcd", compute)
    for key, val in zip(gold["keys"], gold["vals"]):
        assert abs(legendre4_integral(*key) - val) < 1e-12, tuple(key)


def test_parse_subscripts_matches_reference():
    def compute():
        ref_cov = load_reference("covariance")
        return {
            "parsed": np.array([repr(ref_cov.parse_subscripts(s)) for s in SUBSCRIPTS])
        }

    gold = golden_oracle("covariance_parse_subscripts", compute)
    for sub, parsed_ref in zip(SUBSCRIPTS, gold["parsed"]):
        assert repr(parse_subscripts(sub)) == str(parsed_ref)


def test_fullcov_matches_reference():
    rng = np.random.default_rng(0)
    kedges = np.linspace(0, 0.3, 31)
    n = kedges.size - 1

    def mk(scale, shot):
        return dict(
            P0=scale * rng.random(n) + shot,
            P2=scale * rng.random(n),
            P4=scale * rng.random(n),
        )

    paa, pbb, pab = mk(1e4, 1e4), mk(1e3, 5e3), mk(4e3, 0.0)

    def compute():
        ref_cov = load_reference("covariance")
        return {"fullcov": ref_cov.GaussianCovariance(kedges, volume=8.0).fullcov(
            ref_cov.Multipole(**paa), ref_cov.Multipole(**pbb),
            ref_cov.Multipole(**pab),
        )}

    gold = golden_oracle("covariance_fullcov", compute)
    ours = GaussianCovariance(kedges, volume=8.0).fullcov(
        Multipole(paa["P0"], paa["P2"], paa["P4"]),
        Multipole(pbb["P0"], pbb["P2"], pbb["P4"]),
        Multipole(pab["P0"], pab["P2"], pab["P4"]),
    )
    np.testing.assert_allclose(ours, gold["fullcov"], rtol=1e-10)


def test_copy_block_diag():
    """Block-diagonal covariance surgery (reference dcov.py:12-20)."""
    from eftpipe_tpu.likelihood.covariance import copy_block_diag

    rng = np.random.default_rng(0)
    n, nblock = 12, 3
    cov = rng.standard_normal((n, n))
    out = copy_block_diag(cov, nblock)
    nvec = n // nblock
    for i in range(nblock):
        for j in range(nblock):
            blk_in = cov[i*nvec:(i+1)*nvec, j*nvec:(j+1)*nvec]
            blk_out = out[i*nvec:(i+1)*nvec, j*nvec:(j+1)*nvec]
            np.testing.assert_array_equal(np.diag(blk_out), np.diag(blk_in))
            off = blk_out - np.diag(np.diag(blk_out))
            assert np.all(off == 0)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not divisible"):
        copy_block_diag(cov, 5)
