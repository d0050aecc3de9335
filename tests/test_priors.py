import numpy as np
import pytest

from ngmix_tpu.gexceptions import GMixRangeError
from ngmix_tpu.joint_prior import PriorSimpleSep
from ngmix_tpu.priors import (
    CenPrior,
    FlatPrior,
    GPriorBA,
    GPriorGauss,
    LMBounds,
    LogNormal,
    Normal,
    Sinh,
    TruncatedGaussian,
    TwoSidedErf,
    ZDisk2D,
)


def test_flat_prior():
    rng = np.random.RandomState(1)
    p = FlatPrior(-1.0, 1.0, rng=rng)
    assert p.get_lnprob_scalar(0.5) == 0.0
    with pytest.raises(GMixRangeError):
        p.get_lnprob_scalar(2.0)
    s = p.sample(1000)
    assert s.min() >= -1 and s.max() <= 1
    assert abs(s.mean()) < 0.1


def test_two_sided_erf():
    rng = np.random.RandomState(2)
    p = TwoSidedErf(0.0, 0.1, 10.0, 0.1, rng=rng)
    # flat in the middle
    assert np.allclose(p.get_prob_scalar(5.0), 1.0)
    assert p.get_prob_scalar(-2.0) < 1e-5
    assert p.get_lnprob_scalar(5.0) == pytest.approx(0.0, abs=1e-10)
    # device version matches
    assert np.allclose(
        float(p.get_lnprob_device(5.0)), p.get_lnprob_scalar(5.0)
    )
    assert np.allclose(
        float(p.get_fdiff_device(0.02)), p.get_fdiff(0.02), rtol=1e-10
    )
    s = p.sample(500)
    assert ((s > -0.5) & (s < 10.5)).all()


def test_normal():
    rng = np.random.RandomState(3)
    p = Normal(1.0, 2.0, rng=rng)
    assert p.get_lnprob(1.0) == 0.0
    assert np.allclose(p.get_lnprob(3.0), -0.5)
    assert np.allclose(p.get_fdiff(3.0), 1.0)
    s = p.sample(nrand=4000)
    assert abs(s.mean() - 1.0) < 0.15
    assert abs(s.std() - 2.0) < 0.15


def test_lognormal():
    rng = np.random.RandomState(4)
    p = LogNormal(1.0, 0.5, rng=rng)
    # peak lnprob 0 at the mode
    assert np.allclose(p.get_lnprob_scalar(p.mode), 0.0, atol=1e-12)
    assert p.get_lnprob_scalar(p.mode * 2) < 0
    with pytest.raises(GMixRangeError):
        p.get_lnprob_scalar(-1.0)
    s = p.sample(20000)
    assert abs(s.mean() - 1.0) < 0.05
    assert abs(s.std() - 0.5) < 0.05
    # device version
    assert np.allclose(
        float(p.get_lnprob_device(0.7)), p.get_lnprob_scalar(0.7)
    )
    assert float(p.get_lnprob_device(-1.0)) < -1e17


def test_lmbounds():
    rng = np.random.RandomState(5)
    p = LMBounds(-1.0, 3.0, rng=rng)
    assert p.get_fdiff(2.0) == 0.0
    assert p.has_bounds()
    assert p.bounds == (-1.0, 3.0)
    s = p.sample(100)
    assert ((s >= -1) & (s <= 3)).all()


def test_sinh():
    rng = np.random.RandomState(6)
    p = Sinh(1.0, 0.5, rng=rng)
    assert p.get_fdiff(1.0) == 0.0
    assert np.allclose(p.get_fdiff(1.5), np.sinh(1.0))


def test_truncated_gaussian():
    rng = np.random.RandomState(7)
    p = TruncatedGaussian(0.0, 1.0, -2.0, 2.0, rng=rng)
    assert p.get_lnprob_scalar(0.0) == 0.0
    with pytest.raises(GMixRangeError):
        p.get_lnprob_scalar(3.0)
    s = p.sample(2000)
    assert ((s > -2) & (s < 2)).all()


def test_cen_prior():
    rng = np.random.RandomState(8)
    p = CenPrior(0.1, -0.1, 0.5, 0.5, rng=rng)
    assert p.get_lnprob_scalar(0.1, -0.1) == 0.0
    lnp1, lnp2 = p.get_lnprob_scalar_sep(0.6, -0.1)
    assert np.allclose(lnp1, -0.5)
    assert np.allclose(lnp2, 0.0)
    f1, f2 = p.get_fdiff(0.6, -0.1)
    assert np.allclose(f1, 1.0)


def test_gprior_ba():
    rng = np.random.RandomState(9)
    p = GPriorBA(sigma=0.3, rng=rng)
    # max prob 1 at g = 0
    assert np.allclose(p.get_prob_scalar2d(0.0, 0.0), 1.0)
    assert np.allclose(p.get_lnprob_scalar2d(0.0, 0.0), 0.0)
    with pytest.raises(GMixRangeError):
        p.get_lnprob_scalar2d(0.9, 0.9)
    # device version matches and is finite-safe
    assert np.allclose(
        float(p.get_lnprob_device2d(0.2, 0.1)),
        p.get_lnprob_scalar2d(0.2, 0.1),
    )
    g1, g2 = p.sample2d(3000)
    g = np.hypot(g1, g2)
    assert g.max() < 1.0
    # numeric oracle for <|g|> of the BA distribution
    gg = np.linspace(0, 1, 20001)
    pg = gg * (1 - gg**2) ** 2 * np.exp(-0.5 * gg**2 / 0.3**2)
    mean_g = np.trapezoid(gg * pg, gg) / np.trapezoid(pg, gg)
    assert abs(np.mean(g) - mean_g) < 0.02
    g1d = p.sample1d(1000)
    assert abs(np.mean(g1d) - mean_g) < 0.03


def test_gprior_gauss():
    rng = np.random.RandomState(10)
    p = GPriorGauss(0.2, rng=rng)
    g1, g2 = p.sample2d(2000)
    assert abs(np.std(g1) - 0.2) < 0.02
    with pytest.raises(NotImplementedError):
        p.sample1d(10)


def test_zdisk2d():
    rng = np.random.RandomState(11)
    p = ZDisk2D(2.0, rng=rng)
    assert p.get_prob_scalar2d(0.5, 0.5) == 1.0
    assert p.get_prob_scalar2d(2.0, 2.0) == 0.0
    x, y = p.sample2d(2000)
    r = np.hypot(x, y)
    assert r.max() < 2.0
    # uniform disk: <r> = 2/3 R
    assert abs(r.mean() - 4.0 / 3.0) < 0.05


def test_prior_simple_sep():
    from _priors import get_prior

    rng = np.random.RandomState(12)
    prior = get_prior(fit_model="exp", rng=rng)

    pars = np.array([0.0, 0.0, 0.1, -0.05, 2.0, 100.0])
    lnp = prior.get_lnprob_scalar(pars)
    assert np.isfinite(lnp)

    rows = np.asarray(prior.fill_fdiff_device(pars))
    assert rows.shape == (5,)
    assert np.all(np.isfinite(rows))

    # host fill matches the device rows
    fdiff = np.zeros(16)
    n = prior.fill_fdiff(pars, fdiff)
    assert n == 5
    assert np.allclose(fdiff[:5], rows)

    s = prior.sample(100)
    assert s.shape == (100, 6)

    # lnprob array path
    lnps = prior.get_lnprob_array(s)
    assert lnps.shape == (100,)


def test_prior_simple_sep_multiband():
    from ngmix_tpu.priors import CenPrior, GPriorBA, TwoSidedErf

    rng = np.random.RandomState(13)
    prior = PriorSimpleSep(
        cen_prior=CenPrior(0.0, 0.0, 0.2, 0.2, rng=rng),
        g_prior=GPriorBA(sigma=0.2, rng=rng),
        T_prior=TwoSidedErf(-1, 0.1, 100, 1, rng=rng),
        F_prior=[
            TwoSidedErf(-1, 0.1, 1e5, 1, rng=rng),
            TwoSidedErf(-1, 0.1, 1e5, 1, rng=rng),
        ],
    )
    assert prior.nband == 2
    assert prior.n_prior_pars == 6
    pars = np.array([0.0, 0.0, 0.1, 0.0, 2.0, 10.0, 20.0])
    assert np.isfinite(prior.get_lnprob_scalar(pars))
    assert prior.sample(10).shape == (10, 7)


def test_prior_bdf_sep():
    from _priors import get_prior

    rng = np.random.RandomState(14)
    prior = get_prior(fit_model="bdf", rng=rng)
    pars = np.array([0.0, 0.0, 0.1, -0.05, 2.0, 0.5, 100.0])
    assert np.isfinite(prior.get_lnprob_scalar(pars))
    rows = np.asarray(prior.fill_fdiff_device(pars))
    assert rows.shape == (6,)
    s = prior.sample(50)
    assert s.shape == (50, 7)


def test_fitter_with_prior():
    """LM fit with priors: rows included, bounds respected"""
    import sys

    sys.path.insert(0, "tests")
    from _priors import get_prior
    from _sims import get_model_obs
    from ngmix_tpu import Fitter

    rng = np.random.RandomState(15)
    prior = get_prior(fit_model="exp", rng=rng)
    data = get_model_obs(
        rng=rng, model="exp", T=2.0, g1=0.05, g2=0.0, flux=100.0,
        noise=0.01, dims=(49, 49),
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    guess = data["pars"] * rng.uniform(low=0.95, high=1.05, size=6)
    res = Fitter(model="exp", prior=prior).go(obs, guess)
    assert res["flags"] == 0
    assert np.allclose(res["pars"][4], 2.0, rtol=0.05)
    assert np.allclose(res["pars"][5], 100.0, rtol=0.05)


def test_lognormal_sample_brute_matches_sample():
    """brute-force rejection sampling agrees with the direct transform
    sampler in mean/std (ref: ngmix/priors/priors.py:865-920)"""
    from ngmix_tpu.priors import LogNormal

    ln = LogNormal(4.0, 1.0, rng=np.random.RandomState(5))
    a = ln.sample(20000)
    b = ln.sample_brute(20000)
    assert abs(np.mean(a) - np.mean(b)) < 0.05
    assert abs(np.std(a) - np.std(b)) < 0.05
    # scalar convention
    assert np.isscalar(float(ln.sample_brute()))
    # shifted variant
    lns = LogNormal(4.0, 1.0, rng=np.random.RandomState(6), shift=2.0)
    c = lns.sample_brute(20000)
    assert abs(np.mean(c) - (np.mean(a) + 2.0)) < 0.07


def test_lognormal_fit_recovers_parameters():
    """offline fit utility recovers (mean, sigma, amp) from a sampled
    profile (ref: ngmix/priors/priors.py:922-972)"""
    from ngmix_tpu.priors import LogNormal

    truth = LogNormal(3.0, 0.7, rng=np.random.RandomState(7))
    x = np.linspace(0.5, 8.0, 200)
    y = 5.0 * truth.get_prob_array(x)
    res = LogNormal(1.0, 1.0, rng=np.random.RandomState(8)).fit(x, y)
    assert res["flags"] == 0
    assert np.allclose(res["pars"][:2], [3.0, 0.7], rtol=1e-3)
    assert np.allclose(res["pars"][2], 5.0, rtol=1e-3)


def test_gpriorba_fit_and_brute_sampling():
    """GPriorBase.fit recovers (A, sigma) from a histogrammed |g|
    profile; sample2d_brute matches sample2d statistically
    (ref: ngmix/priors/shape.py:250-363)"""
    from ngmix_tpu.priors import GPriorBA

    rng = np.random.RandomState(9)
    truth = GPriorBA(0.3, rng=rng, A=2.0)
    g = np.linspace(0.005, 0.985, 150)
    p = truth.get_prob_array1d(g)

    fitter = GPriorBA(0.2, rng=np.random.RandomState(10))
    res = fitter.fit(g, p, guess=[1.5, 0.25])
    assert res["flags"] == 0
    assert np.allclose(fitter.pars, [2.0, 0.3], rtol=1e-5)
    assert fitter.fit_perr.shape == (2,)

    # default guess path through _get_guess
    fitter2 = GPriorBA(0.2, rng=np.random.RandomState(11))
    res2 = fitter2.fit(g, p)
    assert res2["flags"] == 0
    assert np.allclose(fitter2.pars, [2.0, 0.3], rtol=1e-4)

    g1a, g2a = truth.sample2d(20000)
    g1b, g2b = truth.sample2d_brute(20000)
    for a, b in ((g1a, g1b), (g2a, g2b)):
        assert abs(np.mean(a) - np.mean(b)) < 0.01
        assert abs(np.std(a) - np.std(b)) < 0.01

    truth.set_maxval1d()
    gg = np.linspace(1e-6, 0.9999, 4000)
    assert truth.maxval1d >= np.max(truth.get_prob_array1d(gg)) - 1e-8


def test_draw_until_overdraw_and_exact_count():
    """the shared rejection accumulator returns exactly n and handles
    low acceptance rates and 2-d proposals"""
    from ngmix_tpu.priors.priors import draw_until

    rng = np.random.RandomState(12)

    def low_rate(k):
        x = rng.uniform(size=k)
        return x[x < 0.02]

    out = draw_until(500, low_rate)
    assert out.shape == (500,)
    assert np.all(out < 0.02)

    def pairs(k):
        c = rng.uniform(size=(k, 2))
        return c[c[:, 0] < 0.5]

    out2 = draw_until(100, pairs)
    assert out2.shape == (100, 2)


def test_draw_until_zero_and_scalar_edges():
    """n=0 draws return empty with the right trailing shape (regression:
    np.concatenate([]) raised)"""
    from ngmix_tpu.priors import LogNormal, TruncatedGaussian

    tg = TruncatedGaussian(0.0, 1.0, -0.5, 0.5, rng=np.random.RandomState(2))
    out = tg.sample(0)
    assert out.shape == (0,)
    ln = LogNormal(4.0, 1.0, rng=np.random.RandomState(3))
    assert ln.sample_brute(0).shape == (0,)
    # reference-parity public attributes on Normal
    from ngmix_tpu.priors import Normal

    nrm = Normal(1.0, 2.0, rng=np.random.RandomState(4))
    assert nrm.sinv == 0.5 and nrm.s2inv == 0.25
