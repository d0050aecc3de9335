import numpy as np
import pytest

from ngmix_tpu import GMixList, GMixND, MultiBandGMixList, GMixModel
from ngmix_tpu import fastexp


def test_gmixnd_eval():
    rng = np.random.RandomState(1)
    weights = np.array([0.4, 0.6])
    means = np.array([[0.0, 1.0], [2.0, -1.0]])
    covars = np.array([np.eye(2) * 0.5, np.eye(2) * 1.5])
    gm = GMixND(weights=weights, means=means, covars=covars, rng=rng)

    # scipy oracle
    from scipy.stats import multivariate_normal

    pts = rng.normal(size=(20, 2))
    oracle = sum(
        w * multivariate_normal(mean=m, cov=c).pdf(pts)
        for w, m, c in zip(weights, means, covars)
    )
    ours = gm.get_prob_array(pts)
    assert np.allclose(ours, oracle, rtol=1e-10)
    assert np.allclose(
        gm.get_lnprob_array(pts), np.log(oracle), rtol=1e-10
    )
    # scalar + component paths
    assert np.allclose(gm.get_prob_scalar(pts[0]), oracle[0])
    lnp0 = gm.get_lnprob_scalar(pts[0], component=0)
    assert np.isfinite(lnp0)


def test_gmixnd_sample_stats():
    rng = np.random.RandomState(2)
    gm = GMixND(
        weights=[1.0], means=np.array([[1.0]]), covars=np.array([[[4.0]]]),
        rng=rng,
    )
    s = gm.sample(5000)
    assert abs(s.mean() - 1.0) < 0.1
    assert abs(s.std() - 2.0) < 0.1


def test_gmixnd_fit_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    data = np.concatenate(
        [rng.normal(-2, 0.5, size=2000), rng.normal(2, 0.5, size=2000)]
    )
    gm = GMixND(rng=rng)
    gm.fit(data, ngauss=2, n_iter=200)
    assert gm.ngauss == 2
    assert sorted(np.abs(gm.means[:, 0]).round(1)) == [2.0, 2.0]

    fname = str(tmp_path / "mix.npz")
    gm.save_mixture(fname)
    gm2 = GMixND(file=fname, rng=rng)
    assert np.allclose(gm2.weights, gm.weights)
    assert np.allclose(gm2.means, gm.means)


def test_gmix_lists():
    gl = GMixList()
    gl.append(GMixModel([0, 0, 0, 0, 1.0, 1.0], "gauss"))
    with pytest.raises(AssertionError):
        gl.append("not a gmix")
    mb = MultiBandGMixList()
    mb.append(gl)
    with pytest.raises(AssertionError):
        mb.append([1, 2])


def test_fastexp_shim():
    assert float(fastexp.fexp(-1.0)) == pytest.approx(np.exp(-1.0))
    assert fastexp.FASTEXP_MAX_CHI2 == 25.0
    # window continuity at the boundaries
    assert float(fastexp.apod_window(20.0)) == pytest.approx(1.0)
    assert float(fastexp.apod_window(25.0)) == pytest.approx(0.0)


def test_noise_cov():
    """white noise sandwich reproduces the chi2-scaled covariance"""
    import sys

    sys.path.insert(0, "tests")
    from _sims import get_model_obs
    from ngmix_tpu import Fitter

    rng = np.random.RandomState(4)
    noise = 0.5
    data = get_model_obs(
        rng=rng, model="gauss", T=1.2, g1=0.1, g2=0.0, flux=100.0,
        noise=noise,
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    obs.set_noise(rng.normal(size=obs.image.shape, scale=noise))

    guess = data["pars"] * rng.uniform(low=0.95, high=1.05, size=6)
    res_plain = Fitter(model="gauss").go(obs, guess)
    res_noise = Fitter(model="gauss", use_noise_image=True).go(obs, guess)
    assert res_noise["flags"] == 0
    # for white noise the sandwich is statistically equal to the
    # chi2-scaled covariance
    assert np.allclose(
        res_noise["pars_err"], res_plain["pars_err"], rtol=0.25
    )

    # requires the noise image
    obs2 = data["obs"].copy()
    obs2.set_noise(None)
    with pytest.raises(ValueError):
        Fitter(model="gauss", use_noise_image=True).go(obs2, guess)
