import numpy as np
import pytest

import ngmix_tpu
from ngmix_tpu import DiagonalJacobian, GMix, GMixModel, Observation
from ngmix_tpu.em import (
    EMFitter,
    EMFitterFixCen,
    EMFitterFluxOnly,
    prep_image,
    prep_obs,
    run_em,
)

FRAC_TOL = 0.001
PIXEL_SCALE = 0.263


def _make_ngauss_obs(rng, pars_list, noise=0.0, dims=(32, 32), psf_gm=None):
    cen = (np.array(dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=PIXEL_SCALE)
    gm = GMix(pars=np.concatenate(pars_list))
    gm_render = gm.convolve(psf_gm) if psf_gm is not None else gm
    im = gm_render.make_image(dims, jacobian=jac, fast_exp=True)
    if noise > 0:
        im = im + rng.normal(size=dims, scale=noise)
        weight = np.ones(dims) / noise**2
    else:
        weight = np.ones(dims)

    psf_obs = None
    if psf_gm is not None:
        psf_dims = (25, 25)
        pcen = (np.array(psf_dims) - 1.0) / 2.0
        pjac = DiagonalJacobian(row=pcen[0], col=pcen[1], scale=PIXEL_SCALE)
        psf_im = psf_gm.make_image(psf_dims, jacobian=pjac, fast_exp=True)
        psf_obs = Observation(psf_im, jacobian=pjac, gmix=psf_gm)

    obs = Observation(im, weight=weight, jacobian=jac, psf=psf_obs)
    return obs, gm


def _randomize_gmix(rng, gmix, pixel_scale):
    data = gmix.get_data()
    out = data.copy()
    for row in out:
        row[0] *= rng.uniform(low=0.9, high=1.1)
        row[1] += rng.uniform(low=-pixel_scale, high=pixel_scale)
        row[2] += rng.uniform(low=-pixel_scale, high=pixel_scale)
        row[3] += 0.1 * pixel_scale**2 * rng.uniform(low=-1, high=1)
        row[4] += 0.1 * pixel_scale**2 * rng.uniform(low=-1, high=1)
        row[5] += 0.1 * pixel_scale**2 * rng.uniform(low=-1, high=1)
    return GMix(pars=out.ravel())


def test_prep_image():
    rng = np.random.RandomState(1)
    im = rng.normal(size=(10, 10))
    imsky, sky = prep_image(im)
    assert imsky.min() > 0
    assert np.allclose(imsky, im + sky)


@pytest.mark.parametrize("noise", [0.0, 0.05])
def test_em_1gauss(noise):
    rng = np.random.RandomState(42587)
    pars = np.array([100.0 / PIXEL_SCALE**2, 0.1, -0.2, 0.8, 0.05, 0.7])
    obs, gm = _make_ngauss_obs(rng, [pars], noise=noise)

    guess = _randomize_gmix(rng, gm, PIXEL_SCALE)
    res = run_em(obs=obs, guess=guess)
    assert res["flags"] == 0

    fitpars = res.get_gmix().get_full_pars()
    truepars = gm.get_full_pars()
    if noise == 0.0:
        assert abs(fitpars[0] / truepars[0] - 1) < FRAC_TOL
        assert abs(fitpars[1] - truepars[1]) < PIXEL_SCALE / 10
        assert abs(fitpars[2] - truepars[2]) < PIXEL_SCALE / 10
        assert abs(fitpars[3] / truepars[3] - 1) < FRAC_TOL
        assert abs(fitpars[4] / truepars[4] - 1) < FRAC_TOL
        assert abs(fitpars[5] / truepars[5] - 1) < FRAC_TOL

    imfit = res.make_image()
    imtol = 0.001 / PIXEL_SCALE**2 + noise * 5
    assert np.all(np.abs(imfit - obs.image) < imtol)


def test_em_1gauss_prep():
    rng = np.random.RandomState(42587)
    pars = np.array([100.0 / PIXEL_SCALE**2, 0.1, -0.2, 0.8, 0.05, 0.7])
    obs, gm = _make_ngauss_obs(rng, [pars], noise=0.0)
    guess = _randomize_gmix(rng, gm, PIXEL_SCALE)

    fitter = EMFitter()
    obs_sky, sky = prep_obs(obs)
    res = fitter.go(obs=obs_sky, guess=guess, sky=sky)
    assert res["flags"] == 0
    fitpars = res.get_gmix().get_full_pars()
    truepars = gm.get_full_pars()
    assert abs(fitpars[0] / truepars[0] - 1) < FRAC_TOL
    assert abs(fitpars[3] / truepars[3] - 1) < FRAC_TOL


def test_em_2gauss():
    rng = np.random.RandomState(42587)
    pars1 = np.array([50.0, -0.6, -0.4, 0.6, 0.02, 0.5])
    pars2 = np.array([70.0, 0.5, 0.3, 1.2, -0.05, 1.0])
    obs, gm = _make_ngauss_obs(rng, [pars1, pars2], noise=0.0)
    guess = _randomize_gmix(rng, gm, PIXEL_SCALE)
    res = run_em(obs=obs, guess=guess)
    assert res["flags"] == 0

    imfit = res.make_image()
    imtol = 0.002 / PIXEL_SCALE**2
    assert np.all(np.abs(imfit - obs.image) < imtol)


def test_em_with_psf():
    """PSF-aware EM: recovers the pre-psf mixture"""
    rng = np.random.RandomState(8821)
    psf_gm = GMixModel([0.0, 0.0, 0.02, -0.01, 0.35, 1.0], "gauss")
    pars = np.array([120.0, 0.05, -0.1, 0.9, 0.08, 0.8])
    obs, gm = _make_ngauss_obs(rng, [pars], noise=0.0, psf_gm=psf_gm)

    guess = _randomize_gmix(rng, gm, PIXEL_SCALE)
    res = run_em(obs=obs, guess=guess)
    assert res["flags"] == 0

    fitpars = res.get_gmix().get_full_pars()
    truepars = gm.get_full_pars()
    # pre-psf second moments recovered
    assert abs(fitpars[3] / truepars[3] - 1) < 0.01
    assert abs(fitpars[5] / truepars[5] - 1) < 0.01
    # convolved model reproduces the image
    imfit = res.make_image()
    assert np.all(np.abs(imfit - obs.image) < 0.005 / PIXEL_SCALE**2)


def test_em_fixcen():
    rng = np.random.RandomState(55)
    pars = np.array([100.0, 0.1, -0.2, 0.8, 0.05, 0.7])
    obs, gm = _make_ngauss_obs(rng, [pars], noise=0.0)
    guess_data = gm.get_data().copy()
    guess_data[0, 0] *= 1.2
    guess_data[0, 3] *= 1.3
    guess = GMix(pars=guess_data.ravel())

    res = EMFitterFixCen().go(obs=obs, guess=guess)
    assert res["flags"] == 0
    fitpars = res.get_gmix().get_full_pars()
    # center stays at the guess
    assert fitpars[1] == guess.get_full_pars()[1]
    assert fitpars[2] == guess.get_full_pars()[2]
    assert abs(fitpars[3] / pars[3] - 1) < 0.01


def test_em_fluxonly():
    rng = np.random.RandomState(56)
    pars = np.array([100.0, 0.1, -0.2, 0.8, 0.05, 0.7])
    obs, gm = _make_ngauss_obs(rng, [pars], noise=0.0)
    guess_data = gm.get_data().copy()
    guess_data[0, 0] *= 1.7
    guess = GMix(pars=guess_data.ravel())

    res = EMFitterFluxOnly().go(obs=obs, guess=guess)
    assert res["flags"] == 0
    fitpars = res.get_gmix().get_full_pars()
    assert abs(fitpars[0] / pars[0] - 1) < 0.01
    # shape untouched
    assert fitpars[3] == guess.get_full_pars()[3]


def test_em_zero_weight_fill():
    """zero-weight pixels are model-filled when not ignored"""
    rng = np.random.RandomState(57)
    pars = np.array([100.0, 0.1, -0.2, 0.8, 0.05, 0.7])
    obs, gm = _make_ngauss_obs(rng, [pars], noise=0.001)
    wt = obs.weight.copy()
    wt[14:18, 14:18] = 0.0
    obs2 = Observation(
        obs.image.copy(), weight=wt, jacobian=obs.jacobian,
        ignore_zero_weight=False,
    )
    guess = _randomize_gmix(rng, gm, PIXEL_SCALE)
    res = run_em(obs=obs2, guess=guess)
    assert res["flags"] == 0
    fitpars = res.get_gmix().get_full_pars()
    assert abs(fitpars[0] / pars[0] - 1) < 0.05


def test_em_batch():
    from ngmix_tpu.em import EMConf, em_batch
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(58)
    obs_list, guesses = [], []
    for i in range(3):
        pars = np.array([100.0, 0.1, -0.2, 0.8 + 0.1 * i, 0.05, 0.7])
        obs, gm = _make_ngauss_obs(rng, [pars], noise=0.001)
        obs_sky, sky = prep_obs(obs)
        obs_list.append((obs_sky, sky))
        guesses.append(_randomize_gmix(rng, gm, PIXEL_SCALE))

    pixels = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[o.pixels for o, _ in obs_list]
    )
    gmix0 = jnp.stack([g.to_device() for g in guesses])
    psf = jnp.zeros((3, 1, 6)).at[:, 0, 0].set(1.0)
    sky = jnp.asarray([s for _, s in obs_list])

    out = em_batch(pixels, gmix0, psf, sky, EMConf())
    assert out["flags"].shape == (3,)
    assert np.all(np.asarray(out["flags"]) == 0)

    # matches single fits
    fitter = EMFitter()
    for i, (obs, sky_i) in enumerate(obs_list):
        res = fitter.go(obs=obs, guess=guesses[i], sky=sky_i)
        single = res.get_gmix().get_full_pars()
        batched = np.asarray(out["gmix"][i]).ravel()
        assert np.allclose(single, batched, rtol=1e-8)


def test_em_maxiter_flag():
    rng = np.random.RandomState(59)
    pars = np.array([100.0, 0.1, -0.2, 0.8, 0.05, 0.7])
    obs, gm = _make_ngauss_obs(rng, [pars], noise=0.0)
    guess = _randomize_gmix(rng, gm, PIXEL_SCALE)
    res = run_em(obs=obs, guess=guess, maxiter=3, miniter=1, tol=1e-14)
    from ngmix_tpu.flags import EM_MAXITER

    assert res["flags"] & EM_MAXITER


del ngmix_tpu
