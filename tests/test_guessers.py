"""Guesser behavior (the analog of the reference's test_guessers.py):
shapes, ranges, prior fix-up, and the EM/coellip psf guess mixtures."""
import numpy as np
import pytest

from ngmix_tpu.guessers import (
    BDFGuesser,
    BDFPSFFluxGuesser,
    BDGuesser,
    CoellipPSFGuesser,
    GMixPSFGuesser,
    ParsGuesser,
    PriorGuesser,
    R50FluxGuesser,
    R50NuFluxGuesser,
    SimplePSFGuesser,
    TFluxAndPriorGuesser,
    TFluxGuesser,
    TPSFFluxAndPriorGuesser,
    TPSFFluxGuesser,
    get_shape_guess,
)
from ngmix_tpu.gexceptions import GMixRangeError
from ngmix_tpu.gmix import GMix, get_coellip_npars

from _priors import get_prior
from _sims import get_model_obs


@pytest.fixture
def obs_with_psf_gmix():
    rng = np.random.RandomState(11)
    data = get_model_obs(
        rng=rng, model="gauss", T=1.0, g1=0.05, g2=-0.02, flux=120.0,
        noise=0.05,
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    return obs


@pytest.mark.parametrize("nband", [1, 2])
@pytest.mark.parametrize("nrand", [1, 3])
def test_tflux_guesser(nband, nrand):
    rng = np.random.RandomState(5)
    flux = 100.0 if nband == 1 else [100.0, 130.0]
    guesser = TFluxGuesser(rng=rng, T=0.8, flux=flux)
    guess = guesser(nrand=nrand)
    shape = (5 + nband,) if nrand == 1 else (nrand, 5 + nband)
    assert guess.shape == shape
    g2d = np.atleast_2d(guess)
    assert np.all(np.abs(g2d[:, 0:2]) <= 0.01)
    assert np.all(np.abs(g2d[:, 2:4]) <= 0.02)
    assert np.all((g2d[:, 4] >= 0.72) & (g2d[:, 4] <= 0.88))
    assert np.all(g2d[:, 5] >= 90.0)


def test_tflux_guesser_with_prior():
    rng = np.random.RandomState(6)
    prior = get_prior(fit_model="exp", rng=rng)
    guesser = TFluxGuesser(rng=rng, T=0.8, flux=100.0, prior=prior)
    guess = guesser(nrand=10)
    # fix-up keeps every row at finite prior probability
    lnp = np.array([prior.get_lnprob_scalar(g) for g in guess])
    assert np.all(np.isfinite(lnp))


def test_tpsfflux_guessers(obs_with_psf_gmix):
    rng = np.random.RandomState(7)
    guesser = TPSFFluxGuesser(rng=rng, T=0.8)
    guess = guesser(obs=obs_with_psf_gmix)
    assert guess.shape == (6,)
    # template flux of an extended object is positive but below the
    # total flux (the psf template under-weights the wings)
    assert 10.0 < guess[5] < 200.0
    # cached by obs identity: same fluxes reused
    f1 = guesser._get_psf_fluxes(obs_with_psf_gmix)
    f2 = guesser._get_psf_fluxes(obs_with_psf_gmix)
    assert f1 is f2

    prior = get_prior(fit_model="exp", rng=rng)
    pguesser = TPSFFluxAndPriorGuesser(rng=rng, T=0.8, prior=prior)
    guess = pguesser(obs=obs_with_psf_gmix, nrand=4)
    assert guess.shape == (4, 6)
    assert np.all(guess[:, 4] > 0)


def test_tflux_and_prior_guesser():
    rng = np.random.RandomState(8)
    prior = get_prior(fit_model="exp", rng=rng)
    guesser = TFluxAndPriorGuesser(rng=rng, T=0.9, flux=80.0, prior=prior)
    guess = guesser(nrand=6)
    assert guess.shape == (6, 6)
    assert np.all(guess[:, 4] >= 0.9 * 0.9)
    assert np.all(guess[:, 5] >= 0.9 * 80.0 * 0.999)


def test_bdf_bd_guessers(obs_with_psf_gmix):
    rng = np.random.RandomState(9)
    prior = get_prior(fit_model="bdf", rng=rng)
    guess = BDFGuesser(T=0.8, flux=100.0, prior=prior)(nrand=5)
    assert guess.shape == (5, 7)
    assert np.all((guess[:, 5] >= 0.4) & (guess[:, 5] <= 0.6))

    guess = BDFPSFFluxGuesser(T=0.8, prior=prior)(obs=obs_with_psf_gmix)
    assert guess.shape == (7,)
    assert 0.4 <= guess[5] <= 0.6

    # bd layout [c1,c2,g1,g2,T,logTratio,fracdev,F]: 8 pars
    from ngmix_tpu.joint_prior import PriorBDSep
    from ngmix_tpu.priors import (
        CenPrior, GPriorBA, LogNormal, Normal, TwoSidedErf,
    )

    prior_bd = PriorBDSep(
        cen_prior=CenPrior(0.0, 0.0, 0.263, 0.263, rng=rng),
        g_prior=GPriorBA(sigma=0.1, rng=rng),
        T_prior=TwoSidedErf(-1.0, 0.1, 1.0e3, 1.0, rng=rng),
        logTratio_prior=Normal(0.0, 0.3, rng=rng),
        fracdev_prior=LogNormal(0.5, 0.1, rng=rng),
        F_prior=TwoSidedErf(-100.0, 0.1, 1.0e9, 1.0, rng=rng),
    )
    guess = BDGuesser(T=0.8, flux=100.0, prior=prior_bd)(nrand=2)
    assert guess.shape == (2, 8)


def test_pars_guesser():
    rng = np.random.RandomState(10)
    pars = np.array([0.0, 0.0, 0.1, -0.1, 2.0, 50.0])
    guesser = ParsGuesser(rng=rng, pars=pars)
    guess = guesser()
    assert guess.shape == (6,)
    assert abs(guess[0]) < 0.03
    assert abs(guess[4] - 2.0) < 0.3
    guess = guesser(nrand=7)
    assert guess.shape == (7, 6)
    # shapes remain valid
    assert np.all(guess[:, 2] ** 2 + guess[:, 3] ** 2 < 1.0)


def test_get_shape_guess_range_safety():
    rng = np.random.RandomState(12)
    # |g| beyond max gets rescaled before perturbing
    guess = get_shape_guess(
        rng=rng, g1=0.95, g2=0.4, nrand=20, width=[0.01, 0.01], max=0.8
    )
    g = np.sqrt(guess[:, 0] ** 2 + guess[:, 1] ** 2)
    assert np.all(g < 1.0)


def test_r50_guessers():
    rng = np.random.RandomState(13)
    guess = R50FluxGuesser(rng=rng, r50=1.5, flux=100.0)(nrand=4)
    assert guess.shape == (4, 6)
    assert np.all(np.abs(guess[:, 4] - 1.5) <= 0.15 + 1e-12)

    with pytest.raises(GMixRangeError):
        R50FluxGuesser(rng=rng, r50=-1.0, flux=100.0)

    guess = R50NuFluxGuesser(rng=rng, r50=1.5, nu=1.0, flux=100.0)(nrand=4)
    assert guess.shape == (4, 7)
    assert np.all((guess[:, 5] > -0.99) & (guess[:, 5] < 3.5))
    # nu clipping at construction
    g2 = R50NuFluxGuesser(rng=rng, r50=1.5, nu=99.0, flux=100.0)
    assert g2.nu == g2.NUMAX


def test_prior_guesser():
    rng = np.random.RandomState(14)
    prior = get_prior(fit_model="exp", rng=rng)
    guesser = PriorGuesser(prior=prior)
    guess = guesser(nrand=9)
    assert np.atleast_2d(guess).shape == (9, 6)


@pytest.mark.parametrize("ngauss", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("guess_from_moms", [False, True])
def test_gmix_psf_guesser(obs_with_psf_gmix, ngauss, guess_from_moms):
    rng = np.random.RandomState(15)
    guesser = GMixPSFGuesser(
        rng=rng, ngauss=ngauss, guess_from_moms=guess_from_moms
    )
    gm = guesser(obs=obs_with_psf_gmix.psf)
    assert isinstance(gm, GMix)
    assert len(gm) == ngauss
    # guess reflects image scale: flux ~ image sum, T positive
    assert gm.get_flux() > 0
    assert gm.get_T() > 0


def test_gmix_psf_guesser_bad_ngauss():
    rng = np.random.RandomState(16)
    with pytest.raises(ValueError):
        GMixPSFGuesser(rng=rng, ngauss=6)


def test_simple_psf_guesser(obs_with_psf_gmix):
    rng = np.random.RandomState(17)
    guesser = SimplePSFGuesser(rng=rng)
    guess = guesser(obs=obs_with_psf_gmix.psf)
    assert guess.shape == (6,)
    assert guess[4] > 0 and guess[5] > 0


@pytest.mark.parametrize("ngauss", [1, 2, 3, 4, 5])
def test_coellip_psf_guesser(obs_with_psf_gmix, ngauss):
    rng = np.random.RandomState(18)
    guesser = CoellipPSFGuesser(rng=rng, ngauss=ngauss)
    guess = guesser(obs=obs_with_psf_gmix.psf)
    assert guess.shape == (get_coellip_npars(ngauss),)
    # T and flux blocks positive
    assert np.all(guess[4:4 + ngauss] > 0)
    assert np.all(guess[4 + ngauss:] > 0)


def test_guessers_reproducible():
    """same seed -> same guesses"""
    for make in (
        lambda r: TFluxGuesser(rng=r, T=0.8, flux=100.0),
        lambda r: R50FluxGuesser(rng=r, r50=1.2, flux=50.0),
    ):
        g1 = make(np.random.RandomState(44))(nrand=3)
        g2 = make(np.random.RandomState(44))(nrand=3)
        assert np.array_equal(g1, g2)
