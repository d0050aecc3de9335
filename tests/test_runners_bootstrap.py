import numpy as np
import pytest

from ngmix_tpu import (
    Bootstrapper,
    Fitter,
    GaussMom,
    PSFRunner,
    Runner,
)
from ngmix_tpu.guessers import (
    GMixPSFGuesser,
    SimplePSFGuesser,
    TFluxGuesser,
    TPSFFluxGuesser,
)

from _sims import get_model_obs


def _setup(rng, **kw):
    data = get_model_obs(rng=rng, model="gauss", T=1.2, g1=0.1, g2=-0.05,
                         flux=100.0, noise=0.05, **kw)
    return data


def test_guessers_basic():
    rng = np.random.RandomState(31)
    g = TFluxGuesser(rng=rng, T=1.0, flux=100.0)
    guess = g()
    assert guess.shape == (6,)
    assert 0.9 <= guess[4] <= 1.1
    guesses = g(nrand=5)
    assert guesses.shape == (5, 6)

    data = _setup(rng)
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    gp = TPSFFluxGuesser(rng=rng, T=1.0)
    guess = gp(obs=obs)
    # psf-template flux systematically underestimates extended
    # objects; it only needs to be a positive, finite starting point
    assert 0 < guess[5] < 100.0

    gm = GMixPSFGuesser(rng=rng, ngauss=3)
    mix = gm(obs.psf)
    assert len(mix) == 3

    gs = SimplePSFGuesser(rng=rng, guess_from_moms=True)
    guess = gs(obs.psf)
    assert guess.shape == (6,)
    assert guess[4] > 0


def test_psf_runner_sets_gmix():
    rng = np.random.RandomState(32)
    data = _setup(rng)
    obs = data["obs"]

    psf_fitter = Fitter(model="gauss")
    psf_guesser = SimplePSFGuesser(rng=rng, guess_from_moms=True)
    runner = PSFRunner(fitter=psf_fitter, guesser=psf_guesser, ntry=3)
    res = runner.go(obs=obs)
    assert res["flags"] == 0
    assert obs.psf.has_gmix()
    assert "result" in obs.psf.meta
    # recovered psf T close to truth
    assert np.allclose(obs.psf.gmix.get_T(), 0.27, rtol=0.05)


def test_bootstrap_full():
    """the canonical two-stage bootstrap: psf fit then object fit"""
    rng = np.random.RandomState(33)
    data = _setup(rng)
    obs = data["obs"]

    psf_runner = PSFRunner(
        fitter=Fitter(model="gauss"),
        guesser=SimplePSFGuesser(rng=rng, guess_from_moms=True),
        ntry=3,
    )
    runner = Runner(
        fitter=Fitter(model="gauss"),
        guesser=TFluxGuesser(rng=rng, T=1.0, flux=90.0),
        ntry=3,
    )
    boot = Bootstrapper(runner=runner, psf_runner=psf_runner)
    res = boot.go(obs)
    assert res["flags"] == 0
    assert np.allclose(res["pars"][2], 0.1, atol=0.03)
    assert np.allclose(res["pars"][4], 1.2, rtol=0.2)
    assert np.allclose(res["pars"][5], 100.0, rtol=0.1)
    assert boot.fitter is runner.fitter


def test_bootstrap_gaussmom():
    """bootstrap with a moments measurer (no guesser needed)"""
    rng = np.random.RandomState(34)
    data = _setup(rng)
    obs = data["obs"]

    psf_runner = PSFRunner(
        fitter=Fitter(model="gauss"),
        guesser=SimplePSFGuesser(rng=rng, guess_from_moms=True),
        ntry=3,
    )
    runner = Runner(fitter=GaussMom(fwhm=1.2))
    boot = Bootstrapper(runner=runner, psf_runner=psf_runner)
    res = boot.go(obs)
    assert int(res["flags"]) == 0


def test_bootstrap_remove_failed():
    from ngmix_tpu import ObsList
    from ngmix_tpu.bootstrap import remove_failed_psf_obs
    from ngmix_tpu.gexceptions import BootPSFFailure

    rng = np.random.RandomState(35)
    obslist = ObsList()
    for i in range(2):
        data = _setup(rng)
        obs = data["obs"]
        obs.psf.meta["result"] = {"flags": i}  # second one failed
        obslist.append(obs)

    cleaned = remove_failed_psf_obs(obslist)
    assert len(cleaned) == 1

    for obs in obslist:
        obs.psf.meta["result"] = {"flags": 1}
    with pytest.raises(BootPSFFailure):
        remove_failed_psf_obs(obslist)
