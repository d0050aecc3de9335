"""Guess generators for fitters.

Behavior parity with ngmix/guessers.py:14-1299: randomized initial
parameter generation around input T/flux scales, prior-based sampling,
psf-flux-based fluxes, and the 1-5 gaussian EM/coellip psf starts with
the reference's hard-coded (p, f) guess tables. All host-side numpy;
vectorized multi-restart guessing uses the ``nrand`` argument.
"""
import logging

import numpy as np

from . import moments
from .defaults import LOWVAL
from .gexceptions import GMixRangeError, PSFFluxFailure
from .gmix.gmix import GMix, GMixModel, get_coellip_npars
from .priors.random import srandu
from .shape import Shape
from .util import print_pars

LOGGER = logging.getLogger(__name__)


class TFluxGuesser(object):
    """guesses from T and fluxes (ref: guessers.py:14-75)"""

    def __init__(self, rng, T, flux, prior=None):
        self.rng = rng
        self.T = T
        self.fluxes = np.array(flux, dtype="f8", ndmin=1)
        self.prior = prior

    def __call__(self, nrand=1, obs=None):
        rng = self.rng
        fluxes = self.fluxes
        nband = fluxes.size
        guess = np.zeros((nrand, 5 + nband))
        guess[:, 0] = rng.uniform(low=-0.01, high=0.01, size=nrand)
        guess[:, 1] = rng.uniform(low=-0.01, high=0.01, size=nrand)
        guess[:, 2] = rng.uniform(low=-0.02, high=0.02, size=nrand)
        guess[:, 3] = rng.uniform(low=-0.02, high=0.02, size=nrand)
        guess[:, 4] = self.T * rng.uniform(low=0.9, high=1.1, size=nrand)
        for band in range(nband):
            guess[:, 5 + band] = fluxes[band] * rng.uniform(
                low=0.9, high=1.1, size=nrand
            )
        if self.prior is not None:
            _fix_guess(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


class TPSFFluxGuesser(object):
    """T + psf-flux based guesses, cached per obs id
    (ref: guessers.py:78-144)"""

    def __init__(self, rng, T, prior=None):
        self.rng = rng
        self.T = T
        self.prior = prior
        self._id_last = None
        self._psf_fluxes = None

    def _get_psf_fluxes(self, obs):
        oid = id(obs)
        if oid != self._id_last:
            self._id_last = oid
            fdict = _get_psf_fluxes(rng=self.rng, obs=obs)
            self._psf_fluxes = fdict["flux"]
        return self._psf_fluxes

    def __call__(self, obs, nrand=1):
        rng = self.rng
        fluxes = self._get_psf_fluxes(obs=obs)
        nband = fluxes.size
        guess = np.zeros((nrand, 5 + nband))
        guess[:, 0] = rng.uniform(low=-0.01, high=0.01, size=nrand)
        guess[:, 1] = rng.uniform(low=-0.01, high=0.01, size=nrand)
        guess[:, 2] = rng.uniform(low=-0.02, high=0.02, size=nrand)
        guess[:, 3] = rng.uniform(low=-0.02, high=0.02, size=nrand)
        guess[:, 4] = self.T * rng.uniform(low=0.9, high=1.1, size=nrand)
        for band in range(nband):
            guess[:, 5 + band] = fluxes[band] * rng.uniform(
                low=0.9, high=1.1, size=nrand
            )
        if self.prior is not None:
            _fix_guess(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


class TPSFFluxAndPriorGuesser(TPSFFluxGuesser):
    """T + psf fluxes + prior samples (ref: guessers.py:147-201)"""

    def __init__(self, rng, T, prior):
        self.rng = rng
        self.T = T
        self.prior = prior
        self._id_last = None
        self._psf_fluxes = None

    def __call__(self, obs, nrand=1):
        rng = self.rng
        fluxes = self._get_psf_fluxes(obs=obs)
        nband = fluxes.size
        guess = np.atleast_2d(self.prior.sample(nrand))
        r = rng.uniform(low=-0.1, high=0.1, size=nrand)
        guess[:, 4] = self.T * (1.0 + r)
        for band in range(nband):
            guess[:, 5 + band] = fluxes[band] * rng.uniform(
                low=0.9, high=1.1, size=nrand
            )
        _fix_guess_TFlux(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


def _get_psf_fluxes(rng, obs):
    """psf fluxes per band with failure fix-up
    (ref: guessers.py:204-264)"""
    from .fitting import PSFFluxFitter
    from .observation import get_mb_obs

    mbobs = get_mb_obs(obs)
    nband = len(mbobs)
    flux = np.zeros(nband)
    flux_err = np.zeros(nband)
    flags = np.zeros(nband, dtype="i4")

    fitter = PSFFluxFitter()
    for iband, obslist in enumerate(mbobs):
        res = fitter.go(obs=obslist)
        flags[iband] = res["flags"]
        flux[iband] = res["flux"]
        flux_err[iband] = res["flux_err"]

    logic = (flags == 0) & np.isfinite(flux)
    (wgood,) = np.where(logic)
    if wgood.size != nband:
        if wgood.size == 0:
            raise PSFFluxFailure("no good psf fluxes")
        (wbad,) = np.where(~logic)
        fac = 1.0 + rng.uniform(low=-0.1, high=0.1, size=wbad.size)
        flux[wbad] = flux[wgood].mean() * fac

    return {"flags": flags, "flux": flux, "flux_err": flux_err}


class TFluxAndPriorGuesser(object):
    """T, flux + prior samples (ref: guessers.py:267-322)"""

    def __init__(self, rng, T, flux, prior):
        fluxes = np.array(flux, dtype="f8", ndmin=1)
        self.T = T
        self.fluxes = fluxes
        self.prior = prior
        lfluxes = self.fluxes.copy()
        (w,) = np.where(self.fluxes < 0.0)
        if w.size > 0:
            lfluxes[w[:]] = 1.0e-10

    def __call__(self, nrand=1, obs=None):
        rng = self.prior.cen_prior.rng
        fluxes = self.fluxes
        nband = fluxes.size
        guess = np.atleast_2d(self.prior.sample(nrand))
        r = rng.uniform(low=-0.1, high=0.1, size=nrand)
        guess[:, 4] = self.T * (1.0 + r)
        for band in range(nband):
            r = rng.uniform(low=-0.1, high=0.1, size=nrand)
            guess[:, 5 + band] = fluxes[band] * (1.0 + r)
        _fix_guess_TFlux(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


class BDFPSFFluxGuesser(TPSFFluxGuesser):
    """bdf guesses with psf fluxes (ref: guessers.py:325-376)"""

    def __init__(self, T, prior):
        self.T = T
        self.prior = prior
        self._id_last = None
        self._psf_fluxes = None
        self.rng = self.prior.cen_prior.rng

    def __call__(self, obs, nrand=1):
        rng = self.prior.cen_prior.rng
        fluxes = self._get_psf_fluxes(obs=obs)
        guess = np.atleast_2d(self.prior.sample(nrand))
        nband = fluxes.size
        r = rng.uniform(low=-0.1, high=0.1, size=nrand)
        guess[:, 4] = self.T * (1.0 + r)
        guess[:, 5] = rng.uniform(low=0.4, high=0.6, size=nrand)
        for band in range(nband):
            r = rng.uniform(low=-0.1, high=0.1, size=nrand)
            guess[:, 6 + band] = fluxes[band] * (1.0 + r)
        _fix_guess(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


class BDFGuesser(object):
    """bdf guesses from T, flux, prior (ref: guessers.py:379-429)"""

    def __init__(self, T, flux, prior):
        self.T = T
        self.fluxes = np.array(flux, ndmin=1)
        self.prior = prior

    def __call__(self, nrand=1, obs=None):
        rng = self.prior.cen_prior.rng
        fluxes = self.fluxes
        guess = np.atleast_2d(self.prior.sample(nrand))
        nband = fluxes.size
        r = rng.uniform(low=-0.1, high=0.1, size=nrand)
        guess[:, 4] = self.T * (1.0 + r)
        guess[:, 5] = rng.uniform(low=0.4, high=0.6, size=nrand)
        for band in range(nband):
            r = rng.uniform(low=-0.1, high=0.1, size=nrand)
            guess[:, 6 + band] = fluxes[band] * (1.0 + r)
        _fix_guess(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


class BDGuesser(object):
    """bd guesses from T, flux, prior (ref: guessers.py:432-486)"""

    def __init__(self, T, flux, prior):
        self.T = T
        self.fluxes = np.array(flux, ndmin=1)
        self.prior = prior

    def __call__(self, nrand=1, obs=None):
        rng = self.prior.cen_prior.rng
        fluxes = self.fluxes
        guess = np.atleast_2d(self.prior.sample(nrand))
        nband = fluxes.size
        r = rng.uniform(low=-0.1, high=0.1, size=nrand)
        guess[:, 4] = self.T * (1.0 + r)
        guess[:, 5] = rng.uniform(low=0.4, high=0.6, size=nrand)
        for band in range(nband):
            r = rng.uniform(low=-0.1, high=0.1, size=nrand)
            guess[:, 7 + band] = fluxes[band] * (1.0 + r)
        if self.prior is not None:
            _fix_guess(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


class ParsGuesser(object):
    """guesses around an input parameter set (ref: guessers.py:489-570)"""

    def __init__(self, rng, pars, prior=None, widths=None):
        self.rng = rng
        self.pars = np.array(pars)
        self.prior = prior
        self.np = self.pars.size
        if widths is None:
            self.widths = self.pars * 0 + 0.1
            self.widths[0:2] = 0.02
        else:
            self.widths = widths

    def __call__(self, nrand=None, obs=None):
        rng = self.rng
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        pars = self.pars
        widths = self.widths
        guess = np.zeros((n, self.np))
        guess[:, 0] = pars[0] + widths[0] * srandu(n, rng=rng)
        guess[:, 1] = pars[1] + widths[1] * srandu(n, rng=rng)
        guess_shape = get_shape_guess(
            rng=rng, g1=pars[2], g2=pars[3], nrand=n, width=widths[2:4],
            max=0.8,
        )
        guess[:, 2] = guess_shape[:, 0]
        guess[:, 3] = guess_shape[:, 1]
        for i in range(4, self.np):
            guess[:, i] = pars[i] * (1.0 + widths[i] * srandu(n, rng=rng))
        if self.prior is not None:
            _fix_guess(guess, self.prior)
        return guess[0, :] if is_scalar else guess


def get_shape_guess(rng, g1, g2, nrand, width, max=0.99):
    """shape guesses with range safety (ref: guessers.py:573-601)"""
    g = np.sqrt(g1**2 + g2**2)
    if g > max:
        fac = max / g
        g1 = g1 * fac
        g2 = g2 * fac

    guess = np.zeros((nrand, 2))
    shape = Shape(g1, g2)
    for i in range(nrand):
        while True:
            try:
                g1_offset = width[0] * srandu(rng=rng)
                g2_offset = width[1] * srandu(rng=rng)
                shape_new = shape.get_sheared(g1_offset, g2_offset)
                break
            except GMixRangeError:
                pass
        guess[i, 0] = shape_new.g1
        guess[i, 1] = shape_new.g2
    return guess


class R50FluxGuesser(object):
    """guesses from r50 and fluxes (ref: guessers.py:604-664)"""

    def __init__(self, rng, r50, flux, prior=None):
        self.rng = rng
        if r50 < 0.0:
            raise GMixRangeError("r50 <= 0: %g" % r50)
        self.r50 = r50
        self.fluxes = np.array(flux, dtype="f8", ndmin=1)
        self.prior = prior

    def __call__(self, nrand=1, obs=None):
        rng = self.rng
        fluxes = self.fluxes
        nband = fluxes.size
        guess = np.zeros((nrand, 5 + nband))
        guess[:, 0] = 0.01 * srandu(nrand, rng=rng)
        guess[:, 1] = 0.01 * srandu(nrand, rng=rng)
        guess[:, 2] = 0.02 * srandu(nrand, rng=rng)
        guess[:, 3] = 0.02 * srandu(nrand, rng=rng)
        guess[:, 4] = self.r50 * (1.0 + 0.1 * srandu(nrand, rng=rng))
        for band in range(nband):
            guess[:, 5 + band] = fluxes[band] * (
                1.0 + 0.1 * srandu(nrand, rng=rng)
            )
        if self.prior is not None:
            _fix_guess(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


class PriorGuesser(object):
    """sample directly from a joint prior (ref: guessers.py:667-686)"""

    def __init__(self, prior):
        self.prior = prior

    def __call__(self, obs=None, nrand=None):
        return self.prior.sample(nrand)


class R50NuFluxGuesser(R50FluxGuesser):
    """r50 + spergel nu + fluxes (ref: guessers.py:689-764)"""

    NUMIN = -0.99
    NUMAX = 3.5

    def __init__(self, rng, r50, nu, flux, prior=None):
        super().__init__(rng=rng, r50=r50, flux=flux, prior=prior)
        if nu < self.NUMIN:
            nu = self.NUMIN
        elif nu > self.NUMAX:
            nu = self.NUMAX
        self.nu = nu

    def __call__(self, nrand=1, obs=None):
        rng = self.rng
        fluxes = self.fluxes
        nband = fluxes.size
        guess = np.zeros((nrand, 6 + nband))
        guess[:, 0] = 0.01 * srandu(nrand, rng=rng)
        guess[:, 1] = 0.01 * srandu(nrand, rng=rng)
        guess[:, 2] = 0.02 * srandu(nrand, rng=rng)
        guess[:, 3] = 0.02 * srandu(nrand, rng=rng)
        guess[:, 4] = self.r50 * (1.0 + 0.1 * srandu(nrand, rng=rng))
        for i in range(nrand):
            while True:
                nuguess = self.nu * (1.0 + 0.1 * srandu(rng=rng))
                if self.NUMIN < nuguess < self.NUMAX:
                    break
            guess[i, 5] = nuguess
        for band in range(nband):
            guess[:, 6 + band] = fluxes[band] * (
                1.0 + 0.1 * srandu(nrand, rng=rng)
            )
        if self.prior is not None:
            _fix_guess(guess, self.prior)
        return guess[0, :] if nrand == 1 else guess


# EM / coellip psf guess tables (ref: guessers.py:1036-1052, 1226-1243)
_em2_pguess = np.array([0.596510042804182, 0.4034898268889178])
_em2_fguess = np.array([0.5793612389470884, 1.621860687127999])

_em3_pguess = np.array(
    [0.596510042804182, 0.4034898268889178, 1.303069003078001e-07]
)
_em3_fguess = np.array(
    [0.5793612389470884, 1.621860687127999, 7.019347162356363]
)

_em4_pguess = np.array(
    [0.596510042804182, 0.4034898268889178, 1.303069003078001e-07, 1.0e-8]
)
_em4_fguess = np.array(
    [0.5793612389470884, 1.621860687127999, 7.019347162356363, 16.0]
)

_em5_pguess = np.array(
    [0.59453032, 0.35671819, 0.03567182, 0.01189061, 0.00118906]
)
_em5_fguess = np.array([0.5, 1.0, 3.0, 10.0, 20.0])

_moffat2_pguess = np.array([0.5, 0.5])
_moffat2_fguess = np.array([0.48955064, 1.50658978])

_moffat3_pguess = np.array([0.27559669, 0.55817131, 0.166232])
_moffat3_fguess = np.array([0.36123609, 0.8426139, 2.58747785])

_moffat4_pguess = np.array([0.44534, 0.366951, 0.10506, 0.0826497])
_moffat4_fguess = np.array([0.541019, 1.19701, 0.282176, 3.51086])

_moffat5_pguess = np.array(
    [0.57874897, 0.32273483, 0.03327272, 0.0341253, 0.03111819]
)
_moffat5_fguess = np.array(
    [0.27831284, 0.9959897, 5.86989779, 5.63590429, 4.17285878]
)

_EM_PGUESS = {2: _em2_pguess, 3: _em3_pguess, 4: _em4_pguess, 5: _em5_pguess}
_EM_FGUESS = {2: _em2_fguess, 3: _em3_fguess, 4: _em4_fguess, 5: _em5_fguess}
_MOFFAT_PGUESS = {
    2: _moffat2_pguess, 3: _moffat3_pguess, 4: _moffat4_pguess,
    5: _moffat5_pguess,
}
_MOFFAT_FGUESS = {
    2: _moffat2_fguess, 3: _moffat3_fguess, 4: _moffat4_fguess,
    5: _moffat5_fguess,
}


class GMixPSFGuesser(object):
    """full mixture guess for psf fits, for EM and admom
    (ref: guessers.py:767-1033)"""

    def __init__(self, rng, ngauss, guess_from_moms=False):
        self.rng = rng
        self.ngauss = ngauss
        self.guess_from_moms = guess_from_moms
        if ngauss not in (1, 2, 3, 4, 5):
            raise ValueError("bad ngauss: %d" % ngauss)

    def __call__(self, obs):
        return self._get_guess(obs=obs)

    def _get_guess(self, obs):
        T, flux = self._get_T_flux(obs=obs)
        return self._make_gmix_guess(flux=flux, T=T)

    def _get_T_flux(self, obs):
        if self.guess_from_moms:
            return self._get_T_flux_from_moms(obs=obs)
        return self._get_T_flux_default(obs=obs)

    def _get_T_flux_default(self, obs):
        scale = obs.jacobian.scale
        flux = obs.image.sum()
        fwhm = scale * 3.5
        T = float(moments.fwhm_to_T(fwhm))
        return T, flux

    def _get_T_flux_from_moms(self, obs):
        """moments-based T/flux with deweighting
        (ref: guessers.py:845-880)"""
        scale = obs.jacobian.scale
        fwhm = scale * 3.5
        Tweight = float(moments.fwhm_to_T(fwhm))
        wt = GMixModel([0.0, 0.0, 0.0, 0.0, Tweight, 1.0], "gauss")
        res = wt.get_weighted_moments(obs=obs, maxrad=1.0e9)
        from .moments import result_to_host

        res = result_to_host(res)
        if int(res["flags"]) != 0:
            return self._get_T_flux_default(obs=obs)

        area = scale**2
        Tmeas = float(res["T"])
        fwhm_meas = float(moments.T_to_fwhm(Tmeas))
        if fwhm_meas < scale:
            T, flux = self._get_T_flux_default(obs=obs)
        else:
            T = 1.0 / (1 / Tmeas - 1 / Tweight)
            flux = float(res["flux"]) * np.pi * (Tweight + T) / area
            if T < 0:
                T = Tmeas
                flux = float(res["flux"])
        return T, flux

    def _make_gmix_guess(self, flux, T):
        rng = self.rng
        sigma2 = T / 2
        n = self.ngauss

        if n == 1:
            pars = np.array([
                flux * rng.uniform(low=0.9, high=1.1),
                rng.uniform(low=-0.1, high=0.1),
                rng.uniform(low=-0.1, high=0.1),
                sigma2 * (1.0 + rng.uniform(low=-0.1, high=0.1)),
                rng.uniform(low=-0.2 * sigma2, high=0.2 * sigma2),
                sigma2 * (1.0 + rng.uniform(low=-0.1, high=0.1)),
            ])
            return GMix(pars=pars)

        pguess = _EM_PGUESS[n]
        fguess = _EM_FGUESS[n]
        pars = []
        for i in range(n):
            if n == 2:
                # the 2-gauss case has no p jitter and zero irc
                # (ref: guessers.py:900-920)
                p = pguess[i] * flux
                irc = 0.0
            else:
                p = flux * pguess[i] * (1.0 + rng.uniform(low=-0.1, high=0.1))
                irc = rng.uniform(low=-0.01, high=0.01)
            pars += [
                p,
                rng.uniform(low=-0.1, high=0.1),
                rng.uniform(low=-0.1, high=0.1),
                fguess[i] * sigma2 * (1.0 + rng.uniform(low=-0.1, high=0.1)),
                irc,
                fguess[i] * sigma2 * (1.0 + rng.uniform(low=-0.1, high=0.1)),
            ]
        return GMix(pars=np.array(pars))


class SimplePSFGuesser(GMixPSFGuesser):
    """simple-model psf guesses (ref: guessers.py:1055-1103)"""

    def __init__(self, rng, guess_from_moms=False):
        self.rng = rng
        self.guess_from_moms = guess_from_moms
        self.npars = 6

    def __call__(self, obs):
        return self._get_guess(obs=obs)

    def _get_guess(self, obs):
        rng = self.rng
        T, flux = self._get_T_flux(obs=obs)
        guess = np.zeros(self.npars)
        guess[0:2] += rng.uniform(low=-0.01, high=0.01, size=2)
        guess[2:4] += rng.uniform(low=-0.05, high=0.05, size=2)
        guess[4] = T * rng.uniform(low=0.9, high=1.1)
        guess[5] = flux * rng.uniform(low=0.9, high=1.1)
        return guess


class CoellipPSFGuesser(GMixPSFGuesser):
    """coellip psf guesses (ref: guessers.py:1106-1223)"""

    def __init__(self, rng, ngauss, guess_from_moms=False):
        super().__init__(
            rng=rng, ngauss=ngauss, guess_from_moms=guess_from_moms
        )
        self.npars = get_coellip_npars(ngauss)

    def __call__(self, obs):
        return self._get_guess(obs=obs)

    def _make_guess_array(self):
        rng = self.rng
        guess = np.zeros(self.npars)
        guess[0:2] += rng.uniform(low=-0.01, high=0.01, size=2)
        guess[2:4] += rng.uniform(low=-0.05, high=0.05, size=2)
        return guess

    def _get_guess(self, obs):
        T, flux = self._get_T_flux(obs=obs)
        rng = self.rng
        n = self.ngauss
        guess = self._make_guess_array()
        if n == 1:
            guess[4] = T * rng.uniform(low=0.9, high=1.1)
            guess[5] = flux * rng.uniform(low=0.9, high=1.1)
            return guess
        pguess = _MOFFAT_PGUESS[n]
        fguess = _MOFFAT_FGUESS[n]
        low, high = 0.99, 1.01
        for i in range(n):
            guess[4 + i] = T * fguess[i] * rng.uniform(low=low, high=high)
            guess[4 + n + i] = flux * pguess[i] * rng.uniform(low=low, high=high)
        return guess


def _fix_guess_TFlux(guess, prior, ntry=4):
    """resample T/flux for guesses the prior rejects
    (ref: guessers.py:1245-1273)"""
    n = guess.shape[0]
    for j in range(n):
        for itry in range(ntry):
            try:
                lnp = prior.get_lnprob_scalar(guess[j, :])
                dosample = lnp <= LOWVAL
            except GMixRangeError:
                dosample = True

            if dosample:
                print_pars(guess[j, :], front="bad guess:", logger=LOGGER)
                if itry < ntry:
                    tguess = prior.sample()
                    guess[j, 4:] = tguess[4:]
                else:
                    guess[j, :] = prior.sample()
            else:
                break


def _fix_guess(guess, prior, ntry=4):
    """replace bad guesses with prior samples
    (ref: guessers.py:1276-1299)"""
    n = guess.shape[0]
    for j in range(n):
        for itry in range(ntry):
            try:
                lnp = prior.get_lnprob_scalar(guess[j, :])
                dosample = lnp <= LOWVAL
            except GMixRangeError:
                dosample = True

            if dosample:
                print_pars(guess[j, :], front="bad guess:", logger=LOGGER)
                guess[j, :] = prior.sample()
            else:
                break
