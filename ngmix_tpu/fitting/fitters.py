"""Levenberg-Marquardt fitters (host API).

API parity with ngmix/fitting/fitters.py:20-181. The device solve is
the pure-JAX bounded LM in lm.py; residual functions are cached per
(model, prior) so repeated fits share compilations.
"""
import logging

import jax.numpy as jnp
import numpy as np

from ..defaults import DEFAULT_LM_PARS
from ..gmix.gmix import get_model_name, get_model_num
from .fit_model import (
    CoellipFitModel,
    FitModel,
    PSFFluxFitModel,
    make_fdiff_fn,
)
from .lm import LMConf, get_def_stuff, run_lm_jit

LOGGER = logging.getLogger(__name__)

# cache of residual closures keyed by (model_name, id(prior)) so jit
# caches hit across fits
_FDIFF_CACHE = {}


def _get_fdiff_fn(model_name, prior):
    key = (model_name, id(prior) if prior is not None else None)
    if key not in _FDIFF_CACHE:
        _FDIFF_CACHE[key] = make_fdiff_fn(model_name, prior=prior)
    return _FDIFF_CACHE[key]


class Fitter(object):
    """LM model fitter (ref: fitters.py:20-117)"""

    def __init__(self, model, prior=None, fit_pars=None,
                 use_noise_image=False, analytic_jacobian=True):
        self.prior = prior
        self.model = get_model_num(model)
        self.model_name = get_model_name(self.model)
        self.use_noise_image = use_noise_image
        # AD derivatives are always exact here; the flag is kept for
        # API compatibility
        self.analytic_jacobian = analytic_jacobian

        if fit_pars is not None:
            self.fit_pars = dict(fit_pars)
        else:
            self.fit_pars = dict(DEFAULT_LM_PARS)
        # "bounds" is an extension over the reference (where bounds
        # come only from prior.bounds and an extra leastsq kwarg would
        # raise); "epsfcn" (MINPACK finite-difference step) is accepted
        # as a no-op since derivatives here are exact AD; anything else
        # unknown raises rather than being silently dropped
        unknown = set(self.fit_pars) - {
            "maxfev", "ftol", "xtol", "bounds", "epsfcn",
        }
        if unknown:
            raise ValueError(
                "unsupported fit_pars keys %s; supported: "
                "maxfev, ftol, xtol, bounds (epsfcn accepted, ignored)"
                % sorted(unknown)
            )

    def go(self, obs, guess):
        """run the fit; returns a FitModel dict"""
        guess = np.asarray(guess, dtype="f8")
        fit_model = self._make_fit_model(obs=obs, guess=guess)

        if self.use_noise_image:
            for obslist in fit_model.obs:
                for tobs in obslist:
                    if not tobs.has_noise():
                        raise ValueError(
                            "obs.noise must be set when "
                            "use_noise_image=True"
                        )

        conf = LMConf(
            maxfev=int(self.fit_pars.get("maxfev", 4000)),
            ftol=float(self.fit_pars.get("ftol", 1.0e-5)),
            xtol=float(self.fit_pars.get("xtol", 1.0e-5)),
        )

        npars = fit_model.npars
        lo = np.full(npars, -np.inf)
        hi = np.full(npars, np.inf)
        # fit_pars["bounds"] (extension) takes precedence over the
        # reference's prior.bounds channel
        bounds = self.fit_pars.get("bounds", None)
        if bounds is None:
            bounds = fit_model.bounds
        if bounds is not None:
            if len(bounds) != npars:
                raise ValueError(
                    "bounds has %d entries for %d parameters"
                    % (len(bounds), npars)
                )
            for i, b in enumerate(bounds):
                if b[0] is not None:
                    lo[i] = b[0]
                if b[1] is not None:
                    hi[i] = b[1]

        fdiff_fn = _get_fdiff_fn(self.model_name, self.prior)

        # masked pixels stay in the grid as zero residual rows; count
        # only live rows for the chi2/dof covariance scale (matches the
        # reference's compacted pixel lists)
        n_eff = fit_model.n_prior_pars + int(
            np.sum(np.asarray(fit_model.data.pixels.ierr) > 0)
        )
        out = run_lm_jit(
            fdiff_fn,
            fit_model.data,
            jnp.asarray(guess),
            jnp.asarray(lo),
            jnp.asarray(hi),
            conf,
            n_prior_pars=fit_model.n_prior_pars,
            n_eff=n_eff,
        )

        result = {
            "flags": int(out["flags"]),
            "nfev": int(out["nfev"]),
            "ier": int(out["ier"]),
            "errmsg": "",
            "pars": np.asarray(out["pars"]),
            "pars_err": np.asarray(out["pars_err"]),
            "pars_cov0": np.asarray(out["pars_cov0"]),
            "pars_cov": np.asarray(out["pars_cov"]),
        }
        if result["flags"] != 0:
            pars, pcov, perr = get_def_stuff(npars)
            if not np.all(np.isfinite(result["pars"])):
                result["pars"] = pars
            result["pars_cov"] = pcov
            result["pars_err"] = perr

        if self.use_noise_image:
            from .noise_cov import apply_noise_cov

            apply_noise_cov(fit_model=fit_model, result=result)

        fit_model.set_fit_result(result)
        return fit_model

    def _make_fit_model(self, obs, guess):
        return FitModel(
            obs=obs, model=self.model, guess=guess, prior=self.prior
        )


class CoellipFitter(Fitter):
    """coelliptical-gaussian fitter (ref: fitters.py:120-141)"""

    def __init__(self, ngauss, prior=None, fit_pars=None):
        self._ngauss = ngauss
        super().__init__(model="coellip", prior=prior, fit_pars=fit_pars)

    def _make_fit_model(self, obs, guess):
        return CoellipFitModel(
            obs=obs, ngauss=self._ngauss, guess=guess, prior=self.prior
        )


class PSFFluxFitter(object):
    """psf/template flux fitter (ref: fitters.py:144-181)"""

    def __init__(self, do_psf=True, normalize_psf=True):
        self.do_psf = do_psf
        self.normalize_psf = normalize_psf

    def go(self, obs):
        fit_model = PSFFluxFitModel(
            obs=obs, do_psf=self.do_psf, normalize_psf=self.normalize_psf
        )
        fit_model.go()
        return fit_model
