"""Sandwich covariance for LM fits under stationary correlated noise.

Behavior parity: ngmix/fitting/noise_cov.py:38-224. The covariance of
the weighted least squares estimator under stationary noise is

    Cov = A^-1 B A^-1,   A^-1 = pars_cov0,
    B_ab = sum_epochs sum_q conj(G_a) G_b |n~(q)|^2 / N^2

with G_a = fft2(weight * dmodel/dp_a) and n~ the FFT of the epoch's
attached noise image. The derivative images come from jax.jacfwd of the
apodized render - exact for every model (the reference needs analytic
kernels for the simple models and central differences otherwise).
"""
__all__ = ["calc_noise_cov", "apply_noise_cov"]

import jax
import jax.numpy as jnp
import numpy as np

from ..gexceptions import GMixRangeError
from ..gmix import core as gcore
from ..pixels import make_coords
from .fit_model import get_band_pars_device
from .lm import get_def_stuff


def _test_cov(pcov):
    """covariance sanity flags (parity: leastsqbound.py:165-179)"""
    from ..flags import EIG_NOTFINITE, LM_NEG_COV_DIAG, LM_NEG_COV_EIG

    flags = 0
    try:
        e, _ = np.linalg.eig(pcov)
        if np.any(e < 0):
            flags |= LM_NEG_COV_EIG
        if np.any(np.diag(pcov) < 0):
            flags |= LM_NEG_COV_DIAG
    except np.linalg.LinAlgError:
        flags |= EIG_NOTFINITE
    return flags


def apply_noise_cov(fit_model, result):
    """replace the chi^2-scaled LM covariance with the noise-power
    sandwich covariance (in place)"""
    if result["flags"] != 0:
        return
    pcov0 = result.get("pars_cov0")
    if pcov0 is None or not np.all(np.isfinite(pcov0)):
        return

    npars = result["pars"].size
    try:
        cov = calc_noise_cov(
            fit_model=fit_model, pars=result["pars"], pars_cov0=pcov0
        )
    except GMixRangeError:
        cov = np.full((npars, npars), np.nan)

    if not np.all(np.isfinite(cov)):
        cflags = _test_cov(np.diag(np.full(npars, -1.0)))
    else:
        cflags = _test_cov(cov)

    if cflags != 0:
        result["flags"] |= cflags
        result["errmsg"] = "bad noise covariance matrix"
        _, result["pars_cov"], result["pars_err"] = get_def_stuff(npars)
    else:
        result["pars_cov"] = cov
        result["pars_err"] = np.sqrt(np.diag(cov))


def _model_image_fn(model_name, coords, psf_gmix):
    """render the convolved model image as a function of band pars"""

    def render(band_pars):
        gm0, _ = gcore.gmix_fill(model_name, band_pars)
        if psf_gmix is not None:
            gm = gcore.gmix_convolve(gm0, psf_gmix)
        else:
            gm = gm0
        return gcore.eval_gmix(gm, coords.v, coords.u, coords.area, fast=True)

    return render


def calc_noise_cov(fit_model, pars, pars_cov0):
    """sandwich covariance pars_cov0 B pars_cov0 with B accumulated
    over epochs from the per-mode noise power"""
    pars = np.asarray(pars)
    npars = pars.size
    nband = fit_model.nband
    nshape = npars - nband

    B = np.zeros((npars, npars))
    for band in range(nband):
        kpars = list(range(nshape)) + [nshape + band]
        band_pars = np.asarray(
            get_band_pars_device(
                fit_model.model_name, jnp.asarray(pars), band
            )
        )
        for obs in fit_model.obs[band]:
            if not obs.has_noise():
                raise ValueError(
                    "obs.noise must be set for calc_noise_cov"
                )
            dims = obs.image.shape
            coords = make_coords(dims, obs.jacobian.to_device())
            psf_gmix = (
                obs.psf.gmix.to_device() if obs.has_psf_gmix() else None
            )
            render = _model_image_fn(
                fit_model.model_name, coords, psf_gmix
            )
            # jacfwd: [npix, npars_band] exact derivative images of the
            # apodized objective
            dflat = np.asarray(jax.jacfwd(render)(jnp.asarray(band_pars)))
            dimages = [
                dflat[:, a].reshape(dims) for a in range(dflat.shape[1])
            ]

            kernels = [np.fft.fft2(obs.weight * dim) for dim in dimages]
            p = np.abs(np.fft.fft2(obs.noise)) ** 2
            n = obs.image.size
            for ia in range(len(kpars)):
                for ib in range(ia, len(kpars)):
                    val = (
                        np.sum(np.conj(kernels[ia]) * kernels[ib] * p).real
                        / n**2
                    )
                    B[kpars[ia], kpars[ib]] += val
                    if ib != ia:
                        B[kpars[ib], kpars[ia]] += val

    return pars_cov0 @ B @ pars_cov0
