"""Gaussian-aperture-weighted fluxes.

TPU re-design of ngmix/gaussap.py: the per-object python loop becomes a
single vmapped closed-form computation. For a 2x2 gaussian covariance M
and round weight W = sigma^2 I, the reference's

    fac = sqrt(det(inv(inv(M) + inv(W))) / det(M))   (gmix.py:325-392)

has closed form fac = 1/sqrt(1 + T/sigma^2 + det(M)/sigma^4), so the
whole catalog reduces to elementwise ops plus a component sum.
"""
import jax
import jax.numpy as jnp
import numpy as np

from . import moments
from .flags import GMIX_RANGE_ERROR, NO_ATTEMPT
from .gmix import core as gcore

DEFAULT_FLUX = np.nan


def gaussap_flux_single(gmix, sigma):
    """aperture flux of one device mixture [..., n, 6] with round
    gaussian weight of the given sigma"""
    det = gcore.gmix_det(gmix)
    T = gmix[..., gcore.G_IRR] + gmix[..., gcore.G_ICC]
    s2 = sigma * sigma
    good = det > 0
    det_safe = jnp.where(good, det, 1.0)
    fac = 1.0 / jnp.sqrt(1.0 + T / s2 + det_safe / (s2 * s2))
    fac = jnp.where(good, jnp.minimum(fac, 1.0), 1.0)
    return jnp.sum(gmix[..., gcore.G_P] * fac, axis=-1)


def _band_pars(pars, model, band, npars_band):
    """slice shared pars + per-band flux -> [nobj, npars_band]"""
    head = pars[:, : npars_band - 1]
    flux = pars[:, npars_band - 1 + band : npars_band + band]
    out = jnp.concatenate([head, flux], axis=1)
    return out.at[:, 4].set(jnp.clip(out[:, 4], 0.0001, None))


def get_gaussap_flux(
    pars,
    model,
    weight_fwhm,
    fracdev=None,
    TdByTe=None,
    mask=None,
    verbose=True,
):
    """gaussian aperture fluxes for a catalog of model parameters.

    API parity: ngmix/gaussap.py:16-84. pars is [nobj, npars(+extra
    bands)]; returns (gap_flux [nobj, nband], flags [nobj, nband]).
    """
    del verbose
    pars = np.array(pars, dtype="f8", ndmin=2)
    nobj = pars.shape[0]

    if mask is not None:
        mask = np.array(mask, dtype=bool, ndmin=1)
        assert mask.shape[0] == nobj, "mask and pars must be same length"
    else:
        mask = np.ones(nobj, dtype=bool)

    if model == "cm":
        fracdev = np.array(fracdev, dtype="f8", ndmin=1)
        TdByTe = np.array(TdByTe, dtype="f8", ndmin=1)
        assert fracdev.size == nobj, "fracdev/pars must be same size"
        assert TdByTe.size == nobj, "TdByTe/pars must be same length"

    npars_band = 7 if model == "bdf" else 6
    nband = pars.shape[1] - npars_band + 1
    sigma = float(moments.fwhm_to_sigma(weight_fwhm))

    dpars = jnp.asarray(pars)
    gap_flux = np.full((nobj, nband), DEFAULT_FLUX)
    flags = np.zeros((nobj, nband), dtype="i4")

    for band in range(nband):
        bpars = _band_pars(dpars, model, band, npars_band)
        if model == "cm":
            gm, gflags = gcore.fill_cm(
                bpars, jnp.asarray(fracdev), jnp.asarray(TdByTe)
            )
        else:
            gm, gflags = gcore.gmix_fill(model, bpars)
        flux = gaussap_flux_single(gm, sigma)
        bad = np.asarray(gflags) != 0
        gap_flux[:, band] = np.where(bad, DEFAULT_FLUX, np.asarray(flux))
        flags[:, band] = np.where(bad, GMIX_RANGE_ERROR, 0)

    gap_flux[~mask, :] = DEFAULT_FLUX
    flags[~mask, :] = NO_ATTEMPT
    return gap_flux, flags


get_gaussap_flux_jit = jax.jit(
    gaussap_flux_single, static_argnames=()
)
