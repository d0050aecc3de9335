"""Fixed-gaussian weighted moments (GaussMom).

Behavior parity with ngmix/gaussmom.py:7-94: the weight is a round
gaussian of the given FWHM centered at the jacobian origin, scaled to
unit peak so fluxes come out in image units; results are divided by the
pixel area to be in flux units. Device path is fully batched.
"""
import logging

import jax
import jax.numpy as jnp
import numpy as np

from . import moments
from .gmix import core as gcore
from .gmix.gmix import get_weighted_moments_stats
from .observation import MultiBandObsList, Observation, ObsList

logger = logging.getLogger(__name__)


def make_weight_gmix(fwhm, dtype=None):
    """unit-peak round gaussian weight [1, 6] for the given fwhm"""
    T = moments.fwhm_to_T(fwhm)
    sigma2 = T / 2.0
    # flux = 1/norm = 2*pi*sqrt(det) makes the peak exactly 1
    flux = 2 * np.pi * sigma2
    return jnp.asarray(
        [[flux, 0.0, 0.0, sigma2, 0.0, sigma2]], dtype=dtype
    )


def gaussmom_measure(pixels, fwhm, area, with_higher_order=False,
                     use_pallas=True):
    """device path: weighted sums + normalization for one (or a batch
    of) pixel structs. area is the jacobian pixel area (scalar or
    batched). The weight evaluation uses the Pallas kernel on TPU for
    explicitly batched [B, npix] inputs."""
    wt = make_weight_gmix(fwhm, dtype=pixels.val.dtype)
    if pixels.val.ndim > 1:
        wt = jnp.broadcast_to(wt, pixels.val.shape[:-1] + wt.shape)
    T = moments.fwhm_to_T(fwhm)
    maxrad = 100.0 * np.sqrt(T / 2.0)
    sums = gcore.get_weighted_sums(
        wt, pixels, maxrad, higher_order=with_higher_order,
        use_pallas=use_pallas,
    )
    return _normalize_sums(sums, area)


def _normalize_sums(sums, area):
    """divide out the pixel area factor (ref: gaussmom.py:60-72) and
    build the moments result"""
    fac = 1.0 / jnp.asarray(area)
    raw = dict(sums)
    raw["sums"] = sums["sums"] * fac[..., None]
    raw["sums_cov"] = sums["sums_cov"] * (fac**2)[..., None, None]
    raw["wsum"] = sums["wsum"] * fac
    res = get_weighted_moments_stats(raw)
    return res


gaussmom_measure_jit = jax.jit(
    gaussmom_measure, static_argnames=("with_higher_order",)
)


class GaussMom(object):
    """measure gaussian weighted moments (kind = "wmom").

    API parity: ngmix/gaussmom.py:7-94. For ObsList/MultiBandObsList
    the sums are coadded assuming perfect registration.
    """

    kind = "wmom"

    def __init__(self, fwhm, with_higher_order=False):
        self.fwhm = fwhm
        self.with_higher_order = with_higher_order

    def go(self, obs):
        res = self._measure_moments(obs=obs)
        if res["flags"] != 0:
            logger.debug("        moments failed: %s" % res["flagstr"])
        return res

    def _obs_seq(self, obs):
        if isinstance(obs, Observation):
            return [obs]
        if isinstance(obs, ObsList):
            return list(obs)
        if isinstance(obs, MultiBandObsList):
            return [o for olist in obs for o in olist]
        raise ValueError(
            "obs must be Observation, ObsList or MultiBandObsList"
        )

    def _measure_moments(self, obs):
        obslist = self._obs_seq(obs)
        wt = make_weight_gmix(self.fwhm)
        T = float(moments.fwhm_to_T(self.fwhm))
        maxrad = 100.0 * np.sqrt(T / 2.0)

        total = None
        for o in obslist:
            s = gcore.get_weighted_sums(
                wt, o.pixels, maxrad, higher_order=self.with_higher_order
            )
            if total is None:
                total = dict(s)
            else:
                for k in ("sums", "sums_cov", "wsum"):
                    total[k] = total[k] + s[k]
                total["npix"] = total["npix"] + s["npix"]

        res = _normalize_sums(total, obslist[0].jacobian.area)
        return moments.result_to_host(res)
