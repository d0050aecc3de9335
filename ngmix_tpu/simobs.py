"""Simulate observations from gaussian mixtures + weight-map noise.

Behavior parity: ngmix/simobs.py:12-301. Used directly by users and by
the metacal fixnoise machinery (pure-noise observations).
"""
import logging
from copy import deepcopy

import numpy as np

from .gmix.gmix import GMix
from .observation import MultiBandObsList, Observation, ObsList

LOGGER = logging.getLogger(__name__)

BIGNOISE = 1.0e15


def simulate_obs(
    gmix, obs, add_noise=True, rng=None, add_all=True, noise_factor=None,
    use_raw_weight=True, convolve_psf=True,
):
    """simulate observation(s) from the input mixture (None -> noise
    only)"""
    if isinstance(obs, MultiBandObsList):
        if gmix is not None:
            if not isinstance(gmix, list):
                raise ValueError(
                    "for simulating MultiBandObsLists, the input must be a "
                    "list of gaussian mixtures"
                )
            if not isinstance(gmix[0], GMix):
                raise ValueError("input must be gaussian mixtures")
            if len(gmix) != len(obs):
                raise ValueError(
                    "len(mbobs)==%d but len(gmix_list)==%d"
                    % (len(obs), len(gmix))
                )
        new_mbobs = MultiBandObsList()
        for i, ol in enumerate(obs):
            g = None if gmix is None else gmix[i]
            new_mbobs.append(
                _simulate_obslist(
                    g, ol, add_noise=add_noise, rng=rng, add_all=add_all,
                    noise_factor=noise_factor, use_raw_weight=use_raw_weight,
                    convolve_psf=convolve_psf,
                )
            )
        return new_mbobs

    if gmix is not None and not isinstance(gmix, GMix):
        raise ValueError("input gmix must be a gaussian mixture")

    if isinstance(obs, ObsList):
        return _simulate_obslist(
            gmix, obs, add_noise=add_noise, rng=rng, add_all=add_all,
            noise_factor=noise_factor, use_raw_weight=use_raw_weight,
            convolve_psf=convolve_psf,
        )
    elif isinstance(obs, Observation):
        return _simulate_obs(
            gmix, obs, add_noise=add_noise, rng=rng, add_all=add_all,
            noise_factor=noise_factor, use_raw_weight=use_raw_weight,
            convolve_psf=convolve_psf,
        )
    else:
        raise ValueError(
            "obs should be an Observation, ObsList, or MultiBandObsList"
        )


def _simulate_obslist(gmix, obslist, **kw):
    new_obslist = ObsList()
    for o in obslist:
        new_obslist.append(simulate_obs(gmix=gmix, obs=o, **kw))
    return new_obslist


def _simulate_obs(gmix, obs, add_noise=True, rng=None, add_all=True,
                  noise_factor=None, use_raw_weight=True, convolve_psf=True):
    sim_image = _get_simulated_image(gmix, obs, convolve_psf=convolve_psf)

    if add_noise:
        sim_image, noise_image = _get_noisy_image(
            obs, sim_image, rng=rng, add_all=add_all,
            noise_factor=noise_factor, use_raw_weight=use_raw_weight,
        )
    else:
        noise_image = None

    psf = deepcopy(obs.psf) if obs.has_psf() else None
    weight = obs.weight.copy()
    if noise_factor is not None:
        LOGGER.debug("Modding weight with noise factor: %s" % noise_factor)
        weight *= 1.0 / noise_factor**2

    new_obs = Observation(
        sim_image, weight=weight, jacobian=obs.jacobian, psf=psf
    )
    new_obs.noise_image = noise_image
    return new_obs


def _get_simulated_image(gmix, obs, convolve_psf=True):
    if gmix is None:
        return np.zeros(obs.image.shape)
    if convolve_psf:
        psf_gmix = _get_psf_gmix(obs)
        gm = gmix.convolve(psf_gmix)
    else:
        gm = gmix
    return gm.make_image(obs.image.shape, jacobian=obs.jacobian)


def _get_noisy_image(obs, sim_image, rng, add_all=True, noise_factor=None,
                     use_raw_weight=True):
    if hasattr(obs, "weight_raw") and use_raw_weight:
        weight = obs.weight_raw
    else:
        weight = obs.weight
    noise_image = get_noise_image(
        weight=weight, rng=rng, add_all=add_all, noise_factor=noise_factor
    )
    return sim_image + noise_image, noise_image


def get_noise_image(weight, rng, add_all=True, noise_factor=None):
    """noise realization from a weight map; zero-weight pixels get the
    median noise if add_all (ref: simobs.py:249-287)"""
    if rng is None:
        raise ValueError("you must send an rng to get_noise_image")

    noise_image = rng.normal(loc=0.0, scale=1.0, size=weight.shape)
    err = np.zeros(weight.shape)
    w = np.where(weight > 0)
    if w[0].size > 0:
        err[w] = np.sqrt(1.0 / weight[w])
        if add_all and (w[0].size != weight.size):
            median_err = np.median(err[w])
            wzero = np.where(weight <= 0)
            err[wzero] = median_err
        if noise_factor is not None:
            LOGGER.debug("Adding noise factor: %s" % noise_factor)
            err *= noise_factor
    else:
        LOGGER.debug("All weight is zero!  Setting noise to %s" % BIGNOISE)
        err[:, :] = BIGNOISE

    return noise_image * err


def _get_psf_gmix(obs):
    if not obs.has_psf():
        raise RuntimeError(
            "You requested to convolve by the psf, but the observation has "
            "no psf observation set"
        )
    psf = obs.get_psf()
    if not psf.has_gmix():
        raise RuntimeError(
            "You requested to convolve by the psf, but the observation has "
            "no psf gmix set"
        )
    return psf.gmix
