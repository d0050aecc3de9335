"""Top-level metacal entry with noise cancellation.

Behavior parity: ngmix/metacal/convenience.py:21-333, including the
fixnoise rot90 trick: metacal a rotated pure-noise field, rotate it
back, add to the images and combine the weights.
"""
import copy
import logging
import warnings

import numpy as np

from .. import simobs
from ..observation import MultiBandObsList, Observation, ObsList
from .defaults import DEFAULT_STEP
from .metacal import (
    MetacalAnalyticPSF,
    MetacalAzGaussPSF,
    MetacalDilatePSF,
    MetacalFitGaussPSF,
    MetacalGaussPSF,
)

__all__ = ["get_all_metacal"]

logger = logging.getLogger(__name__)


def get_all_metacal(
    obs, psf=None, step=DEFAULT_STEP, fixnoise=True, rng=None,
    use_noise_image=False, types=None,
):
    """get all combinations of metacal images in a dict
    (ref: convenience.py:21-113)"""
    if psf is None:
        warnings.warn(
            "The default reconvolution psf will change from "
            "'gauss' to 'azgauss' in a future version",
            FutureWarning,
            stacklevel=2,
        )
        psf = "gauss"

    if fixnoise:
        odict = _get_all_metacal_fixnoise(
            obs, step=step, rng=rng, use_noise_image=use_noise_image,
            psf=psf, types=types,
        )
    else:
        logger.debug("    not doing fixnoise")
        odict = _get_all_metacal(obs, step=step, rng=rng, psf=psf, types=types)

    return odict


def _get_all_metacal(obs, step=DEFAULT_STEP, rng=None, psf=None, types=None):
    if isinstance(obs, Observation):
        if psf == "dilate":
            m = MetacalDilatePSF(obs)
        elif psf == "azgauss":
            m = MetacalAzGaussPSF(obs=obs, rng=rng)
        elif psf == "gauss":
            m = MetacalGaussPSF(obs=obs, rng=rng)
        elif psf == "fitgauss":
            m = MetacalFitGaussPSF(obs=obs, rng=rng)
        else:
            m = MetacalAnalyticPSF(obs=obs, psf=psf, rng=rng)
        odict = m.get_all(step=step, types=types)
    elif isinstance(obs, MultiBandObsList):
        odict = _make_metacal_mb_obs_list_dict(
            mb_obs_list=obs, step=step, rng=rng, psf=psf, types=types
        )
    elif isinstance(obs, ObsList):
        odict = _make_metacal_obs_list_dict(
            obs, step, rng=rng, psf=psf, types=types
        )
    else:
        raise ValueError(
            "obs must be Observation, ObsList, or MultiBandObsList"
        )
    return odict


def _make_metacal_mb_obs_list_dict(mb_obs_list, step, rng=None, **kw):
    new_dict = None
    for obs_list in mb_obs_list:
        odict = _make_metacal_obs_list_dict(
            obs_list=obs_list, step=step, rng=rng, **kw
        )
        if new_dict is None:
            new_dict = {k: MultiBandObsList() for k in odict}
        for key in odict:
            new_dict[key].append(odict[key])
    return new_dict


def _make_metacal_obs_list_dict(obs_list, step, rng=None, **kw):
    odict = None
    for obs in obs_list:
        todict = _get_all_metacal(obs, step=step, rng=rng, **kw)
        if odict is None:
            odict = {k: ObsList() for k in todict}
        for key in odict:
            odict[key].append(todict[key])
    return odict


def _get_all_metacal_fixnoise(
    obs, step=DEFAULT_STEP, rng=None, use_noise_image=False, psf=None,
    types=None,
):
    """add a sheared noise field to cancel the correlated noise
    (ref: convenience.py:208-273)"""
    if use_noise_image:
        noise_obs = _replace_image_with_noise(obs)
        logger.debug("    Doing fixnoise with input noise image")
    else:
        noise_obs = simobs.simulate_obs(gmix=None, obs=obs, rng=rng)

    # rotate by 90
    _rotate_obs_image_square(noise_obs, k=1)

    obsdict = _get_all_metacal(obs, step=step, rng=rng, psf=psf, types=types)
    noise_obsdict = _get_all_metacal(
        noise_obs, step=step, rng=rng, psf=psf, types=types
    )

    for type_ in obsdict:
        imbobs = obsdict[type_]
        nmbobs = noise_obsdict[type_]

        # rotate back, which is 3 more rotations
        _rotate_obs_image_square(nmbobs, k=3)

        if isinstance(imbobs, Observation):
            _doadd_single_obs(imbobs, nmbobs)
        elif isinstance(imbobs, ObsList):
            for iobs in range(len(imbobs)):
                _doadd_single_obs(imbobs[iobs], nmbobs[iobs])
        elif isinstance(imbobs, MultiBandObsList):
            for imb in range(len(imbobs)):
                iolist = imbobs[imb]
                nolist = nmbobs[imb]
                for iobs in range(len(iolist)):
                    _doadd_single_obs(iolist[iobs], nolist[iobs])

    return obsdict


def _rotate_obs_image_square(obs, k=1):
    if isinstance(obs, Observation):
        obs.set_image(np.rot90(obs.image, k=k))
    elif isinstance(obs, ObsList):
        for tobs in obs:
            _rotate_obs_image_square(tobs, k=k)
    elif isinstance(obs, MultiBandObsList):
        for obslist in obs:
            _rotate_obs_image_square(obslist, k=k)


def _doadd_single_obs(obs, nobs):
    obs.image_orig = obs.image.copy()
    obs.weight_orig = obs.weight.copy()

    with obs.writeable():
        obs.image += nobs.image

        wpos = np.where((obs.weight != 0.0) & (nobs.weight != 0.0))
        if wpos[0].size > 0:
            tvar = obs.weight * 0
            tvar[wpos] = 1.0 / obs.weight[wpos] + 1.0 / nobs.weight[wpos]
            obs.weight[wpos] = 1.0 / tvar[wpos]


def _replace_image_with_noise(obs):
    noise_obs = copy.deepcopy(obs)
    if isinstance(noise_obs, Observation):
        noise_obs.image = noise_obs.noise
    elif isinstance(noise_obs, ObsList):
        for nobs in noise_obs:
            nobs.image = nobs.noise
    else:
        for obslist in noise_obs:
            for nobs in obslist:
                nobs.image = nobs.noise
    return noise_obs
