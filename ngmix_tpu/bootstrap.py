"""Two-stage psf-then-object bootstrap.

Behavior parity: ngmix/bootstrap.py:14-154.
"""
import logging

from .gexceptions import BootPSFFailure
from .observation import MultiBandObsList, Observation, ObsList

BOOT_S2N_LOW = 2**0
BOOT_R2_LOW = 2**1
BOOT_R4_LOW = 2**2
BOOT_TS2N_ROUND_FAIL = 2**3
BOOT_ROUND_CONVOLVE_FAIL = 2**4
BOOT_WEIGHTS_LOW = 2**5

logger = logging.getLogger(__name__)


class Bootstrapper(object):
    """bootstrap fits to psf and object"""

    def __init__(self, runner, psf_runner=None, ignore_failed_psf=True):
        self.runner = runner
        self.psf_runner = psf_runner
        self.ignore_failed_psf = ignore_failed_psf

    def go(self, obs):
        return bootstrap(
            obs=obs,
            runner=self.runner,
            psf_runner=self.psf_runner,
            ignore_failed_psf=self.ignore_failed_psf,
        )

    @property
    def fitter(self):
        return self.runner.fitter


def bootstrap(obs, runner, psf_runner=None, ignore_failed_psf=True):
    """psf fits, then object fit (ref: bootstrap.py:67-102)"""
    if psf_runner is not None:
        psf_runner.go(obs=obs)
        if ignore_failed_psf:
            obs = remove_failed_psf_obs(obs=obs)
    return runner.go(obs=obs)


def remove_failed_psf_obs(obs):
    """drop epochs with failed psf fits (ref: bootstrap.py:105-154)"""
    if isinstance(obs, MultiBandObsList):
        new_mbobs = MultiBandObsList(meta=obs.meta)
        for tobslist in obs:
            new_obslist = ObsList(meta=tobslist.meta)
            for tobs in tobslist:
                if tobs.psf.meta["result"]["flags"] == 0:
                    new_obslist.append(tobs)
            if len(new_obslist) == 0:
                raise BootPSFFailure("no good psf fits")
            new_mbobs.append(new_obslist)
        return new_mbobs
    elif isinstance(obs, ObsList):
        new_obslist = ObsList(meta=obs.meta)
        for tobs in obs:
            if tobs.psf.meta["result"]["flags"] == 0:
                new_obslist.append(tobs)
        if len(new_obslist) == 0:
            raise BootPSFFailure("no good psf fits")
        return new_obslist
    elif isinstance(obs, Observation):
        if obs.psf.meta["result"]["flags"] != 0:
            raise BootPSFFailure("no good psf fits")
        return obs
    else:
        raise ValueError(
            'got obs input type: "%s", should be '
            "Observation, ObsList, or MulitiBandObsList" % type(obs)
        )
