"""One-call metacal: sheared image set + fits for each.

Behavior parity: ngmix/metacal/bootstrap.py:7-119.
"""
from ..bootstrap import bootstrap
from .convenience import get_all_metacal

__all__ = ["MetacalBootstrapper", "metacal_bootstrap"]


class MetacalBootstrapper(object):
    """make metacal sheared images and run a fitter on each"""

    def __init__(self, runner, psf_runner, ignore_failed_psf=True, rng=None,
                 **metacal_kws):
        self.runner = runner
        self.psf_runner = psf_runner
        self.ignore_failed_psf = ignore_failed_psf
        self.metacal_kws = metacal_kws
        self.rng = rng

    def go(self, obs):
        return metacal_bootstrap(
            obs=obs,
            runner=self.runner,
            psf_runner=self.psf_runner,
            ignore_failed_psf=self.ignore_failed_psf,
            rng=self.rng,
            **self.metacal_kws,
        )

    @property
    def fitter(self):
        return self.runner.fitter


def metacal_bootstrap(obs, runner, psf_runner=None, ignore_failed_psf=True,
                      rng=None, **metacal_kws):
    """metacal image set + per-type bootstrap; returns (resdict, obsdict)"""
    obsdict = get_all_metacal(obs=obs, rng=rng, **metacal_kws)

    resdict = {}
    for key, tobs in obsdict.items():
        resdict[key] = bootstrap(
            obs=tobs, runner=runner, psf_runner=psf_runner,
            ignore_failed_psf=ignore_failed_psf,
        )
    return resdict, obsdict
