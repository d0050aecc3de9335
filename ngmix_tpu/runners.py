"""Runners: retry + container-dispatch glue around fitters.

Behavior parity: ngmix/runners.py:8-223.
"""
from .observation import MultiBandObsList, Observation, ObsList


class RunnerBase(object):
    """run a fitter and guesser on observations"""

    def __init__(self, fitter, guesser=None, ntry=1):
        self.fitter = fitter
        self.guesser = guesser
        self.ntry = ntry


class Runner(RunnerBase):
    """run a fitter, retrying with fresh guesses on failure"""

    def go(self, obs):
        return run_fitter(
            obs=obs, fitter=self.fitter, guesser=self.guesser, ntry=self.ntry
        )


class PSFRunner(RunnerBase):
    """run a fitter on each (psf) observation"""

    def __init__(self, fitter, guesser=None, ntry=1, set_result=True):
        super().__init__(fitter=fitter, guesser=guesser, ntry=ntry)
        self.set_result = set_result

    def go(self, obs):
        return run_psf_fitter(
            obs=obs, fitter=self.fitter, guesser=self.guesser, ntry=self.ntry,
            set_result=self.set_result,
        )


def run_fitter(obs, fitter, guesser=None, ntry=1):
    """run a fitter up to ntry times with fresh guesses
    (ref: runners.py:116-149)"""
    res = None
    for i in range(ntry):
        if guesser is not None:
            guess = guesser(obs=obs)
            res = fitter.go(obs=obs, guess=guess)
        else:
            res = fitter.go(obs=obs)
        if res["flags"] == 0:
            break
    return res


def run_psf_fitter(obs, fitter, guesser=None, ntry=1, set_result=True):
    """recurse over containers, fitting each obs's psf (or the obs
    itself when no psf is attached) (ref: runners.py:152-223)"""
    if isinstance(obs, MultiBandObsList):
        return [
            run_psf_fitter(
                obs=tobslist, fitter=fitter, guesser=guesser, ntry=ntry,
                set_result=set_result,
            )
            for tobslist in obs
        ]
    elif isinstance(obs, ObsList):
        return [
            run_psf_fitter(
                obs=tobs, fitter=fitter, guesser=guesser, ntry=ntry,
                set_result=set_result,
            )
            for tobs in obs
        ]
    elif isinstance(obs, Observation):
        obs_to_fit = obs.psf if obs.has_psf() else obs

        res = run_fitter(
            obs=obs_to_fit, fitter=fitter, guesser=guesser, ntry=ntry
        )

        if set_result:
            obs_to_fit.meta["result"] = res
            if res["flags"] == 0 and hasattr(res, "get_gmix"):
                obs_to_fit.gmix = res.get_gmix()
        return res
    else:
        raise ValueError(
            "obs must be an Observation, ObsList, or MultiBandObsList"
        )
