"""RNG helpers (behavior parity: ngmix/priors/random.py:4-32)."""
import numpy as np


def make_rng(rng=None):
    """return a numpy RandomState; pass through if already one"""
    if rng is None:
        rng = np.random.RandomState()
    elif not isinstance(rng, np.random.RandomState):
        rng = np.random.RandomState(seed=rng)
    return rng


def srandu(nrand=None, rng=None):
    """uniform deviates in [-1, 1)"""
    rng = make_rng(rng)
    return rng.uniform(low=-1.0, high=1.0, size=nrand)
