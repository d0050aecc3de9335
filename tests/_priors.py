"""standard prior assembly per model (mirrors reference tests/_priors.py
style, written against our API)"""
import numpy as np

from ngmix_tpu.joint_prior import PriorBDFSep, PriorSimpleSep
from ngmix_tpu.priors import CenPrior, GPriorBA, LogNormal, TwoSidedErf


def get_prior(*, fit_model, rng, scale=0.263, T_range=None, F_range=None,
              nband=None):
    if T_range is None:
        T_range = [-1.0, 1.0e3]
    if F_range is None:
        F_range = [-100.0, 1.0e9]

    g_prior = GPriorBA(sigma=0.1, rng=rng)
    cen_prior = CenPrior(0.0, 0.0, scale, scale, rng=rng)
    T_prior = TwoSidedErf(T_range[0], 0.1, T_range[1], 1.0, rng=rng)
    F_prior = TwoSidedErf(F_range[0], 0.1, F_range[1], 1.0, rng=rng)

    if nband is not None:
        F_prior = [F_prior] * nband

    if fit_model == "bdf":
        fracdev_prior = LogNormal(0.5, 0.1, rng=rng)
        return PriorBDFSep(
            cen_prior=cen_prior,
            g_prior=g_prior,
            T_prior=T_prior,
            fracdev_prior=fracdev_prior,
            F_prior=F_prior,
        )
    return PriorSimpleSep(
        cen_prior=cen_prior,
        g_prior=g_prior,
        T_prior=T_prior,
        F_prior=F_prior,
    )


del np
