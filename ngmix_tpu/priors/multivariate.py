"""2-d center prior (behavior parity: ngmix/priors/multivariate.py:8-113)."""
import numpy as np

from .priors import PriorBase


class CenPrior(PriorBase):
    """independent gaussians in each dimension"""

    def __init__(self, cen1, cen2, sigma1, sigma2, rng):
        super().__init__(rng=rng)
        self.cen1 = float(cen1)
        self.cen2 = float(cen2)
        self.sigma1 = float(sigma1)
        self.sigma2 = float(sigma2)
        self.sinv1 = 1.0 / self.sigma1
        self.sinv2 = 1.0 / self.sigma2
        self.s2inv1 = 1.0 / self.sigma1**2
        self.s2inv2 = 1.0 / self.sigma2**2

    def get_fdiff(self, x1, x2):
        return (x1 - self.cen1) * self.sinv1, (x2 - self.cen2) * self.sinv2

    get_fdiff_device = get_fdiff

    def get_lnprob_scalar(self, x1, x2):
        d1 = self.cen1 - x1
        d2 = self.cen2 - x2
        return -0.5 * d1 * d1 * self.s2inv1 - 0.5 * d2 * d2 * self.s2inv2

    def get_lnprob_scalar_sep(self, x1, x2):
        d1 = self.cen1 - x1
        d2 = self.cen2 - x2
        return -0.5 * d1 * d1 * self.s2inv1, -0.5 * d2 * d2 * self.s2inv2

    get_lnprob_device = get_lnprob_scalar
    get_lnprob_device_sep = get_lnprob_scalar_sep

    def get_prob_scalar(self, x1, x2):
        return np.exp(self.get_lnprob_scalar(x1, x2))

    get_prob_array = get_prob_scalar
    get_lnprob_array = get_lnprob_scalar

    def sample(self, nrand=None):
        rand1 = self.rng.normal(loc=self.cen1, scale=self.sigma1, size=nrand)
        rand2 = self.rng.normal(loc=self.cen2, scale=self.sigma2, size=nrand)
        return rand1, rand2

    sample2d = sample


SimpleGauss2D = CenPrior
