"""KDE prior (behavior parity: ngmix/priors/kde.py:4-67)."""
import scipy.stats


class KDE(object):
    """wrapper around scipy.stats.gaussian_kde with a uniform interface"""

    def __init__(self, data, kde_factor, rng):
        self.rng = rng
        self.is_1d = len(data.shape) == 1
        self.kde = scipy.stats.gaussian_kde(
            data.transpose(), bw_method=kde_factor
        )

    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        r = self.kde.resample(size=n, seed=self.rng).transpose()
        if self.is_1d:
            r = r[:, 0]
        if is_scalar:
            r = r[0]
        return r
