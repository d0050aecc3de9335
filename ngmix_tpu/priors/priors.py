"""1-d scalar priors.

Behavior parity with ngmix/priors/priors.py: every prior peaks at
ln(prob) = 0 (so LM prior rows are proper pseudo-residuals), exposes
sample / get_lnprob_scalar / get_lnprob_array / get_fdiff, and raises
GMixRangeError on host out-of-range input where the reference does.

Each prior additionally provides jnp-traced ``*_device`` variants used
by the device fit objective: these never raise, returning -inf (or a
large fdiff) out of range, which the LM path converts to rejected
steps.
"""
import jax.numpy as jnp
import numpy as np

from ..defaults import LOWVAL
from ..gexceptions import GMixRangeError
from .random import make_rng


class PriorBase(object):
    def __init__(self, rng, bounds=None):
        assert rng is not None, "rng is a required argument"
        self.bounds = bounds
        self.rng = make_rng(rng=rng)

    def has_bounds(self):
        return hasattr(self, "bounds") and self.bounds is not None


class FlatPrior(PriorBase):
    """flat in [minval, maxval]; raises outside
    (ref: priors.py:49-188)"""

    def __init__(self, minval, maxval, rng):
        super().__init__(rng=rng)
        self.minval = minval
        self.maxval = maxval

    def _check(self, val):
        if np.any(np.asarray(val) < self.minval) or np.any(
            np.asarray(val) > self.maxval
        ):
            raise GMixRangeError(
                "value %s out of range: [%s,%s]"
                % (val, self.minval, self.maxval)
            )

    def get_prob_scalar(self, val):
        self._check(val)
        return 1.0

    def get_lnprob_scalar(self, val):
        self._check(val)
        return 0.0

    def get_prob_array(self, vals):
        self._check(vals)
        return np.asarray(vals) * 0 + 1.0

    def get_lnprob_array(self, vals):
        self._check(vals)
        return 0.0

    def get_fdiff(self, val):
        self._check(val)
        return 0.0

    def get_lnprob_device(self, val):
        return jnp.where(
            (val < self.minval) | (val > self.maxval), LOWVAL, 0.0
        )

    def get_fdiff_device(self, val):
        return jnp.where(
            (val < self.minval) | (val > self.maxval), jnp.inf, 0.0
        )

    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        rvals = self.minval + (self.maxval - self.minval) * self.rng.uniform(
            size=n
        )
        return rvals[0] if is_scalar else rvals


class TwoSidedErf(PriorBase):
    """smooth box: 0.5 erf((max-x)/wmax) + 0.5 erf((x-min)/wmin)
    (ref: priors.py:190-388)"""

    def __init__(self, minval, width_at_min, maxval, width_at_max, rng):
        super().__init__(rng=rng)
        self.minval = minval
        self.width_at_min = width_at_min
        self.maxval = maxval
        self.width_at_max = width_at_max

    def get_prob_scalar(self, val):
        from math import erf

        p1 = 0.5 * erf((self.maxval - val) / self.width_at_max)
        p2 = 0.5 * erf((val - self.minval) / self.width_at_min)
        return p1 + p2

    def get_lnprob_scalar(self, val):
        p = self.get_prob_scalar(val)
        return np.log(p) if p > 0.0 else LOWVAL

    def get_prob_array(self, vals):
        from scipy.special import erf

        vals = np.array(vals, ndmin=1, dtype="f8")
        return 0.5 * erf((self.maxval - vals) / self.width_at_max) + 0.5 * erf(
            (vals - self.minval) / self.width_at_min
        )

    def get_lnprob_array(self, vals):
        p = self.get_prob_array(vals)
        lnp = np.zeros(p.size) + LOWVAL
        w = p > 0.0
        lnp[w] = np.log(p[w])
        return lnp

    def get_lnprob_device(self, val):
        from jax.scipy.special import erf

        p = 0.5 * erf((self.maxval - val) / self.width_at_max) + 0.5 * erf(
            (val - self.minval) / self.width_at_min
        )
        return jnp.where(p > 0.0, jnp.log(jnp.where(p > 0, p, 1.0)), LOWVAL)

    def get_fdiff(self, val):
        if isinstance(val, np.ndarray):
            lnp = self.get_lnprob_array(val)
        else:
            lnp = self.get_lnprob_scalar(val)
        chi2 = np.clip(-2 * lnp, 0.0, None)
        return np.sqrt(chi2)

    def get_fdiff_device(self, val):
        chi2 = jnp.clip(-2 * self.get_lnprob_device(val), 0.0, None)
        pos = chi2 > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, chi2, 1.0)), 0.0)

    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        xmin = self.minval - 5.0 * self.width_at_min
        xmax = self.maxval + 5.0 * self.width_at_max
        rvals = np.zeros(n)
        ngood, nleft = 0, n
        while ngood < n:
            randx = self.rng.uniform(low=xmin, high=xmax, size=nleft)
            pvals = self.get_prob_array(randx)
            randy = self.rng.uniform(size=nleft)
            (w,) = np.where(randy < pvals)
            if w.size > 0:
                rvals[ngood:ngood + w.size] = randx[w]
                ngood += w.size
                nleft -= w.size
        return rvals[0] if is_scalar else rvals


class Normal(PriorBase):
    """unnormalized gaussian, peak lnprob = 0 (ref: priors.py:391-505)"""

    def __init__(self, mean, sigma, rng, bounds=None):
        super().__init__(rng=rng, bounds=bounds)
        self.mean = mean
        self.sigma = sigma
        self.sinv = 1.0 / sigma
        self.s2inv = 1.0 / sigma**2
        self.ndim = 1

    def get_lnprob(self, val):
        diff = self.mean - val
        return -0.5 * diff * diff * self.s2inv

    get_lnprob_scalar = get_lnprob
    get_lnprob_array = get_lnprob
    get_lnprob_device = get_lnprob

    def get_prob(self, val):
        return np.exp(self.get_lnprob(val))

    get_prob_array = get_prob
    get_prob_scalar = get_prob

    def get_fdiff(self, val):
        return (val - self.mean) * self.sinv

    get_fdiff_device = get_fdiff

    def sample(self, nrand=None, size=None):
        if size is None and nrand is not None:
            size = nrand
        return self.rng.normal(loc=self.mean, scale=self.sigma, size=size)


class LMBounds(PriorBase):
    """pure bounds: fdiff always 0, bounds passed to the minimizer
    (ref: priors.py:508-571)"""

    def __init__(self, minval, maxval, rng):
        super().__init__(rng)
        self.bounds = (minval, maxval)
        self.mean = (minval + maxval) / 2.0
        self.sigma = (maxval - minval) * 0.28

    def get_fdiff(self, val):
        return 0.0 * val

    get_fdiff_device = get_fdiff

    def get_lnprob_scalar(self, val):
        return 0.0 * val

    get_lnprob_array = get_lnprob_scalar
    get_lnprob_device = get_lnprob_scalar

    def sample(self, nrand=None):
        return self.rng.uniform(
            low=self.bounds[0], high=self.bounds[1], size=nrand
        )


class Bounded1D(PriorBase):
    """wrap a pdf with rejection-sampled limits (ref: priors.py:572-671)"""

    def __init__(self, pdf, bounds):
        self.pdf = pdf
        self.set_limits(bounds)

    def set_limits(self, limits):
        ok = False
        try:
            n = len(limits)
            if n == 2:
                ok = True
        except TypeError:
            pass
        if not ok:
            raise ValueError("expected bounds to be 2-element sequence")
        if limits[0] >= limits[1]:
            raise ValueError("bounds[0] must be less than bounds[1]")
        self.limits = limits
        self.bounds = limits

    def sample(self, nrand=None, size=None):
        if size is None and nrand is not None:
            size = nrand
        bounds = self.bounds
        is_scalar = size is None
        nval = 1 if is_scalar else size
        values = np.zeros(nval)
        ngood, nleft = 0, nval
        while ngood < nval:
            tmp = self.pdf.sample(nleft)
            (w,) = np.where((tmp > bounds[0]) & (tmp < bounds[1]))
            if w.size > 0:
                values[ngood:ngood + w.size] = tmp[w]
                ngood += w.size
                nleft -= w.size
        return values[0] if is_scalar else values


LimitPDF = Bounded1D


class LogNormal(PriorBase):
    """lognormal, peak lnprob = 0 at the mode (ref: priors.py:674-972)"""

    def __init__(self, mean, sigma, rng, shift=None):
        super().__init__(rng=rng)
        if mean <= 0:
            raise ValueError("mean must be > 0")
        self.shift = shift
        self.mean = mean
        self.sigma = sigma

        self.logmean = np.log(mean) - 0.5 * np.log(1 + sigma**2 / mean**2)
        self.logvar = np.log(1 + sigma**2 / mean**2)
        self.logsigma = np.sqrt(self.logvar)
        self.logivar = 1.0 / self.logvar

        log_mode = self.logmean - self.logvar
        self.mode = np.exp(log_mode)
        chi2 = self.logivar * (log_mode - self.logmean) ** 2
        self.lnprob_max = -0.5 * chi2 - log_mode
        self.log_mode = log_mode

    def get_lnprob_scalar(self, val):
        if self.shift is not None:
            val = val - self.shift
        if val <= 0:
            raise GMixRangeError("values of LogNormal must be > 0")
        logval = np.log(val)
        chi2 = self.logivar * (logval - self.logmean) ** 2
        return -0.5 * chi2 - logval - self.lnprob_max

    def get_lnprob_array(self, vals):
        vals = np.array(vals, dtype="f8")
        if self.shift is not None:
            vals = vals - self.shift
        if np.any(vals <= 0):
            raise GMixRangeError("values of LogNormal must be > 0")
        logvals = np.log(vals)
        chi2 = self.logivar * (logvals - self.logmean) ** 2
        return -0.5 * chi2 - logvals - self.lnprob_max

    def get_lnprob_device(self, val):
        if self.shift is not None:
            val = val - self.shift
        ok = val > 0
        logval = jnp.log(jnp.where(ok, val, 1.0))
        chi2 = self.logivar * (logval - self.logmean) ** 2
        return jnp.where(ok, -0.5 * chi2 - logval - self.lnprob_max, LOWVAL)

    def get_prob_scalar(self, val):
        return np.exp(self.get_lnprob_scalar(val))

    def get_prob_array(self, vals):
        return np.exp(self.get_lnprob_array(vals))

    def get_fdiff(self, val):
        lnp = self.get_lnprob_scalar(val)
        chi2 = max(-2 * lnp, 0.0)
        return np.sqrt(chi2)

    def get_fdiff_device(self, val):
        chi2 = jnp.clip(-2 * self.get_lnprob_device(val), 0.0, None)
        pos = chi2 > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, chi2, 1.0)), 0.0)

    def sample(self, nrand=None):
        z = self.rng.normal(size=nrand)
        r = np.exp(self.logmean + self.logsigma * z)
        if self.shift is not None:
            r += self.shift
        return r

    def sample_brute(self, nrand=None, maxval=None):
        if maxval is None:
            maxval = self.mean + 10 * self.sigma
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        samples = np.zeros(n)
        ngood, nleft = 0, n
        while ngood < n:
            rvals = maxval * self.rng.uniform(size=nleft)
            if self.shift is not None:
                rvals += self.shift
            h = self.rng.uniform(size=nleft)
            pvals = self.get_prob_array(np.clip(rvals, 1e-300, None))
            (w,) = np.where(h < pvals)
            if w.size > 0:
                samples[ngood:ngood + w.size] = rvals[w]
                ngood += w.size
                nleft -= w.size
        return samples[0] if is_scalar else samples


class Sinh(PriorBase):
    """sinh pseudo-prior for LM (ref: priors.py:975-1043)"""

    def __init__(self, mean, scale, rng):
        super().__init__(rng=rng)
        self.mean = mean
        self.scale = scale

    def get_fdiff(self, val):
        return np.sinh((val - self.mean) / self.scale)

    def get_fdiff_device(self, val):
        return jnp.sinh((val - self.mean) / self.scale)

    def get_lnprob_scalar(self, val):
        f = self.get_fdiff(val)
        return -0.5 * f * f

    get_lnprob_array = get_lnprob_scalar

    def get_lnprob_device(self, val):
        f = self.get_fdiff_device(val)
        return -0.5 * f * f

    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        vals = self.rng.uniform(
            low=self.mean - self.scale, high=self.mean + self.scale, size=n
        )
        return vals[0] if is_scalar else vals


class TruncatedGaussian(PriorBase):
    """gaussian truncated to [minval, maxval] (ref: priors.py:1046-1169)"""

    def __init__(self, mean, sigma, minval, maxval, rng):
        super().__init__(rng=rng)
        self.mean = mean
        self.sigma = sigma
        self.ivar = 1.0 / sigma**2
        self.sinv = 1.0 / sigma
        self.minval = minval
        self.maxval = maxval

    def get_lnprob_scalar(self, val):
        if val < self.minval or val > self.maxval:
            raise GMixRangeError("value out of range")
        diff = val - self.mean
        return -0.5 * diff * diff * self.ivar

    def get_lnprob_array(self, val):
        lnp = np.zeros(np.size(val)) - np.inf
        val = np.asarray(val)
        w = (val > self.minval) & (val < self.maxval)
        diff = val[w] - self.mean
        lnp[w] = -0.5 * diff * diff * self.ivar
        return lnp

    def get_lnprob_device(self, val):
        diff = val - self.mean
        lnp = -0.5 * diff * diff * self.ivar
        return jnp.where(
            (val < self.minval) | (val > self.maxval), LOWVAL, lnp
        )

    def get_fdiff(self, val):
        if val < self.minval or val > self.maxval:
            raise GMixRangeError("value out of range")
        return (val - self.mean) * self.sinv

    def get_fdiff_device(self, val):
        f = (val - self.mean) * self.sinv
        return jnp.where(
            (val < self.minval) | (val > self.maxval), jnp.inf, f
        )

    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        vals = np.zeros(n)
        ngood, nleft = 0, n
        while ngood < n:
            tvals = self.rng.normal(loc=self.mean, scale=self.sigma, size=nleft)
            (w,) = np.where((tvals > self.minval) & (tvals < self.maxval))
            if w.size > 0:
                vals[ngood:ngood + w.size] = tvals[w]
                ngood += w.size
                nleft -= w.size
        return vals[0] if is_scalar else vals
