"""1-d scalar priors.

Behavior parity with ngmix/priors/priors.py: every prior peaks at
ln(prob) = 0 (so LM prior rows are proper pseudo-residuals), exposes
sample / get_lnprob_scalar / get_lnprob_array / get_fdiff, and raises
GMixRangeError on host out-of-range input where the reference does.

Each prior additionally provides jnp-traced ``*_device`` variants used
by the device fit objective: these never raise, returning -inf (or a
large fdiff) out of range, which the LM path converts to rejected
steps.

All rejection sampling goes through :func:`draw_until`, a shared
vectorized accumulator that over-draws by the observed acceptance rate
(the reference re-draws exactly the deficit each round, which costs
O(1/rate) rounds for narrow acceptance windows).
"""
import jax.numpy as jnp
import numpy as np

from ..defaults import LOWVAL
from ..gexceptions import GMixRangeError
from .random import make_rng


def draw_until(n, propose):
    """accumulate accepted draws until at least ``n`` exist.

    ``propose(k)`` makes ``k`` proposals and returns only the ACCEPTED
    ones (an array whose leading axis is the accepted count, possibly
    zero). Each round asks for the remaining deficit scaled by the
    running acceptance rate (floored so a pathological first round
    cannot stall), so even narrow acceptance windows finish in a
    handful of rounds. Returns exactly ``n`` values (leading axis).
    """
    if n <= 0:
        # empty draw with the right trailing shape (size-0 proposals
        # consume nothing from the rng stream)
        return np.asarray(propose(0))[:0]
    kept = []
    have = 0
    asked = 0
    ask = int(n)
    while have < n:
        got = np.asarray(propose(ask))
        kept.append(got)
        have += got.shape[0]
        asked += ask
        rate = max(have / asked, 1.0 / 64.0)
        ask = int(np.ceil((n - have) / rate)) + 1
    return np.concatenate(kept, axis=0)[:n]


def _one_or_many(vals, nrand):
    """the reference's scalar convention: nrand=None -> bare scalar"""
    return vals[0] if nrand is None else vals


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
        n = 1 if nrand is None else nrand
        span = self.maxval - self.minval
        return _one_or_many(
            self.minval + span * self.rng.uniform(size=n), nrand
        )


class TwoSidedErf(PriorBase):
    """smooth box: 0.5 erf((max-x)/wmax) + 0.5 erf((x-min)/wmin)
    (ref: priors.py:190-388)"""

    def __init__(self, minval, width_at_min, maxval, width_at_max, rng):
        super().__init__(rng=rng)
        self.minval = minval
        self.width_at_min = width_at_min
        self.maxval = maxval
        self.width_at_max = width_at_max

    def _smooth_box(self, x):
        """the two half-erf rolloffs, vectorized"""
        from scipy.special import erf

        rise = erf((x - self.minval) / self.width_at_min)
        fall = erf((self.maxval - x) / self.width_at_max)
        return 0.5 * (rise + fall)

    def get_prob_scalar(self, val):
        return float(self._smooth_box(np.float64(val)))

    def get_lnprob_scalar(self, val):
        p = self.get_prob_scalar(val)
        return np.log(p) if p > 0.0 else LOWVAL

    def get_prob_array(self, vals):
        return self._smooth_box(np.array(vals, ndmin=1, dtype="f8"))

    def get_lnprob_array(self, vals):
        p = self.get_prob_array(vals)
        return np.where(p > 0.0, np.log(np.where(p > 0.0, p, 1.0)), LOWVAL)

    def get_lnprob_device(self, val):
        from jax.scipy.special import erf

        rise = erf((val - self.minval) / self.width_at_min)
        fall = erf((self.maxval - val) / self.width_at_max)
        p = 0.5 * (rise + fall)
        return jnp.where(p > 0.0, jnp.log(jnp.where(p > 0, p, 1.0)), LOWVAL)

    def get_fdiff(self, val):
        if isinstance(val, np.ndarray):
            lnp = self.get_lnprob_array(val)
        else:
            lnp = self.get_lnprob_scalar(val)
        return np.sqrt(np.clip(-2 * lnp, 0.0, None))

    def get_fdiff_device(self, val):
        chi2 = jnp.clip(-2 * self.get_lnprob_device(val), 0.0, None)
        pos = chi2 > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, chi2, 1.0)), 0.0)

    def sample(self, nrand=None):
        lo = self.minval - 5.0 * self.width_at_min
        hi = self.maxval + 5.0 * self.width_at_max

        def propose(k):
            x = self.rng.uniform(low=lo, high=hi, size=k)
            return x[self.rng.uniform(size=k) < self._smooth_box(x)]

        return _one_or_many(
            draw_until(1 if nrand is None else nrand, propose), nrand
        )


class Normal(PriorBase):
    """unnormalized gaussian, peak lnprob = 0 (ref: priors.py:391-505)"""

    def __init__(self, mean, sigma, rng, bounds=None):
        super().__init__(rng=rng, bounds=bounds)
        self.mean = mean
        self.sigma = sigma
        # public reference attributes (ngmix priors.py:420-421)
        self.sinv = 1.0 / sigma
        self.s2inv = 1.0 / sigma**2
        self.ndim = 1

    def _zscore(self, val):
        return (val - self.mean) / self.sigma

    def get_lnprob(self, val):
        z = self._zscore(val)
        return -0.5 * z * z

    get_lnprob_scalar = get_lnprob
    get_lnprob_array = get_lnprob
    get_lnprob_device = get_lnprob

    def get_prob(self, val):
        return np.exp(self.get_lnprob(val))

    get_prob_array = get_prob
    get_prob_scalar = get_prob

    def get_fdiff(self, val):
        return self._zscore(val)

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
        try:
            lo, hi = limits
        except (TypeError, ValueError):
            raise ValueError("expected bounds to be 2-element sequence")
        if lo >= hi:
            raise ValueError("bounds[0] must be less than bounds[1]")
        self.limits = limits
        self.bounds = limits

    def sample(self, nrand=None, size=None):
        if size is None:
            size = nrand
        lo, hi = self.bounds

        def propose(k):
            cand = np.atleast_1d(self.pdf.sample(k))
            return cand[(cand > lo) & (cand < hi)]

        return _one_or_many(
            draw_until(1 if size is None else size, propose), size
        )


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

        # moment matching: the underlying normal in t = log(x)
        self.logvar = np.log1p((sigma / mean) ** 2)
        self.logmean = np.log(mean) - 0.5 * self.logvar
        self.logsigma = np.sqrt(self.logvar)
        self.logivar = 1.0 / self.logvar

        self.log_mode = self.logmean - self.logvar
        self.mode = np.exp(self.log_mode)
        # peak of the unnormalized density -0.5*(t-logmean)^2/logvar - t
        # sits at t = log_mode where the quadratic term is exactly
        # -logvar/2, giving the closed form below
        self.lnprob_max = 0.5 * self.logvar - self.logmean

    def _lnprob_of_log(self, t):
        """lnprob as a function of t = log(val - shift), peak 0"""
        z2 = self.logivar * (t - self.logmean) ** 2
        return -0.5 * z2 - t - self.lnprob_max

    def get_lnprob_scalar(self, val):
        if self.shift is not None:
            val = val - self.shift
        if val <= 0:
            raise GMixRangeError("values of LogNormal must be > 0")
        return self._lnprob_of_log(np.log(val))

    def get_lnprob_array(self, vals):
        vals = np.array(vals, dtype="f8")
        if self.shift is not None:
            vals = vals - self.shift
        if np.any(vals <= 0):
            raise GMixRangeError("values of LogNormal must be > 0")
        return self._lnprob_of_log(np.log(vals))

    def get_lnprob_device(self, val):
        if self.shift is not None:
            val = val - self.shift
        ok = val > 0
        t = jnp.log(jnp.where(ok, val, 1.0))
        lnp = -0.5 * self.logivar * (t - self.logmean) ** 2 - t
        return jnp.where(ok, lnp - self.lnprob_max, LOWVAL)

    def get_prob_scalar(self, val):
        return np.exp(self.get_lnprob_scalar(val))

    def get_prob_array(self, vals):
        return np.exp(self.get_lnprob_array(vals))

    def get_fdiff(self, val):
        lnp = self.get_lnprob_scalar(val)
        return np.sqrt(max(-2 * lnp, 0.0))

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
        """rejection sampling against a uniform ceiling; a cross-check
        of sample() (ref: priors.py:865-920)"""
        if maxval is None:
            maxval = self.mean + 10 * self.sigma
        shift = 0.0 if self.shift is None else self.shift

        def propose(k):
            cand = maxval * self.rng.uniform(size=k) + shift
            p = np.exp(self._lnprob_of_log(np.log(np.clip(
                cand - shift, 1e-300, None
            ))))
            return cand[self.rng.uniform(size=k) < p]

        return _one_or_many(
            draw_until(1 if nrand is None else nrand, propose), nrand
        )

    def fit(self, x, y):
        """fit (mean, sigma, amplitude) of this family to measured
        (x, p(x)) data - an offline training utility
        (ref: priors.py:922-972). Returns the result dict; retries a
        few jittered moment-based guesses on failure."""
        from scipy.optimize import least_squares

        x = np.asarray(x, dtype="f8")
        y = np.asarray(y, dtype="f8")

        def resid(pars):
            m, s, amp = pars
            if m <= 0 or s <= 0:
                return np.full(y.size, 1.0e9)
            model = LogNormal(m, s, rng=self.rng)
            return amp * model.get_prob_array(np.clip(x, 1e-300, None)) - y

        base = np.array([x.mean(), x.std(), y.mean()])
        res = None
        for _ in range(4):
            jitter = 1.0 + self.rng.uniform(low=-0.1, high=0.1, size=3)
            fit = least_squares(resid, base * jitter, max_nfev=4000)
            res = {
                "flags": 0 if fit.success else 1,
                "pars": fit.x,
                "nfev": fit.nfev,
                "cost": fit.cost,
            }
            if res["flags"] == 0:
                break
        return res


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
        n = 1 if nrand is None else nrand
        vals = self.rng.uniform(
            low=self.mean - self.scale, high=self.mean + self.scale, size=n
        )
        return _one_or_many(vals, nrand)


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

    def _inside(self, val):
        return (val > self.minval) & (val < self.maxval)

    def get_lnprob_scalar(self, val):
        if val < self.minval or val > self.maxval:
            raise GMixRangeError("value out of range")
        z = (val - self.mean) * self.sinv
        return -0.5 * z * z

    def get_lnprob_array(self, val):
        val = np.asarray(val)
        z = (val - self.mean) * self.sinv
        return np.where(self._inside(val), -0.5 * z * z, -np.inf)

    def get_lnprob_device(self, val):
        z = (val - self.mean) * self.sinv
        return jnp.where(
            (val < self.minval) | (val > self.maxval), LOWVAL, -0.5 * z * z
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
        def propose(k):
            cand = self.rng.normal(loc=self.mean, scale=self.sigma, size=k)
            return cand[self._inside(cand)]

        return _one_or_many(
            draw_until(1 if nrand is None else nrand, propose), nrand
        )
