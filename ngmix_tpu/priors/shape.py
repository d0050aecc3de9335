"""Shape (ellipticity) priors.

Behavior parity with ngmix/priors/shape.py: GPriorBase machinery,
GPriorGauss, GPriorBA (Bernstein & Armstrong 2013) and ZDisk2D.
Sampling uses rejection on the 2d plane; lnprob functions additionally
have jnp-traced device variants for the LM prior rows.
"""
import jax.numpy as jnp
import numpy as np

from ..defaults import LOWVAL
from ..gexceptions import GMixRangeError
from .priors import PriorBase, draw_until


class GPriorBase(PriorBase):
    """base for |g| priors (ref: ngmix/priors/shape.py:18-367)"""

    def __init__(self, pars, rng):
        PriorBase.__init__(self, rng=rng)
        self.pars = np.array(pars, dtype="f8")
        self.gmax = 1.0

    # subclasses provide get_prob_scalar2d / get_lnprob_scalar2d /
    # get_prob_scalar1d array variants via the fill pattern
    def get_lnprob_scalar2d(self, g1, g2):
        raise RuntimeError("over-ride me")

    def get_prob_scalar2d(self, g1, g2):
        raise RuntimeError("over-ride me")

    def get_prob_scalar1d(self, g):
        raise RuntimeError("over-ride me")

    def get_prob_array2d(self, g1arr, g2arr):
        g1arr = np.atleast_1d(np.asarray(g1arr, dtype="f8"))
        g2arr = np.atleast_1d(np.asarray(g2arr, dtype="f8"))
        out = np.zeros(g1arr.size)
        for i in range(g1arr.size):
            out[i] = self.get_prob_scalar2d(g1arr[i], g2arr[i])
        return out

    def get_lnprob_array2d(self, g1arr, g2arr):
        g1arr = np.atleast_1d(np.asarray(g1arr, dtype="f8"))
        g2arr = np.atleast_1d(np.asarray(g2arr, dtype="f8"))
        out = np.zeros(g1arr.size) + LOWVAL
        for i in range(g1arr.size):
            try:
                out[i] = self.get_lnprob_scalar2d(g1arr[i], g2arr[i])
            except GMixRangeError:
                pass
        return out

    def get_prob_array1d(self, garr):
        garr = np.atleast_1d(np.asarray(garr, dtype="f8"))
        out = np.zeros(garr.size)
        for i in range(garr.size):
            out[i] = self.get_prob_scalar1d(garr[i])
        return out

    def get_fdiff(self, g1, g2):
        """sqrt(-2 ln p) pseudo-residual (ref: shape.py:520-553)"""
        if isinstance(g1, np.ndarray):
            lnp = self.get_lnprob_array2d(g1, g2)
            return np.sqrt(np.clip(-2 * lnp, 0.0, None))
        lnp = self.get_lnprob_scalar2d(g1, g2)
        return np.sqrt(max(-2 * lnp, 0.0))

    def get_fdiff_device(self, g1, g2):
        chi2 = jnp.clip(-2 * self.get_lnprob_device2d(g1, g2), 0.0, None)
        pos = chi2 > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, chi2, 1.0)), 0.0)

    def get_lnprob_device2d(self, g1, g2):
        raise RuntimeError("over-ride me")

    def sample2d(self, nrand=None, maxguess=0.1):
        """rejection sample (g1, g2) from the 2d prob"""
        gmax = self.gmax - 1.0e-4
        # ceiling over a grid of |g|
        gg = np.linspace(0, gmax, 1000)
        pmax = np.max(
            [self.get_prob_scalar2d(g, 0.0) for g in gg]
        ) * 1.05

        def propose(k):
            cand = self.rng.uniform(low=-gmax, high=gmax, size=(k, 2))
            inside = np.hypot(cand[:, 0], cand[:, 1]) < gmax
            h = pmax * self.rng.uniform(size=k)
            p = self.get_prob_array2d(cand[:, 0], cand[:, 1])
            return cand[inside & (h < p)]

        pairs = draw_until(1 if nrand is None else nrand, propose)
        if nrand is None:
            return pairs[0, 0], pairs[0, 1]
        return pairs[:, 0], pairs[:, 1]

    def sample2d_brute(self, nrand):
        """rejection sample (g1, g2) against the central-density
        ceiling - a cross-check of sample2d (ref: shape.py:250-291)"""
        ceiling = self.get_prob_scalar2d(0.0, 0.0)

        def propose(k):
            cand = self.rng.uniform(low=-1.0, high=1.0, size=(k, 2))
            h = ceiling * self.rng.uniform(size=k)
            p = self.get_prob_array2d(cand[:, 0], cand[:, 1])
            return cand[h < p]

        pairs = draw_until(nrand, propose)
        return pairs[:, 0], pairs[:, 1]

    def sample1d(self, nrand=None, maxguess=0.1):
        """rejection sample |g| from the 1d prob"""
        gmax = self.gmax - 1.0e-4
        gg = np.linspace(1e-6, gmax, 1000)
        pmax = np.max(self.get_prob_array1d(gg)) * 1.05

        def propose(k):
            cand = self.rng.uniform(low=0.0, high=gmax, size=k)
            h = pmax * self.rng.uniform(size=k)
            return cand[h < self.get_prob_array1d(cand)]

        g = draw_until(1 if nrand is None else nrand, propose)
        return g[0] if nrand is None else g

    def set_maxval1d(self, maxguess=0.1):
        """locate the max of the 1d |g| density (ref: shape.py:293-316)"""
        from scipy.optimize import minimize_scalar

        res = minimize_scalar(
            lambda g: -self.get_prob_scalar1d(g),
            bounds=(1e-6, self.gmax - 1e-4),
            method="bounded",
        )
        if not res.success:
            raise RuntimeError("failed to find 1d max: %s" % res.message)
        self.maxval1d = -res.fun
        self.maxval1d_loc = res.x

    def fit(self, xdata, ydata, guess=None):
        """fit this family's parameters to a measured 1d profile.

        Offline training utility (ref: ngmix/priors/shape.py:318-363):
        least squares of get_prob_array1d against (x, p(x)) data with
        poisson-like weights 1/sqrt(p); subclasses supply set_pars and,
        for guess=None, _get_guess. Stores fit_pars / fit_pars_cov /
        fit_perr and returns the result dict (the reference prints)."""
        from scipy.optimize import least_squares

        x = np.asarray(xdata, dtype="f8")
        y = np.asarray(ydata, dtype="f8")
        keep = y > 0
        x, y = x[keep], y[keep]
        ierr = 1.0 / np.sqrt(y)
        self.xdata, self.ydata, self.ierr = x, y, ierr

        if guess is None:
            guess = self._get_guess(y.sum())

        def resid(pars):
            self.set_pars(pars)
            return (self.get_prob_array1d(x) - y) * ierr

        fit = least_squares(resid, np.asarray(guess, "f8"), max_nfev=4000)
        # chi2/dof-scaled covariance from the jacobian at the optimum
        dof = max(y.size - fit.x.size, 1)
        jtj = fit.jac.T @ fit.jac
        try:
            cov = np.linalg.inv(jtj) * (2 * fit.cost / dof)
        except np.linalg.LinAlgError:
            cov = np.full((fit.x.size, fit.x.size), np.inf)
        self.set_pars(fit.x)
        self.fit_pars = fit.x
        self.fit_pars_cov = cov
        self.fit_perr = np.sqrt(np.abs(np.diag(cov)))
        return {
            "flags": 0 if fit.success else 1,
            "pars": fit.x,
            "pars_cov": cov,
            "pars_err": self.fit_perr,
            "nfev": fit.nfev,
        }


class GPriorGauss(GPriorBase):
    """gaussian prior on (g1, g2) (ref: shape.py:370-443)"""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.sigma = float(self.pars)

    def sample1d(self, nrand=None, **kw):
        raise NotImplementedError("no 1d for gauss")

    def sample2d(self, nrand=None, **kw):
        gmax = self.gmax - 1.0e-4

        def propose(k):
            cand = self.rng.normal(scale=self.sigma, size=(k, 2))
            return cand[np.hypot(cand[:, 0], cand[:, 1]) < gmax]

        pairs = draw_until(1 if nrand is None else nrand, propose)
        if nrand is None:
            return pairs[0, 0], pairs[0, 1]
        return pairs[:, 0], pairs[:, 1]


class GPriorBA(GPriorBase):
    """Bernstein & Armstrong 2013: p = A (1-g^2)^2 exp(-g^2/2 sigma^2)
    (ref: shape.py:446-663)"""

    def __init__(self, sigma, rng, A=1.0):
        PriorBase.__init__(self, rng=rng)
        self.set_pars([A, sigma])
        self.gmax = 1.0

    def set_pars(self, pars):
        self.pars = np.array(pars, dtype="f8")
        self.A = self.pars[0]
        self.sigma = self.pars[1]
        self.sig2 = self.sigma**2
        self.sig2inv = 1.0 / self.sig2

    def get_lnprob_scalar2d(self, g1, g2):
        gsq = g1 * g1 + g2 * g2
        omgsq = 1.0 - gsq
        if omgsq <= 0.0:
            raise GMixRangeError("g^2 too big: %s" % gsq)
        return 2 * np.log(omgsq) - 0.5 * gsq * self.sig2inv

    def get_lnprob_device2d(self, g1, g2):
        gsq = g1 * g1 + g2 * g2
        omgsq = 1.0 - gsq
        ok = omgsq > 0.0
        lnp = 2 * jnp.log(jnp.where(ok, omgsq, 1.0)) - 0.5 * gsq * self.sig2inv
        return jnp.where(ok, lnp, LOWVAL)

    def get_prob_scalar2d(self, g1, g2):
        gsq = g1 * g1 + g2 * g2
        omgsq = 1.0 - gsq
        if omgsq <= 0.0:
            return 0.0
        return self.A * omgsq * omgsq * np.exp(-0.5 * gsq * self.sig2inv)

    def get_prob_scalar1d(self, g):
        gsq = g * g
        omgsq = 1.0 - gsq
        if omgsq <= 0.0:
            return 0.0
        return (
            self.A
            * omgsq
            * omgsq
            * np.exp(-0.5 * gsq * self.sig2inv)
            * 2
            * np.pi
            * g
        )

    def _get_guess(self, num):
        """moment-scaled starting point for fit(); jittered so retries
        differ (ref: shape.py:645-663)"""
        bin_width = self.xdata[1] - self.xdata[0]
        base = np.array([1.3 * num * bin_width, 0.16])
        return base * (1.0 + 0.2 * self.rng.uniform(-1.0, 1.0, size=2))


class ZDisk2D(PriorBase):
    """uniform prior on a disk of the given radius
    (ref: shape.py:665-803)"""

    def __init__(self, radius, rng):
        super().__init__(rng=rng)
        self.radius = radius
        self.radius_sq = radius**2

    def get_lnprob_scalar1d(self, r):
        if r >= self.radius:
            raise GMixRangeError("position out of bounds")
        return 0.0

    def get_prob_scalar1d(self, r):
        return 0.0 if r >= self.radius else 1.0

    def get_lnprob_scalar2d(self, x, y):
        r2 = x**2 + y**2
        if r2 >= self.radius_sq:
            raise GMixRangeError("position out of bounds")
        return 0.0

    def get_prob_scalar2d(self, x, y):
        r2 = x**2 + y**2
        return 0.0 if r2 >= self.radius_sq else 1.0

    def get_lnprob_device2d(self, x, y):
        r2 = x**2 + y**2
        return jnp.where(r2 >= self.radius_sq, LOWVAL, 0.0)

    def get_prob_array2d(self, x, y):
        x = np.atleast_1d(np.asarray(x))
        y = np.atleast_1d(np.asarray(y))
        out = np.zeros(x.size)
        out[(x**2 + y**2) < self.radius_sq] = 1.0
        return out

    def sample1d(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        r = np.sqrt(self.radius_sq * self.rng.uniform(size=n))
        return r[0] if is_scalar else r

    def sample2d(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        radius = self.sample1d(nrand=n)
        theta = 2.0 * np.pi * self.rng.uniform(size=n)
        x = radius * np.cos(theta)
        y = radius * np.sin(theta)
        if is_scalar:
            return x[0], y[0]
        return x, y
