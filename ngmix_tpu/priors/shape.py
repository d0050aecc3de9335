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
from .priors import PriorBase


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
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        gmax = self.gmax - 1.0e-4
        # find pmax over a grid of |g|
        gg = np.linspace(0, gmax, 1000)
        pmax = np.max(
            [self.get_prob_scalar2d(g, 0.0) for g in gg]
        ) * 1.05

        g1 = np.zeros(n)
        g2 = np.zeros(n)
        ngood, nleft = 0, n
        while ngood < n:
            g1r = self.rng.uniform(low=-gmax, high=gmax, size=nleft)
            g2r = self.rng.uniform(low=-gmax, high=gmax, size=nleft)
            gr = np.hypot(g1r, g2r)
            h = self.rng.uniform(size=nleft) * pmax
            p = self.get_prob_array2d(g1r, g2r)
            (w,) = np.where((gr < gmax) & (h < p))
            if w.size > 0:
                g1[ngood:ngood + w.size] = g1r[w]
                g2[ngood:ngood + w.size] = g2r[w]
                ngood += w.size
                nleft -= w.size
        if is_scalar:
            return g1[0], g2[0]
        return g1, g2

    def sample1d(self, nrand=None, maxguess=0.1):
        """rejection sample |g| from the 1d prob"""
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        gmax = self.gmax - 1.0e-4
        gg = np.linspace(1e-6, gmax, 1000)
        pmax = np.max(self.get_prob_array1d(gg)) * 1.05
        g = np.zeros(n)
        ngood, nleft = 0, n
        while ngood < n:
            gr = self.rng.uniform(low=0.0, high=gmax, size=nleft)
            h = self.rng.uniform(size=nleft) * pmax
            p = self.get_prob_array1d(gr)
            (w,) = np.where(h < p)
            if w.size > 0:
                g[ngood:ngood + w.size] = gr[w]
                ngood += w.size
                nleft -= w.size
        return g[0] if is_scalar else g


class GPriorGauss(GPriorBase):
    """gaussian prior on (g1, g2) (ref: shape.py:370-443)"""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.sigma = float(self.pars)

    def sample1d(self, nrand=None, **kw):
        raise NotImplementedError("no 1d for gauss")

    def sample2d(self, nrand=None, **kw):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        gmax = self.gmax - 1.0e-4
        g1 = np.zeros(n)
        g2 = np.zeros(n)
        ngood, nleft = 0, n
        while ngood < n:
            g1r = self.rng.normal(size=nleft, scale=self.sigma)
            g2r = self.rng.normal(size=nleft, scale=self.sigma)
            gr = np.sqrt(g1r**2 + g2r**2)
            (w,) = np.where(gr < gmax)
            if w.size > 0:
                g1[ngood:ngood + w.size] = g1r[w]
                g2[ngood:ngood + w.size] = g2r[w]
                ngood += w.size
                nleft -= w.size
        if is_scalar:
            return g1[0], g2[0]
        return g1, g2


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
