"""Reduced-shear ellipticity algebra.

Device-side, batch-first versions of the reference's shape conversions
(ngmix/shape.py). All functions are pure jnp, work elementwise on arrays
of any shape, and never raise under jit: out-of-range inputs are clipped
(|g| or |e| -> ONE_MINUS_EPS). The host-facing ``Shape`` class keeps the
reference's raising behavior for API parity.
"""
import jax.numpy as jnp
import numpy as np

from .gexceptions import GMixRangeError

ONE_MINUS_EPS = 0.9999999999999999


def shear_reduced(g1, g2, s1, s2):
    """Reduced-shear addition: apply shear (s1,s2) to shape (g1,g2).

    Behavior parity: ngmix/shape.py:9-35.
    """
    A = 1 + g1 * s1 + g2 * s2
    B = g2 * s1 - g1 * s2
    denom_inv = 1.0 / (A * A + B * B)

    g1o = (A * (g1 + s1) + B * (g2 + s2)) * denom_inv
    g2o = (A * (g2 + s2) - B * (g1 + s1)) * denom_inv
    return g1o, g2o


def _safe_ratio(num_mag, mag):
    """num_mag/mag with the mag == 0 limit -> 1."""
    return jnp.where(mag == 0.0, 1.0, num_mag / jnp.where(mag == 0.0, 1.0, mag))


def g1g2_to_e1e2(g1, g2):
    """g -> e conversion: e = tanh(2 atanh(g)), which has the AD-safe
    closed form e = 2 g / (1 + |g|^2) (exactly equal for |g| < 1; no
    sqrt/atanh singularities at g = 0, so jacfwd through the fit
    objective is exact). Clips |g| below 1 instead of raising.

    Behavior parity: ngmix/shape.py:179-235.
    """
    gsq = g1 * g1 + g2 * g2
    # clip |g| -> ONE_MINUS_EPS while preserving direction
    scale = jnp.where(
        gsq >= 1.0,
        ONE_MINUS_EPS / jnp.sqrt(jnp.where(gsq >= 1.0, gsq, 1.0)),
        1.0,
    )
    g1c = g1 * scale
    g2c = g2 * scale
    fac = 2.0 / (1.0 + g1c * g1c + g2c * g2c)
    return fac * g1c, fac * g2c


def e1e2_to_g1g2(e1, e2):
    """e -> g conversion: g = tanh(atanh(e)/2) = e / (1 + sqrt(1-|e|^2))
    (AD-safe closed form). Clips |e| below 1 instead of raising.

    Behavior parity: ngmix/shape.py:238-293.
    """
    esq = e1 * e1 + e2 * e2
    scale = jnp.where(
        esq >= 1.0,
        ONE_MINUS_EPS / jnp.sqrt(jnp.where(esq >= 1.0, esq, 1.0)),
        1.0,
    )
    e1c = e1 * scale
    e2c = e2 * scale
    esqc = e1c * e1c + e2c * e2c
    fac = 1.0 / (1.0 + jnp.sqrt(jnp.clip(1.0 - esqc, 0.0, None)))
    return fac * e1c, fac * e2c


def g1g2_to_eta1eta2(g1, g2):
    """g -> eta: eta = 2 atanh(g). ref: ngmix/shape.py:296-347"""
    g = jnp.sqrt(g1 * g1 + g2 * g2)
    gc = jnp.clip(g, 0.0, ONE_MINUS_EPS)
    eta = 2 * jnp.arctanh(gc)
    fac = _safe_ratio(eta, gc)
    return fac * g1, fac * g2


def e1e2_to_eta1eta2(e1, e2):
    """e -> eta: eta = atanh(e). ref: ngmix/shape.py:350-393"""
    e = jnp.sqrt(e1 * e1 + e2 * e2)
    ec = jnp.clip(e, 0.0, ONE_MINUS_EPS)
    eta = jnp.arctanh(ec)
    fac = _safe_ratio(eta, ec)
    return fac * e1, fac * e2


def eta1eta2_to_g1g2(eta1, eta2):
    """eta -> g: g = tanh(eta/2). ref: ngmix/shape.py:396-440"""
    eta = jnp.sqrt(eta1 * eta1 + eta2 * eta2)
    g = jnp.tanh(0.5 * eta)
    fac = _safe_ratio(g, eta)
    return fac * eta1, fac * eta2


def dgs_by_dgo_jacob(g1, g2, s1, s2):
    """|dgs/dgo| jacobian of the shear transform. ref: ngmix/shape.py:443-468"""
    ssq = s1 * s1 + s2 * s2
    num = (ssq - 1) ** 2
    denom = (1 + 2 * g1 * s1 + 2 * g2 * s2 + g1**2 * ssq + g2**2 * ssq) ** 2
    return num / denom


def get_round_factor(g1, g2):
    """T_round = T * f(g1,g2). ref: ngmix/shape.py:471-489"""
    gsq = g1**2 + g2**2
    return (1 - gsq) / (1 + gsq)


def rotate_shape(g1, g2, theta):
    """rotate shapes by angle theta (radians). ref: ngmix/shape.py:492-517"""
    twotheta = 2.0 * theta
    c = jnp.cos(twotheta)
    s = jnp.sin(twotheta)
    return g1 * c + g2 * s, -g1 * s + g2 * c


def g_range_flag(g1, g2):
    """1 where |g| >= 1 (invalid), else 0; for device flag accumulation."""
    g2sum = g1 * g1 + g2 * g2
    return (g2sum >= 1.0).astype(jnp.int32)


class Shape(object):
    """Host-side reduced-shear shape with range checking.

    API parity: ngmix/shape.py:38-176.
    """

    def __init__(self, g1, g2):
        self.set_g1g2(g1, g2)

    def set_g1g2(self, g1, g2):
        self.g1 = g1
        self.g2 = g2
        g = np.sqrt(g1 * g1 + g2 * g2)
        if g >= 1.0:
            raise GMixRangeError("g out of range: %.16g" % g)
        self.g = g

    def get_sheared(self, s1, s2=None):
        if isinstance(s1, Shape):
            s1, s2 = s1.g1, s1.g2
        elif s2 is None:
            raise ValueError("send s1,s2 or a Shape")
        g1, g2 = shear_reduced(self.g1, self.g2, s1, s2)
        return Shape(float(g1), float(g2))

    def __neg__(self):
        return Shape(-self.g1, -self.g2)

    def get_rotated(self, theta_radians):
        g1, g2 = rotate_shape(self.g1, self.g2, theta_radians)
        return Shape(float(g1), float(g2))

    def rotate(self, theta_radians):
        sh = self.get_rotated(theta_radians)
        self.set_g1g2(sh.g1, sh.g2)

    def copy(self):
        return Shape(self.g1, self.g2)

    def __repr__(self):
        return "(%.16g, %.16g)" % (self.g1, self.g2)
