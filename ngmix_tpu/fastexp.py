"""Apodized-exponential helpers (API-parity shim for ngmix/fastexp_nb.py).

The reference's fastexp is a CPU lookup-table trick; on TPU jnp.exp is
a hardware transcendental, so ``fexp`` is exact here. The apodization
window constants and functions define the fit objective and live in
gmix.core; they are re-exported for familiarity.
"""
import jax.numpy as jnp

from .defaults import FASTEXP_APOD_CHI2, FASTEXP_MAX_CHI2  # noqa: F401
from .gmix.core import apod_window, apod_window_deriv  # noqa: F401


def fexp(x):
    """exact exponential (the reference's fexp is accurate to ~2e-6)"""
    return jnp.exp(x)


fexp_arr = fexp
