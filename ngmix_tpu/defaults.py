"""Default values and numerical constants.

Mirrors the behavioral constants of the reference implementation
(ngmix/defaults.py:9-17, ngmix/fastexp_nb.py:80-86,
ngmix/gmix/gmix_nb.py:11) without copying code: these numbers define the
objective function and public API semantics, so they must match exactly.
"""
import numpy as np

# parameter / covariance defaults used when a fit fails
PDEF = -9.999e9
CDEF = 9.999e9

# for priors etc.
LOWVAL = -np.inf
BIGVAL = 9999.0e47

DEFAULT_LM_PARS = {"maxfev": 4000, "ftol": 1.0e-5, "xtol": 1.0e-5}

# Gaussian evaluations are smoothly apodized to zero over
# chi^2 in [APOD_CHI2, MAX_CHI2] so rendered models are C2 in the
# parameters (ref: ngmix/fastexp_nb.py:80-86).
FASTEXP_MAX_CHI2 = 25.0
FASTEXP_APOD_CHI2 = 20.0

# determinant floor for a 2-d gaussian covariance
# (ref: ngmix/gmix/gmix_nb.py:11). In float32 this underflows to 0,
# which still behaves correctly as a floor (det <= 0 is flagged).
GMIX_LOW_DETVAL = 1.0e-200

# default dtype for device computation. Tests run with x64 enabled on
# CPU for tight agreement with the reference; on TPU float32 is the
# native fast path and accuracy is validated statistically.
DEFAULT_DTYPE = None  # None -> jax default (f4 or f8 depending on x64 flag)


def copy_if_needed():
    """numpy>=2 shim kept for API familiarity."""
    return None
