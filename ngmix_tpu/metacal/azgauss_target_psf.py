"""Azimuthally-averaged round-gaussian target psf (compat module for
the reference's ngmix/metacal/azgauss_target_psf.py).

The derivation itself is the k-space threshold-crossing in
kops.azgauss_target_sigma; this module provides the reference's entry
point name. Deviation from the reference: the input is the psf's
(centered) k transform and |k|^2 grid rather than a galsim object, and
the return is a round GMixModel rather than a galsim.Gaussian.
"""
import numpy as np

from ..gmix.gmix import GMixModel
from .kops import azgauss_target_sigma  # noqa: F401

SMALL_KVAL = 3.0e-2
SMALLER_KVAL = 9.0e-3


def get_azgauss_target_psf(psfhat, ksq, nbin, flux=1.0,
                           small_kval=SMALL_KVAL,
                           smaller_kval=SMALLER_KVAL):
    """round gaussian target pinned below the psf's azimuthally
    averaged k profile (ref: azgauss_target_psf.py:40-136); returns a
    GMixModel ('gauss') with the requested flux."""
    sigma = float(
        azgauss_target_sigma(
            psfhat, ksq, nbin, small_kval=small_kval,
            smaller_kval=smaller_kval,
        )
    )
    T = 2.0 * sigma**2
    return GMixModel(np.array([0.0, 0.0, 0.0, 0.0, T, flux]), "gauss")
