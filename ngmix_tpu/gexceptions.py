"""Exception hierarchy (host-side only).

Device code never raises: invalid parameter regions set flag bits
(see flags.py). These exceptions exist for the host-facing API layer,
matching the reference semantics (ngmix/gexceptions.py:1-59).
"""


class NGmixBaseException(Exception):
    """Base exception class"""

    def __init__(self, value):
        super().__init__(value)
        self.value = value

    def __str__(self):
        return repr(self.value)


class GMixRangeError(NGmixBaseException):
    """Some number was out of range."""


class GMixFatalError(NGmixBaseException):
    """A fatal error in the gaussian mixtures."""


class GMixMaxIterEM(NGmixBaseException):
    """EM algorithm hit max iter."""


class PSFFluxFailure(NGmixBaseException):
    """Failure to fit PSF fluxes."""


class BootPSFFailure(NGmixBaseException):
    """Failure to bootstrap PSF."""


class BootGalFailure(NGmixBaseException):
    """Failure to bootstrap galaxy."""


class FFTRangeError(NGmixBaseException):
    """FFT size is not correct/consistent."""
