"""PSF-then-object bootstrap pipeline.

Capability parity with the reference's two-stage bootstrap
(ngmix/bootstrap.py): fit every epoch's PSF, optionally prune epochs
whose PSF fit failed, then run the object fitter on what remains.
Built on the generic container traversal in ngmix_tpu.containers
instead of per-type dispatch.
"""
import logging

from .containers import obs_prune
from .gexceptions import BootPSFFailure

__all__ = ["Bootstrapper", "bootstrap", "remove_failed_psf_obs"]

# bootstrap diagnostic flag bits (parity: ngmix/bootstrap.py:14-19)
BOOT_S2N_LOW = 2**0
BOOT_R2_LOW = 2**1
BOOT_R4_LOW = 2**2
BOOT_TS2N_ROUND_FAIL = 2**3
BOOT_ROUND_CONVOLVE_FAIL = 2**4
BOOT_WEIGHTS_LOW = 2**5

logger = logging.getLogger(__name__)


def bootstrap(obs, runner, psf_runner=None, ignore_failed_psf=True):
    """PSF fits first, then the object fit.

    When ``ignore_failed_psf`` is set, epochs whose PSF fit carries
    nonzero flags are dropped before the object stage; an object with
    no surviving epochs raises BootPSFFailure. Side effect: the psf
    runner stores ``meta['result']`` (and a gmix on success) on each
    psf observation. Parity: ngmix/bootstrap.py:67-102.
    """
    if psf_runner is not None:
        psf_runner.go(obs=obs)
        if ignore_failed_psf:
            obs = remove_failed_psf_obs(obs=obs)
    return runner.go(obs=obs)


def remove_failed_psf_obs(obs):
    """Drop epochs whose attached PSF fit failed.

    Returns a rebuilt container of the same type; raises
    BootPSFFailure if no epoch (or any whole band) survives.
    Parity: ngmix/bootstrap.py:105-154.
    """
    kept = obs_prune(obs, _psf_fit_succeeded)
    if kept is None:
        raise BootPSFFailure("no good psf fits")
    return kept


def _psf_fit_succeeded(single_obs):
    return single_obs.psf.meta["result"]["flags"] == 0


class Bootstrapper(object):
    """Bundles an object runner + psf runner into one ``go(obs=...)``.

    Parity: ngmix/bootstrap.py:24-64.
    """

    def __init__(self, runner, psf_runner=None, ignore_failed_psf=True):
        self.runner = runner
        self.psf_runner = psf_runner
        self.ignore_failed_psf = ignore_failed_psf

    @property
    def fitter(self):
        return self.runner.fitter

    def go(self, obs):
        return bootstrap(
            obs=obs,
            runner=self.runner,
            psf_runner=self.psf_runner,
            ignore_failed_psf=self.ignore_failed_psf,
        )
