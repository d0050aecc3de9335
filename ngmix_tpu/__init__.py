"""ngmix_tpu: TPU-native gaussian-mixture galaxy fitting, moments, and
metacalibration.

A from-scratch JAX/XLA re-design with the capabilities of esheldon/ngmix
(reference under study at /root/reference). The device core is
batch-first (vmap/pjit over stamps); the host layer keeps the familiar
Observation / GMix / Fitter.go / Bootstrapper / get_all_metacal API.
"""
__version__ = "0.5.0"

from . import defaults  # noqa: F401
from . import flags  # noqa: F401
from . import gexceptions  # noqa: F401
from . import jacobian  # noqa: F401
from . import moments  # noqa: F401
from . import pixels  # noqa: F401
from . import shape  # noqa: F401
from . import util  # noqa: F401
from .util import print_pars  # noqa: F401
from .gexceptions import (  # noqa: F401
    BootGalFailure,
    BootPSFFailure,
    FFTRangeError,
    GMixFatalError,
    GMixMaxIterEM,
    GMixRangeError,
    NGmixBaseException,
    PSFFluxFailure,
)
from .jacobian import DiagonalJacobian, Jacobian, UnitJacobian  # noqa: F401
from .shape import Shape  # noqa: F401

from . import gmix  # noqa: F401
from . import observation  # noqa: F401
from .observation import (  # noqa: F401
    MultiBandObsList,
    Observation,
    ObsList,
    get_mb_obs,
)
from .gmix import (  # noqa: F401
    GMix,
    GMixCM,
    GMixCoellip,
    GMixModel,
    make_gmix_model,
)
from .gmix.gmix_lists import GMixList, MultiBandGMixList  # noqa: F401
from . import gaussap  # noqa: F401
from . import priors  # noqa: F401
from .priors import srandu  # noqa: F401
from . import joint_prior  # noqa: F401
from . import em  # noqa: F401
from . import fitting  # noqa: F401
from .em import EMFitter, run_em  # noqa: F401
from .fitting import CoellipFitter, Fitter, PSFFluxFitter  # noqa: F401
from . import admom  # noqa: F401
from . import prepsfmom  # noqa: F401
from . import ksigmamom  # noqa: F401
from .prepsfmom import KSigmaMom, PGaussMom  # noqa: F401
from . import gaussmom  # noqa: F401
from . import guessers  # noqa: F401
from . import runners  # noqa: F401
from . import bootstrap  # noqa: F401
from .bootstrap import Bootstrapper  # noqa: F401
from .runners import PSFRunner, Runner  # noqa: F401
from . import metacal  # noqa: F401
from . import gmix_ndim  # noqa: F401
from .gmix_ndim import GMixND  # noqa: F401
from . import fastexp  # noqa: F401
fastexp_nb = fastexp  # reference-name alias (ngmix/__init__.py:31)
from . import medsreaders  # noqa: F401
from . import kobs  # noqa: F401
from .kobs import (  # noqa: F401
    KMultiBandObsList,
    KObservation,
    KObsList,
    get_kmb_obs,
    make_iilist,
    make_kobs,
)
from . import ops  # noqa: F401
from . import profiling  # noqa: F401
from . import checkpoint  # noqa: F401
from . import batch  # noqa: F401
from . import containers  # noqa: F401
from . import parallel  # noqa: F401
from . import ragged  # noqa: F401
from . import simobs  # noqa: F401
from .metacal import MetacalBootstrapper  # noqa: F401
from .admom import AdmomFitter, find_cen_admom, run_admom  # noqa: F401
from .gaussmom import GaussMom  # noqa: F401
from .util import print_pars  # noqa: F401
