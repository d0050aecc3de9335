# flake8: noqa
from . import kops
from .bootstrap import MetacalBootstrapper, metacal_bootstrap
from .convenience import get_all_metacal
from .defaults import DEFAULT_STEP, METACAL_MINIMAL_TYPES, METACAL_TYPES
from .metacal import (
    MetacalAnalyticPSF,
    MetacalAzGaussPSF,
    MetacalDilatePSF,
    MetacalFitGaussPSF,
    MetacalGaussPSF,
)
