# flake8: noqa
from .kde import KDE
from .multivariate import CenPrior, SimpleGauss2D
from .priors import (
    Bounded1D,
    FlatPrior,
    LimitPDF,
    LMBounds,
    LogNormal,
    Normal,
    PriorBase,
    Sinh,
    TruncatedGaussian,
    TwoSidedErf,
)
from .random import make_rng, srandu
from .shape import GPriorBA, GPriorBase, GPriorGauss, ZDisk2D
