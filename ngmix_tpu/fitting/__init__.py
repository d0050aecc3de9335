from . import lm  # noqa: F401
from .fit_model import (  # noqa: F401
    CoellipFitModel,
    FitData,
    FitModel,
    PSFFluxFitModel,
    SIMPLE_ANALYTIC_MODELS,
    make_fdiff_fn,
    make_lnprob_fn,
    pack_fit_data,
)
from .fitters import CoellipFitter, Fitter, PSFFluxFitter  # noqa: F401
from .lm import LMConf, run_lm, run_lm_batch, run_lm_jit  # noqa: F401
from .kspace_fitters import (  # noqa: F401
    GalsimFitter,
    GalsimMoffatFitter,
    GalsimPSFFluxFitter,
    GalsimSpergelFitter,
    KSpaceFitter,
    KSpaceFitModel,
)
from . import noise_cov  # noqa: F401

# reference module-path aliases (internal layout names a migrating
# user may reach for): leastsqbound -> lm, results -> fit_model,
# galsim_fitters/galsim_results -> kspace_fitters
from . import fit_model, kspace_fitters, lm  # noqa: F401,E402

leastsqbound = lm
results = fit_model
galsim_fitters = kspace_fitters
galsim_results = kspace_fitters
