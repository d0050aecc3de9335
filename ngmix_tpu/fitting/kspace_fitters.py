"""k-space ML fitting of analytic profiles (the reference's "galsim
fitters"), galsim-free.

TPU re-design of ngmix/fitting/galsim_fitters.py:19-156 and
galsim_results.py:13-677. The reference builds models by galsim
_drawKImage; here the model k-images are closed-form expressions
evaluated directly on the k grid:

- gauss:   exp(-sigma^2 k^2 / 2)
- exp:     (1 + (k r0)^2)^(-3/2)            (exact exponential-disk FT)
- dev:     the 10-gaussian dev expansion in k (the package's dev
           definition; the reference uses galsim's numeric Sersic-4)
- spergel: (1 + (k r_c)^2)^(-(1+nu))        (exact, Spergel 2010)
- moffat:  2 (k rd / 2)^(b-1) K_{b-1}(k rd) / Gamma(b-1)
           via a precomputed (beta, log k) Bessel table

Shear enters as evaluation at |S^T k| and centroids as phase factors,
so a model evaluation involves no FFTs at all. Residuals are the
real+imag parts scaled by sqrt(weight) (k_space dof convention).
"""
import logging
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..defaults import DEFAULT_LM_PARS
from ..gexceptions import GMixRangeError
from ..gmix import tables as gtables
from ..kobs import KMultiBandObsList, KObsList, KObservation, get_kmb_obs, make_kobs
from .fit_model import FDIFF_BAD, PSFFluxFitModel
from .lm import LMConf, get_def_stuff, run_lm_jit

logger = logging.getLogger(__name__)

__all__ = [
    "GalsimFitter",
    "GalsimSpergelFitter",
    "GalsimMoffatFitter",
    "GalsimPSFFluxFitter",
    "KSpaceFitter",
]


# ----------------------------------------------------------------------
# size conversions and host-precomputed tables

R50_TO_SIGMA_GAUSS = 1.0 / (2.0 * np.sqrt(2.0 * np.log(2.0)) / 2.0)
R50_TO_R0_EXP = 1.0 / 1.6783469900166605


def _dev_r50_factor():
    """r50 / sqrt(T) for the 10-gaussian dev expansion, from the
    analytic enclosed flux of the mixture (computed once)"""
    p = gtables.PVALS_DEV
    f = gtables.FVALS_DEV

    def enclosed(r, T):
        sig2 = T * f / 2.0
        return np.sum(p * (1 - np.exp(-0.5 * r * r / sig2)))

    lo, hi = 1e-4, 50.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if enclosed(mid, 1.0) < 0.5:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


_DEV_R50_FAC = _dev_r50_factor()


def _spergel_cnu_table():
    """c_nu = r50 / r_c for the Spergel profile: the enclosed flux has
    the closed form F(x) = 1 - x^(nu+1) K_{nu+1}(x) / (2^nu Gamma(nu+1))
    (Spergel 2010); solve F(c) = 0.5 over a nu grid."""
    from scipy.optimize import brentq
    from scipy.special import gamma, kv

    nus = np.linspace(-0.85, 4.0, 120)
    cs = np.zeros_like(nus)
    for i, nu in enumerate(nus):
        norm = 2**nu * gamma(nu + 1)

        def func(x):
            return 1.0 - x ** (nu + 1) * kv(nu + 1, x) / norm - 0.5

        cs[i] = brentq(func, 1e-4, 50.0)
    return nus, cs


_SPERGEL_NUS, _SPERGEL_CS = _spergel_cnu_table()


def _moffat_ktable():
    """g_beta(x) = 2 (x/2)^(beta-1) K_{beta-1}(x) / Gamma(beta-1),
    the unit-flux Moffat k profile, tabulated over (beta, log x)"""
    from scipy.special import gamma, kv

    betas = np.linspace(1.05, 10.0, 180)
    logx = np.linspace(np.log(1e-4), np.log(300.0), 1500)
    x = np.exp(logx)
    tab = np.zeros((betas.size, x.size))
    for i, b in enumerate(betas):
        nu = b - 1.0
        tab[i] = 2.0 * (x / 2.0) ** nu * kv(nu, x) / gamma(nu)
    tab = np.nan_to_num(tab, nan=0.0)
    return betas, logx, tab


_MOFFAT_BETAS, _MOFFAT_LOGX, _MOFFAT_TAB = _moffat_ktable()


def _moffat_kprofile(x, beta):
    """bilinear interpolation of the Moffat k table; x -> 1 at 0,
    -> 0 beyond the table"""
    betas = jnp.asarray(_MOFFAT_BETAS)
    logxg = jnp.asarray(_MOFFAT_LOGX)
    tab = jnp.asarray(_MOFFAT_TAB)

    bi = jnp.clip(
        jnp.searchsorted(betas, beta) - 1, 0, betas.size - 2
    )
    bw = (beta - betas[bi]) / (betas[bi + 1] - betas[bi])

    lx = jnp.log(jnp.clip(x, 1e-30, None))
    xi = jnp.clip(jnp.searchsorted(logxg, lx) - 1, 0, logxg.size - 2)
    xw = (lx - logxg[xi]) / (logxg[xi + 1] - logxg[xi])

    v00 = tab[bi, xi]
    v01 = tab[bi, xi + 1]
    v10 = tab[bi + 1, xi]
    v11 = tab[bi + 1, xi + 1]
    val = (
        v00 * (1 - bw) * (1 - xw)
        + v01 * (1 - bw) * xw
        + v10 * bw * (1 - xw)
        + v11 * bw * xw
    )
    val = jnp.where(lx < logxg[0], 1.0, val)
    val = jnp.where(lx > logxg[-1], 0.0, val)
    return val


# ----------------------------------------------------------------------
# model k-image evaluation

class KFitData(NamedTuple):
    kimage: jnp.ndarray  # [nepoch, N, N] complex, fftshifted
    ierr: jnp.ndarray  # [nepoch, N, N]
    psf_kimage: Optional[jnp.ndarray]  # [nepoch, N, N] complex or None
    band: jnp.ndarray  # [nepoch]
    kv: jnp.ndarray  # [N, N] sky-frame k (row-like)
    ku: jnp.ndarray  # [N, N] sky-frame k (col-like)


def _round_kprofile(model, ksq, size, extra):
    """unit-flux round profile at |k|^2; ``size`` is r50 except for
    moffat size_type='fwhm'. Returns (profile, bad_flag)."""
    bad = size < 1.0e-4
    size = jnp.where(bad, 1.0, size)
    if model == "gauss":
        sigma = size * R50_TO_SIGMA_GAUSS
        return jnp.exp(-0.5 * sigma**2 * ksq), bad
    elif model == "exp":
        r0 = size * R50_TO_R0_EXP
        return (1.0 + ksq * r0 * r0) ** (-1.5), bad
    elif model == "dev":
        T = (size / _DEV_R50_FAC) ** 2
        p = jnp.asarray(gtables.PVALS_DEV)
        f = jnp.asarray(gtables.FVALS_DEV)
        sig2 = T * f / 2.0
        return (
            jnp.sum(
                p * jnp.exp(-0.5 * sig2 * ksq[..., None]), axis=-1
            ),
            bad,
        )
    elif model == "spergel":
        nu = extra
        bad = bad | (nu < _SPERGEL_NUS[0]) | (nu > _SPERGEL_NUS[-1])
        nu_s = jnp.clip(nu, _SPERGEL_NUS[0], _SPERGEL_NUS[-1])
        cnu = jnp.interp(
            nu_s, jnp.asarray(_SPERGEL_NUS), jnp.asarray(_SPERGEL_CS)
        )
        rc = size / cnu
        return (1.0 + ksq * rc * rc) ** (-(1.0 + nu_s)), bad
    elif model == "moffat":
        beta = extra
        bad = bad | (beta < _MOFFAT_BETAS[0]) | (beta > _MOFFAT_BETAS[-1])
        beta_s = jnp.clip(beta, _MOFFAT_BETAS[0], _MOFFAT_BETAS[-1])
        return _moffat_kprofile(jnp.sqrt(ksq) * size, beta_s), bad
    raise ValueError("bad kspace model %s" % model)


def _moffat_rd(size, beta, size_type):
    """convert the size parameter to the Moffat scale radius rd"""
    beta_s = jnp.clip(beta, 1.0 + 1e-3, None)
    if size_type in ("r50", "half_light_radius", "hlr"):
        return size / jnp.sqrt(2.0 ** (1.0 / (beta_s - 1.0)) - 1.0)
    elif size_type == "fwhm":
        return size / (2.0 * jnp.sqrt(2.0 ** (1.0 / beta_s) - 1.0))
    raise ValueError("bad size_type %s" % size_type)


def make_kspace_model_fn(model, size_type="r50"):
    """(band_pars, kv, ku) -> (kmodel complex, bad flag)"""

    def model_fn(band_pars, kv, ku):
        c1 = band_pars[0]  # x/u shift (galsim shift convention)
        c2 = band_pars[1]  # y/v shift
        g1 = band_pars[2]
        g2 = band_pars[3]
        size = band_pars[4]
        if model in ("spergel", "moffat"):
            extra = band_pars[5]
            flux = band_pars[6]
        else:
            extra = None
            flux = band_pars[5]

        gsq = g1 * g1 + g2 * g2
        bad_g = gsq >= 1.0
        g1s = jnp.where(bad_g, 0.0, g1)
        g2s = jnp.where(bad_g, 0.0, g2)

        # sheared profile: evaluate at S^T k ((v,u) ordering)
        gsq_s = g1s * g1s + g2s * g2s
        fac = 1.0 / jnp.sqrt(1.0 - gsq_s)
        s00 = (1.0 - g1s) * fac
        s01 = g2s * fac
        s11 = (1.0 + g1s) * fac
        kv_s = s00 * kv + s01 * ku
        ku_s = s01 * kv + s11 * ku
        ksq = kv_s * kv_s + ku_s * ku_s

        if model == "moffat":
            rd = _moffat_rd(size, extra, size_type)
            prof, bad_p = _round_kprofile(model, ksq, rd, extra)
        else:
            prof, bad_p = _round_kprofile(model, ksq, size, extra)

        phase = jnp.exp(-1j * (ku * c1 + kv * c2))
        return flux * prof * phase, bad_g | bad_p

    return model_fn


def make_kspace_fdiff_fn(model, size_type="r50", prior=None):
    """residual function for run_lm with k_space=True: per epoch the
    real and imaginary residuals scaled by ierr"""
    model_fn = make_kspace_model_fn(model, size_type=size_type)
    if model in ("spergel", "moffat"):
        nhead = 6
    else:
        nhead = 5

    def fdiff_fn(pars, data: KFitData):
        def get_band_pars(band):
            flux = jnp.take(pars, nhead + band)
            return jnp.concatenate([pars[:nhead], flux[None]])

        def epoch_model(band):
            bp = get_band_pars(band)
            return model_fn(bp, data.kv, data.ku)

        kmodels, bad = jax.vmap(epoch_model)(data.band)
        if data.psf_kimage is not None:
            kmodels = kmodels * data.psf_kimage

        diff = (kmodels - data.kimage) * data.ierr
        rows = jnp.concatenate(
            [diff.real.reshape(-1), diff.imag.reshape(-1)]
        )
        rows = jnp.where(jnp.any(bad), FDIFF_BAD, rows)

        if prior is not None:
            prows = prior.fill_fdiff_device(pars)
            prows = jnp.where(jnp.isfinite(prows), prows, FDIFF_BAD)
            return jnp.concatenate([prows, rows])
        return rows

    return fdiff_fn


def _kgrids_sky(dims, dk):
    """fftshift-layout k grids (sky units) matching KObservation"""
    N0, N1 = dims
    idx0 = np.fft.fftshift(np.fft.fftfreq(N0) * N0)
    idx1 = np.fft.fftshift(np.fft.fftfreq(N1) * N1)
    kv = idx0[:, None] * dk + np.zeros((1, N1))
    ku = np.zeros((N0, 1)) + idx1[None, :] * dk
    return jnp.asarray(kv), jnp.asarray(ku)


def pack_kfit_data(mb_kobs):
    """stack a KMultiBandObsList into a KFitData pytree"""
    kimages, ierrs, psfs, bands = [], [], [], []
    have_psf = mb_kobs[0][0].has_psf()
    dk = None
    dims = None
    for band, kobs_list in enumerate(mb_kobs):
        for kobs in kobs_list:
            if dk is None:
                dk = kobs.scale
                dims = kobs.kimage.shape
            else:
                assert np.allclose(dk, kobs.scale), "dk must match"
                assert dims == kobs.kimage.shape, "kimage dims must match"
            kimages.append(kobs.kimage)
            ierr = np.zeros(kobs.weight.shape)
            w = kobs.weight > 0
            ierr[w] = np.sqrt(kobs.weight[w])
            ierrs.append(ierr)
            bands.append(band)
            if have_psf:
                psfs.append(kobs.psf.kimage)

    kv, ku = _kgrids_sky(dims, dk)
    return KFitData(
        kimage=jnp.asarray(np.stack(kimages)),
        ierr=jnp.asarray(np.stack(ierrs)),
        psf_kimage=jnp.asarray(np.stack(psfs)) if have_psf else None,
        band=jnp.asarray(bands, dtype=jnp.int32),
        kv=kv,
        ku=ku,
    )


# ----------------------------------------------------------------------
# fit model + fitters

def get_galsim_npars(model, nband):
    """(ref: galsim_results.py:657-677)"""
    if model in ["exp", "dev", "gauss"]:
        return 5 + nband
    elif model in ["spergel", "moffat"]:
        return 6 + nband
    else:
        raise ValueError("bad model %s" % model)


class KSpaceFitModel(dict):
    """k-space fit model/result (the reference's GalsimFitModel,
    galsim_results.py:13-361)"""

    def __init__(self, obs, model, guess, prior=None, size_type="r50"):
        self.prior = prior
        self.model = model
        self.size_type = size_type
        self["model"] = model

        self._set_kobs(obs)
        self.data = pack_kfit_data(self.mb_kobs)
        self.totpix = int(np.prod(self.data.kimage.shape))
        self._set_npars()
        self._set_n_prior_pars()
        self.fdiff_size = self.n_prior_pars + 2 * self.totpix
        self._set_bounds()
        self._check_guess(guess)
        self._fdiff_fn = make_kspace_fdiff_fn(
            model, size_type=size_type, prior=prior
        )

    def _set_kobs(self, obs_in):
        if isinstance(obs_in, (KObservation, KObsList, KMultiBandObsList)):
            kobs = get_kmb_obs(obs_in)
        else:
            kobs = make_kobs(obs_in)
        self.mb_kobs = kobs
        self.nband = len(kobs)

    def _set_npars(self):
        self.npars = get_galsim_npars(self.model, self.nband)

    def _set_n_prior_pars(self):
        if self.prior is None:
            self.n_prior_pars = 0
        elif hasattr(self.prior, "n_prior_pars"):
            self.n_prior_pars = self.prior.n_prior_pars
        elif self.model in ("spergel", "moffat"):
            self.n_prior_pars = 5 + self.nband
        else:
            self.n_prior_pars = 4 + self.nband

    def _set_bounds(self):
        self._bounds = None
        if self.prior is not None and hasattr(self.prior, "bounds"):
            self._bounds = self.prior.bounds

    @property
    def bounds(self):
        import copy

        return copy.deepcopy(self._bounds)

    def _check_guess(self, guess):
        guess = np.asarray(guess, dtype="f8")
        if guess.size != self.npars:
            raise ValueError(
                "expected %d entries in the guess, but got %d"
                % (self.npars, guess.size)
            )
        if guess[2] ** 2 + guess[3] ** 2 >= 1.0:
            raise GMixRangeError("g out of range in guess")
        if guess[4] < 1.0e-4:
            raise GMixRangeError("low r50: %g" % guess[4])

    def calc_fdiff(self, pars):
        return np.asarray(self._fdiff_fn(jnp.asarray(pars), self.data))

    def get_band_pars(self, pars, band):
        nhead = 6 if self.model in ("spergel", "moffat") else 5
        out = np.zeros(nhead + 1)
        out[:nhead] = pars[:nhead]
        out[nhead] = pars[nhead + band]
        return out

    def set_fit_result(self, result):
        self.update(result)
        if self["flags"] == 0:
            self["s2n_r"] = self.calc_s2n_r(self["pars"])
            self._set_g()
            self._set_flux()

    def _set_g(self):
        self["g"] = self["pars"][2:4].copy()
        self["g_cov"] = self["pars_cov"][2:4, 2:4].copy()
        self["g_err"] = self["pars_err"][2:4].copy()

    def _set_flux(self):
        nhead = 6 if self.model in ("spergel", "moffat") else 5
        if self.nband == 1:
            self["flux"] = self["pars"][nhead]
            self["flux_err"] = np.sqrt(self["pars_cov"][nhead, nhead])
        else:
            self["flux"] = self["pars"][nhead:]
            self["flux_cov"] = self["pars_cov"][nhead:, nhead:]
            self["flux_err"] = np.sqrt(np.diag(self["flux_cov"]))

    def calc_s2n_r(self, pars):
        """round-model s2n (ref: galsim_results.py:322-361)"""
        model_fn = make_kspace_model_fn(self.model, self.size_type)
        s2n_sum = 0.0
        data = self.data
        for band in range(self.nband):
            bp = self.get_band_pars(pars, band)
            bp = bp.copy()
            bp[2:4] = 0.0
            kmodel, _ = model_fn(jnp.asarray(bp), data.kv, data.ku)
            sel = np.asarray(data.band) == band
            for i in np.where(sel)[0]:
                km = np.asarray(kmodel)
                if data.psf_kimage is not None:
                    km = km * np.asarray(data.psf_kimage[i])
                w = np.asarray(data.ierr[i]) ** 2
                s2n_sum += np.sum((km.real**2 + km.imag**2) * w)
        return np.sqrt(s2n_sum) if s2n_sum > 0 else 0.0


class KSpaceFitter(object):
    """LM fitter over k-space models (the reference's GalsimFitter)"""

    def __init__(self, model, prior=None, fit_pars=None, size_type="r50"):
        self.prior = prior
        self.model = model
        self.size_type = size_type
        if fit_pars is not None:
            self.fit_pars = dict(fit_pars)
        else:
            self.fit_pars = dict(DEFAULT_LM_PARS)

    def go(self, obs, guess):
        guess = np.asarray(guess, dtype="f8")
        fit_model = self._make_fit_model(obs=obs, guess=guess)

        conf = LMConf(
            maxfev=int(self.fit_pars.get("maxfev", 4000)),
            ftol=float(self.fit_pars.get("ftol", 1.0e-5)),
            xtol=float(self.fit_pars.get("xtol", 1.0e-5)),
        )
        npars = fit_model.npars
        lo = np.full(npars, -np.inf)
        hi = np.full(npars, np.inf)
        if fit_model.bounds is not None:
            for i, b in enumerate(fit_model.bounds):
                if b[0] is not None:
                    lo[i] = b[0]
                if b[1] is not None:
                    hi[i] = b[1]

        out = run_lm_jit(
            fit_model._fdiff_fn,
            fit_model.data,
            jnp.asarray(guess),
            jnp.asarray(lo),
            jnp.asarray(hi),
            conf,
            n_prior_pars=fit_model.n_prior_pars,
            k_space=True,
        )
        result = {
            "flags": int(out["flags"]),
            "nfev": int(out["nfev"]),
            "ier": int(out["ier"]),
            "errmsg": "",
            "pars": np.asarray(out["pars"]),
            "pars_err": np.asarray(out["pars_err"]),
            "pars_cov0": np.asarray(out["pars_cov0"]),
            "pars_cov": np.asarray(out["pars_cov"]),
        }
        if result["flags"] != 0:
            pars, pcov, perr = get_def_stuff(npars)
            if not np.all(np.isfinite(result["pars"])):
                result["pars"] = pars
            result["pars_cov"] = pcov
            result["pars_err"] = perr

        fit_model.set_fit_result(result)
        return fit_model

    def _make_fit_model(self, obs, guess):
        return KSpaceFitModel(
            obs=obs, model=self.model, guess=guess, prior=self.prior,
            size_type=self.size_type,
        )


class KSpaceSpergelFitter(KSpaceFitter):
    def __init__(self, prior=None, fit_pars=None):
        super().__init__(model="spergel", prior=prior, fit_pars=fit_pars)


class KSpaceMoffatFitter(KSpaceFitter):
    def __init__(self, prior=None, size_type="r50", fit_pars=None):
        super().__init__(
            model="moffat", prior=prior, fit_pars=fit_pars,
            size_type=size_type,
        )


class _TemplateFluxFitModel(PSFFluxFitModel):
    """template flux against precomputed (model x psf) template images.

    Shares the two-pass cross-correlation of PSFFluxFitModel but takes
    the templates directly (the analytic-model path of the reference's
    GalsimPSFFitModel, galsim_results.py:508-654).
    """

    def __init__(self, obs, templates):
        from ..observation import Observation, ObsList

        self.do_psf = False
        self.normalize_psf = True
        self["model"] = "template"
        self.npars = 1
        if isinstance(obs, Observation):
            obs_list = ObsList()
            obs_list.append(obs)
        else:
            obs_list = obs
        self.obs = obs_list
        self._mode = "image"
        self._templates = [
            np.asarray(t) / np.asarray(t).sum() for t in templates
        ]
        self._norms = [1.0] * len(self._templates)
        self.totpix = sum(o.pixels.val.shape[-1] for o in self.obs)


class KSpacePSFFluxFitter(object):
    """psf/template flux via cross correlation (the reference's
    GalsimPSFFluxFitter, galsim_fitters.py:123-156).

    model=None measures a psf flux against the psf image itself. An
    analytic template is requested with a spec dict, e.g.
    {"model": "exp", "r50": 0.5} (optional g1/g2, nu for spergel,
    beta + fwhm for moffat): the template image is built on-device as
    ifft(model_khat(k_sky) * psfhat), replacing the reference's galsim
    Convolve(model, InterpolatedImage(psf)).drawImage.
    """

    def __init__(self, model=None, draw_method="auto", interp="lanczos15",
                 pad_factor=4):
        del draw_method, interp  # galsim knobs; the k ops are exact
        if model is not None and not (
            isinstance(model, dict) and "model" in model
        ):
            raise ValueError(
                "model must be None or a spec dict like "
                "{'model': 'exp', 'r50': 0.5}"
            )
        self.model = model
        self.pad_factor = pad_factor

    def go(self, obs):
        from ..observation import Observation, ObsList

        if isinstance(obs, Observation):
            obs_list = ObsList()
            obs_list.append(obs)
        else:
            obs_list = obs
        templates = [self._make_template(o) for o in obs_list]
        fit_model = _TemplateFluxFitModel(
            obs=obs_list, templates=templates
        )
        fit_model.go()
        return fit_model

    def _make_template(self, obs):
        """unit-flux model convolved with the epoch's pixelized psf
        (model=None: the psf itself), rendered at the observation's
        jacobian center on the observation grid"""
        from ..metacal import kops

        spec = self.model
        name = None if spec is None else spec["model"]
        if name is None:
            band_pars = None
            model_fn = None
            size_type = None
        elif name == "moffat":
            size_type = "fwhm" if "fwhm" in spec else "r50"
            size = spec.get("fwhm", spec.get("r50"))
            band_pars = jnp.asarray([
                0.0, 0.0, spec.get("g1", 0.0), spec.get("g2", 0.0),
                size, spec["beta"], 1.0,
            ])
        elif name == "spergel":
            size_type = "r50"
            band_pars = jnp.asarray([
                0.0, 0.0, spec.get("g1", 0.0), spec.get("g2", 0.0),
                spec["r50"], spec["nu"], 1.0,
            ])
        else:
            size_type = "r50"
            band_pars = jnp.asarray([
                0.0, 0.0, spec.get("g1", 0.0), spec.get("g2", 0.0),
                spec["r50"], 1.0,
            ])
        if name is not None:
            model_fn = make_kspace_model_fn(name, size_type=size_type)

        psf_obs = obs.psf
        psf_im = psf_obs.image / psf_obs.image.sum()
        H, W = obs.image.shape
        Hp, Wp = psf_im.shape
        N = kops.good_fft_size(self.pad_factor * max(H, W, Hp, Wp))
        psfhat = kops.centered_fft(
            jnp.asarray(psf_im), jnp.asarray(psf_obs.jacobian.get_cen()), N
        )
        if model_fn is None:
            khat = psfhat
        else:
            kv, ku = kops.sky_kvu(N, obs.jacobian)
            khat_model, bad = model_fn(band_pars, kv, ku)
            if bool(bad):
                raise GMixRangeError("bad template model parameters")
            khat = khat_model * psfhat
        template = kops.centered_ifft(
            khat, jnp.asarray(obs.jacobian.get_cen()), (H, W),
        )
        return np.asarray(template)


# reference-compatible names
GalsimFitter = KSpaceFitter
GalsimSpergelFitter = KSpaceSpergelFitter
GalsimMoffatFitter = KSpaceMoffatFitter
GalsimPSFFluxFitter = KSpacePSFFluxFitter
GalsimFitModel = KSpaceFitModel
