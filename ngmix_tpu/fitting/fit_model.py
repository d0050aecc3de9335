"""Fit objective (fdiff) construction and the FitModel result class.

TPU re-design of ngmix/fitting/results.py:13-1109. The reference keeps
per-band-epoch python lists of mixture buffers refilled per LM step;
here all epochs are stacked into one device pytree (FitData) and the
whole residual vector is produced by a single traced function - the
jacobian of which (jacfwd) replaces the analytic derivs_nb kernel.
"""
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .. import gmix as _gmix_pkg
from ..defaults import BIGVAL, CDEF, LOWVAL, PDEF
from ..flags import BAD_VAR, DIV_ZERO, ZERO_DOF
from ..gexceptions import GMixRangeError
from ..gmix import core as gcore
from ..gmix.gmix import get_model_name, get_model_npars, get_model_num, make_gmix_model
from ..observation import Observation, ObsList, get_mb_obs
from ..pixels import Pixels

# residual value used for out-of-range parameters; large but finite so
# LM rejects the step without inf arithmetic (reference uses
# LOWVAL=-inf, results.py:463-464)
FDIFF_BAD = 1.0e10

# the simple models with analytic/AD-exact derivatives shared across
# components (ref: results.py:921)
SIMPLE_ANALYTIC_MODELS = ("gauss", "exp", "dev")


class FitData(NamedTuple):
    """stacked per-epoch device data for one object's fit"""

    pixels: Pixels  # fields [nepoch, npix]
    psf_gmix: Optional[jnp.ndarray]  # [nepoch, m, 6] or None
    band: jnp.ndarray  # [nepoch] int32


_FLUX_START = {"bd": 7, "bdf": 6}


def get_band_pars_device(model, pars, band):
    """slice shared pars + per-band flux for one epoch (device).

    ref: ngmix/fitting/results.py:1013-1046.
    """
    if model == "coellip":
        return pars
    start = _FLUX_START.get(model, 5)
    flux = jnp.take(pars, start + band)
    return jnp.concatenate([pars[:start], flux[None]])


def epoch_band_pars(model, pars, band):
    """[E, band_npars] per-epoch parameter rows for the whole fit.

    The shared shape columns broadcast; each epoch's band flux comes
    from a dense one-hot contraction over the flux block rather than a
    per-epoch gather (exactly one 1.0 per row, so the selection is
    IEEE-exact) - gathers inside the jacfwd x while_loop objective are
    a poor fit for the TPU lowering, a tiny matmul is not. Same rows
    as vmapping get_band_pars_device over the epochs.
    """
    E = band.shape[0]
    if model == "coellip":
        return jnp.broadcast_to(pars, (E,) + pars.shape)
    start = _FLUX_START.get(model, 5)
    flux = pars[start:]
    onehot = (
        band[:, None] == jnp.arange(flux.shape[0], dtype=band.dtype)
    ).astype(pars.dtype)
    flux_e = onehot @ flux
    shared = jnp.broadcast_to(pars[:start], (E, start))
    return jnp.concatenate([shared, flux_e[:, None]], axis=-1)


def make_fdiff_fn(model, prior=None):
    """build the residual function (pars, FitData) -> [n_prior + totpix].

    The pixel rows are (model - data) * ierr with the apodized render
    (ref: results.py:439-466); out-of-range parameters produce constant
    FDIFF_BAD rows (zero gradient under AD, the analog of LOWVAL).
    prior is a device prior with fill_fdiff(pars) -> [n_prior_pars].
    """

    def fdiff_fn(pars, data: FitData):
        bpars = epoch_band_pars(model, pars, data.band)
        gm0, gflags = gcore.gmix_fill(model, bpars)  # [nepoch, n, 6]
        if data.psf_gmix is not None:
            gm = gcore.gmix_convolve(gm0, data.psf_gmix)
        else:
            gm = gm0

        rows = gcore.fill_fdiff(gm, data.pixels)  # [nepoch, npix]
        bad = (gflags != 0) | (gcore.gmix_flags(gm) != 0)
        rows = jnp.where(
            jnp.any(bad)[..., None, None], FDIFF_BAD, rows
        )
        pix_rows = rows.reshape(-1)

        if prior is not None:
            prows = prior.fill_fdiff_device(pars)
            prows = jnp.where(jnp.isfinite(prows), prows, FDIFF_BAD)
            return jnp.concatenate([prows, pix_rows])
        return pix_rows

    return fdiff_fn


def make_lnprob_fn(model, prior=None):
    """(pars, FitData) -> (lnprob, s2n_numer, s2n_denom, npix)"""

    def lnprob_fn(pars, data: FitData):
        bpars = epoch_band_pars(model, pars, data.band)
        gm0, gflags = gcore.gmix_fill(model, bpars)
        if data.psf_gmix is not None:
            gm = gcore.gmix_convolve(gm0, data.psf_gmix)
        else:
            gm = gm0

        loglike, s2n_numer, s2n_denom, npix = gcore.get_loglike(
            gm, data.pixels
        )
        lnprob = jnp.sum(loglike)
        s2n_numer = jnp.sum(s2n_numer)
        s2n_denom = jnp.sum(s2n_denom)
        npix = jnp.sum(npix)

        if prior is not None:
            lnprob = lnprob + prior.get_lnprob_scalar_device(pars)

        bad = jnp.any(gflags != 0)
        lnprob = jnp.where(bad, LOWVAL, lnprob)
        s2n_numer = jnp.where(bad, 0.0, s2n_numer)
        s2n_denom = jnp.where(bad, BIGVAL, s2n_denom)
        npix = jnp.where(bad, 0, npix)
        return lnprob, s2n_numer, s2n_denom, npix

    return lnprob_fn


def pack_fit_data(obs, model=None):
    """host: stack a MultiBandObsList's epochs into a FitData pytree.

    All epochs must share a stamp shape (the reference has no such
    constraint; for mixed sizes use the bucketing utilities in
    ngmix_tpu.ragged).
    """
    import jax

    mbobs = get_mb_obs(obs)
    pixels_list = []
    psf_list = []
    band_list = []
    have_psf = mbobs[0][0].has_psf_gmix()
    max_psf_ngauss = 0
    for band, obslist in enumerate(mbobs):
        for o in obslist:
            pixels_list.append(o.pixels)
            band_list.append(band)
            if have_psf:
                pg = o.psf.gmix.get_data()
                max_psf_ngauss = max(max_psf_ngauss, pg.shape[0])
                psf_list.append(pg)

    npix = {p.val.shape[-1] for p in pixels_list}
    if len(npix) != 1:
        raise ValueError(
            "all epochs must share a stamp size for a stacked fit; "
            "got pixel counts %s" % sorted(npix)
        )

    pixels = jax.tree.map(lambda *xs: jnp.stack(xs), *pixels_list)
    if have_psf:
        # pad psf mixtures to a common ngauss with zero-flux gaussians
        padded = []
        for pg in psf_list:
            if pg.shape[0] < max_psf_ngauss:
                pad = np.zeros((max_psf_ngauss - pg.shape[0], 6))
                pad[:, 3] = pad[:, 5] = 1.0  # unit covariance, p=0
                pg = np.vstack([pg, pad])
            padded.append(pg)
        psf_gmix = jnp.asarray(np.stack(padded))
    else:
        psf_gmix = None
    return FitData(
        pixels=pixels,
        psf_gmix=psf_gmix,
        band=jnp.asarray(band_list, dtype=jnp.int32),
    ), mbobs


class FitModel(dict):
    """fit-model result container (API parity: results.py:13-625)"""

    def __init__(self, obs, model, guess, prior=None):
        self.prior = prior
        self.model = get_model_num(model)
        self.model_name = get_model_name(self.model)
        self["model"] = self.model_name

        self._set_obs_and_data(obs)
        self._set_npars()
        self._set_n_prior_pars()
        self.fdiff_size = self.totpix + self.n_prior_pars
        self._set_bounds()
        self._check_guess(guess)

        self._fdiff_fn = make_fdiff_fn(self.model_name, prior=prior)
        self._lnprob_fn = make_lnprob_fn(self.model_name, prior=prior)

    def _set_obs_and_data(self, obs):
        self.data, self.obs = pack_fit_data(obs)
        self.nband = len(self.obs)
        self.nimage = int(self.data.band.shape[0])
        self.totpix = int(
            self.data.pixels.val.shape[0] * self.data.pixels.val.shape[1]
        )
        self.dopsf = self.data.psf_gmix is not None

    def _set_npars(self):
        self.npars = get_model_npars(self.model) + self.nband - 1

    def _set_n_prior_pars(self):
        if self.prior is None:
            self.n_prior_pars = 0
        elif hasattr(self.prior, "n_prior_pars"):
            # exact number of rows the prior fills; the reference
            # over-allocates one slot (results.py:377-384 vs the 4+nband
            # rows PriorSimpleSep.fill_fdiff actually fills) and pads
            # with a zero row - our stacked objective has no padding
            self.n_prior_pars = self.prior.n_prior_pars
        else:
            self.n_prior_pars = get_lm_n_prior_pars(
                model=self.model_name, nband=self.nband
            )

    def _set_bounds(self):
        self._bounds = None
        if self.prior is not None and hasattr(self.prior, "bounds"):
            self._bounds = self.prior.bounds

    def _check_guess(self, guess):
        guess = np.asarray(guess, dtype="f8")
        assert guess.size == self.npars, (
            "guess has npars=%d, expected %d" % (guess.size, self.npars)
        )
        # range check, matching the GMixRangeError on bad guesses
        g1, g2 = guess[2], guess[3]
        if self.model_name != "coellip" and g1 * g1 + g2 * g2 >= 1.0:
            raise GMixRangeError("g out of range in guess")

    @property
    def bounds(self):
        import copy

        return copy.deepcopy(self._bounds)

    # --- objective (host-callable, used by tests and mcmc) ------------
    def calc_fdiff(self, pars):
        return np.asarray(self._fdiff_fn(jnp.asarray(pars), self.data))

    def calc_lnprob(self, pars, more=False):
        out = self._lnprob_fn(jnp.asarray(pars), self.data)
        if more:
            return {
                "lnprob": float(out[0]),
                "s2n_numer": float(out[1]),
                "s2n_denom": float(out[2]),
                "npix": int(out[3]),
            }
        return float(out[0])

    # --- results ------------------------------------------------------
    def set_fit_result(self, result):
        self.update(result)
        if self["flags"] == 0:
            cres = self.calc_lnprob(self["pars"], more=True)
            self.update(cres)
            if self["s2n_denom"] > 0:
                s2n = self["s2n_numer"] / np.sqrt(self["s2n_denom"])
            else:
                s2n = 0.0
            chi2 = self["lnprob"] / (-0.5)
            dof = self["npix"] - self.npars
            self["chi2per"] = chi2 / dof if dof != 0 else 9999.0
            self["dof"] = dof
            self["s2n_w"] = s2n
            self["s2n"] = s2n
            self._set_g()
            self._set_T()
            self._set_flux()

    def _set_g(self):
        self["g"] = self["pars"][2:4].copy()
        self["g_cov"] = self["pars_cov"][2:4, 2:4].copy()
        self["g_err"] = self["pars_err"][2:4].copy()

    def _set_T(self):
        self["T"] = self["pars"][4]
        self["T_err"] = np.sqrt(self["pars_cov"][4, 4])

    def _set_flux(self):
        _set_flux(res=self, nband=self.nband)

    def get_band_pars(self, pars, band):
        return np.asarray(
            get_band_pars_device(self.model_name, jnp.asarray(pars), band)
        )

    def get_gmix(self, band=0):
        pars = self.get_band_pars(pars=self["pars"], band=band)
        return make_gmix_model(pars, self.model)

    def get_convolved_gmix(self, band=0, obsnum=0):
        gm = self.get_gmix(band)
        obs = self.obs[band][obsnum]
        if obs.has_psf_gmix():
            gm = gm.convolve(obs.psf.gmix)
        return gm

    def make_image(self, band=0, obsnum=0):
        gm = self.get_convolved_gmix(band=band, obsnum=obsnum)
        obs = self.obs[band][obsnum]
        return gm.make_image(obs.image.shape, jacobian=obs.jacobian)


class CoellipFitModel(FitModel):
    """coelliptical-gaussians fit model (ref: results.py:628-675)"""

    def __init__(self, obs, ngauss, guess, prior=None):
        self._ngauss = ngauss
        super().__init__(obs=obs, model="coellip", guess=guess, prior=prior)

    def _set_flux(self):
        pass

    def _set_npars(self):
        assert self.nband == 1, "Coellip can only fit one band"
        self.npars = 4 + 2 * self._ngauss

    def get_band_pars(self, pars, band):
        return np.asarray(pars).copy()


def _as_obs_list(obs):
    """wrap a bare Observation in a one-epoch ObsList; pass an ObsList
    through; reject anything else"""
    if isinstance(obs, ObsList):
        return obs
    if isinstance(obs, Observation):
        wrapped = ObsList()
        wrapped.append(obs)
        return wrapped
    raise ValueError(
        "PSFFluxFitModel takes an Observation or an ObsList, got %s"
        % type(obs).__name__
    )


class PSFFluxFitModel(dict):
    """template/psf flux via zero-lag cross correlation
    (ref: results.py:677-905).

    Each epoch contributes one template — a gaussian mixture rendered
    on demand, or a raw template image — held in ``self._templates``
    with a per-epoch flux norm in ``self._norms`` that converts the
    cross-correlation amplitude into a flux. The template source
    (``self._mode``: "gmix" or "image") is decided once, from the
    first epoch.
    """

    def __init__(self, obs, do_psf=True, normalize_psf=True):
        self.do_psf = do_psf
        self.normalize_psf = normalize_psf
        self["model"] = "template"
        self.npars = 1

        self.obs = _as_obs_list(obs)
        lead = self.obs[0].psf if do_psf else self.obs[0]
        if lead.has_gmix():
            self._mode = "gmix"
        elif hasattr(lead, "template"):
            self._mode = "image"
        else:
            raise ValueError(
                "PSFFluxFitModel: the %s carries neither a gmix nor a "
                "template image to correlate against"
                % ("psf observation" if do_psf else "observation")
            )
        specs = [self._make_template(o) for o in self.obs]
        self._templates = [t for t, _ in specs]
        self._norms = [n for _, n in specs]
        self.totpix = sum(o.pixels.val.shape[-1] for o in self.obs)

    def _make_template(self, obs):
        """one epoch's (template, flux norm). Templates are unit-flux
        except a psf gmix/image kept at its native flux when
        normalize_psf=False — there the norm carries that flux so the
        fitted flux stays in template units either way."""
        if self._mode == "gmix":
            gm = obs.get_psf_gmix() if self.do_psf else obs.get_gmix()
            if self.normalize_psf or not self.do_psf:
                gm.set_flux(1.0)
            return gm, gm.get_flux()
        src = obs.psf if self.do_psf else obs
        im = np.array(src.template, dtype="f8", copy=True)
        total = im.sum()
        if self.do_psf and not self.normalize_psf:
            return im, total
        return im / total, 1.0

    def _get_model(self, iobs, flux=None):
        """render epoch iobs's template; flux=None leaves it at the
        stored normalization (pass 1 of go), otherwise scale to the
        requested flux (pass 2)"""
        tmpl = self._templates[iobs]
        if self._mode == "image":
            if flux is None:
                return tmpl
            return tmpl * (self._norms[iobs] * flux / tmpl.sum())
        gm = tmpl
        if flux is not None:
            gm = gm.copy()
            gm.set_flux(flux * self._norms[iobs])
        obs = self.obs[iobs]
        return gm.make_image(obs.image.shape, jacobian=obs.jacobian)

    def go(self):
        flags = 0
        xcorr_sum = 0.0
        msq_sum = 0.0
        chi2 = 0.0
        flux = PDEF
        flux_err = CDEF

        for ipass in (1, 2):
            for iobs, obs in enumerate(self.obs):
                im = obs.image
                wt = obs.weight
                if ipass == 1:
                    model = self._get_model(iobs)
                    xcorr_sum += (model * im * wt).sum()
                    msq_sum += (model * model * wt).sum()
                else:
                    model = self._get_model(iobs, flux=flux)
                    chi2 += ((model - im) ** 2 * wt).sum()
            if ipass == 1:
                if msq_sum == 0:
                    break
                flux = xcorr_sum / msq_sum

        dof = self.get_dof()
        chi2per = 9999.0
        if dof > 0:
            chi2per = chi2 / dof
        else:
            flags |= ZERO_DOF

        if msq_sum == 0 or self.totpix == 1:
            flags |= DIV_ZERO
        else:
            arg = chi2 / msq_sum / (self.totpix - 1)
            if arg >= 0.0:
                flux_err = np.sqrt(arg)
            else:
                flags |= BAD_VAR

        self.update({
            "flags": flags,
            "chi2per": chi2per,
            "dof": dof,
            "flux": flux,
            "flux_err": flux_err,
        })

    def get_dof(self):
        npix = self.get_effective_npix()
        dof = npix - self.npars
        if dof <= 0:
            dof = 1.0e-6
        return dof

    def get_effective_npix(self):
        if not hasattr(self, "eff_npix"):
            npix = 0
            for obs in self.obs:
                npix += int((obs.weight > 0).sum())
            self.eff_npix = npix
        return self.eff_npix


def get_lm_n_prior_pars(model, nband):
    """number of fdiff slots for priors (ref: results.py:1050-1076)"""
    if model == "bd":
        return 1 + 1 + 1 + 1 + 1 + 1 + nband
    elif model == "bdf":
        return 1 + 1 + 1 + 1 + 1 + nband
    elif model in ("exp", "dev", "gauss", "turb"):
        return 1 + 1 + 1 + 1 + 1 + nband
    else:
        raise ValueError("bad model: %s" % model)


def _set_flux(res, nband):
    """set flux results (ref: results.py:1079-1109)"""
    model = res["model"]
    assert model != "coellip"
    if model == "bd":
        start = 7
    elif model == "bdf":
        start = 6
    else:
        start = 5

    if nband == 1:
        res["flux"] = res["pars"][start]
        res["flux_err"] = np.sqrt(res["pars_cov"][start, start])
    else:
        res["flux"] = res["pars"][start:]
        res["flux_cov"] = res["pars_cov"][start:, start:]
        res["flux_err"] = np.sqrt(np.diag(res["flux_cov"]))


del _gmix_pkg
