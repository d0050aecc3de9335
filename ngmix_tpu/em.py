"""Expectation-maximization image decomposition.

TPU re-design of ngmix/em/em_nb.py:16-1322 and ngmix/em/em.py:23-521.
The reference runs the whole EM loop inside one numba function with
per-pixel scalar loops; here each iteration is a set of [n, npix]
broadcasts + matmul reductions, and the outer iteration is a
lax.while_loop over a state pytree. All four variants (free, fixcen,
fixcov, fluxonly) share one body parameterized by a static mode.

PSF-aware: the fitted mixture is pre-psf; each M-step subtracts the psf
moments and the mixture is re-convolved with the psf for the next
E-step (ref: em_nb.py:285-355).
"""
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .defaults import FASTEXP_MAX_CHI2, GMIX_LOW_DETVAL
from .flags import EM_MAXITER, EM_RANGE_ERROR
from .gmix import core as gcore
from .gmix.gmix import GMix, GMixModel
from .observation import Observation
from .util import match_vma

logger = logging.getLogger(__name__)

DEFAULT_TOL = 1.0e-5
DEFAULT_MINITER = 40
DEFAULT_MAXITER = 500

_MODES = ("free", "fixcen", "fixcov", "fluxonly")


class EMConf:
    """static EM configuration (hashable for jit)"""

    def __init__(self, mode="free", miniter=DEFAULT_MINITER,
                 maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL, vary_sky=False,
                 fill_zero_weight=False):
        assert mode in _MODES
        self.mode = mode
        self.miniter = int(miniter)
        self.maxiter = int(maxiter)
        self.tol = float(tol)
        self.vary_sky = bool(vary_sky)
        self.fill_zero_weight = bool(fill_zero_weight)

    def _key(self):
        return (self.mode, self.miniter, self.maxiter, self.tol,
                self.vary_sky, self.fill_zero_weight)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, EMConf) and self._key() == other._key()


def _conv_and_norms(gmix, gmix_psf):
    """convolved mixture + eval quantities; returns
    (gmix_conv, dcc, drr, drc, pnorm, logtau, logdet)"""
    gmix_conv = gcore.gmix_convolve(gmix, gmix_psf)
    det = gcore.gmix_det(gmix_conv)
    det_safe = jnp.where(det > 0, det, 1.0)
    idet = 1.0 / det_safe
    drr = gmix_conv[..., gcore.G_IRR] * idet
    drc = gmix_conv[..., gcore.G_IRC] * idet
    dcc = gmix_conv[..., gcore.G_ICC] * idet
    p = gmix_conv[..., gcore.G_P]
    pnorm = jnp.where(det > 0, p / (2 * np.pi * jnp.sqrt(det_safe)), 0.0)
    logtau = jnp.log(jnp.where(p > 0, p, 1.0))
    logdet = jnp.log(det_safe)
    return gmix_conv, dcc, drr, drc, pnorm, logtau, logdet


def _psf_moms(gmix_psf):
    """total (irr, irc, icc) of the psf about its center
    (ref: em_nb.py gmix_get_moms)"""
    row, col, psum = gcore.gmix_get_cen(gmix_psf)
    p = gmix_psf[..., gcore.G_P]
    rd = gmix_psf[..., gcore.G_ROW] - row[..., None]
    cd = gmix_psf[..., gcore.G_COL] - col[..., None]
    psum_safe = jnp.where(psum == 0, 1.0, psum)
    irr = jnp.sum(p * (gmix_psf[..., gcore.G_IRR] + rd * rd), axis=-1) / psum_safe
    irc = jnp.sum(p * (gmix_psf[..., gcore.G_IRC] + rd * cd), axis=-1) / psum_safe
    icc = jnp.sum(p * (gmix_psf[..., gcore.G_ICC] + cd * cd), axis=-1) / psum_safe
    return irr, irc, icc


def em_single(pixels, gmix0, gmix_psf, sky, conf: EMConf):
    """run EM for one stamp.

    pixels: Pixels [npix]; gmix0 [n, 6] pre-psf guess; gmix_psf [m, 6];
    sky: scalar sky level (the image must be non-negative after adding
    it — see prep_obs). Returns dict with gmix (pre-psf), gmix_conv,
    numiter, fdiff, sky, flags.
    """
    # materialize loop-invariant inputs so the compiler cannot fuse
    # their producers into the while_loop body (see admom_single)
    pixels, gmix0, gmix_psf = jax.lax.optimization_barrier(
        (pixels, gmix0, gmix_psf)
    )
    dtype = pixels.val.dtype
    n = gmix0.shape[-2]
    m = gmix_psf.shape[-2]

    mask = pixels.ierr > 0
    if conf.fill_zero_weight:
        include = jnp.ones_like(mask)
    else:
        include = mask
    finclude = include.astype(dtype)
    npix_f = jnp.sum(finclude)

    psf_irr, psf_irc, psf_icc = _psf_moms(gmix_psf)

    state = {
        "gmix": gmix0.astype(dtype),
        "sky": jnp.asarray(sky, dtype),
        "elogL_last": jnp.asarray(-9999.9e9, dtype),
        "fdiff": jnp.asarray(jnp.inf, dtype),
        "numiter": jnp.int32(0),
        "flags": jnp.int32(0),
        "done": jnp.asarray(False),
    }
    # carries initialized from constants must match the body's
    # varying-across-mesh types under shard_map (no-op otherwise)
    state = jax.tree.map(lambda v: match_vma(v, pixels.val), state)

    def cond(s):
        return (~s["done"]) & (s["numiter"] < conf.maxiter)

    def body(s):
        gmix = s["gmix"]
        sky_ = s["sky"]

        gmix_conv, dcc, drr, drc, pnorm, logtau, logdet = _conv_and_norms(
            gmix, gmix_psf
        )

        # per conv-gaussian evaluation [n*m, npix]; hard chi2 cut
        # (the reference EM uses the truncated kernel without the
        # apodization window, em_nb.py:224-227)
        vd = pixels.v[None, :] - gmix_conv[:, gcore.G_ROW, None]
        ud = pixels.u[None, :] - gmix_conv[:, gcore.G_COL, None]
        v2 = vd * vd
        u2 = ud * ud
        uv = vd * ud
        chi2 = dcc[:, None] * v2 + drr[:, None] * u2 - 2.0 * drc[:, None] * uv
        inrange = (chi2 < FASTEXP_MAX_CHI2) & (chi2 >= 0.0)
        gval = jnp.where(
            inrange,
            pnorm[:, None]
            * jnp.exp(-0.5 * jnp.clip(chi2, 0.0, FASTEXP_MAX_CHI2))
            * pixels.area,
            0.0,
        )

        # model-fill zero weight pixels (ref: em_nb.py:1298-1316)
        if conf.fill_zero_weight:
            model = jnp.sum(gval, axis=0)
            val = jnp.where(mask, pixels.val, sky_ + model)
        else:
            val = pixels.val

        # group psf components per object gaussian
        gval_g = gval.reshape(n, m, -1)
        gi = jnp.sum(gval_g, axis=1) * finclude  # [n, npix]
        gsum = jnp.sum(gi, axis=0)  # [npix]
        gtot = gsum + sky_
        bad_gtot = jnp.any(include & (gtot == 0.0))
        gtot_safe = jnp.where(gtot == 0.0, 1.0, gtot)

        # E-step log likelihood (ref: em_nb.py:239-246)
        logterm = logtau - 0.5 * logdet
        per_px_L = jnp.sum(
            gval * (logterm[:, None] - 0.5 * chi2) * inrange, axis=0
        )
        gsum_safe = jnp.where(gsum == 0.0, 1.0, gsum)
        elogL = jnp.sum(
            jnp.where(gsum == 0.0, 0.0, per_px_L / gsum_safe) * finclude
        )

        factor = val / gtot_safe * finclude  # [npix]

        pnew = gi @ factor  # [n]
        p_safe = jnp.where(pnew == 0, 1.0, pnew)
        pinv = 1.0 / p_safe

        if conf.mode in ("free", "fixcov"):
            vsum = gi @ (pixels.v * factor)
            usum = gi @ (pixels.u * factor)
            newv = vsum * pinv
            newu = usum * pinv
        else:
            newv = gmix[:, gcore.G_ROW]
            newu = gmix[:, gcore.G_COL]

        if conf.mode in ("free", "fixcen"):
            tv2 = jnp.sum(v2.reshape(n, m, -1) * gval_g, axis=1)
            tuv = jnp.sum(uv.reshape(n, m, -1) * gval_g, axis=1)
            tu2 = jnp.sum(u2.reshape(n, m, -1) * gval_g, axis=1)
            irr = (tv2 * finclude) @ factor * pinv - psf_irr
            irc = (tuv * finclude) @ factor * pinv - psf_irc
            icc = (tu2 * finclude) @ factor * pinv - psf_icc

            # force positive sizes (ref: em_nb.py:333-341)
            minval = 1.0e-4
            neg = (irr < 0.0) | (icc < 0.0)
            irr = jnp.where(neg, minval, irr)
            irc = jnp.where(neg, 0.0, irc)
            icc = jnp.where(neg, minval, icc)
            det = irr * icc - irc**2
            low = det < GMIX_LOW_DETVAL
            Thalf = 0.5 * (irr + icc)
            irr = jnp.where(low, Thalf, irr)
            icc = jnp.where(low, Thalf, icc)
            irc = jnp.where(low, 0.0, irc)
        else:
            irr = gmix[:, gcore.G_IRR]
            irc = gmix[:, gcore.G_IRC]
            icc = gmix[:, gcore.G_ICC]

        new_gmix = jnp.stack([pnew, newv, newu, irr, irc, icc], axis=-1)

        if conf.vary_sky:
            skysum = jnp.sum(sky_ * val / gtot_safe * finclude)
            new_sky = skysum / jnp.where(npix_f == 0, 1.0, npix_f)
        else:
            new_sky = sky_

        numiter = s["numiter"] + 1

        if conf.mode == "fluxonly":
            # convergence on total flux (ref: em_nb.py:1089-1097)
            stat = jnp.sum(pnew)
            last = s["elogL_last"]
            fdiff = jnp.abs(stat / jnp.where(last == 0, 1.0, last) - 1.0)
            bad_stat = jnp.asarray(False)
        else:
            stat = elogL
            bad_stat = (numiter >= conf.miniter) & (elogL == 0.0)
            elogL_safe = jnp.where(elogL == 0.0, 1.0, elogL)
            fdiff = jnp.abs((elogL - s["elogL_last"]) / elogL_safe)

        converged = (numiter >= conf.miniter) & (fdiff < conf.tol)
        flags = jnp.where(
            bad_gtot | bad_stat, jnp.int32(EM_RANGE_ERROR), jnp.int32(0)
        )

        return {
            "gmix": new_gmix,
            "sky": new_sky,
            "elogL_last": stat,
            "fdiff": fdiff,
            "numiter": numiter,
            "flags": s["flags"] | flags,
            "done": converged | (flags != 0),
        }

    out = jax.lax.while_loop(cond, body, state)

    flags = out["flags"]
    flags = flags | jnp.where(
        (out["numiter"] >= conf.maxiter), jnp.int32(EM_MAXITER), jnp.int32(0)
    )
    gmix_conv = gcore.gmix_convolve(out["gmix"], gmix_psf)
    return {
        "gmix": out["gmix"],
        "gmix_conv": gmix_conv,
        "numiter": out["numiter"],
        "fdiff": out["fdiff"],
        "sky": out["sky"],
        "flags": flags,
    }


@partial(jax.jit, static_argnames=("conf",))
def em_fit(pixels, gmix0, gmix_psf, sky, conf: EMConf):
    return em_single(pixels, gmix0, gmix_psf, sky, conf)


@partial(jax.jit, static_argnames=("conf",))
def em_batch(pixels, gmix0, gmix_psf, sky, conf: EMConf):
    """vmapped EM over a [B] batch of stamps"""
    return jax.vmap(lambda p, g, gp, s: em_single(p, g, gp, s, conf))(
        pixels, gmix0, gmix_psf, sky
    )


# ----------------------------------------------------------------------
# host API

def prep_image(im0):
    """shift the sky so no pixel is below 0.001 * range
    (ref: ngmix/em/em.py:96-120)"""
    im = im0.copy()
    im_min = im.min()
    im_max = im.max()
    desired_minval = 0.001 * (im_max - im_min)
    sky = desired_minval - im_min
    im += sky
    return im, sky


def prep_obs(obs):
    """prep an observation for EM (ref: ngmix/em/em.py:74-94)"""
    imsky, sky = prep_image(obs.image)
    newobs = obs.copy()
    with newobs.writeable():
        newobs.image[:, :] = imsky
    return newobs, sky


class EMResult(dict):
    """EM fit result (API parity: ngmix/em/em.py:123-198)"""

    def __init__(self, obs, result, gm=None, gm_conv=None):
        self._obs = obs
        self.update(result)
        if gm is not None and gm_conv is not None:
            self._gm = gm
            self._gm_conv = gm_conv

    def has_gmix(self):
        return hasattr(self, "_gm")

    def get_gmix(self):
        if not self.has_gmix():
            raise RuntimeError("no gmix set")
        return self._gm.copy()

    def get_convolved_gmix(self):
        if not self.has_gmix():
            raise RuntimeError("no gmix set")
        return self._gm_conv.copy()

    def make_image(self):
        gm = self.get_convolved_gmix()
        return gm.make_image(
            self._obs.image.shape, jacobian=self._obs.jacobian
        )


class EMFitter(object):
    """EM fitter (API parity: ngmix/em/em.py:200-341)"""

    mode = "free"

    def __init__(self, miniter=DEFAULT_MINITER, maxiter=DEFAULT_MAXITER,
                 tol=DEFAULT_TOL, vary_sky=False):
        self.miniter = miniter
        self.maxiter = maxiter
        self.tol = tol
        self.vary_sky = vary_sky

    def go(self, obs, guess, sky=None):
        if not isinstance(obs, Observation):
            raise ValueError("input obs must be an instance of Observation")

        if sky is None:
            obs_sky, sky = prep_obs(obs)
        else:
            obs_sky = obs

        if not obs_sky.has_psf() or not obs_sky.psf.has_gmix():
            logger.debug("NO PSF SET")
            gmix_psf = GMixModel([0.0, 0.0, 0.0, 0.0, 0.0, 1.0], "gauss")
        else:
            gmix_psf = obs_sky.psf.gmix
            gmix_psf.set_flux(1.0)

        pixels = obs_sky.pixels
        fill_zero_weight = bool(np.any(np.asarray(pixels.ierr) <= 0.0))

        conf = EMConf(
            mode=self.mode, miniter=self.miniter, maxiter=self.maxiter,
            tol=self.tol, vary_sky=self.vary_sky,
            fill_zero_weight=fill_zero_weight,
        )

        out = em_fit(
            pixels,
            guess.to_device(),
            gmix_psf.to_device(),
            sky,
            conf,
        )

        flags = int(out["flags"])
        if flags & EM_RANGE_ERROR:
            result = {
                "flags": EM_RANGE_ERROR,
                "message": "gtot == 0 or elogL == 0",
            }
            gm = gm_conv = None
        else:
            gm = GMix(pars=np.asarray(out["gmix"]).ravel())
            gm_conv = GMix(pars=np.asarray(out["gmix_conv"]).ravel())
            result = {
                "flags": flags,
                "numiter": int(out["numiter"]),
                "fdiff": float(out["fdiff"]),
                "sky": float(out["sky"]),
                "message": "maxit" if flags & EM_MAXITER else "OK",
            }

        return EMResult(obs=obs, result=result, gm=gm, gm_conv=gm_conv)


class EMFitterFixCen(EMFitter):
    mode = "fixcen"


class EMFitterFixCov(EMFitter):
    mode = "fixcov"


class EMFitterFluxOnly(EMFitter):
    mode = "fluxonly"

    def __init__(self, miniter=20, maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL,
                 vary_sky=False):
        super().__init__(
            miniter=miniter, maxiter=maxiter, tol=tol, vary_sky=vary_sky
        )


def run_em(obs, guess, sky=None, fixcen=False, fixcov=False, fluxonly=False,
           **kws):
    """fit the observation with EM (ref: ngmix/em/em.py:23-67)"""
    if fixcen:
        fitter = EMFitterFixCen(**kws)
    elif fixcov:
        fitter = EMFitterFixCov(**kws)
    elif fluxonly:
        fitter = EMFitterFluxOnly(**kws)
    else:
        fitter = EMFitter(**kws)
    return fitter.go(obs=obs, guess=guess, sky=sky)


# backwards-compat alias (ref: em.py:70-71)
fit_em = run_em


# reference package-layout alias (ngmix.em.em)
import sys as _sys

em = _sys.modules[__name__]
em_nb = em
