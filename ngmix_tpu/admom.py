"""Adaptive moments (admom) as a fixed-shape lax.while_loop.

TPU re-design of ngmix/admom/admom_nb.py:14-243 and
ngmix/admom/admom.py:20-591. The per-stamp iteration {recenter on the
weighted centroid; accumulate 7 weighted sums + 7x7 covariance; check
convergence; deweight} runs as a jax while_loop over a state pytree;
failures set flag bits and freeze the lane instead of breaking out.
Batch over stamps with vmap (see admom_batch).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import flags as nf
from .defaults import GMIX_LOW_DETVAL
from .gmix import core as gcore
from .gmix.gmix import GMix, GMixModel
from .observation import Observation
from .shape import e1e2_to_g1g2
from .util import match_vma
from .util import get_ratio_error

DEFAULT_MAXITER = 200
DEFAULT_SHIFTMAX = 5.0  # pixels
DEFAULT_ETOL = 1.0e-5
DEFAULT_TTOL = 1.0e-3

_NSUMS = 7


def _eval_weight(wt6, pixels):
    """apodized evaluation of the single-gaussian weight [..., npix];
    masked pixels (ierr == 0) contribute nothing"""
    w = gcore.eval_gmix(wt6[..., None, :], pixels.v, pixels.u, pixels.area)
    return w * (pixels.ierr > 0)


def _censums(wt6, pixels):
    """sums for the weighted centroid (ref: admom_nb.py:112-128)"""
    w = _eval_weight(wt6, pixels)
    wdata = w * pixels.val
    s0 = jnp.sum(wdata * pixels.v, axis=-1)
    s1 = jnp.sum(wdata * pixels.u, axis=-1)
    s5 = jnp.sum(wdata, axis=-1)
    return s0, s1, s5


def _momsums(wt6, pixels, with_cov=True):
    """7 weighted sums + 7x7 covariance (ref: admom_nb.py:132-175).

    with_cov=False skips the 7x7 covariance accumulation (49 weighted
    reductions vs 7 for the sums): the iteration loop only consumes the
    sums, so the covariance is computed ONCE after convergence at the
    stored measurement weight - identical values at a fraction of the
    per-iteration cost.
    """
    w = _eval_weight(wt6, pixels)
    vcen = wt6[..., 1]
    ucen = wt6[..., 2]
    irr, irc, icc = wt6[..., 3], wt6[..., 4], wt6[..., 5]
    det = irr * icc - irc * irc
    det_safe = jnp.where(det > 0, det, 1.0)
    dcc, drr, drc = icc / det_safe, irr / det_safe, irc / det_safe

    vmod = pixels.v - vcen[..., None]
    umod = pixels.u - ucen[..., None]
    chi2 = (
        dcc[..., None] * vmod * vmod
        + drr[..., None] * umod * umod
        - 2.0 * drc[..., None] * vmod * umod
    )
    feats = [
        pixels.v,
        pixels.u,
        umod * umod - vmod * vmod,
        2 * vmod * umod,
        umod * umod + vmod * vmod,
        jnp.ones_like(vmod),
        chi2 * chi2,
    ]
    wdata = w * pixels.val
    wsum = jnp.sum(w, axis=-1)
    if with_cov:
        mask = pixels.ierr > 0
        ierr_safe = jnp.where(mask, pixels.ierr, 1.0)
        var = 1.0 / (ierr_safe * ierr_safe)
        w2var = w * w * var
    else:
        w2var = None
    # unrolled 7-feature reductions (gcore.weighted_feature_reductions:
    # the einsum lowering was an MXU-stranding batched small GEMM)
    sums, sums_cov = gcore.weighted_feature_reductions(
        wdata, feats, cov_weight=w2var
    )
    return sums, sums_cov, wsum


def _deweight(wt6, Irr, Irc, Icc):
    """inverse-covariance subtraction N^-1 = M^-1 - W^-1
    (ref: admom_nb.py:179-227). Returns (new wt6, flags)."""
    detm = Irr * Icc - Irc * Irc
    Wrr, Wrc, Wcc = wt6[3], wt6[4], wt6[5]
    detw = Wrr * Wcc - Wrc * Wrc

    bad = (detm <= GMIX_LOW_DETVAL) | (detw <= GMIX_LOW_DETVAL)
    idetm = 1.0 / jnp.where(bad, 1.0, detm)
    idetw = 1.0 / jnp.where(bad, 1.0, detw)

    Nrr = Icc * idetm - Wcc * idetw
    Ncc = Irr * idetm - Wrr * idetw
    Nrc = -Irc * idetm + Wrc * idetw
    detn = Nrr * Ncc - Nrc * Nrc
    bad = bad | (detn <= GMIX_LOW_DETVAL)
    idetn = 1.0 / jnp.where(bad, 1.0, detn)

    new = wt6.at[3].set(Ncc * idetn).at[4].set(-Nrc * idetn).at[5].set(Nrr * idetn)
    new = jnp.where(bad, wt6, new)
    flags = jnp.where(bad, jnp.int32(nf.LOW_DET), jnp.int32(0))
    return new, flags


class AdmomConf:
    """static configuration (hashable, safe as a jit static arg)"""

    def __init__(self, maxiter=DEFAULT_MAXITER, shiftmax=DEFAULT_SHIFTMAX,
                 etol=DEFAULT_ETOL, Ttol=DEFAULT_TTOL, cenonly=False):
        self.maxiter = int(maxiter)
        self.shiftmax = float(shiftmax)
        self.etol = float(etol)
        self.Ttol = float(Ttol)
        self.cenonly = bool(cenonly)

    def _key(self):
        return (self.maxiter, self.shiftmax, self.etol, self.Ttol, self.cenonly)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, AdmomConf) and self._key() == other._key()


def admom_single(pixels, wt0, conf: AdmomConf):
    """run adaptive moments for one stamp.

    pixels: Pixels with [npix] fields; wt0: [6] single-gaussian guess
    (p, row, col, irr, irc, icc). Returns a dict of raw results (the
    analog of the reference's _admom_result_dtype).
    """
    # materialize the loop-invariant inputs: without the barrier XLA
    # may FUSE whatever produced the pixels (e.g. a whole jitted
    # sim+metacal stage) into the while_loop body and recompute it
    # every iteration (measured: a fused sim+admom program ran 1000x
    # slower than sim-then-admom as separate dispatches)
    pixels, wt0 = jax.lax.optimization_barrier((pixels, wt0))
    dtype = pixels.val.dtype
    zero_sums = jnp.zeros(_NSUMS, dtype=dtype)

    roworig = wt0[1]
    colorig = wt0[2]

    state = {
        "wt": wt0.astype(dtype),
        # the weight the final sums were measured with (center-updated,
        # pre-deweight) - the post-loop covariance is evaluated here
        "wt_meas": wt0.astype(dtype),
        "e1old": jnp.asarray(jnp.nan, dtype),
        "e2old": jnp.asarray(jnp.nan, dtype),
        "Told": jnp.asarray(jnp.nan, dtype),
        "flags": jnp.int32(0),
        "numiter": jnp.int32(0),
        "done": jnp.asarray(False),
        "sums": zero_sums,
        "wsum": jnp.asarray(0.0, dtype),
        "pars": jnp.full(6, jnp.nan, dtype),
        "rho4": jnp.asarray(jnp.nan, dtype),
    }
    # carries initialized from constants must match the body's
    # varying-across-mesh types under shard_map (no-op otherwise)
    state = jax.tree.map(lambda v: match_vma(v, pixels.val), state)

    def cond(s):
        return (~s["done"]) & (s["numiter"] < conf.maxiter)

    def body(s):
        wt = s["wt"]
        flags = jnp.int32(0)

        det = wt[3] * wt[5] - wt[4] * wt[4]
        low_det = det < GMIX_LOW_DETVAL
        flags = flags | jnp.where(low_det, nf.LOW_DET, 0)

        # center update
        s0, s1, s5 = _censums(wt, pixels)
        nonpos_flux1 = (~low_det) & (s5 <= 0.0)
        flags = flags | jnp.where(nonpos_flux1, nf.NONPOS_FLUX, 0)

        s5_safe = jnp.where(s5 == 0, 1.0, s5)
        newrow = jnp.where(low_det | nonpos_flux1, wt[1], s0 / s5_safe)
        newcol = jnp.where(low_det | nonpos_flux1, wt[2], s1 / s5_safe)
        wt = wt.at[1].set(newrow).at[2].set(newcol)

        cen_shift = (
            (jnp.abs(newrow - roworig) > conf.shiftmax)
            | (jnp.abs(newcol - colorig) > conf.shiftmax)
        ) & (flags == 0)
        flags = flags | jnp.where(cen_shift, nf.CEN_SHIFT, 0)

        # moment sums (covariance deferred to after the loop)
        sums, _, wsum = _momsums(wt, pixels, with_cov=False)
        wt_meas = wt
        nonpos_flux2 = (flags == 0) & (sums[5] <= 0.0)
        flags = flags | jnp.where(nonpos_flux2, nf.NONPOS_FLUX, 0)

        finv = 1.0 / jnp.where(sums[5] == 0, 1.0, sums[5])
        M1 = sums[2] * finv
        M2 = sums[3] * finv
        T = sums[4] * finv
        Irr = 0.5 * (T - M1)
        Icc = 0.5 * (T + M1)
        Irc = 0.5 * M2

        nonpos_size = (flags == 0) & (T <= 0.0)
        flags = flags | jnp.where(nonpos_size, nf.NONPOS_SIZE, 0)

        T_safe = jnp.where(T == 0, 1.0, T)
        e1 = (Icc - Irr) / T_safe
        e2 = 2 * Irc / T_safe

        converged = (
            (flags == 0)
            & (jnp.abs(e1 - s["e1old"]) < conf.etol)
            & (jnp.abs(e2 - s["e2old"]) < conf.etol)
            & (jnp.abs(T / jnp.where(s["Told"] == 0, 1.0, s["Told"]) - 1.0)
               < conf.Ttol)
        )

        pars = jnp.stack(
            [wt[1], wt[2], wt[5] - wt[3], 2.0 * wt[4], wt[5] + wt[3],
             jnp.asarray(1.0, dtype)]
        )
        rho4 = sums[6] * finv

        # deweight for the next iteration (skipped if converged/failed)
        if conf.cenonly:
            wt_next, dw_flags = wt, jnp.int32(0)
        else:
            wt_next, dw_flags = _deweight(wt, Irr, Irc, Icc)
        do_iterate = (flags == 0) & (~converged)
        flags = flags | jnp.where(do_iterate, dw_flags, 0)
        wt = jnp.where(do_iterate, wt_next, wt)

        done = (flags != 0) | converged

        return {
            "wt": wt,
            "wt_meas": wt_meas,
            "e1old": jnp.where(do_iterate, e1, s["e1old"]),
            "e2old": jnp.where(do_iterate, e2, s["e2old"]),
            "Told": jnp.where(do_iterate, T, s["Told"]),
            "flags": s["flags"] | flags,
            "numiter": s["numiter"] + 1,
            "done": done,
            "sums": sums,
            "wsum": wsum,
            "pars": jnp.where(converged, pars, s["pars"]),
            "rho4": jnp.where(converged, rho4, s["rho4"]),
        }

    out = jax.lax.while_loop(cond, body, state)

    flags = out["flags"]
    # parity with the reference: hitting maxiter sets MAXITER
    # (admom_nb.py:105-108), even over a final-iteration convergence
    flags = jnp.where(out["numiter"] >= conf.maxiter, nf.MAXITER, flags)

    wt = out["wt"]
    det = wt[3] * wt[5] - wt[4] * wt[4]
    wgt_norm = 1.0 / (2 * np.pi * jnp.sqrt(jnp.where(det > 0, det, 1.0)))

    # the 7x7 covariance, once, at the weight the final sums used
    _, sums_cov, _ = _momsums(out["wt_meas"], pixels)

    return {
        "flags": flags,
        "numiter": out["numiter"],
        "sums": out["sums"],
        "sums_cov": sums_cov,
        "wsum": out["wsum"],
        "pars": out["pars"],
        "rho4": out["rho4"],
        "wgt_norm": wgt_norm,
        "wt": wt,
    }


def admom_result(raw, jac_area):
    """raw admom output -> full result dict (batched, device).

    Mirrors ngmix/admom/admom.py:406-568 with jnp.where control flow.
    """
    flags = raw["flags"]
    sums = raw["sums"]
    cov = raw["sums_cov"]
    wsum = raw["wsum"]
    pars = raw["pars"]
    ok = flags == 0
    nan = jnp.nan

    T = jnp.where(ok, pars[..., 4], nan)
    rho4 = jnp.where(ok, raw["rho4"], nan)
    wsum_safe = jnp.where(wsum == 0, 1.0, wsum)
    flux_mean = jnp.where(ok, sums[..., 5] / wsum_safe, nan)
    pars = pars.at[..., 5].set(jnp.where(ok, flux_mean, pars[..., 5]))

    res = {
        "flags": flags,
        "numiter": raw["numiter"],
        "sums": sums,
        "sums_cov": cov,
        "wsum": wsum,
        "sums_norm": wsum,
        "pars": pars,
        "T": T,
        "rho4": rho4,
        "flux_mean": flux_mean,
    }

    izero = jnp.zeros_like(flags)

    # flux: fnorm = area * wgt_norm * wsum (admom.py:461-476)
    T_ok = T > GMIX_LOW_DETVAL
    fnorm = jnp.asarray(jac_area) * raw["wgt_norm"] * wsum_safe
    flux = jnp.where(ok & T_ok, sums[..., 5] / fnorm, nan)
    var55 = cov[..., 5, 5]
    flux_err = jnp.where(ok & T_ok & (var55 > 0), jnp.sqrt(jnp.abs(var55)) / fnorm, nan)
    s2n = flux / flux_err
    flux_flags = jnp.where(
        ok,
        jnp.where(
            T_ok,
            jnp.where(var55 > 0, izero, nf.NONPOS_VAR),
            jnp.full_like(izero, nf.NONPOS_SIZE),
        ),
        flags,
    )
    res["flux"] = flux
    res["flux_err"] = flux_err
    res["s2n"] = jnp.where(jnp.isfinite(s2n), s2n, nan)
    res["flux_flags"] = flux_flags

    # T err (factor ~4 from the weight; admom.py:480-496)
    var44 = cov[..., 4, 4]
    fsum_pos = sums[..., 5] > 0
    var_ok = (var44 > 0) & (var55 > 0)
    T_err = 4 * get_ratio_error(
        sums[..., 4],
        jnp.where(fsum_pos, sums[..., 5], 1.0),
        var44,
        var55,
        cov[..., 4, 5],
    )
    res["T_err"] = jnp.where(ok & var_ok & fsum_pos, T_err, nan)
    T_flags = jnp.where(
        ok,
        jnp.where(
            var_ok,
            jnp.where(fsum_pos, izero, nf.NONPOS_FLUX),
            jnp.full_like(izero, nf.NONPOS_VAR),
        ),
        flags,
    )
    res["T_flags"] = T_flags

    # rho4
    var66 = cov[..., 6, 6]
    rho4_var_ok = (var66 > 0) & (var55 > 0)
    rho4_err = 4 * get_ratio_error(
        sums[..., 6],
        jnp.where(fsum_pos, sums[..., 5], 1.0),
        var66,
        var55,
        cov[..., 6, 5],
    )
    res["rho4_err"] = jnp.where(ok & rho4_var_ok & fsum_pos, rho4_err, nan)
    res["rho4_flags"] = jnp.where(
        ok,
        jnp.where(
            rho4_var_ok,
            jnp.where(fsum_pos, izero, nf.NONPOS_FLUX),
            jnp.full_like(izero, nf.NONPOS_VAR),
        ),
        flags,
    )

    # full flags: require positive diagonal cov for moments 2..6
    diag = jnp.diagonal(cov, axis1=-2, axis2=-1)[..., 2:]
    diag_ok = jnp.all(diag > 0, axis=-1)
    flags = flags | jnp.where(diag_ok, izero, nf.NONPOS_VAR)

    T_pos = jnp.nan_to_num(T, nan=-1.0) > 0
    e_ok = (flags == 0) & fsum_pos & T_pos
    T_div = jnp.where(T_pos, T, 1.0)
    e1 = jnp.where(e_ok, pars[..., 2] / T_div, nan)
    e2 = jnp.where(e_ok, pars[..., 3] / T_div, nan)
    e1err = 2 * get_ratio_error(
        sums[..., 2], jnp.where(fsum_pos, sums[..., 4], 1.0),
        cov[..., 2, 2], var44, cov[..., 2, 4],
    )
    e2err = 2 * get_ratio_error(
        sums[..., 3], jnp.where(fsum_pos, sums[..., 4], 1.0),
        cov[..., 3, 3], var44, cov[..., 3, 4],
    )
    err_finite = jnp.isfinite(e1err) & jnp.isfinite(e2err)
    flags = flags | jnp.where(
        e_ok & ~err_finite, jnp.full_like(izero, nf.NONPOS_SHAPE_VAR), izero
    )
    flags = flags | jnp.where(
        (flags == 0) & fsum_pos & ~T_pos, jnp.full_like(izero, nf.NONPOS_SIZE), izero
    )
    flags = flags | jnp.where(
        (flags == 0) & ~fsum_pos, jnp.full_like(izero, nf.NONPOS_FLUX), izero
    )

    res["e1"] = e1
    res["e2"] = e2
    res["e"] = jnp.stack([e1, e2], axis=-1)
    e1err = jnp.where(e_ok & err_finite, e1err, nan)
    e2err = jnp.where(e_ok & err_finite, e2err, nan)
    res["e1err"] = e1err
    res["e2err"] = e2err
    res["e_err"] = jnp.stack([e1err, e2err], axis=-1)
    res["e_cov"] = jnp.stack(
        [
            jnp.stack([e1err**2, jnp.zeros_like(e1err)], axis=-1),
            jnp.stack([jnp.zeros_like(e1err), e2err**2], axis=-1),
        ],
        axis=-2,
    )
    res["flags"] = flags
    return res


@partial(jax.jit, static_argnames=("conf",))
def admom_fit(pixels, wt0, jac_area, conf: AdmomConf):
    """jitted single-stamp adaptive moments -> result dict"""
    raw = admom_single(pixels, wt0, conf)
    res = admom_result(raw, jac_area)
    res["numiter"] = raw["numiter"]
    res["wt"] = raw["wt"]
    return res


@partial(jax.jit, static_argnames=("conf",))
def admom_batch(pixels, wt0, jac_area, conf: AdmomConf):
    """vmapped adaptive moments over a [B] batch of stamps.

    pixels fields [B, npix]; wt0 [B, 6]; jac_area [B].
    """
    raw = jax.vmap(lambda p, w: admom_single(p, w, conf))(pixels, wt0)
    res = admom_result(raw, jac_area)
    res["numiter"] = raw["numiter"]
    res["wt"] = raw["wt"]
    return res


# ----------------------------------------------------------------------
# host API

class AdmomResult(dict):
    """admom fit result (API parity: ngmix/admom/admom.py:167-277)"""

    def __init__(self, obs, result):
        self._obs = obs
        self.update(result)

    def get_gmix(self):
        if self["flags"] != 0:
            raise RuntimeError("cannot create gmix, fit failed")
        pars = np.array(self["pars"], copy=True)
        pars[5] = 1.0
        e1 = pars[2] / pars[4]
        e2 = pars[3] / pars[4]
        g1, g2 = (float(x) for x in e1e2_to_g1g2(e1, e2))
        pars[2] = g1
        pars[3] = g2
        return GMixModel(pars, "gauss")

    def make_image(self):
        if self["flags"] != 0:
            raise RuntimeError("cannot create image, fit failed")
        obs = self._obs
        gm = self.get_gmix()
        gm.set_flux(obs.image.sum())
        return gm.make_image(obs.image.shape, jacobian=obs.jacobian)


class AdmomFitter(object):
    """adaptive moments fitter (kind = "am").

    API parity: ngmix/admom/admom.py:280-403.
    """

    kind = "am"

    def __init__(self, maxiter=DEFAULT_MAXITER, shiftmax=DEFAULT_SHIFTMAX,
                 etol=DEFAULT_ETOL, Ttol=DEFAULT_TTOL, cenonly=False,
                 rng=None):
        self.conf = AdmomConf(
            maxiter=maxiter, shiftmax=shiftmax, etol=etol, Ttol=Ttol,
            cenonly=cenonly,
        )
        self.rng = rng

    def go(self, obs, guess):
        if not isinstance(obs, Observation):
            raise ValueError("input obs must be an Observation")

        guess_gmix = self._get_guess(obs=obs, guess=guess)
        wt0 = jnp.asarray(guess_gmix.get_data()[0])

        res = admom_fit(obs.pixels, wt0, obs.jacobian.area, self.conf)
        result = {k: np.asarray(v) for k, v in res.items() if k != "wt"}
        for k in ("flags", "flux_flags", "T_flags", "rho4_flags"):
            result[k] = int(result[k])
            result[k.replace("flags", "flagstr")] = nf.get_flags_str(result[k])
        result["numiter"] = int(result["numiter"])
        for k in ("flux", "flux_err", "flux_mean", "T", "T_err", "rho4",
                  "rho4_err", "s2n", "e1", "e2", "e1err", "e2err", "wsum",
                  "sums_norm"):
            result[k] = float(result[k])
        return AdmomResult(obs=obs, result=result)

    def _get_guess(self, obs, guess):
        if isinstance(guess, GMix):
            return guess
        return self._generate_guess(obs=obs, Tguess=guess)

    def _get_rng(self):
        if self.rng is None:
            self.rng = np.random.RandomState()
        return self.rng

    def _generate_guess(self, obs, Tguess):
        rng = self._get_rng()
        scale = obs.jacobian.get_scale()
        pars = np.zeros(6)
        pars[0:2] = rng.uniform(low=-0.5 * scale, high=0.5 * scale, size=2)
        pars[2:4] = rng.uniform(low=-0.3, high=0.3, size=2)
        pars[4] = Tguess * (1.0 + rng.uniform(low=-0.1, high=0.1))
        pars[5] = 1.0
        return GMixModel(pars, "gauss")


def run_admom(obs, guess, maxiter=DEFAULT_MAXITER, shiftmax=DEFAULT_SHIFTMAX,
              etol=DEFAULT_ETOL, Ttol=DEFAULT_TTOL, cenonly=False, rng=None):
    """run adaptive moments (ref: ngmix/admom/admom.py:20-71)"""
    am = AdmomFitter(
        maxiter=maxiter, shiftmax=shiftmax, etol=etol, Ttol=Ttol,
        cenonly=cenonly, rng=rng,
    )
    return am.go(obs=obs, guess=guess)


def find_cen_admom(obs, fwhm=None, gmix=None, maxiter=DEFAULT_MAXITER,
                   shiftmax=DEFAULT_SHIFTMAX, etol=DEFAULT_ETOL,
                   Ttol=DEFAULT_TTOL, ntry=1, rng=None):
    """center-only adaptive moments with retries
    (ref: ngmix/admom/admom.py:74-164)"""
    from .moments import fwhm_to_T

    if ntry > 1 and rng is None:
        raise ValueError(
            "send a random number generator rng= when trying more than once "
            "this facilitates generating a new guess for the center"
        )

    if gmix is not None:
        wt = gmix.copy()
    elif fwhm is not None:
        T = float(fwhm_to_T(fwhm))
        wt = GMixModel([0.0, 0.0, 0.0, 0.0, T, 1.0], "gauss")
    else:
        raise ValueError("send gmix= or fwhm=")

    scale = obs.jacobian.scale
    am = AdmomFitter(
        maxiter=maxiter, shiftmax=shiftmax, etol=etol, Ttol=Ttol,
        cenonly=True,
    )

    res = None
    for itry in range(ntry):
        res = am.go(obs=obs, guess=wt)
        if res["flags"] == 0:
            break
        if ntry > 1:
            drow, dcol = rng.uniform(low=-scale / 2, high=scale / 2, size=2)
            wt.set_cen(row=drow, col=dcol)

    if res["flags"] == 0:
        res["cen"] = res.get_gmix().get_cen()
    else:
        res["cen"] = np.zeros(2) + np.nan
    return res


# reference package-layout alias (ngmix.admom.admom)
import sys as _sys

admom = _sys.modules[__name__]
admom_nb = admom
