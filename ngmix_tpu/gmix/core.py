"""Device-side gaussian-mixture kernels (batch-first, pure JAX).

This module is the TPU-native equivalent of the reference's numba tier
(ngmix/gmix/gmix_nb.py, ngmix/gmix/render_nb.py). Re-designed rather
than translated:

- a gaussian mixture is a dense ``[..., n, 6]`` tensor with columns
  (p, row, col, irr, irc, icc); normalizations (det, pnorm, inverse
  covariance) are derived functionally on the fly - there is no lazy
  ``norm_set`` state.
- every function broadcasts over arbitrary leading batch dims; batching
  over stamps is via vmap/shard_map at a higher layer.
- invalid parameter regions (det ~ 0, |g| >= 1) never raise: they are
  reported as int32 flag bits and the corresponding gaussians evaluate
  to zero.
- pixel loops become [..., n, npix] broadcasts reduced on device; the
  6x6 / 17x17 moment covariances are einsum contractions (MXU).
"""
import jax.numpy as jnp
import numpy as np

from .. import flags as _flags
from ..defaults import (
    FASTEXP_APOD_CHI2,
    FASTEXP_MAX_CHI2,
    GMIX_LOW_DETVAL,
)
from ..shape import g1g2_to_e1e2
from . import tables

# column indices of the gmix tensor
G_P, G_ROW, G_COL, G_IRR, G_IRC, G_ICC = range(6)

_APOD_IWIDTH = 1.0 / (FASTEXP_MAX_CHI2 - FASTEXP_APOD_CHI2)


def apod_window(chi2):
    """Quintic smoothstep from 1 at APOD_CHI2 to 0 at MAX_CHI2.

    C2-continuous apodization of the gaussian truncation; defines the
    objective (ref: ngmix/fastexp_nb.py:97-117). No range checking.
    """
    u = (FASTEXP_MAX_CHI2 - chi2) * _APOD_IWIDTH
    return u * u * u * (10.0 + u * (-15.0 + 6.0 * u))


def apod_window_deriv(chi2):
    """d(apod_window)/d(chi2) (ref: ngmix/fastexp_nb.py:120-135)."""
    u = (FASTEXP_MAX_CHI2 - chi2) * _APOD_IWIDTH
    umu = u * (1.0 - u)
    return -30.0 * umu * umu * _APOD_IWIDTH


def gmix_det(gmix):
    """determinants [..., n] of the per-gaussian covariances"""
    return (
        gmix[..., G_IRR] * gmix[..., G_ICC] - gmix[..., G_IRC] * gmix[..., G_IRC]
    )


def gmix_flags(gmix):
    """int32 flags [...] : LOW_DET where any component has det or T
    below the floor (ref raise sites: ngmix/gmix/gmix_nb.py:203-208)."""
    det = gmix_det(gmix)
    T = gmix[..., G_IRR] + gmix[..., G_ICC]
    bad = (det < GMIX_LOW_DETVAL) | (T <= GMIX_LOW_DETVAL)
    return jnp.where(
        jnp.any(bad, axis=-1), jnp.int32(_flags.LOW_DET), jnp.int32(0)
    )


def gmix_norms(gmix):
    """derived evaluation quantities.

    Returns (dcc, drr, drc, pnorm, valid), each [..., n]:
    inverse-covariance terms, p/(2 pi sqrt(det)), and a per-gaussian
    validity mask. Invalid gaussians get pnorm = 0 so they evaluate to
    zero rather than producing NaN.
    """
    det = gmix_det(gmix)
    T = gmix[..., G_IRR] + gmix[..., G_ICC]
    valid = (det >= GMIX_LOW_DETVAL) & (det > 0) & (T > GMIX_LOW_DETVAL)
    det_safe = jnp.where(valid, det, 1.0)
    idet = 1.0 / det_safe
    drr = gmix[..., G_IRR] * idet
    drc = gmix[..., G_IRC] * idet
    dcc = gmix[..., G_ICC] * idet
    norm = 1.0 / (2 * np.pi * jnp.sqrt(det_safe))
    pnorm = jnp.where(valid, gmix[..., G_P] * norm, 0.0)
    return dcc, drr, drc, pnorm, valid


def eval_chi2(gmix, v, u):
    """mahalanobis distances [..., n, npix] of coords to each gaussian.

    v, u: [..., npix] tangent-plane coordinates.
    """
    dcc, drr, drc, _, _ = gmix_norms(gmix)
    vd = v[..., None, :] - gmix[..., G_ROW, None]
    ud = u[..., None, :] - gmix[..., G_COL, None]
    return (
        dcc[..., None] * vd * vd
        + drr[..., None] * ud * ud
        - 2.0 * drc[..., None] * vd * ud
    )


def eval_gmix(gmix, v, u, area=1.0, fast=True):
    """Evaluate the mixture surface brightness at coords.

    Parameters
    ----------
    gmix : [..., n, 6]
    v, u : [..., npix] tangent-plane coordinates
    area : pixel area factor (scalar or [..., npix]); both reference
        evaluation paths multiply by the pixel area
        (gauss2d_eval_pixel_fast gmix_nb.py:59, gauss2d_eval_pixel
        gmix_nb.py:90)
    fast : apodized-truncation objective (chi2 cut at 25 with the C2
        window from 20); ``fast=False`` is the exact untruncated
        gaussian

    Returns
    -------
    model values [..., npix]
    """
    _, _, _, pnorm, _ = gmix_norms(gmix)
    chi2 = eval_chi2(gmix, v, u)
    if fast:
        win = jnp.where(chi2 > FASTEXP_APOD_CHI2, apod_window(chi2), 1.0)
        win = jnp.where((chi2 < FASTEXP_MAX_CHI2) & (chi2 >= 0.0), win, 0.0)
        # clip the exp argument so masked-out lanes cannot overflow
        vals = jnp.exp(-0.5 * jnp.clip(chi2, 0.0, FASTEXP_MAX_CHI2)) * win
    else:
        vals = jnp.exp(-0.5 * chi2)
    return jnp.sum(pnorm[..., None] * vals, axis=-2) * area


def render(gmix, coords, fast=True):
    """Render the mixture over a coords struct (see pixels.make_coords).

    ref: ngmix/gmix/render_nb.py:10-36. Returns flat image [..., npix].
    """
    return eval_gmix(gmix, coords.v, coords.u, coords.area, fast=fast)


def get_loglike(gmix, pixels):
    """log likelihood + s/n sums over a pixel struct.

    ref: ngmix/gmix/gmix_nb.py:825-874. Masked pixels carry ierr = 0 and
    contribute zero. Returns (loglike, s2n_numer, s2n_denom, npix).
    """
    model = eval_gmix(gmix, pixels.v, pixels.u, pixels.area, fast=True)
    ivar = pixels.ierr * pixels.ierr
    diff = model - pixels.val
    loglike = -0.5 * jnp.sum(diff * diff * ivar, axis=-1)
    s2n_numer = jnp.sum(pixels.val * model * ivar, axis=-1)
    s2n_denom = jnp.sum(model * model * ivar, axis=-1)
    npix = jnp.sum((pixels.ierr > 0).astype(jnp.int32), axis=-1)
    return loglike, s2n_numer, s2n_denom, npix


def fill_fdiff(gmix, pixels):
    """scaled residuals (model - data) * ierr, [..., npix].

    ref: ngmix/gmix/gmix_nb.py:878-900. Masked pixels give 0 rows.
    """
    model = eval_gmix(gmix, pixels.v, pixels.u, pixels.area, fast=True)
    return (model - pixels.val) * pixels.ierr


def get_model_s2n_sum(gmix, pixels):
    """sum(model^2 * ivar) (ref: ngmix/gmix/gmix_nb.py:904-937)."""
    model = eval_gmix(gmix, pixels.v, pixels.u, pixels.area, fast=True)
    ivar = pixels.ierr * pixels.ierr
    return jnp.sum(model * model * ivar, axis=-1)


# ----------------------------------------------------------------------
# mixture-level reductions

def gmix_get_cen(gmix):
    """(row, col, psum) flux-weighted center (ref: gmix_nb.py:109-130)."""
    p = gmix[..., G_P]
    psum = jnp.sum(p, axis=-1)
    psum_safe = jnp.where(psum == 0, 1.0, psum)
    row = jnp.sum(p * gmix[..., G_ROW], axis=-1) / psum_safe
    col = jnp.sum(p * gmix[..., G_COL], axis=-1) / psum_safe
    return row, col, psum


def gmix_get_e1e2T(gmix):
    """total (e1, e2, T) about the common center (ref: gmix_nb.py:134-173).

    Returns nan where psum == 0 or T <= 0 (callers flag).
    """
    row, col, psum = gmix_get_cen(gmix)
    p = gmix[..., G_P]
    rowdiff = gmix[..., G_ROW] - row[..., None]
    coldiff = gmix[..., G_COL] - col[..., None]

    irr_sum = jnp.sum(p * (gmix[..., G_IRR] + rowdiff * rowdiff), axis=-1)
    irc_sum = jnp.sum(p * (gmix[..., G_IRC] + rowdiff * coldiff), axis=-1)
    icc_sum = jnp.sum(p * (gmix[..., G_ICC] + coldiff * coldiff), axis=-1)

    T_sum = irr_sum + icc_sum
    ok = (psum != 0) & (T_sum > 0)
    T_sum_safe = jnp.where(ok, T_sum, 1.0)
    psum_safe = jnp.where(psum == 0, 1.0, psum)

    T = jnp.where(ok, T_sum / psum_safe, jnp.nan)
    e1 = jnp.where(ok, (icc_sum - irr_sum) / T_sum_safe, jnp.nan)
    e2 = jnp.where(ok, 2.0 * irc_sum / T_sum_safe, jnp.nan)
    return e1, e2, T


def gmix_get_T(gmix):
    """flux-weighted T about the common center"""
    _, _, T = gmix_get_e1e2T(gmix)
    return T


def gmix_set_cen(gmix, row, col):
    """shift the mixture so its flux-weighted center is (row, col)"""
    row0, col0, _ = gmix_get_cen(gmix)
    out = gmix.at[..., G_ROW].add((row - row0)[..., None])
    out = out.at[..., G_COL].add((col - col0)[..., None])
    return out


def gmix_set_flux(gmix, flux):
    """rescale p so sum(p) = flux"""
    psum = jnp.sum(gmix[..., G_P], axis=-1)
    rat = flux / jnp.where(psum == 0, 1.0, psum)
    return gmix.at[..., G_P].multiply(rat[..., None])


def gmix_convolve(gmix, psf):
    """analytic gaussian x gaussian convolution.

    ref: ngmix/gmix/gmix_nb.py:610-649. gmix [..., n, 6] (*) psf
    [..., m, 6] -> [..., n*m, 6]; the psf is normalized to unit flux and
    recentered about its own flux-weighted center.
    """
    psf_row, psf_col, psf_psum = gmix_get_cen(psf)
    ipsum = 1.0 / jnp.where(psf_psum == 0, 1.0, psf_psum)

    # outer-product over components: obj axis -2 gets a new psf axis
    p = gmix[..., :, None, G_P] * psf[..., None, :, G_P] * ipsum[..., None, None]
    row = gmix[..., :, None, G_ROW] + (
        psf[..., None, :, G_ROW] - psf_row[..., None, None]
    )
    col = gmix[..., :, None, G_COL] + (
        psf[..., None, :, G_COL] - psf_col[..., None, None]
    )
    irr = gmix[..., :, None, G_IRR] + psf[..., None, :, G_IRR]
    irc = gmix[..., :, None, G_IRC] + psf[..., None, :, G_IRC]
    icc = gmix[..., :, None, G_ICC] + psf[..., None, :, G_ICC]

    out = jnp.stack([p, row, col, irr, irc, icc], axis=-1)
    return out.reshape(out.shape[:-3] + (-1, 6))


# ----------------------------------------------------------------------
# model fills: pars [..., npars] -> (gmix [..., ngauss, 6], flags [...])

def _fill_from_pf(row, col, e1, e2, T, flux, pvals, fvals):
    """assemble a co-centered, co-elliptical expansion [..., n, 6]"""
    T_i_2 = 0.5 * T[..., None] * fvals
    p = flux[..., None] * pvals
    n = pvals.shape[-1]
    row = jnp.broadcast_to(row[..., None], p.shape)
    col = jnp.broadcast_to(col[..., None], p.shape)
    irr = T_i_2 * (1 - e1[..., None])
    irc = T_i_2 * e2[..., None]
    icc = T_i_2 * (1 + e1[..., None])
    del n
    return jnp.stack([p, row, col, irr, irc, icc], axis=-1)


def _g_flags(g1, g2):
    g2sum = g1 * g1 + g2 * g2
    return jnp.where(
        g2sum >= 1.0, jnp.int32(_flags.GMIX_RANGE_ERROR), jnp.int32(0)
    )


def fill_simple(pars, pvals, fvals):
    """6-parameter [cen1, cen2, g1, g2, T, flux] fill over fixed tables.

    ref: ngmix/gmix/gmix_nb.py:308-340.
    """
    row, col, g1, g2, T, flux = (pars[..., i] for i in range(6))
    e1, e2 = g1g2_to_e1e2(g1, g2)
    gm = _fill_from_pf(row, col, e1, e2, T, flux, pvals, fvals)
    return gm, _g_flags(g1, g2)


def fill_exp(pars):
    return fill_simple(pars, jnp.asarray(tables.PVALS_EXP), jnp.asarray(tables.FVALS_EXP))


def fill_dev(pars):
    return fill_simple(pars, jnp.asarray(tables.PVALS_DEV), jnp.asarray(tables.FVALS_DEV))


def fill_turb(pars):
    return fill_simple(pars, jnp.asarray(tables.PVALS_TURB), jnp.asarray(tables.FVALS_TURB))


def fill_gauss(pars):
    return fill_simple(pars, jnp.asarray(tables.PVALS_GAUSS), jnp.asarray(tables.FVALS_GAUSS))


def fill_coellip(pars):
    """[cen1, cen2, g1, g2, T1..Tn, F1..Fn] (ref: gmix_nb.py:376-405)."""
    npars = pars.shape[-1]
    n = (npars - 4) // 2
    row, col, g1, g2 = (pars[..., i] for i in range(4))
    e1, e2 = g1g2_to_e1e2(g1, g2)
    T = pars[..., 4:4 + n]
    flux = pars[..., 4 + n:4 + 2 * n]
    Thalf = 0.5 * T
    row = jnp.broadcast_to(row[..., None], flux.shape)
    col = jnp.broadcast_to(col[..., None], flux.shape)
    gm = jnp.stack(
        [
            flux,
            row,
            col,
            Thalf * (1 - e1[..., None]),
            Thalf * e2[..., None],
            Thalf * (1 + e1[..., None]),
        ],
        axis=-1,
    )
    return gm, _g_flags(g1, g2)


def fill_full(pars):
    """independent per-gaussian pars [..., 6n] (ref: gmix_nb.py:408-427)."""
    gm = pars.reshape(pars.shape[:-1] + (-1, 6))
    return gm, jnp.zeros(pars.shape[:-1], dtype=jnp.int32)


def _cm_pf(fracdev, TdByTe):
    """16-component (p, f) arrays for composite models [..., 16]"""
    pe = jnp.asarray(tables.PVALS_EXP) * (1.0 - fracdev)[..., None]
    pd = jnp.asarray(tables.PVALS_DEV) * fracdev[..., None]
    fe = jnp.broadcast_to(jnp.asarray(tables.FVALS_EXP), pe.shape)
    fd = jnp.asarray(tables.FVALS_DEV) * TdByTe[..., None]
    return (
        jnp.concatenate([pe, pd], axis=-1),
        jnp.concatenate([fe, fd], axis=-1),
    )


def get_cm_Tfactor(fracdev, TdByTe):
    """T normalization factor for composite models (ref: gmix_nb.py:562-593)."""
    p, f = _cm_pf(jnp.asarray(fracdev), jnp.asarray(TdByTe))
    return 1.0 / jnp.sum(p * f, axis=-1)


def fill_cm(pars, fracdev, TdByTe):
    """composite model from 6 pars + (fracdev, TdByTe) (ref: gmix_nb.py:431-466)."""
    fracdev = jnp.asarray(fracdev)
    TdByTe = jnp.asarray(TdByTe)
    row, col, g1, g2, T, flux = (pars[..., i] for i in range(6))
    Tfactor = get_cm_Tfactor(fracdev, TdByTe)
    e1, e2 = g1g2_to_e1e2(g1, g2)
    p, f = _cm_pf(fracdev, TdByTe)
    T_i_2 = 0.5 * (T * Tfactor)[..., None] * f
    pp = flux[..., None] * p
    row = jnp.broadcast_to(row[..., None], pp.shape)
    col = jnp.broadcast_to(col[..., None], pp.shape)
    gm = jnp.stack(
        [
            pp,
            row,
            col,
            T_i_2 * (1 - e1[..., None]),
            T_i_2 * e2[..., None],
            T_i_2 * (1 + e1[..., None]),
        ],
        axis=-1,
    )
    return gm, _g_flags(g1, g2)


def fill_bd(pars):
    """bulge+disk [c1, c2, g1, g2, T, log10(Td/Te), fracdev, flux]
    (ref: gmix_nb.py:470-512)."""
    TdByTe = 10.0 ** pars[..., 5]
    fracdev = pars[..., 6]
    pars6 = jnp.concatenate(
        [pars[..., :5], pars[..., 7:8]], axis=-1
    )
    return fill_cm(pars6, fracdev, TdByTe)


def fill_bdf(pars):
    """bdf: fixed Td/Te = 1, varying fracdev
    [c1, c2, g1, g2, T, fracdev, flux] (ref: gmix_nb.py:516-558)."""
    fracdev = pars[..., 5]
    TdByTe = jnp.ones_like(fracdev)
    pars6 = jnp.concatenate([pars[..., :5], pars[..., 6:7]], axis=-1)
    return fill_cm(pars6, fracdev, TdByTe)


GMIX_FILL_FUNCS = {
    "exp": fill_exp,
    "dev": fill_dev,
    "turb": fill_turb,
    "gauss": fill_gauss,
    "bd": fill_bd,
    "bdf": fill_bdf,
    "coellip": fill_coellip,
    "full": fill_full,
}


def gmix_fill(model, pars, fracdev=None, TdByTe=None):
    """dispatch fill by model name -> (gmix, flags)"""
    name = tables.get_model_name(model)
    if name == "cm":
        return fill_cm(pars, fracdev, TdByTe)
    return GMIX_FILL_FUNCS[name](pars)


# ----------------------------------------------------------------------
# weighted moment sums

def _moment_feature_list(vmod, umod, v, u, higher_order=False):
    """moment basis functions as a list of [..., npix] arrays.

    order matches ngmix/moments.py MOMENTS_NAME_MAP and the reference
    sums kernels (gmix_nb.py:682-821). The first two are the
    *absolute* coords v, u; the quadratic+ terms use centered coords.
    """
    rad2 = umod * umod + vmod * vmod
    feats = [
        v,
        u,
        umod * umod - vmod * vmod,
        2 * vmod * umod,
        rad2,
        jnp.ones_like(rad2),
    ]
    if higher_order:
        u2 = umod * umod
        v2 = vmod * vmod
        vu = vmod * umod
        r4 = rad2 * rad2
        feats += [
            umod * rad2,
            vmod * rad2,
            umod * (u2 - 3 * v2),
            vmod * (3 * u2 - v2),
            r4,
            rad2 * (u2 - v2),
            rad2 * 2 * vu,
            u2 * u2 - 6 * u2 * v2 + v2 * v2,
            (u2 - v2) * 4 * vu,
            r4 * rad2,
            r4 * r4,
        ]
    return feats


def _moment_features(vmod, umod, v, u, higher_order=False):
    """stacked moment basis F [..., npix, nmom] (einsum consumers)"""
    return jnp.stack(
        _moment_feature_list(vmod, umod, v, u, higher_order), axis=-1
    )


def weighted_feature_reductions(w, feats, cov_weight=None):
    """sums_i = sum_p w[..., p] f_i[..., p] and (optionally)
    cov_ij = sum_p cov_weight[..., p] f_i f_j, with the small feature
    indices UNROLLED: XLA lowers the equivalent einsums to batched
    GEMMs with M=N=nmom(<=8 here) that strand the MXU at a few percent
    tile occupancy (the same pathology ops/small_linalg.py and the LM
    normal reductions remove); n(n+3)/2 fused multiply-reduces
    vectorize the batch/pixel dims on the VPU instead, and the
    [..., npix, nmom] feature stack is never materialized.

    feats: list of [..., npix] feature arrays. Returns (sums, cov) with
    cov None when cov_weight is None.
    """
    n = len(feats)
    sums = jnp.stack(
        [jnp.sum(w * f, axis=-1) for f in feats], axis=-1
    )
    if cov_weight is None:
        return sums, None
    rows = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            rows[i][j] = jnp.sum(
                cov_weight * feats[i] * feats[j], axis=-1
            )
    for i in range(n):
        for j in range(i):
            rows[i][j] = rows[j][i]
    cov = jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )
    return sums, cov


def get_weighted_sums(wt, pixels, maxrad, higher_order=False,
                      use_pallas=False, with_cov=True):
    """weighted moment sums with full covariance.

    ref: ngmix/gmix/gmix_nb.py:682-821. The weight is evaluated with the
    exact (untruncated) exponential including the pixel-area factor
    (gauss2d_eval_pixel). The [nmom, nmom] covariance is a single
    einsum (MXU) per stamp. use_pallas routes the weight evaluation
    through the fused Pallas kernel on TPU backends (~5x on the
    explicitly batched [B, npix] path). with_cov=False skips the
    covariance accumulation (nmom^2 reductions) for callers that only
    consume the sums (e.g. LM starting guesses); sums_cov is None.

    Returns dict with sums [..., nmom], sums_cov [..., nmom, nmom],
    wsum, npix, flags.
    """
    vcen = wt[..., 0, G_ROW]
    ucen = wt[..., 0, G_COL]
    vmod = pixels.v - vcen[..., None]
    umod = pixels.u - ucen[..., None]
    rad2 = umod * umod + vmod * vmod

    mask = (rad2 < maxrad**2) & (pixels.ierr > 0.0)
    fmask = mask.astype(pixels.v.dtype)

    if use_pallas:
        from ..ops.pallas_gmix import eval_gmix_auto

        weight = eval_gmix_auto(
            wt, pixels.v, pixels.u, pixels.area, fast=False, use_pallas=True
        ) * fmask
    else:
        weight = eval_gmix(
            wt, pixels.v, pixels.u, pixels.area, fast=False
        ) * fmask
    ierr_safe = jnp.where(mask, pixels.ierr, 1.0)
    var = 1.0 / (ierr_safe * ierr_safe)

    wdata = weight * pixels.val
    w2var = weight * weight * var

    feats = _moment_feature_list(
        vmod, umod, pixels.v, pixels.u, higher_order
    )
    if len(feats) <= 8:
        # unrolled multiply-reduces (see weighted_feature_reductions);
        # the 17-moment higher-order path keeps the einsum (compile
        # size; it is not on a hot path)
        sums, sums_cov = weighted_feature_reductions(
            wdata, feats, cov_weight=w2var if with_cov else None
        )
    else:
        F = jnp.stack(feats, axis=-1)
        sums = jnp.einsum("...p,...pi->...i", wdata, F)
        sums_cov = (
            jnp.einsum("...p,...pi,...pj->...ij", w2var, F, F)
            if with_cov else None
        )

    return {
        "sums": sums,
        "sums_cov": sums_cov,
        "wsum": jnp.sum(weight, axis=-1),
        "npix": jnp.sum(mask.astype(jnp.int32), axis=-1),
        "flags": jnp.zeros(sums.shape[:-1], dtype=jnp.int32),
    }


# ----------------------------------------------------------------------
# shear / rounding transforms on mixtures

def gmix_make_round(gmix):
    """round version: each component T -> T * round_factor, irc = 0
    (ref: ngmix/gmix/gmix.py:565-617, preserve_size=False)."""
    from ..moments import mom2g  # local import avoids cycle
    from ..shape import get_round_factor

    e1, e2, T = gmix_get_e1e2T(gmix)
    del T
    from ..shape import e1e2_to_g1g2

    g1, g2 = e1e2_to_g1g2(e1, e2)
    factor = get_round_factor(g1, g2)
    Ti = gmix[..., G_IRR] + gmix[..., G_ICC]
    half = 0.5 * Ti * factor[..., None]
    out = gmix.at[..., G_IRC].set(0.0)
    out = out.at[..., G_IRR].set(half)
    out = out.at[..., G_ICC].set(half)
    del mom2g
    return out


def gmix_get_sheared(gmix, s1, s2):
    """apply reduced shear to each component's second moments
    (ref: ngmix/gmix/gmix.py:478-516)."""
    from ..moments import get_sheared_moments

    irr, irc, icc = (
        gmix[..., G_IRR],
        gmix[..., G_IRC],
        gmix[..., G_ICC],
    )
    irr_s, irc_s, icc_s = get_sheared_moments(irr, irc, icc, s1, s2)
    out = gmix.at[..., G_IRR].set(irr_s)
    out = out.at[..., G_IRC].set(irc_s)
    out = out.at[..., G_ICC].set(icc_s)
    return out
