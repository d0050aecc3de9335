"""Batched survey-scale pipeline: metacal + measurement over [B] stamps.

This is the TPU-native scale-out layer the reference lacks entirely
(SURVEY 2.3: the reference loops objects in single-threaded python;
production throughput comes from external process farming). Here the
whole workload - psf target derivation, the 5-type k-space metacal
image set with optional fixnoise, and the per-type measurements - is
one jitted program over stacked [B, H, W] arrays, sharding over the
batch axis on a device mesh (see parallel/).
"""
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .gaussmom import gaussmom_measure
from .gmix import core as gcore
from .fitting.lm import LMConf, run_lm_normal_batched
from .jacobian import Jacobian
from .metacal import kops
from .metacal.defaults import DEFAULT_STEP
from .pixels import Pixels


class MetacalConfig(NamedTuple):
    """static configuration for the batched metacal pipeline"""

    dims: tuple  # (H, W) galaxy stamps
    psf_dims: tuple  # (Hp, Wp) psf stamps
    jac: tuple  # (dvdrow, dvdcol, dudrow, dudcol) shared WCS matrix
    step: float = DEFAULT_STEP
    types: tuple = ("noshear", "1p", "1m", "2p", "2m")
    fixnoise: bool = True
    psf_mode: str = "gauss"  # 'gauss' | 'azgauss' | 'fitgauss' | 'dilate'
    # FFT grid = good_fft_size(ceil(pad_factor * stamp size)). May be
    # fractional: the k ops are exact as long as the deconvolved
    # object + target psf support fits the periodic grid, and the
    # apodized compact objective tolerates pad_factor down to ~1.3
    # (measured: m unchanged at 3.7e-4 for 49px stamps from N=100 to
    # N=64, incl. broad-wing Spergel/Moffat on a sheared WCS). Keep 2+
    # for full-stamp measures of strongly offset objects.
    pad_factor: float = 4
    # optional central crop for the measurement stage: pixels outside
    # the model support carry zero parameter gradient, so fitting on a
    # crop is the same objective at a fraction of the evaluation cost
    fit_dims: tuple = None
    # LM measures only: when > 0, run the full LM solve on the noshear
    # type alone and refine the sheared types with this many
    # unconditional damped Gauss-Newton steps from the noshear optimum
    # (run_gn_refine_batched). Agrees with the full solve to ~1e-8 in
    # pars at niter=3 (identical m), but MEASURED SLOWER on v5e at the
    # headline config (303 -> 349 ms at B=10240, niter=3): the
    # straggler-compacted stacked LM already beats unconditional
    # refinement plus the lane-gather copies. Kept for shapes where
    # the tradeoff may flip (e.g. cheap-converging 9-type sets);
    # default 0 = full LM on every type.
    sheared_refine: int = 0


def _host_jacobian(conf, row0=0.0, col0=0.0):
    return Jacobian(
        row=row0, col=col0, dvdrow=conf.jac[0], dvdcol=conf.jac[1],
        dudrow=conf.jac[2], dudcol=conf.jac[3],
    )


GALSHEAR_TYPES = ("noshear", "1p", "1m", "2p", "2m")
PSFSHEAR_TYPES = ("1p_psf", "1m_psf", "2p_psf", "2m_psf")


def _type_shear(type_, step):
    """(g1, g2) applied by this metacal type (to the galaxy for the
    galshear types, to the target psf for the *_psf types)"""
    base = type_[:-4] if type_.endswith("_psf") else type_
    return {
        "noshear": (0.0, 0.0),
        "1p": (step, 0.0),
        "1m": (-step, 0.0),
        "2p": (0.0, step),
        "2m": (0.0, -step),
    }[base]


def _check_types(conf):
    for t in conf.types:
        if t in GALSHEAR_TYPES:
            continue
        if t in PSFSHEAR_TYPES:
            if conf.psf_mode != "dilate":
                # parity: the reference's round-gaussian targets refuse
                # psf shearing too (metacal.py:660 'no shearing gauss psf')
                raise ValueError(
                    "psf-sheared metacal types need psf_mode='dilate', "
                    "got %r" % (conf.psf_mode,)
                )
            continue
        raise ValueError("bad metacal type: %s" % t)


def prepare_psf_kdata(psf_images, psf_cens, conf: MetacalConfig):
    """psf-side k data shared by the image and fixnoise pipelines:
    (normalized psfhat, target sigma, pixel response, sky |k|^2)"""
    N = kops.good_fft_size(
        int(np.ceil(
            conf.pad_factor * max(max(conf.dims), max(conf.psf_dims))
        ))
    )
    jac = _host_jacobian(conf)
    psfhat = _batched_centered_fft(psf_images, psf_cens, N)
    psf_flux = psfhat[:, 0, 0].real[:, None, None]
    psfhat_n = psfhat / psf_flux
    pix = kops.pixel_kresponse(N, dtype=psf_images.dtype)
    ksq = kops.sky_ksq(N, jac, dtype=psf_images.dtype)
    psfhat_nopix = None
    if conf.psf_mode == "dilate":
        # the target is the dilated original psf: keep its pixel-free
        # k transform for the per-type remaps. sigma (from k-power
        # pinning) is still derived for reporting / guess scales.
        psfhat_nopix = psfhat_n / jnp.where(jnp.abs(pix) > 1e-8, pix, 1e-8)
        sigma = kops.gauss_target_sigma(psfhat_n, ksq)
    elif conf.psf_mode == "azgauss":
        sigma = jax.vmap(
            lambda ph: kops.azgauss_target_sigma(ph, ksq, nbin=N)
        )(psfhat)
    elif conf.psf_mode == "fitgauss":
        sigma = _fitgauss_target_sigma_batch(psf_images, psf_cens, conf)
        # per-lane fallback to the conservative k-pinned derivation
        # where the fit failed (host path raises BootPSFFailure only
        # after several retries; the batch path degrades gracefully)
        sigma = jnp.where(
            jnp.isfinite(sigma) & (sigma > 0),
            sigma, kops.gauss_target_sigma(psfhat, ksq),
        )
    else:
        sigma = kops.gauss_target_sigma(psfhat, ksq)
    return dict(
        N=N, psfhat_n=psfhat_n, pix=pix, ksq=ksq, sigma=sigma,
        psfhat_nopix=psfhat_nopix,
    )


def _admom_gauss_fit_batch(psf_images, psf_cens, conf):
    """batched adaptive-moments gaussian fit of psf stamps; returns the
    admom result dict (e1/e2/T/flags...)"""
    from .admom import AdmomConf, admom_batch
    from .moments import fwhm_to_T

    B = psf_images.shape[0]
    dtype = psf_images.dtype
    conf_psf = conf._replace(dims=conf.psf_dims)
    pixels = make_pixels_batch(
        psf_images, jnp.ones_like(psf_images), psf_cens, conf_psf
    )
    scale = abs(
        conf.jac[0] * conf.jac[3] - conf.jac[1] * conf.jac[2]
    ) ** 0.5
    Tg = float(fwhm_to_T(3.5 * scale))
    wt0 = jnp.zeros((B, 6), dtype)
    wt0 = wt0.at[:, 0].set(1.0)
    wt0 = wt0.at[:, 3].set(Tg / 2).at[:, 5].set(Tg / 2)
    area = jnp.full((B,), scale**2, dtype)
    return admom_batch(pixels, wt0, area, AdmomConf())


def _psf_moms_from_stamps(psf_images, conf, fallback_sigma):
    """per-stamp (irr, irc, icc) [B, 3] gaussian moments of rendered
    target-psf stamps via batched admom, with a round fallback where
    the fit failed. Used by the LM measures under psf_mode='dilate',
    where the reconvolution target is the dilated original psf rather
    than an analytic gaussian (the measurement psf model is then the
    gaussian fit of that target, as in typical reference configs that
    refit the metacal psf with a gauss model)."""
    from .moments import e2mom

    B = psf_images.shape[0]
    dtype = psf_images.dtype
    Hp, Wp = conf.psf_dims
    pcens = jnp.broadcast_to(
        jnp.asarray([(Hp - 1) / 2.0, (Wp - 1) / 2.0], dtype), (B, 2)
    )
    res = _admom_gauss_fit_batch(psf_images, pcens, conf)
    T_safe = jnp.where(res["T"] > 0, res["T"], 1.0)
    irr, irc, icc = e2mom(res["e1"], res["e2"], T_safe)
    ok = (res["flags"] == 0) & (res["T"] > 0)
    rnd = fallback_sigma**2
    return jnp.stack(
        [
            jnp.where(ok, irr, rnd),
            jnp.where(ok, irc, 0.0),
            jnp.where(ok, icc, rnd),
        ],
        axis=-1,
    )


def _fitgauss_target_sigma_batch(psf_images, psf_cens, conf):
    """round target sigma from a batched adaptive-moments gaussian fit
    of each psf stamp with the ellipticity-driven dilation (the device
    equivalent of metacal/fitgauss_target_psf.py get_fitgauss_target_T;
    NaN where the fit failed so the caller can substitute)."""
    from .moments import e2mom

    res = _admom_gauss_fit_batch(psf_images, psf_cens, conf)

    e1, e2, T = res["e1"], res["e2"], res["T"]
    T_safe = jnp.where(T > 0, T, 1.0)
    irr, irc, icc = e2mom(e1, e2, T_safe)
    half = 0.5 * (irr + icc)
    d = jnp.sqrt((0.5 * (irr - icc)) ** 2 + irc**2)
    eigmax = half + d
    dil = jnp.minimum(
        1.0 + 2.0 * (jnp.sqrt(eigmax / (T_safe / 2.0)) - 1.0), 1.1
    )
    sigma = jnp.sqrt(T_safe * dil / 2.0)
    ok = (res["flags"] == 0) & (T > 0)
    return jnp.where(ok, sigma, jnp.nan)


def metacal_image_set(images, cens, psf_images, psf_cens,
                      conf: MetacalConfig, psfdata=None,
                      with_psf_images=False, crop=None):
    """produce the metacal image set for a batch.

    images [B, H, W]; cens [B, 2]; psf_images [B, Hp, Wp];
    psf_cens [B, 2]. Returns (dict type -> [B, H, W] images,
    target_sigma [B] of the *undilated* round target psf). Pass a
    precomputed ``psfdata`` (prepare_psf_kdata) to share the psf FFTs
    and target derivation across pipelines (fixnoise).

    Types: the 5 galshear types shear the deconvolved galaxy before
    reconvolving with the (round, dilated) target; the four *_psf
    types (psf_mode='dilate' only) reconvolve the UNSHEARED galaxy
    with the sheared dilated original psf - the counterfactual images
    behind the psf-leakage response R_psf
    (ref: ngmix/metacal/metacal.py:118-248).

    with_psf_images: also return {type: [B, Hp, Wp]} rendered target
    psf stamps (centered at the stamp center), for measures that need
    the psf model when the target is not an analytic gaussian.

    crop: optional (r0, c0, fh, fw). Output images are only the crop
    window [B, fh, fw], evaluated by partial-iDFT matmuls instead of
    full inverse FFTs (kops.idft2_crop) - exact, and the skinny MXU
    matmuls do crop/N of the transform work. Callers that fit on a
    central fit_dims window never materialize the full stamps.
    """
    _check_types(conf)
    if psfdata is None:
        psfdata = prepare_psf_kdata(psf_images, psf_cens, conf)
    N = psfdata["N"]
    jac = _host_jacobian(conf)

    imhat = _batched_centered_fft(images, cens, N)
    objhat = kops.deconvolve_k(imhat, psfdata["psfhat_n"])
    pix = psfdata["pix"]
    ksq = psfdata["ksq"]
    sigma = psfdata["sigma"]

    dilation = 1.0 + 2.0 * conf.step
    if conf.psf_mode == "dilate":
        # dilated original psf (evaluate the pixel-free psf transform
        # at d*k, exactly), reconvolved by the pixel; shared by all
        # galshear types (ref: metacal.py:296-315)
        ghat = kops.remap_k(
            psfdata["psfhat_nopix"], np.eye(2) * dilation
        ) * pix
    else:
        # round-gaussian target WITHOUT the pixel: the deconvolution
        # removed the pixelized psf and the reference never re-applies
        # the pixel in these modes (drawImage(method='no_pixel'),
        # metacal.py:285,651-665). Re-applying it would smear the
        # output with the sky-projected pixel, whose anisotropy under
        # a non-diagonal WCS leaks additively into <e> (measured:
        # m=+0.22 at the reference test's ShearWCS g1=0.1).
        sig_d = sigma * dilation
        ghat = jnp.exp(-0.5 * (sig_d[:, None, None] ** 2) * ksq)
        ghat = ghat.astype(psfdata["psfhat_n"].dtype)

    out = {}
    psf_out = {}
    B = images.shape[0]
    for type_ in conf.types:
        g1, g2 = _type_shear(type_, conf.step)
        ghat_t = ghat
        if type_ in PSFSHEAR_TYPES:
            # sheared dilated psf target; galaxy stays unsheared
            S = kops.shear_matrix(g1, g2)
            M = kops.kmap_matrix(jac, S) @ (np.eye(2) * dilation)
            ghat_t = kops.remap_k(psfdata["psfhat_nopix"], M) * pix
            sheared = objhat
        elif type_ == "noshear":
            sheared = objhat
        else:
            S = kops.shear_matrix(g1, g2)
            M = kops.kmap_matrix(jac, S)
            sheared = kops.remap_k(objhat, M)
        if crop is not None:
            out[type_] = _batched_centered_ifft_crop(
                sheared * ghat_t, cens, *crop
            )
        else:
            out[type_] = _batched_centered_ifft(
                sheared * ghat_t, cens, conf.dims
            )
        if with_psf_images:
            Hp, Wp = conf.psf_dims
            pcen = jnp.broadcast_to(
                jnp.asarray(
                    [(Hp - 1) / 2.0, (Wp - 1) / 2.0], images.dtype
                ),
                (B, 2),
            )
            psf_out[type_] = _batched_centered_ifft(
                ghat_t, pcen, conf.psf_dims
            )
    if with_psf_images:
        return out, sigma, psf_out
    return out, sigma


def _center_phase(cens, N, dtype, sign):
    """separable center-shift phase e^{sign*i(kr c0 + kc c1)} as the
    outer product of two 1-D phase vectors: 2*B*N transcendentals
    instead of B*N^2 (the broadcast multiply is cheap; the exps were
    ~25M per transform at B=6144, N=64)"""
    kr, kc = kops.kgrids(N, dtype=dtype)
    pr = jnp.exp(sign * 1j * kr[:, 0][None, :] * cens[:, 0, None])
    pc = jnp.exp(sign * 1j * kc[0, :][None, :] * cens[:, 1, None])
    return pr[:, :, None] * pc[:, None, :]


def _batched_centered_fft(img, cens, N):
    H, W = img.shape[-2:]
    phase = _center_phase(cens, N, img.real.dtype, +1.0)
    if H <= N // 2 and W <= N // 2:
        # skinny blocks (psf stamps): partial-input DFT matmuls beat
        # padding to the full grid. For near-full blocks (the galaxy
        # stamps at pad 1.3) XLA's fft2 HLO measured faster - the
        # full-transform DFT-matmul lesson holds (kops.fft2_auto doc).
        return kops.dft2_zeropad(img, N) * phase
    pad = jnp.zeros(img.shape[:-2] + (N, N), dtype=jnp.complex128
                    if img.dtype == jnp.float64 else jnp.complex64)
    pad = pad.at[..., :H, :W].set(img)
    return kops.fft2_auto(pad) * phase


def _batched_centered_ifft(khat, cens, dims):
    N = khat.shape[-1]
    phase = _center_phase(cens, N, khat.real.dtype, -1.0)
    full = kops.fft2_auto(khat * phase, inverse=True).real
    return full[..., : dims[0], : dims[1]]


def _batched_centered_ifft_crop(khat, cens, r0, c0, fh, fw):
    """only rows r0..r0+fh-1, cols c0..c0+fw-1 of the centered inverse
    transform, via partial-iDFT matmuls (kops.idft2_crop)"""
    N = khat.shape[-1]
    phase = _center_phase(cens, N, khat.real.dtype, -1.0)
    return kops.idft2_crop(khat * phase, r0, c0, fh, fw).real


def make_pixels_batch(images, weights, cens, conf: MetacalConfig):
    """[B,H,W] images -> batched Pixels with per-stamp centers"""
    H, W = conf.dims
    rows = jnp.arange(H, dtype=images.dtype)
    cols = jnp.arange(W, dtype=images.dtype)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    rflat = rr.reshape(-1)[None, :] - cens[:, 0:1]
    cflat = cc.reshape(-1)[None, :] - cens[:, 1:2]
    dvdrow, dvdcol, dudrow, dudcol = conf.jac
    v = dvdrow * rflat + dvdcol * cflat
    u = dudrow * rflat + dudcol * cflat
    area = abs(dvdrow * dudcol - dvdcol * dudrow)
    val = images.reshape(images.shape[0], -1)
    ierr = jnp.sqrt(jnp.clip(weights.reshape(val.shape), 0.0, None))
    return Pixels(
        v=v, u=u, area=jnp.full_like(val, area), val=val, ierr=ierr
    )


def metacal_pipeline(images, weights, cens, psf_images, psf_cens, noise,
                     conf: MetacalConfig, measure="gaussmom",
                     measure_fwhm=1.2, lm_conf=None, lm_prior=None,
                     lm_bounds=None):
    """full batched pipeline: metacal image set (+fixnoise) and
    measurement of every type.

    noise: [B, H, W] noise field for fixnoise (pass zeros with
    fixnoise=False). measure: "gaussmom" (fixed gaussian weighted
    moments), "admom" (adaptive moments), or "<model>-lm" with model
    in gauss/exp/dev/bdf/bd (bounded LM fits). lm_prior/lm_bounds regularize
    the LM measures (see _exp_lm_measure). Returns dict type -> result
    dict of batched arrays.
    """
    psfdata = prepare_psf_kdata(psf_images, psf_cens, conf)
    # under psf_mode='dilate' the target psf is not an analytic
    # gaussian, so psf-model-consuming measures get the rendered
    # per-type target stamps
    need_psf_stamps = conf.psf_mode == "dilate" and (
        measure.endswith("-lm") or measure in ("pgauss", "ksigma")
    )
    # pixel-space measures over a central fit_dims window never need
    # the full stamps: evaluate only the window via partial-iDFT
    # matmuls (crop/N of the inverse-transform work). The window must
    # be square and centered so the fixnoise rot90 commutes with it;
    # the pre-psf k-space measures always take full stamps.
    crop = None
    if (
        conf.fit_dims is not None
        and measure not in ("pgauss", "ksigma")
        and conf.dims[0] == conf.dims[1]
        and conf.fit_dims[0] == conf.fit_dims[1]
        and (conf.dims[0] - conf.fit_dims[0]) % 2 == 0
    ):
        fh, fw = conf.fit_dims
        crop = (
            (conf.dims[0] - fh) // 2, (conf.dims[1] - fw) // 2, fh, fw
        )
    if need_psf_stamps:
        odict, sigma, psfdict = metacal_image_set(
            images, cens, psf_images, psf_cens, conf, psfdata=psfdata,
            with_psf_images=True, crop=crop,
        )
    else:
        odict, sigma = metacal_image_set(
            images, cens, psf_images, psf_cens, conf, psfdata=psfdata,
            crop=crop,
        )
        psfdict = None

    if conf.fixnoise:
        # rotate the noise field by 90 deg, metacal it, rotate back and
        # add; variance doubles (ref: convenience.py:208-312)
        cen_c = jnp.full_like(cens, (conf.dims[0] - 1) / 2.0)
        noise_rot = jnp.rot90(noise, k=1, axes=(-2, -1))
        ndict, _ = metacal_image_set(
            noise_rot, cen_c, psf_images, psf_cens, conf, psfdata=psfdata,
            crop=crop,
        )
        for t in odict:
            odict[t] = odict[t] + jnp.rot90(ndict[t], k=3, axes=(-2, -1))
        weights = weights * 0.5

    dilation = 1.0 + 2.0 * conf.step
    sig_d = sigma * dilation
    area = abs(conf.jac[0] * conf.jac[3] - conf.jac[1] * conf.jac[2])

    # stack the metacal types into the batch axis so all types share
    # one measurement program (for the LM this collapses 5 sequential
    # while_loops into one, cutting the serial step count 5x)
    types = list(odict.keys())
    B = weights.shape[0]
    ims_all = jnp.concatenate([odict[t] for t in types], axis=0)
    wt_all = jnp.tile(weights, (len(types), 1, 1))
    cens_all = jnp.tile(cens, (len(types), 1))

    # the pre-psf k-space measures need the full (uncropped) stamps
    ims_full, wt_full, cens_full = ims_all, wt_all, cens_all

    if crop is not None:
        # images came out of the k engine already cropped; crop the
        # weights and shift the centers to match
        r0, c0, fh, fw = crop
        wt_all = wt_all[:, r0:r0 + fh, c0:c0 + fw]
        cens_all = cens_all - jnp.asarray([r0, c0], cens_all.dtype)
        conf_fit = conf._replace(dims=(fh, fw))
    elif conf.fit_dims is not None:
        fh, fw = conf.fit_dims
        r0 = (conf.dims[0] - fh) // 2
        c0 = (conf.dims[1] - fw) // 2
        ims_all = ims_all[:, r0:r0 + fh, c0:c0 + fw]
        wt_all = wt_all[:, r0:r0 + fh, c0:c0 + fw]
        cens_all = cens_all - jnp.asarray([r0, c0], cens_all.dtype)
        conf_fit = conf._replace(dims=(fh, fw))
    else:
        conf_fit = conf
    pixels = make_pixels_batch(ims_all, wt_all, cens_all, conf_fit)
    # NOTE on fusion: the while_loop solvers guard their own
    # loop-invariant inputs with optimization_barrier (admom_single,
    # em_single) so the TPU compiler cannot fuse this whole upstream
    # k-space stage into a loop body and recompute it per iteration.
    # Do NOT add a pipeline-level barrier here: at B=6144 it triggered
    # an XLA TPU miscompile (1169 deterministic garbage moments
    # guesses in the noshear slice; fine at B=2048, fine on CPU).

    if measure == "gaussmom":
        res_all = gaussmom_measure(pixels, measure_fwhm, area)
    elif measure == "admom":
        from .admom import AdmomConf, admom_batch
        from .moments import fwhm_to_T

        Tw = float(fwhm_to_T(measure_fwhm))
        nb = pixels.val.shape[0]
        dtype = pixels.val.dtype
        wt0 = jnp.zeros((nb, 6), dtype)
        wt0 = wt0.at[:, 0].set(1.0)
        wt0 = wt0.at[:, 3].set(Tw / 2).at[:, 5].set(Tw / 2)
        area_b = jnp.full((nb,), area, dtype)
        res_all = admom_batch(pixels, wt0, area_b, AdmomConf())
    elif measure in ("pgauss", "ksigma"):
        # pre-psf weighted moments on each metacal type, deconvolving
        # the rendered round target psf (the metadetect-era estimator;
        # ref: ngmix/prepsfmom.py PGaussMom/KSigmaMom)
        from .prepsfmom import prepsfmom_batch

        kernel = "gauss" if measure == "pgauss" else "ksigma"
        Hp, Wp = conf.psf_dims
        dtype = ims_full.dtype
        if psfdict is not None:
            # dilate mode: deconvolve the rendered per-type target psf
            pimgs_t = jnp.concatenate([psfdict[t] for t in types], axis=0)
        else:
            pr = jnp.arange(Hp, dtype=dtype) - (Hp - 1) / 2.0
            pc = jnp.arange(Wp, dtype=dtype) - (Wp - 1) / 2.0
            prr, pcc = jnp.meshgrid(pr, pc, indexing="ij")
            dvdrow, dvdcol, dudrow, dudcol = conf.jac
            pv = (dvdrow * prr + dvdcol * pcc).reshape(-1)[None, :]
            pu = (dudrow * prr + dudcol * pcc).reshape(-1)[None, :]
            pg = jnp.zeros((B, 1, 6), dtype)
            pg = pg.at[:, 0, 0].set(1.0)
            pg = pg.at[:, 0, 3].set(sig_d**2).at[:, 0, 5].set(sig_d**2)
            pimg = gcore.eval_gmix(pg, pv, pu, area, fast=False)
            pimg = pimg.reshape(B, Hp, Wp)
            pimgs_t = jnp.tile(pimg, (len(types), 1, 1))
        pcen = jnp.asarray([(Hp - 1) / 2.0, (Wp - 1) / 2.0], dtype)
        pcens_t = jnp.broadcast_to(pcen, (len(types) * B, 2))
        wt_safe = jnp.where(wt_full > 0, wt_full, jnp.inf)
        tot_var = jnp.sum(1.0 / wt_safe, axis=(-2, -1))
        res_all = prepsfmom_batch(
            ims_full, cens_full, pimgs_t, pcens_t, tot_var,
            target_dim=4 * conf.dims[0], kernel=kernel,
            jac_tuple=conf.jac, fwhm=measure_fwhm,
        )
    elif measure.endswith("-lm") and measure[:-3] in _MODEL_FILLS:
        if psfdict is not None:
            # dilate mode: per-type gaussian fit of the rendered target
            psf_moms_all = jnp.concatenate(
                [
                    _psf_moms_from_stamps(psfdict[t], conf, sig_d)
                    for t in types
                ],
                axis=0,
            )
        else:
            psf_moms_all = jnp.tile(
                jnp.stack(
                    [sig_d**2, jnp.zeros_like(sig_d), sig_d**2], axis=-1
                ),
                (len(types), 1),
            )
        if (
            conf.sheared_refine
            and "noshear" in types
            and len(types) > 1
        ):
            res_all = _lm_with_sheared_refine(
                pixels, psf_moms_all, lm_conf or LMConf(), types, B,
                model=measure[:-3], prior=lm_prior, bounds=lm_bounds,
                niter=conf.sheared_refine,
            )
        else:
            res_all = _exp_lm_measure(
                pixels, psf_moms_all, lm_conf or LMConf(),
                model=measure[:-3], prior=lm_prior, bounds=lm_bounds,
            )
    else:
        raise ValueError("bad measure: %s" % measure)

    results = {}
    for i, t in enumerate(types):
        results[t] = jax.tree.map(
            lambda x: x[i * B:(i + 1) * B] if (
                hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == len(types) * B
            ) else x,
            res_all,
        )
    results["psf_sigma"] = sigma
    return results


# models available as batched metacal measures: the simple
# 6-parameter families plus the bulge+disk composites - bdf (fixed
# Td/Te=1, varying fracdev; 7 pars, ref: gmix_nb.py:516-558) and bd
# (varying log10(Td/Te) AND fracdev; 8 pars, ref: gmix_nb.py:470-512)
_MODEL_FILLS = {
    "exp": gcore.fill_exp,
    "gauss": gcore.fill_gauss,
    "dev": gcore.fill_dev,
    "bdf": gcore.fill_bdf,
    "bd": gcore.fill_bd,
}
# parameters before the flux column(s)
_MODEL_NSHAPE = {"exp": 5, "gauss": 5, "dev": 5, "bdf": 6, "bd": 7}
# starting values for the extra shape columns (after [cen, g, T]):
# fracdev 0.5; bd's log10(Td/Te) 0 (equal sizes)
_MODEL_EXTRA_GUESS = {"bdf": (0.5,), "bd": (0.0, 0.5)}


def _model_lm_fdiff(pars, data, fill_fn):
    """simple-model residuals for one stamp with an analytic round
    gaussian psf (the known metacal target)"""
    pixels, psf_gmix = data
    gm0, gflags = fill_fn(pars)
    gm = gcore.gmix_convolve(gm0, psf_gmix)
    rows = gcore.fill_fdiff(gm, pixels)
    bad = (gflags != 0) | (gcore.gmix_flags(gm) != 0)
    return jnp.where(bad, 1.0e10, rows)


def _exp_lm_fdiff(pars, data):
    return _model_lm_fdiff(pars, data, gcore.fill_exp)


def _lm_planes(pixels):
    """iteration-invariant pixel planes for the normal-equation kernel,
    padded once to the lane-tile multiple (masked rows contribute 0)"""
    P = pixels.val.shape[-1]
    Pp = int(np.ceil(P / 128) * 128)

    def pad(x):
        if Pp == P:
            return x
        return jnp.pad(x, ((0, 0), (0, Pp - P)))

    return (
        pad(pixels.v),
        pad(pixels.u),
        pad(pixels.ierr * pixels.area),
        pad(pixels.val * pixels.ierr),
    )


def _normal_reductions(r, J):
    """(cost, Jtr, JtJ) from batched residuals r [B, R] and jacobians
    J [B, R, n], with the tiny-output contractions UNROLLED over the
    parameter indices instead of batched GEMMs: XLA lowers
    einsum('bri,brj->bij') to a batched matmul with M=N=n(=6), K=R,
    which strands the MXU at a few-percent tile occupancy (the same
    pathology ops/small_linalg.py removes from the solve/epilogue).
    n(n+3)/2 fused multiply-reduces over [B, R] vectorize the batch
    dim on the VPU instead."""
    n = J.shape[-1]
    cost = jnp.sum(r * r, axis=-1)
    cols = [J[..., i] for i in range(n)]
    Jtr = jnp.stack(
        [jnp.sum(cols[i] * r, axis=-1) for i in range(n)], axis=-1
    )
    rows = []
    for i in range(n):
        row = [None] * n
        for j in range(n):
            if j < i:
                continue
            row[j] = jnp.sum(cols[i] * cols[j], axis=-1)
        rows.append(row)
    for i in range(n):
        for j in range(i):
            rows[i][j] = rows[j][i]
    JtJ = jnp.stack(
        [jnp.stack(row, axis=-1) for row in rows], axis=-2
    )
    return cost, Jtr, JtJ


def _make_ad_normal_fn(fill_fn, flux_col=False):
    """normal-equation reductions (cost, Jtr, JtJ) of a simple-model
    fit via vmapped AD (eval + jacfwd): the XLA-fused default. Same
    contract as _exp_normal_fn so both plug into
    run_lm_normal_batched.

    jacfwd rather than linearize + manual seed basis: measured
    identical on TPU (the tangent passes dominate; XLA CSEs the second
    primal), and linearize's constant eye seeds violate jax 0.9's
    varying-across-mesh typing under shard_map.

    flux_col: every fill is exactly linear in its (single, trailing)
    flux parameter - the p column is flux * pvals and the flags depend
    only on shape/size pars - so dr/dF is the unit-flux weighted model,
    available from the primal. Computing that column analytically
    drops one of the npars forward tangent passes; the remaining
    shape-par jacobian still comes from jacfwd (AD-exact). Identical
    math to the full-AD jacobian up to one-ulp reassociation
    (F * eval(flux=1) vs eval(flux=F))."""

    def normal_fn(pars, data):
        pixels, psf_gmix = data

        def one(p, px, pg):
            def f(q):
                return _model_lm_fdiff(q, (px, pg), fill_fn)

            return f(p), jax.jacfwd(f)(p)

        def one_fluxcol(p, px, pg):
            F = p[-1]
            yw = px.val * px.ierr

            def f(q):
                pars1 = jnp.concatenate([q, jnp.ones_like(q[:1])])
                gm0, gflags = fill_fn(pars1)
                gm = gcore.gmix_convolve(gm0, pg)
                mh = gcore.eval_gmix(
                    gm, px.v, px.u, px.area, fast=True
                ) * px.ierr
                bad = (gflags != 0) | (gcore.gmix_flags(gm) != 0)
                r = jnp.where(bad, 1.0e10, F * mh - yw)
                # aux: (residual, flux column); the masked-bad rows
                # carry zero jacobian, matching jacfwd through the
                # constant 1e10 branch
                return r, (r, jnp.where(bad, 0.0, mh))

            Jq, (r, mcol) = jax.jacfwd(f, has_aux=True)(p[:-1])
            return r, jnp.concatenate([Jq, mcol[:, None]], axis=-1)

        lane = one_fluxcol if flux_col else one
        r, J = jax.vmap(lane)(pars, pixels, psf_gmix)
        return _normal_reductions(r, J)

    return normal_fn


def _exp_ad_normal_fn(pars, data):
    return _make_ad_normal_fn(gcore.fill_exp)(pars, data)


def _vp_unit_model_rows(fill_fn, q, px, pg):
    """unit-flux weighted model rows for ONE stamp at shape pars q:
    (mh [P], good scalar) with mh zeroed on bad parameter points"""
    pars1 = jnp.concatenate([q, jnp.ones_like(q[:1])])
    gm0, gflags = fill_fn(pars1)
    gm = gcore.gmix_convolve(gm0, pg)
    mh = gcore.eval_gmix(gm, px.v, px.u, px.area, fast=True) * px.ierr
    good = (gflags == 0) & (gcore.gmix_flags(gm) == 0)
    return mh, good


def _make_vp_normal_fn(fill_fn):
    """variable-projection normal-equation reductions: the flux is
    solved EXACTLY per evaluation (the model is linear in it), so the
    nonlinear problem is over the nshape shape pars only.

    Golub & Pereyra variable projection, with the reduced jacobian
    from jacfwd straight through the flux solve F(q) = <m̂,y>/<m̂,m̂> -
    AD-exact including the dF/dq term. The reduced cost equals the
    full cost at the optimal flux, so ftol semantics match the full
    solve; the gradient of the reduced problem equals the full
    gradient's shape block at (q, F(q)). One fewer tangent pass per
    iteration than the full-AD solve AND the flux dimension drops out
    of the curvature entirely (the first iterations no longer spend
    steps trading flux against size)."""

    def normal_fn(q, data):
        pixels, psf_gmix = data

        def one(qq, px, pg):
            yw = px.val * px.ierr
            tiny = jnp.asarray(
                np.finfo(np.dtype(yw.dtype.name)).tiny, yw.dtype
            )

            def f(q5):
                mh, good = _vp_unit_model_rows(fill_fn, q5, px, pg)
                den = jnp.sum(mh * mh)
                good = good & (den > tiny)
                den_s = jnp.where(good, den, 1.0)
                F = jnp.where(good, jnp.sum(mh * yw) / den_s, 0.0)
                r = jnp.where(good, F * mh - yw, 1.0e10)
                return r, r

            J, r = jax.jacfwd(f, has_aux=True)(qq)
            return r, J

        r, J = jax.vmap(one)(q, pixels, psf_gmix)
        return _normal_reductions(r, J)

    return normal_fn


def _vp_flux_batch(fill_fn, q, data):
    """optimal flux per lane at shape pars q (zero where invalid)"""
    pixels, psf_gmix = data

    def one(qq, px, pg):
        mh, good = _vp_unit_model_rows(fill_fn, qq, px, pg)
        den = jnp.sum(mh * mh)
        tiny = jnp.asarray(np.finfo(np.dtype(mh.dtype.name)).tiny, mh.dtype)
        good = good & (den > tiny)
        den_s = jnp.where(good, den, 1.0)
        return jnp.where(
            good, jnp.sum(mh * px.val * px.ierr) / den_s, 0.0
        )

    return jax.vmap(one)(q, pixels, psf_gmix)


def _exp_normal_fn(pars, planes, psf_gmix, interpret=False,
                   fill_fn=gcore.fill_exp):
    """fused normal-equation reductions (cost, Jtr, JtJ) for a batched
    simple-model fit via the Pallas kernel (ops.pallas_lm). The chain
    matrices come from jacfwd of the tiny fill+convolve+reparam map,
    so the jacobian is AD-exact; invalid parameter points (LOW_DET)
    get a huge finite cost so LM rejects the step, matching the
    fdiff=1e10 convention of _model_lm_fdiff."""
    from .ops.pallas_lm import gmix_normal_eqs_pallas, gmix_reparam

    v, u, ia, ve = planes
    gm0, gflags = fill_fn(pars)
    gm = gcore.gmix_convolve(gm0, psf_gmix)
    bad = (gflags != 0) | (gcore.gmix_flags(gm) != 0)

    def reparam_of(p, pg):
        g0, _ = fill_fn(p)
        return gmix_reparam(gcore.gmix_convolve(g0, pg))

    rp = gmix_reparam(gm)
    chain = jax.vmap(jax.jacfwd(reparam_of))(pars, psf_gmix)
    # jacfwd output [n, 6, npars] with q index second-to-last
    cost, Jtr, JtJ = gmix_normal_eqs_pallas(
        rp, chain, v, u, ia, ve, interpret=interpret,
    )
    dtype = cost.dtype
    eye = jnp.eye(pars.shape[-1], dtype=dtype)
    cost = jnp.where(bad, jnp.asarray(1.0e30, dtype), cost)
    Jtr = jnp.where(bad[:, None], 0.0, Jtr)
    JtJ = jnp.where(bad[:, None, None], eye, JtJ)
    return cost, Jtr, JtJ


def _run_varpro(fill_fn, data, guess, lo, hi, lm_conf, nres,
                compact_capacity, nshape):
    """variable-projection LM drive: reduced (shape-only) solve via
    _make_vp_normal_fn, then optimal flux + a full-width (nshape+1)-
    parameter normal evaluation at the reduced optimum for the
    reference-consistent covariance/flag epilogue (the GN refiner at
    niter=0 is exactly that evaluation; (q*, F(q*)) is a stationary
    point of the full problem so nothing moves). Loop-outcome flags
    (maxiter/func-notfinite/incomplete) and nfev/ier carry over from
    the reduced solve."""
    from . import flags as _flags
    from .defaults import PDEF
    from .fitting.lm import run_gn_refine_batched

    out5 = run_lm_normal_batched(
        _make_vp_normal_fn(fill_fn), data, guess[:, :nshape],
        lo[:nshape], hi[:nshape], lm_conf, nres=nres,
        compact_capacity=compact_capacity,
    )
    q = out5["pars"]
    ok5 = jnp.all(jnp.isfinite(q) & (jnp.abs(q) < 1.0e9), axis=-1)
    benign = jnp.zeros((nshape,), q.dtype).at[4].set(1.0)
    q_safe = jnp.where(ok5[:, None], q, benign)
    F = _vp_flux_batch(fill_fn, q_safe, data)
    pars_full = jnp.concatenate([q_safe, F[:, None]], axis=-1)
    out = run_gn_refine_batched(
        _make_ad_normal_fn(fill_fn, flux_col=True), data, pars_full,
        lo, hi, lm_conf, nres=nres, niter=0,
    )
    loop_bits = (
        _flags.MAXITER | _flags.LM_FUNC_NOTFINITE
        | _flags.SOLVER_INCOMPLETE
    )
    out["flags"] = out["flags"] | (out5["flags"] & loop_bits)
    out["pars"] = jnp.where(
        ok5[:, None], out["pars"],
        jnp.asarray(PDEF, q.dtype),
    )
    out["nfev"] = out5["nfev"]
    out["ier"] = out5["ier"]
    return out


def _moments_lm_guess(pixels, Tpsf, guess_fwhm=1.2):
    """batched LM starting guesses from one cheap gaussian
    weighted-moments pass: measured centroid and (halved) shape, the
    deweighted size with the psf subtracted, and the masked pixel sum
    as the flux scale. Shared by the flat and multi-band pipelines so
    an E=1/nband=1 mb fit starts from the identical point.

    pixels: batched Pixels with fields [B, npix]. Tpsf: [B] psf T to
    subtract from the deweighted size. Returns (guess5 [B, 5], the
    first five parameter columns, and wsum [B], the per-band flux
    scale the caller expands to its band layout).
    """
    from .moments import fwhm_to_T

    B = pixels.val.shape[0]
    dtype = pixels.val.dtype
    wt = jnp.zeros((B, 1, 6), dtype)
    Tw = float(fwhm_to_T(guess_fwhm))
    wt = wt.at[:, 0, 0].set(2 * np.pi * Tw / 2)
    wt = wt.at[:, 0, 3].set(Tw / 2)
    wt = wt.at[:, 0, 5].set(Tw / 2)
    msums = gcore.get_weighted_sums(
        wt, pixels, maxrad=1.0e9, with_cov=False
    )
    s = msums["sums"]
    mf = s[..., 5]
    mf_safe = jnp.where(mf > 0, mf, 1.0)
    cen_v = s[..., 0] / mf_safe
    cen_u = s[..., 1] / mf_safe
    mt = s[..., 4] / mf_safe
    e1 = jnp.clip(
        s[..., 2] / jnp.where(s[..., 4] > 0, s[..., 4], 1.0), -0.5, 0.5
    )
    e2 = jnp.clip(
        s[..., 3] / jnp.where(s[..., 4] > 0, s[..., 4], 1.0), -0.5, 0.5
    )
    # deweight the measured size and remove the psf
    Tmeas = jnp.clip(mt, 0.05, None)
    Tdew = 1.0 / jnp.clip(1.0 / Tmeas - 1.0 / Tw, 0.05, None)
    Tguess = jnp.clip(Tdew - Tpsf, 0.05, None)

    wsum = jnp.sum(pixels.val * (pixels.ierr > 0), axis=-1)
    guess5 = jnp.stack(
        [cen_v, cen_u, 0.5 * e1, 0.5 * e2, Tguess], axis=-1
    )
    return guess5, wsum


def _clamp_guess_in_bounds(guess, lo, hi):
    """clamp guesses strictly inside the box so the bounds transform
    starts in the interior. The margin must be TINY relative to the
    span: with wide production bounds (flux in [1e-3, 1e9]) a 1e-3
    margin would shove a ~1e2 moments-based flux guess up to 1e6,
    starting the fit nowhere near the optimum; e2i's own clip already
    handles exactly-on-bound values."""
    span = jnp.where(jnp.isfinite(hi - lo), hi - lo, jnp.ones_like(hi))
    return jnp.clip(guess, lo + 1.0e-9 * span, hi - 1.0e-9 * span)


def _lm_with_sheared_refine(pixels, psf_moms_all, lm_conf, types, B,
                            model, prior, bounds, niter):
    """full LM on the noshear lanes; the other metacal types take
    ``niter`` unconditional damped GN steps from the noshear optimum
    (fitting.lm.run_gn_refine_batched) - the sheared targets differ by
    an O(step) perturbation so the refinement converges quadratically
    at a fixed, compaction-free cost. Results reassemble in type
    order with the same keys as the single stacked solve."""
    T = len(types)
    i_ns = types.index("noshear")
    sl_ns = slice(i_ns * B, (i_ns + 1) * B)
    pix_ns = jax.tree.map(lambda x: x[sl_ns], pixels)
    res_ns = _exp_lm_measure(
        pix_ns, psf_moms_all[sl_ns], lm_conf, model=model, prior=prior,
        bounds=bounds,
    )
    others = [i for i in range(T) if i != i_ns]
    idx = jnp.concatenate(
        [jnp.arange(i * B, (i + 1) * B) for i in others]
    )
    pix_o = jax.tree.map(lambda x: x[idx], pixels)
    guess_o = jnp.tile(res_ns["pars"], (len(others), 1))
    res_o = _exp_lm_measure(
        pix_o, psf_moms_all[idx], lm_conf, model=model, prior=prior,
        bounds=bounds, guess=guess_o, refine=niter,
    )

    out = {}
    for key, v_ns in res_ns.items():
        v_o = res_o[key]
        if not (
            hasattr(v_ns, "ndim") and v_ns.ndim >= 1
            and v_ns.shape[0] == B
        ):
            out[key] = v_ns
            continue
        blocks = []
        j = 0
        for i in range(T):
            if i == i_ns:
                blocks.append(v_ns)
            else:
                blocks.append(v_o[j * B:(j + 1) * B])
                j += 1
        out[key] = jnp.concatenate(blocks, axis=0)
    return out


def _exp_lm_measure(pixels, psf_sigma, lm_conf, guess_fwhm=1.2,
                    use_pallas=None, interpret=False,
                    compact_capacity="auto", model="exp",
                    prior=None, bounds=None, guess=None, refine=0):
    """batched model LM fit (model in "exp" | "gauss" | "dev" |
    "bdf" | "bd"); psf is the analytic round target gaussian. bdf
    adds a fracdev column before the flux (7 pars, started at
    fracdev=0.5); bd adds [log10(Td/Te), fracdev] (8 pars, started at
    [0, 0.5]). ref: gmix_nb.py:470-558, fitting/results.py:1013-1047.
    Starting guesses come from a cheap gaussian weighted-moments pass
    (deweighted size, measured shape and centroid), cutting the LM
    iteration count roughly in half vs fixed-scale guesses.

    The solve runs through the batched normal-equation LM driver with
    straggler compaction (run_lm_normal_batched): the full batch
    iterates only until the unconverged tail fits in B/8 lanes, then
    the tail is gathered and finished at 1/8 the per-iteration cost
    (nfev p50 ~ 5 but max ~ 23 on survey batches, so the last ~1% of
    lanes would otherwise set the whole batch's wall clock).

    use_pallas routes the reductions through the fused Pallas kernel
    instead of vmapped AD - see ops/pallas_lm.py for why AD is the
    default on current hardware.

    prior: a joint prior with fill_fdiff_device(pars) -> rows (e.g.
    PriorSimpleSep); its rows regularize every lane's fit exactly as in
    the single-object path. bounds: (lo, hi) arrays of shape [6] with
    +-inf for unbounded sides (the reference's production fits are
    bounded+prior-regularized; ngmix/fitting/results.py:439-485)."""
    B = pixels.val.shape[0]
    dtype = pixels.val.dtype
    # psf_sigma: [B] round sigma, or [B, 3] full (irr, irc, icc)
    # moments (psf-sheared types / dilate-mode gaussian psf fits)
    psf_sigma = jnp.asarray(psf_sigma, dtype)
    if psf_sigma.ndim == 2:
        p_irr = psf_sigma[:, 0]
        p_irc = psf_sigma[:, 1]
        p_icc = psf_sigma[:, 2]
    else:
        p_irr = p_icc = psf_sigma**2
        p_irc = jnp.zeros_like(p_irr)
    psf_gmix = jnp.zeros((B, 1, 6), dtype)
    psf_gmix = psf_gmix.at[:, 0, 0].set(1.0)
    psf_gmix = psf_gmix.at[:, 0, 3].set(p_irr)
    psf_gmix = psf_gmix.at[:, 0, 4].set(p_irc)
    psf_gmix = psf_gmix.at[:, 0, 5].set(p_icc)

    nshape = _MODEL_NSHAPE[model]
    npars = nshape + 1
    # moments-based starting guesses; models with extra shape columns
    # (bdf fracdev) start those at 0.5. Caller-supplied guesses (warm
    # starts from the noshear fit) are used per-lane only where sane:
    # a failed noshear fit carries the PDEF sentinel (-9.999e9) in its
    # pars, which would otherwise seed every sheared type of that lane
    # with garbage and guarantee failures the fresh-guess path would
    # not have had
    guess5, wsum = _moments_lm_guess(
        pixels, p_irr + p_icc, guess_fwhm
    )
    cols = [guess5]
    if nshape > 5:
        extra = jnp.asarray(_MODEL_EXTRA_GUESS[model], dtype)
        cols.append(jnp.broadcast_to(extra, (B, nshape - 5)))
    cols.append(wsum[:, None])
    default_guess = jnp.concatenate(cols, axis=-1)
    if guess is None:
        guess = default_guess
    else:
        guess = jnp.asarray(guess, dtype)
        bad = ~jnp.all(
            jnp.isfinite(guess) & (jnp.abs(guess) < 1.0e9), axis=-1
        )
        guess = jnp.where(bad[:, None], default_guess, guess)
    if bounds is None:
        lo = jnp.full(npars, -jnp.inf, dtype)
        hi = jnp.full(npars, jnp.inf, dtype)
    else:
        lo = jnp.asarray(bounds[0], dtype)
        hi = jnp.asarray(bounds[1], dtype)
        guess = _clamp_guess_in_bounds(guess, lo, hi)

    # Measured on TPU v5e (B=5120, P=625, n=6): the fused kernel runs
    # 7.3 ms/iteration vs 8.2 ms for the ENTIRE AD iteration - Mosaic
    # codegen of the ~216 per-lane scalar-broadcast FMAs loses to
    # XLA's fused big-tensor AD code, so the AD path stays the
    # default. The kernel's O(B*P) HBM footprint (no [B, n, P]
    # intermediates) can still win when batch * pixels presses HBM.
    if use_pallas is None:
        use_pallas = False
    if compact_capacity == "auto":
        compact_capacity = _auto_cascade(B)
    # per-stamp unmasked row count for the chi2/dof covariance scale
    nres = jnp.sum(pixels.ierr > 0, axis=-1)
    fill_fn = _MODEL_FILLS[model]
    if use_pallas:
        data = (_lm_planes(pixels), psf_gmix)
        normal_fn = lambda p, d: _exp_normal_fn(  # noqa: E731
            p, d[0], d[1], interpret=interpret, fill_fn=fill_fn
        )
    else:
        data = (pixels, psf_gmix)
        normal_fn = _make_ad_normal_fn(fill_fn, flux_col=lm_conf.flux_col)
    prior_fn = None if prior is None else prior.fill_fdiff_device
    if lm_conf.varpro and not refine:
        if prior is not None:
            raise ValueError(
                "varpro solves the flux exactly per evaluation; it "
                "cannot honor a prior (which couples all pars). Use "
                "the standard path."
            )
        if bounds is not None and not (
            np.isinf(np.asarray(bounds[0])[-1])
            and np.isinf(np.asarray(bounds[1])[-1])
        ):
            raise ValueError(
                "varpro requires an unbounded flux (it is solved "
                "exactly, not iterated)"
            )
        out = _run_varpro(
            fill_fn, (pixels, psf_gmix), guess, lo, hi, lm_conf, nres,
            compact_capacity, nshape,
        )
    elif refine:
        from .fitting.lm import run_gn_refine_batched

        out = run_gn_refine_batched(
            normal_fn, data, guess, lo, hi, lm_conf, nres=nres,
            niter=refine, prior_fn=prior_fn,
        )
    else:
        out = run_lm_normal_batched(
            normal_fn, data, guess, lo, hi, lm_conf, nres=nres,
            compact_capacity=compact_capacity, prior_fn=prior_fn,
        )
    s2n_sums = _model_s2n_sums(
        out["pars"], out["flags"], fill_fn, psf_gmix, pixels
    )
    _lm_result_columns(out, model, nshape, s2n_sums=s2n_sums)
    return out


def _auto_cascade(B):
    """default straggler-compaction capacities for a batch of B lanes.

    Geometric halving B/2, B/4, ... tracks the shrinking active set
    (measured on v5e, B=5120: 0.240s -> 0.130s for the LM stage). An
    optional 3B/4 head level (NGMIX_CASCADE34=1) gathers one iteration
    earlier at the cost of an extra near-full-width data copy —
    measured 3% SLOWER at the headline config (same-session A/B,
    tools/ab_cascade.py); kept env-gated for HBM-pressed shapes where
    the earlier narrowing may pay.
    """
    caps = tuple(B // (2 ** i) for i in range(1, 8) if B // (2 ** i) >= 32)
    if os.environ.get("NGMIX_CASCADE34", "0") == "1" and 3 * B // 4 >= 32:
        caps = (3 * B // 4,) + caps
    return caps


def _safe_best_pars(pars, flags):
    """best-fit pars with failed lanes replaced by a benign round
    unit-T point: sentinel pars (PDEF) would overflow the gaussian
    fill; flags != 0 lanes are masked to zero downstream. Shared by
    the flat and mb s2n epilogues so the masking rule cannot drift."""
    npars = pars.shape[-1]
    benign = jnp.zeros((npars,), pars.dtype).at[4].set(1.0)
    return jnp.where((flags == 0)[:, None], pars, benign)


def _model_s2n_sums(pars, flags, fill_fn, psf_gmix, pixels):
    """model-weighted s/n sums at the best-fit parameters.

    The reference definition (ngmix/fitting/results.py:56-67) built
    from the per-pixel sums of ngmix/gmix/gmix_nb.py:825-874:
    s2n_numer = sum(val*model*ivar), s2n_denom = sum(model^2*ivar)."""
    safe = _safe_best_pars(pars, flags)
    gm0, _ = fill_fn(safe)
    gm = gcore.gmix_convolve(gm0, psf_gmix)
    _, num, den, _ = gcore.get_loglike(gm, pixels)
    return num, den


def _lm_result_columns(out, model, nshape, nband=1, s2n_sums=None):
    """add the derived catalog columns (e1/e2/T/flux/s2n + composite
    model extras) to a batched LM result dict, in place. Shared by the
    flat and mb pipelines so the column contract cannot drift.

    Single-band fluxes are scalar [B] (so mixed 1-epoch/multi-epoch
    ragged buckets merge); multi-band keeps [B, nband].

    s2n follows the reference definition when the call site supplies
    the model-weighted sums (s2n_sums=(numer, denom), see
    _model_s2n_sums): s2n = numer/sqrt(denom), zero for failed or
    zero-signal lanes (ngmix/fitting/results.py:56-67). The flux-based
    proxy |flux|/flux_err is always kept as s2n_flux; for nband > 1 it
    uses the band-SUM flux with its error from the full flux covariance
    block (1^T C 1 - band fluxes are correlated through the shared
    cen/shape/T parameters, so the quadrature sum of marginal errors
    understates Var(sum) and would overstate s2n)."""
    out["e1"] = out["pars"][:, 2]
    out["e2"] = out["pars"][:, 3]
    out["T"] = out["pars"][:, 4]
    if nband == 1:
        out["flux"] = out["pars"][:, nshape]
        ferr = out["pars_err"][:, nshape]
        s2n_flux = jnp.where(
            ferr > 0, jnp.abs(out["flux"]) / ferr, 0.0
        )
    else:
        out["flux"] = out["pars"][:, nshape:]
        fsum = jnp.sum(out["flux"], axis=-1)
        fcov = out["pars_cov"][:, nshape:, nshape:]
        esum = jnp.sqrt(jnp.clip(jnp.sum(fcov, axis=(-2, -1)), 0.0))
        s2n_flux = jnp.where(
            esum > 0, jnp.abs(fsum) / esum, 0.0
        )
    out["s2n_flux"] = s2n_flux
    if s2n_sums is None:
        out["s2n"] = s2n_flux
    else:
        num, den = s2n_sums
        ok = (out["flags"] == 0) & (den > 0)
        out["s2n"] = jnp.where(
            ok, num / jnp.sqrt(jnp.where(den > 0, den, 1.0)), 0.0
        )
    if model == "bdf":
        out["fracdev"] = out["pars"][:, 5]
    elif model == "bd":
        out["logTdByTe"] = out["pars"][:, 5]
        out["fracdev"] = out["pars"][:, 6]


def make_metacal_pipeline_fn(conf: MetacalConfig, measure="gaussmom",
                             measure_fwhm=1.2, lm_conf=None,
                             lm_prior=None, lm_bounds=None,
                             max_chunk=10240, inflight=2):
    """jitted batched pipeline closure.

    lm_conf / lm_prior / lm_bounds pass through to the LM measures
    (see metacal_pipeline): production fits are typically
    prior-regularized and bounded.

    max_chunk: batches larger than this are processed as successive
    sub-batches of (at most) this size inside one host call, so the
    fixed per-dispatch latency and the compile cache amortize while
    the working set stays below the HBM knee; batches that are
    multiples of max_chunk compile exactly one program shape. None
    disables chunking. Results are concatenated; per-lane outputs are
    identical to a single-batch run except for LM straggler-compaction
    capacities, which scale with the chunk size (compaction never
    changes per-lane results).

    The 10240 default is the largest |m|-validated program shape
    (full bench gate green at B=10240: m=3.9e-4, hetero 4.0e-4).
    CAUTION on retuning: round 4's throughput sweep found a "39-41k
    stamps/s sweet spot" at exactly 6144 (vs ~31k at 8192-12288) that
    turned out to be an XLA TPU wrong-code artifact - the compiled LM
    froze ~every lane at its starting guess after one iteration, so
    the program was fast because it wasn't fitting, and three
    different restructurings of the solver all miscompiled (in
    different ways) at that one shape — see run_lm_normal_batched's
    wrong-code history note. Any chunk-size retune must be validated
    by a full `python bench.py` gate run (|m| AND |hetero m| < 1e-3)
    at the new shape, never by throughput alone. Dispatcher-chosen
    program shapes are restricted to the per-lane-VALIDATED set: a
    remainder chunk (or a quarantined exact batch like B=6144) runs
    as 2048-stamp programs or is padded up to an 8192/10240-stamp
    program with dummy lanes that are sliced off the results — see
    _chunk_schedule. A single-shot batch (B <= max_chunk) keeps the
    user's own shape.

    inflight: at most this many chunk programs are dispatched ahead of
    the oldest unfetched one (2 keeps the device queue busy while
    bounding the live input-copy + output working set; round 4's
    unbounded dispatch OOMed 16G HBM at B=18432).
    """

    @jax.jit
    def fn(images, weights, cens, psf_images, psf_cens, noise):
        return metacal_pipeline(
            images, weights, cens, psf_images, psf_cens, noise, conf,
            measure=measure, measure_fwhm=measure_fwhm, lm_conf=lm_conf,
            lm_prior=lm_prior, lm_bounds=lm_bounds,
        )

    if max_chunk is None:
        return fn
    if max_chunk in _XLA_TPU_QUARANTINED_CHUNKS:
        raise ValueError(
            "max_chunk=%d is a quarantined XLA-TPU wrong-code program "
            "shape (see _chunk_schedule)" % max_chunk
        )

    def chunked(images, weights, cens, psf_images, psf_cens, noise):
        B = images.shape[0]
        sched = _chunk_schedule(B, max_chunk)
        if len(sched) == 1 and sched[0] == (B, B):
            return fn(images, weights, cens, psf_images, psf_cens, noise)
        args = (images, weights, cens, psf_images, psf_cens, noise)
        parts = []
        i = 0
        for j, (real, size) in enumerate(sched):
            if j >= inflight:
                _sync_result(parts[j - inflight])
            chunk = [a[i:i + real] for a in args]
            if size > real:
                # pad to a validated program shape with copies of the
                # first lane (lane-independent pipeline: real-lane
                # results are unchanged); sliced off below
                chunk = [
                    jnp.concatenate(
                        [c, jnp.repeat(c[:1], size - real, axis=0)],
                        axis=0,
                    )
                    for c in chunk
                ]
            out = fn(*chunk)
            if size > real:
                out = jax.tree.map(lambda x: x[:real], out)
            parts.append(out)
            i += real
        return jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts
        )

    return chunked


# XLA-TPU wrong-code quarantine: flat-pipeline program shapes known to
# miscompile the fused metacal+LM program on current XLA TPU (the
# round-4 headline regression - the compiled solver froze ~every lane
# at its starting guess with flags=0; see make_metacal_pipeline_fn's
# retune caution and run_lm_normal_batched's history note). Without
# this, B=6144 exactly would single-shot the bad shape. More broadly,
# ANY dispatcher-chosen shape the validation harness never ran is
# suspect, so remainder scheduling below is restricted to the
# per-lane-validated ladder. Applies only to the flat chunk schedule -
# the mb pipeline compiles a structurally different program and has
# shown no artifact signature at its folded-row shapes.
_XLA_TPU_QUARANTINED_CHUNKS = frozenset({6144})
# program shapes validated per-lane against CPU on fixed sims
# (tools/diag_6144.py; 2048+10240 round 5 opening, 8192 via
# diag_cmp8192.log) - dispatcher-chosen chunks only ever compile these
_LADDER_SMALL = 2048
_LADDER_BIG = (8192, 10240)
# measured on-chip: 2048-stamp programs sustain ~20k stamps/s vs ~31k
# for 8192/10240, so padding a remainder r up to 8192 beats splitting
# it into 2048s once r/8192*31k > 20k, i.e. r > ~5284; 5120 (= 2.5x
# 2048) is the scheduling breakeven used
_SPLIT_BREAKEVEN = 5120


def _chunk_schedule(B, max_chunk):
    """flat-closure chunk schedule: a list of (n_real, program_size)
    entries covering B.

    A batch that fits one program (B <= max_chunk) keeps the user's
    own shape - their explicit choice, like the reference's obs
    config. Beyond that the DISPATCHER picks the shapes, and it only
    ever picks per-lane-validated ones: full max_chunk chunks, then a
    remainder either split into _LADDER_SMALL-stamp programs (small
    remainders) or padded up to the nearest _LADDER_BIG shape (large
    remainders; dummy lanes are sliced off the results). Quarantined
    exact batches (B=6144, the known XLA-TPU wrong-code shape) are
    routed through the remainder path instead of single-shotting.
    If max_chunk is too small for the ladder (< _LADDER_SMALL), the
    remainder runs at its own (small, cheap-to-cross-check) shape.
    """
    if B <= max_chunk and B not in _XLA_TPU_QUARANTINED_CHUNKS:
        return [(B, B)]
    sched = []
    left = B
    while left > max_chunk:
        sched.append((max_chunk, max_chunk))
        left -= max_chunk
    r = left
    if r == 0:
        return sched
    if max_chunk < _LADDER_SMALL:
        sched.append((r, r))
        return sched
    big = [s for s in _LADDER_BIG if r <= s <= max_chunk]
    if r > _SPLIT_BREAKEVEN and big:
        sched.append((r, big[0]))
        return sched
    while r > 0:
        c = min(r, _LADDER_SMALL)
        sched.append((c, _LADDER_SMALL))
        r -= c
    return sched


def _sync_result(part):
    """block until a dispatched chunk's program has executed, bounding
    the number of in-flight chunk programs (and so the live input-copy
    + output working set) without draining the device queue: the next
    chunk is already queued while this one is fetched. A scalar fetch,
    not block_until_ready - the latter does not reliably block on
    remote-tunnel backends."""
    float(jnp.sum(jax.tree.leaves(part)[0]))


def make_metacal_pipeline_mb_fn(conf: MetacalConfig, band, nband,
                                measure="exp-lm", measure_fwhm=1.2,
                                lm_conf=None, lm_prior=None,
                                lm_bounds=None, max_chunk=4096,
                                inflight=2, objective="auto"):
    """jitted multi-band pipeline closure, the mb analog of
    make_metacal_pipeline_fn (same chunking/dispatch/inflight
    contract; the default max_chunk is in OBJECTS, sized for E~3
    epochs each).

    band: [E] shared epoch->band map, or [B, E] per-object maps - a
    2-d band map is chunked with the batch.

    objective ("auto"/"epoch"/"fused"): see metacal_pipeline_mb. Under
    "auto" the pick is made per PROGRAM shape, i.e. from the chunk
    size, which is what actually compiles.
    """
    band = jnp.asarray(band, jnp.int32)

    @jax.jit
    def fn(images, weights, cens, psf_images, psf_cens, noise, band_c):
        return metacal_pipeline_mb(
            images, weights, cens, psf_images, psf_cens, noise,
            band_c, nband, conf, measure=measure,
            measure_fwhm=measure_fwhm, lm_conf=lm_conf,
            lm_prior=lm_prior, lm_bounds=lm_bounds, objective=objective,
        )

    if max_chunk is None:
        return lambda *args: fn(*args, band)

    def chunked(images, weights, cens, psf_images, psf_cens, noise):
        B = images.shape[0]
        args = (images, weights, cens, psf_images, psf_cens, noise)
        if B <= max_chunk:
            return fn(*args, band)
        parts = []
        for j, i in enumerate(range(0, B, max_chunk)):
            if j >= inflight:
                _sync_result(parts[j - inflight])
            parts.append(fn(
                *[a[i:i + max_chunk] for a in args],
                band if band.ndim == 1 else band[i:i + max_chunk],
            ))
        return jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts
        )

    return chunked


def shear_response_sums(results):
    """per-type partial calibration sums {type: {"se": [2], "n": []}}.

    These are the shard-local quantities whose cross-chip psum exactly
    reconstructs the global shear_response - the only data that needs
    to cross the ICI in the sharded pipeline.
    """
    missing = [t for t in GALSHEAR_TYPES if t not in results]
    if missing:
        raise ValueError(
            "shear_response needs all five galshear metacal types; "
            "results lack %s (run with types including %s)"
            % (missing, GALSHEAR_TYPES)
        )
    out = {}
    for t in GALSHEAR_TYPES:
        ok = results[t]["flags"] == 0
        se = jnp.stack([
            jnp.sum(jnp.where(ok, results[t]["e1"], 0.0)),
            jnp.sum(jnp.where(ok, results[t]["e2"], 0.0)),
        ])
        out[t] = {"se": se, "n": jnp.sum(ok)}
    return out


def shear_response_from_sums(sums, step=DEFAULT_STEP):
    """shear_response from (psum'd) partial sums"""
    def mean_e(t):
        # an all-flagged batch divides by 1 and yields e=0 instead of
        # nan; n_used in the output exposes the empty selection
        return sums[t]["se"] / jnp.maximum(sums[t]["n"], 1)

    e_ns = mean_e("noshear")
    R11 = (mean_e("1p")[0] - mean_e("1m")[0]) / (2 * step)
    R22 = (mean_e("2p")[1] - mean_e("2m")[1]) / (2 * step)
    R12 = (mean_e("2p")[0] - mean_e("2m")[0]) / (2 * step)
    R21 = (mean_e("1p")[1] - mean_e("1m")[1]) / (2 * step)
    R = jnp.array([[R11, R12], [R21, R22]])
    shear = jnp.linalg.solve(R, e_ns)
    return {
        "e_mean": e_ns, "R": R, "shear": shear,
        "n_used": sums["noshear"]["n"],
    }


def shear_response(results, step=DEFAULT_STEP):
    """mean shear and response from a batched metacal result dict.

    Returns dict with e_mean [2], R [2, 2], shear [2] = R^-1 e_mean
    (the standard metacal estimator).
    """
    return shear_response_from_sums(shear_response_sums(results), step=step)


def psf_shear_response(results, step=DEFAULT_STEP):
    """psf-leakage response R_psf from the *_psf metacal types.

    R_psf[i, j] = d<e_i>/d g_psf_j, estimated from the counterfactual
    sheared-psf images (1p_psf..2m_psf; requires psf_mode='dilate').
    Users correct the mean shape as <e> - R_psf g_psf (the reference
    exposes the same types through MetacalDilatePSF.get_all,
    metacal/metacal.py:118-248).
    """
    def mean_e(t):
        ok = results[t]["flags"] == 0
        n = jnp.maximum(jnp.sum(ok), 1)
        e1 = jnp.sum(jnp.where(ok, results[t]["e1"], 0.0)) / n
        e2 = jnp.sum(jnp.where(ok, results[t]["e2"], 0.0)) / n
        return jnp.stack([e1, e2])

    d1 = (mean_e("1p_psf") - mean_e("1m_psf")) / (2 * step)
    d2 = (mean_e("2p_psf") - mean_e("2m_psf")) / (2 * step)
    return jnp.stack([d1, d2], axis=-1)  # [i, j] = de_i / dgpsf_j


def shear_response_select(results, select_fn, step=DEFAULT_STEP):
    """mean shear with the selection-response correction.

    The measurement response R is computed from the sheared
    measurements under the selection derived from noshear; the
    selection response R_sel uses the NOSHEAR ellipticities averaged
    under selections derived from each sheared catalog
    (Sheldon & Huff 2017 eq. 10-12; the reference demonstrates this in
    examples/metacal/metacal_select.py). select_fn maps a type's
    result dict to a boolean [B] keep mask. Returns e_mean, R, R_sel,
    and shear = (R + R_sel)^-1 e_mean.
    """
    def mean_e_n(val_t, sel_t):
        ok = (
            (results[val_t]["flags"] == 0)
            & (results[sel_t]["flags"] == 0)
            & select_fn(results[sel_t])
        )
        n = jnp.sum(ok)
        n_safe = jnp.maximum(n, 1)  # empty selection -> e=0, n_used=0
        e1 = jnp.sum(jnp.where(ok, results[val_t]["e1"], 0.0)) / n_safe
        e2 = jnp.sum(jnp.where(ok, results[val_t]["e2"], 0.0)) / n_safe
        return jnp.stack([e1, e2]), n

    def mean_e(val_t, sel_t):
        return mean_e_n(val_t, sel_t)[0]

    e_ns, n_used = mean_e_n("noshear", "noshear")
    # measurement response: sheared measurements, noshear selection
    R = jnp.array(
        [
            [
                (mean_e("1p", "noshear")[0] - mean_e("1m", "noshear")[0]),
                (mean_e("2p", "noshear")[0] - mean_e("2m", "noshear")[0]),
            ],
            [
                (mean_e("1p", "noshear")[1] - mean_e("1m", "noshear")[1]),
                (mean_e("2p", "noshear")[1] - mean_e("2m", "noshear")[1]),
            ],
        ]
    ) / (2 * step)
    # selection response: noshear measurements, sheared selections
    R_sel = jnp.array(
        [
            [
                (mean_e("noshear", "1p")[0] - mean_e("noshear", "1m")[0]),
                (mean_e("noshear", "2p")[0] - mean_e("noshear", "2m")[0]),
            ],
            [
                (mean_e("noshear", "1p")[1] - mean_e("noshear", "1m")[1]),
                (mean_e("noshear", "2p")[1] - mean_e("noshear", "2m")[1]),
            ],
        ]
    ) / (2 * step)
    shear = jnp.linalg.solve(R + R_sel, e_ns)
    return {
        "e_mean": e_ns, "R": R, "R_sel": R_sel, "shear": shear,
        "n_used": n_used,
    }


def shear_response_select_consistent(results, select_fn,
                                     step=DEFAULT_STEP):
    """mean shear with shear-CONSISTENT per-type selection.

    Each sheared type's sample is selected entirely by that type's
    OWN catalog (flags==0 plus select_fn on its own measurements), so
    the selection response is absorbed into R instead of being a
    separate first-order R_sel term — the metadetect methodology, and
    what the reference's accuracy oracle does (its test selects
    w/w_1p/w_1m per shear type before forming R11;
    ngmix/tests/test_metacal_accuracy.py:56-58,122-143).

    Prefer this over shear_response_select at survey noise: the
    two-term split's cross-type flag/selection intersections measured
    a spurious m ~ 1.3e-3 on a 1M-pair NULL-control (an s2n cut that
    never binds, where any unbiased estimator must return the plain
    no-selection answer) while this estimator read 1.8e-4
    (tools/tpu_logs/pm_sel_null.log, s2n ~ 15, 2026-08-19). Both are
    first-order metacal estimators; they agree when flags and the
    selection are shear-independent.

    select_fn maps a type's result dict to a boolean [B] keep mask.
    Returns e_mean (noshear, own selection), R (2x2, absorbing the
    selection response), shear = R^-1 e_mean, and n_used.
    """
    def mean_e_n(t):
        r = results[t]
        ok = (r["flags"] == 0) & select_fn(r)
        n = jnp.sum(ok)
        n_safe = jnp.maximum(n, 1)  # empty selection -> e=0, n_used=0
        e1 = jnp.sum(jnp.where(ok, r["e1"], 0.0)) / n_safe
        e2 = jnp.sum(jnp.where(ok, r["e2"], 0.0)) / n_safe
        return jnp.stack([e1, e2]), n

    e_ns, n_used = mean_e_n("noshear")
    e_1p, _ = mean_e_n("1p")
    e_1m, _ = mean_e_n("1m")
    e_2p, _ = mean_e_n("2p")
    e_2m, _ = mean_e_n("2m")
    R = jnp.array(
        [
            [e_1p[0] - e_1m[0], e_2p[0] - e_2m[0]],
            [e_1p[1] - e_1m[1], e_2p[1] - e_2m[1]],
        ]
    ) / (2 * step)
    shear = jnp.linalg.solve(R, e_ns)
    return {"e_mean": e_ns, "R": R, "shear": shear, "n_used": n_used}


# ----------------------------------------------------------------------
# multi-epoch / multi-band pipeline (MEDS-style)

def _mb_epochwise_normal_fn(model, nband):
    """multi-band normal-equation reductions with PER-EPOCH jacobians.

    The joint fit's global parameter vector is [nshape shared pars +
    nband fluxes], but any single epoch only ever sees 6-8 effective
    parameters: the shared shape plus its OWN band's flux
    (epoch_band_pars). jacfwd over the global vector therefore wastes
    nband-1 tangent passes per epoch on identically-zero flux columns
    and materializes a [B, E*P, nshape+nband] jacobian. Instead:
    jacfwd each epoch-stamp over its 6-8 effective pars (the SAME
    per-stamp work as the flat pipeline), reduce per epoch with the
    unrolled kernels, and assemble the global (Jtr, JtJ) with band
    one-hot sums over the epoch axis - the flux block of JtJ is
    diagonal by construction (an epoch contributes to exactly one
    band). Bad-parameter coupling matches the fused objective: any bad
    epoch poisons the whole lane (rows FDIFF_BAD, zero gradient).

    At E=1/nband=1 every reduction degenerates to the flat pipeline's
    (the epoch sum is over one element), so the mb==flat bitwise
    parity test gates this path too.
    """
    from .fitting.fit_model import FDIFF_BAD, epoch_band_pars

    fill_fn = _MODEL_FILLS[model]
    start = _MODEL_NSHAPE[model]

    def normal_fn(pars, d):
        px, pg, bnd = d.pixels, d.psf_gmix, d.band
        Bc, E = bnd.shape
        bpars = jax.vmap(
            lambda p, b: epoch_band_pars(model, p, b)
        )(pars, bnd)  # [Bc, E, start+1]

        def one(p6, pxe, pge):
            def f(q):
                return _model_lm_fdiff(q, (pxe, pge), fill_fn)

            return f(p6), jax.jacfwd(f)(p6)

        # nested vmap (lanes x epochs), NOT a fold-reshape to [Bc*E]:
        # the pixel tree is loop-invariant, and a reshape inside the
        # while_loop body is a per-iteration copy of every pixel plane
        # if the TPU compiler fails to hoist it
        r, J = jax.vmap(jax.vmap(one))(
            bpars, px, pg
        )  # [Bc, E, P], [Bc, E, P, start+1] (bdf/bd carry extra cols)

        # epoch-bad coupling (cheap re-fill; flags only, no pixels)
        gm0, gflags = fill_fn(bpars)
        gm = gcore.gmix_convolve(gm0, pg)
        bad_e = (gflags != 0) | (gcore.gmix_flags(gm) != 0)
        any_bad = jnp.any(bad_e.reshape(Bc, E), axis=1)  # [Bc]
        r = jnp.where(any_bad[:, None, None], FDIFF_BAD, r)
        J = jnp.where(any_bad[:, None, None, None], 0.0, J)

        cost_e, jtr_e, jtj_e = _normal_reductions(r, J)
        cost = cost_e.sum(axis=1)
        oh = (
            bnd[:, :, None] == jnp.arange(nband, dtype=bnd.dtype)
        ).astype(r.dtype)  # [Bc, E, nband]

        Jtr_s = jnp.sum(jtr_e[..., :start], axis=1)  # [Bc, start]
        Jtr_f = jnp.sum(
            oh * jtr_e[..., start][..., None], axis=1
        )  # [Bc, nband]
        Jtr = jnp.concatenate([Jtr_s, Jtr_f], axis=-1)

        SS = jnp.sum(jtj_e[..., :start, :start], axis=1)
        SF = jnp.sum(
            jtj_e[..., :start, start][..., None] * oh[:, :, None, :],
            axis=1,
        )  # [Bc, start, nband]
        ff_diag = jnp.sum(
            oh * jtj_e[..., start, start][..., None], axis=1
        )  # [Bc, nband]
        FF = jax.vmap(jnp.diag)(ff_diag)
        top = jnp.concatenate([SS, SF], axis=-1)
        bot = jnp.concatenate(
            [jnp.swapaxes(SF, -1, -2), FF], axis=-1
        )
        JtJ = jnp.concatenate([top, bot], axis=-2)
        return cost, Jtr, JtJ

    return normal_fn


def _mb_epochwise_normal_fn_t(model, nband):
    """_mb_epochwise_normal_fn over EPOCH-LEADING [E, Bc, P] pixel
    planes (same math, same per-lane results).

    Why the layout matters: TPU f32 tiles are (8 sublanes, 128 lanes)
    on the two minor dims, so a lane-leading [Bc, E, P] tensor puts
    E = 2-3 epochs in the 8-wide sublane dim and pads 8/E-fold -
    measured as the mb solver running at half the flat solver's
    lanes/s (tools/tpu_logs/solver_iso2.log: 63.6k vs 125.6k at
    N=12288). With E leading, every heavy op works on fully-packed
    [Bc, P] minor dims, exactly like the flat objective. Only the
    parameter transpose [Bc, E, n] -> [E, Bc, n] (tiny) happens per
    iteration; the pixel planes enter the loop already transposed
    (see metacal_pipeline_mb) and are gathered by _mb_gather_t.
    """
    from .fitting.fit_model import FDIFF_BAD, epoch_band_pars

    fill_fn = _MODEL_FILLS[model]
    start = _MODEL_NSHAPE[model]

    def normal_fn(pars, d):
        px, pg, bnd = d.pixels, d.psf_gmix, d.band
        Bc, E = bnd.shape
        bpars = jax.vmap(
            lambda p, b: epoch_band_pars(model, p, b)
        )(pars, bnd)  # [Bc, E, start+1]
        bpars_t = jnp.swapaxes(bpars, 0, 1)  # [E, Bc, start+1]

        def one(p6, pxe, pge):
            def f(q):
                return _model_lm_fdiff(q, (pxe, pge), fill_fn)

            return f(p6), jax.jacfwd(f)(p6)

        r, J = jax.vmap(jax.vmap(one))(
            bpars_t, px, pg
        )  # [E, Bc, P], [E, Bc, P, start+1]

        # epoch-bad coupling (cheap re-fill; flags only, no pixels)
        gm0, gflags = fill_fn(bpars_t)
        gm = gcore.gmix_convolve(gm0, pg)
        bad_e = (gflags != 0) | (gcore.gmix_flags(gm) != 0)
        any_bad = jnp.any(bad_e, axis=0)  # [Bc]
        r = jnp.where(any_bad[None, :, None], FDIFF_BAD, r)
        J = jnp.where(any_bad[None, :, None, None], 0.0, J)

        cost_e, jtr_e, jtj_e = _normal_reductions(r, J)
        cost = cost_e.sum(axis=0)
        oh = (
            bnd.T[:, :, None] == jnp.arange(nband, dtype=bnd.dtype)
        ).astype(r.dtype)  # [E, Bc, nband]

        Jtr_s = jnp.sum(jtr_e[..., :start], axis=0)  # [Bc, start]
        Jtr_f = jnp.sum(
            oh * jtr_e[..., start][..., None], axis=0
        )  # [Bc, nband]
        Jtr = jnp.concatenate([Jtr_s, Jtr_f], axis=-1)

        SS = jnp.sum(jtj_e[..., :start, :start], axis=0)
        SF = jnp.sum(
            jtj_e[..., :start, start][..., None] * oh[:, :, None, :],
            axis=0,
        )  # [Bc, start, nband]
        ff_diag = jnp.sum(
            oh * jtj_e[..., start, start][..., None], axis=0
        )  # [Bc, nband]
        FF = jax.vmap(jnp.diag)(ff_diag)
        top = jnp.concatenate([SS, SF], axis=-1)
        bot = jnp.concatenate(
            [jnp.swapaxes(SF, -1, -2), FF], axis=-1
        )
        JtJ = jnp.concatenate([top, bot], axis=-2)
        return cost, Jtr, JtJ

    return normal_fn


def _mb_gather_t(d, idx):
    """straggler-compaction gather for the epoch-leading solver data:
    pixels/psf_gmix keep the lane axis SECOND ([E, Bc, ...]); band
    stays lane-leading"""
    return d._replace(
        pixels=jax.tree.map(lambda x: x[:, idx], d.pixels),
        psf_gmix=d.psf_gmix[:, idx],
        band=d.band[idx],
    )


def _mb_epochwise_normal_fn_f(model, nband):
    """_mb_epochwise_normal_fn over FOLDED [Bc*E, P] pixel planes.

    Every heavy tensor (residuals [Bc*E, P], jacobians [Bc*E, P, n],
    per-pixel evals) has exactly the flat solver's rank-2/3 shapes -
    the per-epoch-stamp work IS a flat solve of Bc*E stamps. Only the
    small tensors cross the epoch structure per iteration: the
    parameter fold [Bc, E, n] -> [Bc*E, n] and the reduction unfold
    [Bc*E, ...] -> [Bc, E, ...] before the band one-hot assembly
    (n<=8 per lane - trivial copies). The pixel planes enter the
    while_loop already folded, so nothing big reshapes per iteration;
    compaction gathers lanes by expanding the lane index to its E
    epoch rows (_mb_gather_f).
    """
    from .fitting.fit_model import FDIFF_BAD, epoch_band_pars

    fill_fn = _MODEL_FILLS[model]
    start = _MODEL_NSHAPE[model]

    def normal_fn(pars, d):
        px, pg, bnd = d.pixels, d.psf_gmix, d.band
        Bc, E = bnd.shape
        bpars = jax.vmap(
            lambda p, b: epoch_band_pars(model, p, b)
        )(pars, bnd)  # [Bc, E, start+1]
        bp = bpars.reshape(Bc * E, start + 1)

        def one(p6, pxe, pge):
            def f(q):
                return _model_lm_fdiff(q, (pxe, pge), fill_fn)

            return f(p6), jax.jacfwd(f)(p6)

        r, J = jax.vmap(one)(bp, px, pg)  # [Bc*E, P], [Bc*E, P, n]

        gm0, gflags = fill_fn(bp)
        gm = gcore.gmix_convolve(gm0, pg)
        bad = (gflags != 0) | (gcore.gmix_flags(gm) != 0)  # [Bc*E]
        any_bad = jnp.any(bad.reshape(Bc, E), axis=1)
        bad_l = jnp.repeat(any_bad, E)
        r = jnp.where(bad_l[:, None], FDIFF_BAD, r)
        J = jnp.where(bad_l[:, None, None], 0.0, J)

        cost_l, jtr_l, jtj_l = _normal_reductions(r, J)
        cost = cost_l.reshape(Bc, E).sum(axis=1)
        jtr_e = jtr_l.reshape(Bc, E, start + 1)
        jtj_e = jtj_l.reshape(Bc, E, start + 1, start + 1)
        oh = (
            bnd[:, :, None] == jnp.arange(nband, dtype=bnd.dtype)
        ).astype(r.dtype)  # [Bc, E, nband]

        Jtr_s = jnp.sum(jtr_e[..., :start], axis=1)
        Jtr_f = jnp.sum(oh * jtr_e[..., start][..., None], axis=1)
        Jtr = jnp.concatenate([Jtr_s, Jtr_f], axis=-1)

        SS = jnp.sum(jtj_e[..., :start, :start], axis=1)
        SF = jnp.sum(
            jtj_e[..., :start, start][..., None] * oh[:, :, None, :],
            axis=1,
        )
        ff_diag = jnp.sum(
            oh * jtj_e[..., start, start][..., None], axis=1
        )
        FF = jax.vmap(jnp.diag)(ff_diag)
        top = jnp.concatenate([SS, SF], axis=-1)
        bot = jnp.concatenate(
            [jnp.swapaxes(SF, -1, -2), FF], axis=-1
        )
        JtJ = jnp.concatenate([top, bot], axis=-2)
        return cost, Jtr, JtJ

    return normal_fn


def _make_mb_gather_f(E):
    """compaction gather for the folded solver data: expand each
    surviving lane index to its E contiguous epoch rows"""

    def gather(d, idx):
        idx_ep = (idx[:, None] * E + jnp.arange(E, dtype=idx.dtype))
        idx_ep = idx_ep.reshape(-1)
        return d._replace(
            pixels=jax.tree.map(lambda x: x[idx_ep], d.pixels),
            psf_gmix=d.psf_gmix[idx_ep],
            band=d.band[idx],
        )

    return gather


def metacal_pipeline_mb(images, weights, cens, psf_images, psf_cens, noise,
                        band, nband, conf: MetacalConfig, lm_conf=None,
                        measure="exp-lm", measure_fwhm=1.2,
                        lm_prior=None, lm_bounds=None, objective="auto"):
    """metacal + multi-band multi-epoch measurement (MEDS-style).

    images [B, E, H, W] with E epochs per object spanning ``nband``
    bands (band [E], or [B, E] when epoch->band assignment varies per
    object); weights/cens/psf data follow. Each epoch's metacal image
    set is built independently (the epoch axis folds into the batch
    axis for the k-space engine).

    measure: "<model>-lm" with model in gauss/exp/dev/bdf/bd - a single
    joint multi-band LM fit per type with npars = nshape + nband (the
    reference runs the same joint fit through the metacal bootstrap,
    ngmix/metacal/bootstrap.py:63-119 with multi-band pars sliced per
    band, ngmix/fitting/results.py:1013-1047) - or "gaussmom"/"admom"
    (nband=1 only), which POOL the weighted-moment sums over all
    epochs: the epochs live in one sky frame, so summing their pixel
    contributions is the moment-space coadd, exact for matched target
    psfs. The pre-psf k-space measures (pgauss/ksigma) need a
    per-epoch deconvolution and are not defined for pooled epochs -
    they raise; measure each epoch through the flat pipeline instead.

    lm_prior / lm_bounds regularize the LM measures exactly as in the
    flat pipeline (the prior must be built for ``nband`` flux slots,
    e.g. PriorSimpleSep with a list of F priors). Starting guesses
    come from the same pooled weighted-moments pass the flat pipeline
    uses, with per-band flux scales. Under psf_mode='dilate' the
    reconvolution target is the dilated original psf; the LM psf model
    is then a per-epoch per-type gaussian fit of the rendered target
    stamps, exactly as in the flat pipeline.

    Ragged epoch counts are handled by masking: pad epochs carry zero
    weight (ierr=0 -> zero residual rows and zero normal-equation
    contributions) and a copied valid psf stamp so the k-space engine
    stays finite; see ngmix_tpu.ragged for the packing utility.

    objective: LM normal-equation formulation - "epoch" (nested vmap
    over epochs, hoists per-epoch constants), "fused" (one jacfwd over
    the full [E, P] residual tensor, the reference-shaped objective
    kept as the parity oracle), or "auto" (default): both are
    per-lane identical; which is faster flips with the stacked batch
    size (measured same-session on v5e: at B=2048/E=3/nband=2 epoch is
    1.46x SLOWER than fused, at B=4096 it is 8% faster -
    tools/tpu_logs/ab_mb_e3b2.log, ab_mb_b4096.log). "auto" picks
    epoch above ~40k stacked epoch-lanes (T*B*E) and fused below, the
    measured crossover's midpoint.
    """
    from .fitting.fit_model import FitData, make_fdiff_fn, make_lnprob_fn

    is_lm = measure.endswith("-lm") and measure[:-3] in _MODEL_FILLS
    if not is_lm:
        if measure in ("pgauss", "ksigma"):
            raise ValueError(
                "pre-psf moments (%s) need a per-epoch psf "
                "deconvolution and cannot pool epochs; run each epoch "
                "through the flat metacal_pipeline or use an LM "
                "measure for joint multi-epoch fits" % measure
            )
        if measure not in ("gaussmom", "admom"):
            raise ValueError("bad measure: %s" % measure)
        if nband != 1:
            raise ValueError(
                "moments measures pool the epochs of ONE band; got "
                "nband=%d (use an LM measure for joint multi-band fits)"
                % nband
            )

    B, E = images.shape[:2]

    def fold(x):
        return x.reshape((B * E,) + x.shape[2:])

    psfdata = prepare_psf_kdata(fold(psf_images), fold(psf_cens), conf)
    # dilate mode: LM needs the rendered per-type target psf stamps
    # for its psf model (the target is NOT an analytic gaussian)
    need_psf_stamps = conf.psf_mode == "dilate" and is_lm
    # centered square fit windows evaluate only the window via
    # partial-iDFT matmuls (see metacal_pipeline)
    crop = None
    if (
        conf.fit_dims is not None
        and conf.dims[0] == conf.dims[1]
        and conf.fit_dims[0] == conf.fit_dims[1]
        and (conf.dims[0] - conf.fit_dims[0]) % 2 == 0
    ):
        cf, _ = conf.fit_dims
        crop = (
            (conf.dims[0] - cf) // 2, (conf.dims[1] - cf) // 2, cf, cf
        )
    if need_psf_stamps:
        odict, sigma, psfdict = metacal_image_set(
            fold(images), fold(cens), fold(psf_images), fold(psf_cens),
            conf, psfdata=psfdata, with_psf_images=True, crop=crop,
        )
    else:
        odict, sigma = metacal_image_set(
            fold(images), fold(cens), fold(psf_images), fold(psf_cens),
            conf, psfdata=psfdata, crop=crop,
        )
        psfdict = None
    if conf.fixnoise:
        cen_c = jnp.full_like(fold(cens), (conf.dims[0] - 1) / 2.0)
        noise_rot = jnp.rot90(fold(noise), k=1, axes=(-2, -1))
        ndict, _ = metacal_image_set(
            noise_rot, cen_c, fold(psf_images), fold(psf_cens), conf,
            psfdata=psfdata, crop=crop,
        )
        for t in odict:
            odict[t] = odict[t] + jnp.rot90(ndict[t], k=3, axes=(-2, -1))
        weights = weights * 0.5

    dilation = 1.0 + 2.0 * conf.step
    sig_d = sigma * dilation  # [B*E]
    dtype = images.dtype
    area = abs(conf.jac[0] * conf.jac[3] - conf.jac[1] * conf.jac[2])

    # stack the metacal types into the batch axis (one solver program,
    # one straggler-compacted while_loop for all types)
    T = len(conf.types)
    ims_st = jnp.concatenate([odict[t] for t in conf.types], axis=0)
    wt_st = jnp.tile(fold(weights), (T, 1, 1))
    cens_st = jnp.tile(fold(cens), (T, 1))
    conf_fit = conf
    if crop is not None:
        r0, c0, fh, fw = crop
        wt_st = wt_st[:, r0:r0 + fh, c0:c0 + fw]
        cens_st = cens_st - jnp.asarray([r0, c0], cens_st.dtype)
        conf_fit = conf._replace(dims=(fh, fw))
    elif conf.fit_dims is not None:
        fh, fw = conf.fit_dims
        r0 = (conf.dims[0] - fh) // 2
        c0 = (conf.dims[1] - fw) // 2
        ims_st = ims_st[:, r0:r0 + fh, c0:c0 + fw]
        wt_st = wt_st[:, r0:r0 + fh, c0:c0 + fw]
        cens_st = cens_st - jnp.asarray([r0, c0], cens_st.dtype)
        conf_fit = conf._replace(dims=(fh, fw))
    pixels = make_pixels_batch(ims_st, wt_st, cens_st, conf_fit)
    pixels = jax.tree.map(lambda x: x.reshape(T * B, E, -1), pixels)

    if not is_lm:
        # pool all epochs' pixels into one moments measurement: the
        # weighted sums are additive over pixels in the shared sky
        # frame, so this is the moment-space coadd
        pix_flat = jax.tree.map(
            lambda x: x.reshape(T * B, -1), pixels
        )
        if measure == "gaussmom":
            out = gaussmom_measure(pix_flat, measure_fwhm, area)
        else:
            from .admom import AdmomConf, admom_batch
            from .moments import fwhm_to_T

            Tw = float(fwhm_to_T(measure_fwhm))
            nb = pix_flat.val.shape[0]
            wt0 = jnp.zeros((nb, 6), dtype)
            wt0 = wt0.at[:, 0].set(1.0)
            wt0 = wt0.at[:, 3].set(Tw / 2).at[:, 5].set(Tw / 2)
            area_b = jnp.full((nb,), area, dtype)
            out = admom_batch(pix_flat, wt0, area_b, AdmomConf())
    else:
        model = measure[:-3]
        # per-epoch psf second moments, per type under dilate (the
        # psf-sheared types and the dilated target differ per type)
        if psfdict is not None:
            psf_moms_all = jnp.concatenate(
                [
                    _psf_moms_from_stamps(psfdict[t], conf, sig_d)
                    for t in conf.types
                ],
                axis=0,
            )  # [T*B*E, 3]
        else:
            psf_moms_all = jnp.tile(
                jnp.stack(
                    [sig_d**2, jnp.zeros_like(sig_d), sig_d**2], axis=-1
                ),
                (T, 1),
            )
        psf_moms = psf_moms_all.reshape(T * B, E, 3)
        psf_gmix = jnp.zeros((T * B, E, 1, 6), dtype)
        psf_gmix = psf_gmix.at[..., 0, 0].set(1.0)
        psf_gmix = psf_gmix.at[..., 0, 3].set(psf_moms[..., 0])
        psf_gmix = psf_gmix.at[..., 0, 4].set(psf_moms[..., 1])
        psf_gmix = psf_gmix.at[..., 0, 5].set(psf_moms[..., 2])

        band = jnp.asarray(band, jnp.int32)
        if band.ndim == 1:
            band_be = jnp.broadcast_to(band, (B, E))
        else:
            band_be = band
        band_st = jnp.tile(band_be, (T, 1))
        data = FitData(pixels=pixels, psf_gmix=psf_gmix, band=band_st)

        # pooled moments-based guesses (identical to the flat path for
        # E=1): per-band flux scale = mean per-epoch masked pixel sum.
        # Pad epochs (no positive-weight pixels) are excluded from the
        # guess statistics so padding a ragged object changes nothing.
        pix_flat = jax.tree.map(
            lambda x: x.reshape(T * B, -1), pixels
        )
        real_e = jnp.any(pixels.ierr > 0, axis=-1)  # [T*B, E]
        nreal = jnp.maximum(jnp.sum(real_e, axis=-1), 1)
        Tpsf = (
            jnp.sum(
                jnp.where(
                    real_e, psf_moms[..., 0] + psf_moms[..., 2], 0.0
                ),
                axis=-1,
            )
            / nreal
        )
        guess5, _ = _moments_lm_guess(pix_flat, Tpsf)
        wsum_e = jnp.sum(
            pixels.val * (pixels.ierr > 0), axis=-1
        )  # [T*B, E]
        onehot = (
            band_st[:, :, None] == jnp.arange(nband)[None, None, :]
        ) & real_e[:, :, None]  # [T*B, E, nband]
        nep_band = jnp.maximum(jnp.sum(onehot, axis=1), 1)
        flux_guess = (
            jnp.sum(wsum_e[:, :, None] * onehot, axis=1) / nep_band
        )
        nshape = _MODEL_NSHAPE[model]
        cols = [guess5]
        if nshape > 5:
            extra = jnp.asarray(_MODEL_EXTRA_GUESS[model], dtype)
            cols.append(
                jnp.broadcast_to(extra, (guess5.shape[0], nshape - 5))
            )
        cols.append(flux_guess)
        guess = jnp.concatenate(cols, axis=-1)

        npars = nshape + nband
        if lm_bounds is None:
            lo = jnp.full(npars, -jnp.inf, dtype)
            hi = jnp.full(npars, jnp.inf, dtype)
        else:
            lo = jnp.asarray(lm_bounds[0], dtype)
            hi = jnp.asarray(lm_bounds[1], dtype)
            guess = _clamp_guess_in_bounds(guess, lo, hi)

        if objective == "auto":
            # measured crossover: see the docstring's cited A/B logs
            objective = "epoch" if T * B * E > 40960 else "fused"
        if objective == "fused":
            # reference-shaped objective: one jacfwd over the full
            # global parameter vector (kept for A/B and as the oracle
            # for the epochwise path's parity test)
            fdiff_fn = make_fdiff_fn(model)

            def mb_normal_fn(pars, d):
                # jacfwd, not linearize + seeds: see _make_ad_normal_fn
                def one(p, dd):
                    def f(q):
                        return fdiff_fn(q, dd)

                    return f(p), jax.jacfwd(f)(p)

                r, J = jax.vmap(one)(pars, d)
                return _normal_reductions(r, J)
        elif objective == "epoch":
            # folded [Bc*E, P] layout - the measured winner: 1.09x the
            # flat solver's time vs 1.94x ([Bc, E, P]) and 2.02x
            # ([E, Bc, P]) at N=12288/E=2 (tools/tpu_logs/
            # solver_iso_f.log); see _mb_epochwise_normal_fn_f
            mb_normal_fn = _mb_epochwise_normal_fn_f(model, nband)
        elif objective == "epoch-be":
            # lane-leading [Bc, E, P] layout, kept for A/B
            mb_normal_fn = _mb_epochwise_normal_fn(model, nband)
        elif objective == "epoch-t":
            # epoch-leading [E, Bc, P] layout, kept for A/B
            mb_normal_fn = _mb_epochwise_normal_fn_t(model, nband)
        else:
            raise ValueError(
                "objective must be 'auto', 'epoch', 'epoch-be', "
                "'epoch-t' or 'fused'; got %r" % (objective,)
            )

        nres = jnp.sum(pixels.ierr > 0, axis=(-2, -1))
        caps = _auto_cascade(T * B)
        prior_fn = (
            None if lm_prior is None else lm_prior.fill_fdiff_device
        )
        if objective == "epoch":
            # folded solver view [T*B*E, P]: one contiguous reshape
            # here, outside the while_loop
            data_solve = FitData(
                pixels=jax.tree.map(
                    lambda x: x.reshape((T * B * E,) + x.shape[2:]),
                    pixels,
                ),
                psf_gmix=psf_gmix.reshape(T * B * E, 1, 6),
                band=band_st,
            )
            gather_fn = _make_mb_gather_f(E)
        elif objective == "epoch-t":
            # solver-side view with the epoch axis leading: the pixel
            # planes transpose ONCE here (outside the while_loop) and
            # the compaction levels gather lanes on axis 1
            data_solve = FitData(
                pixels=jax.tree.map(
                    lambda x: jnp.swapaxes(x, 0, 1), pixels
                ),
                psf_gmix=jnp.swapaxes(psf_gmix, 0, 1),
                band=band_st,
            )
            gather_fn = _mb_gather_t
        else:
            data_solve, gather_fn = data, None
        out = run_lm_normal_batched(
            mb_normal_fn, data_solve, guess, lo, hi, lm_conf or LMConf(),
            nres=nres, compact_capacity=caps, prior_fn=prior_fn,
            gather_fn=gather_fn,
        )
        # reference-definition s2n from the model-weighted sums over
        # ALL epochs/bands (ngmix/fitting/results.py:56-67); failed
        # lanes are evaluated at a benign point and masked to zero
        lnp_fn = make_lnprob_fn(model)
        safe = _safe_best_pars(out["pars"], out["flags"])
        _, s2n_num, s2n_den, _ = jax.vmap(lnp_fn)(safe, data)
        _lm_result_columns(
            out, model, nshape, nband=nband, s2n_sums=(s2n_num, s2n_den)
        )

    results = {}
    for i, t in enumerate(conf.types):
        results[t] = jax.tree.map(
            lambda x: x[i * B:(i + 1) * B] if (
                hasattr(x, "shape") and x.ndim >= 1
                and x.shape[0] == T * B
            ) else x,
            out,
        )
    results["psf_sigma"] = sigma.reshape(B, E)
    return results
