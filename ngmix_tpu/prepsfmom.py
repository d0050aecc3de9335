"""Pre-PSF moments measured in Fourier space (KSigmaMom, PGaussMom).

TPU re-design of ngmix/prepsfmom.py:43-923: zero-pad + apodize the
stamp, FFT image and psf, deconvolve with an amplitude floor, phase
shift to the jacobian center, and dot masked k-space kernels against
the modes. The reference compacts to the kernel's nonzero modes with
boolean masks; here everything stays on the full static [N, N] grid
with multiplicative masks (jit/vmap friendly), which also makes the
whole measurement one fused program.
"""
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .defaults import FASTEXP_MAX_CHI2
from .gexceptions import FFTRangeError
from .moments import fwhm_to_sigma, make_mom_result, result_to_host
from .observation import Observation

logger = logging.getLogger(__name__)


def _ap_kern_kern(x, m, h):
    """cumulative triweight kernel (ref: prepsfmom.py:424-440)"""
    y = (x - m) / h + 3
    val = (
        -5 * y**7 / 69984
        + 7 * y**5 / 2592
        - 35 * y**3 / 864
        + 35 * y / 96
        + 1.0 / 2.0
    )
    return jnp.where(y < -3, 0.0, jnp.where(y > 3, 1.0, val))


def apodization_mask(dims, ap_rad):
    """square stamp-edge apodization (ref: prepsfmom.py:443-456)"""
    ap_range = int(6 * ap_rad + 0.5)
    ny, nx = dims
    y = jnp.arange(ny, dtype=jnp.result_type(float))
    x = jnp.arange(nx, dtype=jnp.result_type(float))
    wy = _ap_kern_kern(y, ap_range, ap_rad) * _ap_kern_kern(
        ny - 1 - y, ap_range, ap_rad
    )
    wx = _ap_kern_kern(x, ap_range, ap_rad) * _ap_kern_kern(
        nx - 1 - x, ap_range, ap_rad
    )
    return wy[:, None] * wx[None, :]


def _zero_pad_offsets(dim, target_dim):
    twice = target_dim - dim
    before = twice // 2
    return before


def _pad_and_fft(im, cen, target_dim, ap_rad):
    """apodize, symmetric zero pad and FFT
    (ref: prepsfmom.py:537-552). Returns (kim, padded cen)."""
    dim = im.shape[-1]
    if ap_rad > 0:
        im = im * apodization_mask(im.shape[-2:], ap_rad)
    before = _zero_pad_offsets(dim, target_dim)
    pad = [(0, 0)] * (im.ndim - 2) + [
        (before, target_dim - dim - before),
        (before, target_dim - dim - before),
    ]
    pim = jnp.pad(im, pad)
    return jnp.fft.fft2(pim), cen + before


def _cen_phase(dim, cen_row, cen_col, dtype=None):
    """exp(i 2 pi f . cen) (ref: prepsfmom.py:497-507)"""
    f = 2 * jnp.pi * jnp.fft.fftfreq(dim).astype(dtype or jnp.result_type(float))
    kcen = f[:, None] * cen_row + f[None, :] * cen_col
    return jnp.exp(1j * kcen)


def _pixel_fft(dim, dtype=None):
    """k-response of the pixel (ref: prepsfmom.py:554-562)"""
    f = jnp.sinc(jnp.fft.fftfreq(dim).astype(dtype or jnp.result_type(float)))
    return (f[:, None] * f[None, :]).astype(jnp.complex128 if (
        dtype in (None, jnp.float64)) else jnp.complex64)


def _deconvolve(kim, kpsf, min_psf_frac=1e-5):
    """deconvolve with a |P| floor (ref: prepsfmom.py:584-601)"""
    max_amp = jnp.abs(kpsf[..., 0, 0])[..., None, None]
    min_amp = min_psf_frac * max_amp
    amp = jnp.abs(kpsf)
    kpsf_fl = jnp.where(
        (amp <= min_amp) & (amp != 0),
        kpsf / jnp.where(amp == 0, 1.0, amp) * min_amp,
        kpsf,
    )
    kpsf_fl = jnp.where(amp == 0, min_amp + 0j, kpsf_fl)
    return kim / kpsf_fl, kpsf_fl


def _sky_freqs(dim, jac_tuple, dtype=None, xp=jnp):
    """(fv, fu) sky-frame angular frequencies and |det Atinv|.

    xp=np evaluates eagerly in numpy: the kernels depend only on static
    config, so the partial-mode batch path builds them at trace time to
    select the masked k-modes as compile-time constants."""
    dvdrow, dvdcol, dudrow, dudcol = jac_tuple
    f = 2 * np.pi * xp.fft.fftfreq(dim).astype(
        dtype or jnp.result_type(float)
    )
    fy = f[:, None]
    fx = f[None, :]
    At = np.array([[dvdrow, dvdcol], [dudrow, dudcol]], dtype=float)
    Atinv = np.linalg.inv(At).T
    fv = Atinv[0, 0] * fy + Atinv[0, 1] * fx
    fu = Atinv[1, 0] * fy + Atinv[1, 1] * fx
    detAtinv = abs(np.linalg.det(Atinv))
    return fv, fu, detAtinv


def ksigma_kernels(dim, fwhm, jac_tuple, fwhm_smooth=0.0, dtype=None,
                   xp=jnp):
    """Bernstein et al. ksigma k-space kernels
    (ref: prepsfmom.py:650-760). Full-grid arrays with the support mask
    folded in; returns dict fkf/fkr/fkp/fkc/msk/nrm/fk00."""
    fv, fu, detAtinv = _sky_freqs(dim, jac_tuple, dtype, xp=xp)
    n = 4
    sigma = float(fwhm_to_sigma(fwhm))
    kmax2 = 2 * n / sigma**2
    fu2 = fu * fu
    fv2 = fv * fv
    fmag2 = fu2 + fv2
    msk = fmag2 < kmax2
    fm = msk.astype(fv.dtype)

    karg = xp.clip(1.0 - fmag2 / kmax2, 0.0, None)
    karg2 = karg * karg
    karg3 = karg2 * karg
    karg4 = karg3 * karg

    max_real_val = n / (sigma**2 * 10 * np.pi)
    knrm = detAtinv / max_real_val

    fkf = karg4 * knrm * fm
    nrm = xp.sum(fkf) / dim / dim

    two_knrm_dWdk2 = (-knrm * 8.0 / kmax2) * karg3 * fm
    four_knrm_dW2dk22 = (knrm * 48 / kmax2**2) * karg2 * fm

    if fwhm_smooth > 0:
        sm = _smooth_profile(fwhm_smooth, fmag2, xp=xp)
        fkf = fkf * sm
        two_knrm_dWdk2 = two_knrm_dWdk2 * sm
        four_knrm_dW2dk22 = four_knrm_dW2dk22 * sm

    fkr = -2 * two_knrm_dWdk2 - fmag2 * four_knrm_dW2dk22
    fkp = -(fu2 - fv2) * four_knrm_dW2dk22
    fkc = -2 * fu * fv * four_knrm_dW2dk22

    return dict(fkf=fkf, fkr=fkr, fkp=fkp, fkc=fkc, msk=msk, nrm=nrm,
                fk00=knrm)


def gauss_kernels(dim, fwhm, jac_tuple, fwhm_smooth=0.0, dtype=None,
                  xp=jnp):
    """gaussian k-space kernels (ref: prepsfmom.py:803-900)"""
    fv, fu, detAtinv = _sky_freqs(dim, jac_tuple, dtype, xp=xp)
    sigma = float(fwhm_to_sigma(fwhm))
    sigma2 = sigma * sigma
    fu2 = fu * fu
    fv2 = fv * fv
    fmag2 = fu2 + fv2
    exp_fac = sigma2 / 2
    chi2_2 = exp_fac * fmag2
    msk = (chi2_2 < FASTEXP_MAX_CHI2 / 2) & (chi2_2 >= 0)
    fm = msk.astype(fv.dtype)
    exp_val = xp.exp(-xp.clip(chi2_2, 0.0, FASTEXP_MAX_CHI2)) * fm

    knrm = detAtinv * np.pi * 2 * sigma2
    fkf = exp_val * knrm
    nrm = xp.sum(fkf) / dim / dim

    if fwhm_smooth > 0:
        fkf = fkf * _smooth_profile(fwhm_smooth, fmag2, xp=xp)

    fkfac = 2 * exp_fac
    fkfac2 = 4 * exp_fac**2
    fkr = (2 * fkfac - fkfac2 * fmag2) * fkf
    fkp = fkfac2 * (fv2 - fu2) * fkf
    fkc = -2 * fkfac2 * fu * fv * fkf

    return dict(fkf=fkf, fkr=fkr, fkp=fkp, fkc=fkc, msk=msk, nrm=nrm,
                fk00=knrm)


def _smooth_profile(fwhm_smooth, fmag2, xp=jnp):
    sigma_smooth = float(fwhm_to_sigma(fwhm_smooth))
    chi2_2 = sigma_smooth**2 / 2 * fmag2
    ok = (chi2_2 < FASTEXP_MAX_CHI2 / 2) & (chi2_2 >= 0)
    return xp.where(ok, xp.exp(-xp.clip(chi2_2, 0, FASTEXP_MAX_CHI2)), 0.0)


def measure_moments_fft(kim, kpsf, pnoise_white, kernels, drow, dcol,
                        knoise=None):
    """masked k-space dot products + 6x6 noise covariance
    (ref: prepsfmom.py:337-421). pnoise_white is the scalar per-mode
    white power; pass knoise (FFT of the noise image) to use measured
    per-mode power instead."""
    dim = kim.shape[-1]
    fm = kernels["msk"].astype(kim.real.dtype)

    kim_d, kpsf_fl = _deconvolve(kim, kpsf)
    phase = _cen_phase(dim, drow, dcol, dtype=kim.real.dtype)
    kim_d = kim_d * phase

    df = 1.0 / dim
    df2 = df * df
    df4 = df2 * df2

    fkf = kernels["fkf"]
    fkr = kernels["fkr"]
    fkp = kernels["fkp"]
    fkc = kernels["fkc"]

    mf = jnp.sum((kim_d * fkf).real * fm, axis=(-2, -1)) * df2
    mr = jnp.sum((kim_d * fkr).real * fm, axis=(-2, -1)) * df2
    mp = jnp.sum((kim_d * fkp).real * fm, axis=(-2, -1)) * df2
    mc = jnp.sum((kim_d * fkc).real * fm, axis=(-2, -1)) * df2

    if knoise is not None:
        pnoise = jnp.abs(knoise) ** 2
    else:
        pnoise = pnoise_white

    ipsf = 1.0 / kpsf_fl
    kerns = [fkp * ipsf, fkc * ipsf, fkr * ipsf, fkf * ipsf]

    cov = jnp.zeros(kim.shape[:-2] + (6, 6), dtype=kim.real.dtype)
    cov = cov.at[..., 0, 0].set(1.0)
    cov = cov.at[..., 1, 1].set(1.0)
    for i in range(2, 6):
        for j in range(i, 6):
            val = jnp.sum(
                (kerns[i - 2] * jnp.conj(kerns[j - 2])).real * pnoise * fm,
                axis=(-2, -1),
            ) * df4
            cov = cov.at[..., i, j].set(val)
            cov = cov.at[..., j, i].set(val)

    nan = jnp.full_like(mf, jnp.nan)
    mom = jnp.stack([nan, nan, mp, mc, mr, mf], axis=-1)
    return mom, cov, kernels["fk00"]


@partial(jax.jit, static_argnames=(
    "target_dim", "ap_rad", "kernel", "jac_tuple", "fwhm", "fwhm_smooth",
    "has_psf", "use_noise",
))
def prepsfmom_core(image, cen, psf_image, psf_cen, tot_var, noise_image,
                   target_dim, ap_rad, kernel, jac_tuple, fwhm,
                   fwhm_smooth, has_psf, use_noise):
    """jitted single-stamp pre-psf moments -> (mom, cov, norm, nrm)"""
    dim = image.shape[-1]
    eff_pad_factor = target_dim / dim

    kim, pcen = _pad_and_fft(image, cen, target_dim, ap_rad)
    if has_psf:
        kpsf, ppcen = _pad_and_fft(psf_image, psf_cen, target_dim, 0.0)
    else:
        kpsf = _pixel_fft(target_dim, dtype=image.dtype)
        ppcen = jnp.zeros(2, image.dtype)

    if kernel == "ksigma":
        kernels = ksigma_kernels(
            target_dim, fwhm, jac_tuple, fwhm_smooth, dtype=image.dtype
        )
    else:
        kernels = gauss_kernels(
            target_dim, fwhm, jac_tuple, fwhm_smooth, dtype=image.dtype
        )

    if use_noise:
        knoise, _ = _pad_and_fft(noise_image, cen, target_dim, 0.0)
        knoise = knoise * eff_pad_factor
        pnoise_white = None
    else:
        knoise = None
        pnoise_white = tot_var * eff_pad_factor**2

    mom, cov, norm = measure_moments_fft(
        kim, kpsf, pnoise_white, kernels,
        pcen[0] - ppcen[0], pcen[1] - ppcen[1], knoise=knoise,
    )
    return mom, cov, norm, kernels["nrm"]


class PrePSFMom(object):
    """pre-psf weighted moments (API parity: ngmix/prepsfmom.py:43-247)"""

    def __init__(self, fwhm, kernel, pad_factor=4, ap_rad=1.5,
                 fwhm_smooth=0, use_noise_image=False):
        self.fwhm = fwhm
        self.pad_factor = pad_factor
        self.kernel = kernel
        self.ap_rad = ap_rad
        self.fwhm_smooth = fwhm_smooth
        self.use_noise_image = use_noise_image
        if self.kernel == "ksigma":
            self.kind = "ksigma"
        elif self.kernel in ["gauss", "pgauss"]:
            self.kind = "pgauss"
        else:
            raise ValueError(
                "The kernel '%s' for PrePSFMom is not recognized!"
                % self.kernel
            )

    def go(self, obs, return_kernels=False, no_psf=False):
        psf_obs = _check_obs_and_get_psf_obs(obs, no_psf)

        if psf_obs is not None and (
            psf_obs.image.shape[0] > obs.image.shape[0]
        ):
            target_dim = int(psf_obs.image.shape[0] * self.pad_factor)
        else:
            target_dim = int(obs.image.shape[0] * self.pad_factor)

        jac = obs.jacobian
        jac_tuple = (jac.dvdrow, jac.dvdcol, jac.dudrow, jac.dudcol)

        msk = obs.weight > 0
        tot_var = float(np.sum(1.0 / obs.weight[msk]))

        if self.use_noise_image:
            if not obs.has_noise():
                raise ValueError(
                    "obs.noise must be set when use_noise_image=True"
                )
            noise_image = jnp.asarray(obs.noise)
        else:
            noise_image = jnp.zeros_like(jnp.asarray(obs.image))

        if psf_obs is not None:
            psf_image = jnp.asarray(psf_obs.image)
            psf_cen = jnp.asarray(psf_obs.jacobian.get_cen())
        else:
            psf_image = jnp.zeros((1, 1))
            psf_cen = jnp.zeros(2)

        mom, cov, norm, nrm = prepsfmom_core(
            jnp.asarray(obs.image),
            jnp.asarray(jac.get_cen()),
            psf_image,
            psf_cen,
            tot_var,
            noise_image,
            int(target_dim),
            float(self.ap_rad),
            self.kind if self.kind == "ksigma" else "gauss",
            jac_tuple,
            float(self.fwhm),
            float(self.fwhm_smooth),
            psf_obs is not None,
            bool(self.use_noise_image),
        )

        if not np.allclose(float(nrm), 1.0, atol=1e-5, rtol=0):
            raise FFTRangeError(
                "FFT size appears to be too small for %s kernel size %f: "
                "norm = %f (should be 1)!" % (self.kind, self.fwhm, float(nrm))
            )

        res = make_mom_result(mom, cov, sums_norm=norm)
        res = result_to_host(res)
        if res["flags"] != 0:
            logger.debug("pre-psf moments failed: %s" % res["flagstr"])
        return res


class KSigmaMom(PrePSFMom):
    """ksigma pre-psf moments (Bernstein et al., arXiv:1508.05655)"""

    def __init__(self, fwhm, pad_factor=4, ap_rad=1.5, fwhm_smooth=0,
                 use_noise_image=False):
        super().__init__(
            fwhm, "ksigma", pad_factor=pad_factor, ap_rad=ap_rad,
            fwhm_smooth=fwhm_smooth, use_noise_image=use_noise_image,
        )


class PGaussMom(PrePSFMom):
    """gaussian-kernel pre-psf moments"""

    def __init__(self, fwhm, pad_factor=4, ap_rad=1.5, fwhm_smooth=0,
                 use_noise_image=False):
        super().__init__(
            fwhm, "pgauss", pad_factor=pad_factor, ap_rad=ap_rad,
            fwhm_smooth=fwhm_smooth, use_noise_image=use_noise_image,
        )


# API alias (ref: prepsfmom.py:333-334)
PrePSFGaussMom = PGaussMom


def _check_obs_and_get_psf_obs(obs, no_psf):
    """(ref: prepsfmom.py:901-923)"""
    if not isinstance(obs, Observation):
        raise ValueError("input obs must be an Observation")

    shape = obs.image.shape
    if shape[0] != shape[1]:
        raise ValueError(
            "pre-psf moments require a square image, got %s" % (shape,)
        )

    if not obs.has_psf() and not no_psf:
        raise RuntimeError("The PSF must be set to measure a pre-PSF moment!")

    if not no_psf:
        psf_obs = obs.get_psf()
        j1 = obs.jacobian
        j2 = psf_obs.jacobian
        same = all(
            np.isclose(getattr(j1, a), getattr(j2, a))
            for a in ("dvdrow", "dvdcol", "dudrow", "dudcol")
        )
        if not same:
            raise RuntimeError(
                "The PSF and observation must have the same WCS "
                "Jacobian for measuring pre-PSF moments."
            )
    else:
        psf_obs = None

    return psf_obs


# cache-toggle API parity shims (see note in metacal.metacal); no-ops
def turn_on_fft_caching():
    pass


def turn_off_fft_caching():
    pass


def turn_on_kernel_caching():
    pass


def turn_off_kernel_caching():
    pass


def _partial_dft_matrix(target_dim, sel, nin, offset, sign=-1):
    """[nin, nsel] evaluation matrix taking the ``nin`` nonzero input
    rows of a block placed at ``offset`` in a target_dim-padded frame to
    the selected DFT output rows ``sel``: zero padding contributes
    nothing, so the pad buffer is never materialized (the masked-mode
    analog of metacal.kops.dft2_zeropad)."""
    f = np.fft.fftfreq(target_dim)[sel]
    y = offset + np.arange(nin)
    return np.exp(sign * 2j * np.pi * np.outer(y, f))


def prepsfmom_batch(images, cens, psf_images, psf_cens, tot_var,
                    target_dim, kernel, jac_tuple, fwhm, ap_rad=1.5,
                    fwhm_smooth=0.0, partial_modes=True,
                    noise_images=None):
    """batched pre-psf moments over a [B] batch of stamps.

    images [B, H, W]; cens/psf_cens [B, 2]; tot_var [B]. Returns the
    batched moments result dict (see moments.make_mom_result).

    noise_images [B, H, W] switches the noise covariance from the
    white per-mode power (tot_var) to the measured per-mode power
    |fft(noise)|^2 — the correlated-noise error model of the
    reference's use_noise_image option (ngmix/prepsfmom.py:197-221).

    partial_modes=True (default) never materializes the pad_factor
    FFT grids: the measurement only consumes k-modes inside the
    kernel's support mask (a trace-time constant), so the forward
    transforms become partial-DFT matmuls straight from the unpadded
    stamps to the masked row/column block, the four moment sums one
    [B, M] x [M, 4] contraction against constant kernel planes, and
    the 6x6 noise covariance a [B, M] x [M, 10] contraction of the
    per-mode deconvolution power against the constant kernel products
    (the kernels are real, so kern_i conj(kern_j) reduces to
    fk_i fk_j / |kpsf|^2). This removes the HBM ceiling that capped
    batch sizes (5 full pad-4 complex grids per metacal type) and
    keeps the contractions on the MXU. Results match the FFT path to
    f8 roundoff. ref: ngmix/prepsfmom.py:337-421 (the reference's
    reductions are masked dot products too).
    """
    import jax

    from .moments import make_mom_result

    if not partial_modes:
        use_noise = noise_images is not None

        def one(im, cen, pim, pcen, tv, nz):
            return prepsfmom_core(
                im, cen, pim, pcen, tv, nz,
                int(target_dim), float(ap_rad), kernel, jac_tuple,
                float(fwhm), float(fwhm_smooth), True, use_noise,
            )

        mom, cov, norm, nrm = jax.vmap(one)(
            images, cens, psf_images, psf_cens, tot_var,
            noise_images if use_noise else jnp.zeros_like(images),
        )
        res = make_mom_result(mom, cov, sums_norm=norm)
        res["kernel_nrm"] = nrm
        return res

    N = int(target_dim)
    B, H, W = images.shape
    Hp, Wp = psf_images.shape[-2:]
    dtype = images.dtype
    cdtype = jnp.result_type(dtype, np.complex64)
    hi = jax.lax.Precision.HIGHEST

    # ---- trace-time constants (static config only) -------------------
    build = ksigma_kernels if kernel == "ksigma" else gauss_kernels
    kern = build(N, fwhm, jac_tuple, fwhm_smooth, dtype=np.float64, xp=np)
    msk = np.asarray(kern["msk"])
    all_rows = np.flatnonzero(msk.any(axis=1))
    cols = np.flatnonzero(msk.any(axis=0))
    freqs = np.fft.fftfreq(N)

    # real inputs: modes come in conjugate pairs k <-> -k and every
    # consumed quantity is even under the pairing (the kernels depend
    # on fv^2/fu^2/fu*fv; Re(kim_d) and |kpsf|^2 are even for real
    # image/psf/noise stamps), so only the canonical half-plane is
    # computed and a weight plane (2 for paired modes, 1 for
    # self-conjugate, 0 for the dropped half of self-conjugate rows)
    # folds into the constant kernel planes. Halves the DFT matmuls
    # and the per-lane mode block.
    def selfconj(i):
        return i == 0 or (N % 2 == 0 and i == N // 2)

    rows = np.asarray(
        [r for r in all_rows if freqs[r] > 0 or selfconj(r)], np.int64
    )
    wgt = np.full((rows.size, cols.size), 2.0)
    for i, r in enumerate(rows):
        if selfconj(r):
            for j, c in enumerate(cols):
                if selfconj(c):
                    wgt[i, j] = 1.0
                elif freqs[c] < 0:
                    wgt[i, j] = 0.0

    fm = msk[np.ix_(rows, cols)].astype(np.float64) * wgt
    fk = [np.asarray(kern[k])[np.ix_(rows, cols)]
          for k in ("fkp", "fkc", "fkr", "fkf")]
    M = rows.size * cols.size
    # moment-sum planes [M, 4] and covariance products [M, 10], with
    # the mask and conjugate-pair weights folded in
    kmat = jnp.asarray(
        np.stack([(f * fm).reshape(-1) for f in fk], axis=-1), dtype
    )
    pairs = [(i, j) for i in range(4) for j in range(i, 4)]
    cmat = jnp.asarray(
        np.stack(
            [(fk[i] * fk[j] * fm).reshape(-1) for i, j in pairs],
            axis=-1,
        ),
        dtype,
    )
    # DC mode position inside the selection (row/col 0 are always in
    # the mask: the kernels have positive support at k=0)
    i0r = int(np.flatnonzero(rows == 0)[0])
    i0c = int(np.flatnonzero(cols == 0)[0])

    off_g = _zero_pad_offsets(H, N)
    off_p = _zero_pad_offsets(Hp, N)
    Fr_g = jnp.asarray(_partial_dft_matrix(N, rows, H, off_g), cdtype)
    Fc_g = jnp.asarray(_partial_dft_matrix(N, cols, W, off_g), cdtype)
    Fr_p = jnp.asarray(_partial_dft_matrix(N, rows, Hp, off_p), cdtype)
    Fc_p = jnp.asarray(_partial_dft_matrix(N, cols, Wp, off_p), cdtype)
    fsel_r = jnp.asarray(2 * np.pi * np.fft.fftfreq(N)[rows], dtype)
    fsel_c = jnp.asarray(2 * np.pi * np.fft.fftfreq(N)[cols], dtype)
    apod = (apodization_mask((H, W), ap_rad).astype(dtype)
            if ap_rad > 0 else None)

    # ---- device program ----------------------------------------------
    im_ap = images * apod if apod is not None else images
    kim = jnp.einsum("bhw,hr->brw", im_ap.astype(cdtype), Fr_g,
                     precision=hi)
    kim = jnp.einsum("brw,wc->brc", kim, Fc_g, precision=hi)
    kpsf = jnp.einsum("bhw,hr->brw", psf_images.astype(cdtype), Fr_p,
                      precision=hi)
    kpsf = jnp.einsum("brw,wc->brc", kpsf, Fc_p, precision=hi)

    kim_d, kpsf_fl = _deconvolve_at(kim, kpsf, i0r, i0c)

    # separable center phase about the (padded) galaxy-psf centroid
    # offset (ref: prepsfmom.py:482-507); the pad offsets cancel in
    # the difference except for the stamp-size mismatch
    drow = (cens[:, 0] + off_g) - (psf_cens[:, 0] + off_p)
    dcol = (cens[:, 1] + off_g) - (psf_cens[:, 1] + off_p)
    ph_r = jnp.exp(1j * fsel_r[None, :] * drow[:, None])
    ph_c = jnp.exp(1j * fsel_c[None, :] * dcol[:, None])
    kim_d = kim_d * ph_r[:, :, None] * ph_c[:, None, :]

    df2 = 1.0 / (N * N)
    # the kernel planes are real: only the real part of the
    # deconvolved modes enters the sums
    mom4 = jnp.einsum(
        "bm,mk->bk", kim_d.real.reshape(B, M), kmat, precision=hi
    ) * df2

    eff_pad = N / H
    w = (1.0 / jnp.abs(kpsf_fl) ** 2).reshape(B, M)
    if noise_images is not None:
        # measured per-mode power at the masked modes (the padded FFT
        # of the noise stamp is the same partial DFT, no apodization)
        knz = jnp.einsum(
            "bhw,hr->brw", noise_images.astype(cdtype), Fr_g,
            precision=hi,
        )
        knz = jnp.einsum("brw,wc->brc", knz, Fc_g, precision=hi)
        pmode = (jnp.abs(knz) ** 2).reshape(B, M) * eff_pad**2
        cvals = jnp.einsum(
            "bm,mk->bk", w * pmode, cmat, precision=hi
        ) * (df2 * df2)
    else:
        pnoise = tot_var * eff_pad**2  # [B] white per-mode power
        cvals = jnp.einsum("bm,mk->bk", w, cmat, precision=hi) * (
            pnoise[:, None] * df2 * df2
        )
    cov = jnp.zeros((B, 6, 6), dtype)
    cov = cov.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
    for k, (i, j) in enumerate(pairs):
        cov = cov.at[:, 2 + i, 2 + j].set(cvals[:, k])
        if i != j:
            cov = cov.at[:, 2 + j, 2 + i].set(cvals[:, k])

    nan = jnp.full((B,), jnp.nan, dtype)
    mom = jnp.stack(
        [nan, nan, mom4[:, 0], mom4[:, 1], mom4[:, 2], mom4[:, 3]],
        axis=-1,
    )
    res = make_mom_result(mom, cov, sums_norm=jnp.full((B,), kern["fk00"],
                                                       dtype))
    res["kernel_nrm"] = jnp.full((B,), float(kern["nrm"]), dtype)
    return res


def _deconvolve_at(kim, kpsf, i0r, i0c, min_psf_frac=1e-5):
    """_deconvolve with the DC reference amplitude taken at the given
    selected-mode indices (the masked-mode layout need not have the DC
    mode at [0, 0])"""
    max_amp = jnp.abs(kpsf[..., i0r, i0c])[..., None, None]
    min_amp = min_psf_frac * max_amp
    amp = jnp.abs(kpsf)
    kpsf_fl = jnp.where(
        (amp <= min_amp) & (amp != 0),
        kpsf / jnp.where(amp == 0, 1.0, amp) * min_amp,
        kpsf,
    )
    kpsf_fl = jnp.where(amp == 0, min_amp + 0j, kpsf_fl)
    return kim / kpsf_fl, kpsf_fl
