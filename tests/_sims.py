"""Simulation fixtures: render models with the library's own kernels,
add controlled noise (mirrors the style of the reference's
ngmix/tests/_sims.py, written independently against our API)."""
import numpy as np

import ngmix_tpu
from ngmix_tpu import DiagonalJacobian, GMixModel, Observation

PIXEL_SCALE = 0.263
TPSF = 0.27


def get_gauss_obs(
    *, rng, T=2.0, g1=0.1, g2=-0.05, flux=100.0, noise=0.0, dims=(33, 33),
    scale=PIXEL_SCALE, with_psf=False, psf_model="gauss", Tpsf=TPSF,
):
    """render a (possibly psf-convolved) gaussian observation"""
    cen = (np.array(dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=scale)

    gm = GMixModel([0.0, 0.0, g1, g2, T, flux], "gauss")
    if with_psf:
        psf_gm = GMixModel([0.0, 0.0, 0.0, 0.0, Tpsf, 1.0], psf_model)
        gm_conv = gm.convolve(psf_gm)
        psf_dims = (25, 25)
        psf_cen = (np.array(psf_dims) - 1.0) / 2.0
        psf_jac = DiagonalJacobian(row=psf_cen[0], col=psf_cen[1], scale=scale)
        psf_im = psf_gm.make_image(psf_dims, jacobian=psf_jac, fast_exp=True)
        psf_noise = 1.0e-6
        psf_im = psf_im + rng.normal(size=psf_dims, scale=psf_noise)
        psf_obs = Observation(
            psf_im,
            weight=np.ones(psf_dims) / psf_noise**2,
            jacobian=psf_jac,
        )
    else:
        gm_conv = gm
        psf_obs = None
        psf_gm = None

    im = gm_conv.make_image(dims, jacobian=jac, fast_exp=True)
    if noise > 0:
        im = im + rng.normal(size=dims, scale=noise)
        weight = np.ones(dims) / noise**2
    else:
        weight = np.ones(dims) * 1.0e12

    obs = Observation(im, weight=weight, jacobian=jac, psf=psf_obs)
    return {
        "obs": obs,
        "gmix": gm,
        "gmix_conv": gm_conv,
        "psf_gmix": psf_gm,
        "jacobian": jac,
        "pars": np.array([0.0, 0.0, g1, g2, T, flux]),
    }


def get_model_obs(
    *, rng, model="exp", T=2.0, g1=0.05, g2=-0.02, flux=100.0, noise=0.001,
    dims=(33, 33), scale=PIXEL_SCALE, Tpsf=TPSF, psf_model="gauss",
    psf_g1=0.0, psf_g2=0.0,
):
    """render a psf-convolved model observation with a psf observation
    attached"""
    cen = (np.array(dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=scale)

    gm = GMixModel([0.0, 0.0, g1, g2, T, flux], model)
    psf_gm = GMixModel([0.0, 0.0, psf_g1, psf_g2, Tpsf, 1.0], psf_model)
    gm_conv = gm.convolve(psf_gm)

    psf_dims = (25, 25)
    psf_cen = (np.array(psf_dims) - 1.0) / 2.0
    psf_jac = DiagonalJacobian(row=psf_cen[0], col=psf_cen[1], scale=scale)
    psf_noise = 1.0e-6
    psf_im = psf_gm.make_image(psf_dims, jacobian=psf_jac, fast_exp=True)
    psf_im = psf_im + rng.normal(size=psf_dims, scale=psf_noise)
    psf_obs = Observation(
        psf_im, weight=np.ones(psf_dims) / psf_noise**2, jacobian=psf_jac,
    )

    im = gm_conv.make_image(dims, jacobian=jac, fast_exp=True)
    im = im + rng.normal(size=dims, scale=noise)
    obs = Observation(
        im, weight=np.ones(dims) / noise**2, jacobian=jac, psf=psf_obs,
    )
    return {
        "obs": obs,
        "gmix": gm,
        "gmix_conv": gm_conv,
        "psf_gmix": psf_gm,
        "jacobian": jac,
        "pars": np.array([0.0, 0.0, g1, g2, T, flux]),
    }


del ngmix_tpu
