"""Independent (non-self-anchored) regression anchors.

The golden harness (test_golden.py) freezes this implementation's own
outputs; these tests anchor against values NO code in this repo
produced: closed-form analytic oracles and the reference's documented
configuration (examples/fitting/fitting.py:17-25). A regression that
shifted the goldens AND the code consistently would still trip here.
"""
import jax.numpy as jnp
import numpy as np

import ngmix_tpu as ngmix

SCALE = 0.263


def _gauss_obs(T=0.8, g1=0.0, g2=0.0, flux=100.0, dims=(49, 49)):
    gal = ngmix.GMixModel([0.0, 0.0, g1, g2, T, flux], "gauss")
    cen = (np.array(dims) - 1.0) / 2.0
    jac = ngmix.DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
    img = gal.make_image(dims, jacobian=jac, fast_exp=False)
    return ngmix.Observation(
        img, weight=np.full(dims, 1.0e8), jacobian=jac
    )


def test_gaussmom_closed_form_oracle():
    """weighted moments of a gaussian with a gaussian weight have the
    closed form Sigma_meas = (Sigma_w^-1 + Sigma_g^-1)^-1 and
    wflux = flux * |Sigma_meas|^(1/2) / |Sigma_g|^(1/2) (weight
    unit-peak); checked against GaussMom on a noiseless stamp"""
    T, flux = 0.8, 100.0
    fwhm = 1.2
    Tw = float(ngmix.moments.fwhm_to_T(fwhm))
    obs = _gauss_obs(T=T, flux=flux)
    res = ngmix.GaussMom(fwhm=fwhm).go(obs)
    assert res["flags"] == 0

    # per-axis variances sigma^2 = T/2
    sg = T / 2.0
    sw = Tw / 2.0
    sm = 1.0 / (1.0 / sg + 1.0 / sw)
    T_expect = 2.0 * sm
    # apodization + pixelization effects are ~1e-3; closed form holds
    assert abs(res["T"] / T_expect - 1) < 2e-3
    assert abs(res["e1"]) < 1e-6 and abs(res["e2"]) < 1e-6

    # weighted flux of density*weight integrated, per unit pixel area:
    # flux * |Sm|^1/2 / |Sg|^1/2 (unit-peak gaussian weight)
    wflux_expect = flux * sm / sg  # 2-d: sqrt(det) = sigma^2 ratio
    assert abs(res["flux"] / wflux_expect - 1) < 2e-3


def test_admom_gaussian_fixed_point_oracle():
    """adaptive moments of a pure gaussian converge to the matched
    weight: deweighted T equals the true T exactly (closed-form fixed
    point), e matches the true shape"""
    T, g1, g2 = 0.9, 0.08, -0.04
    obs = _gauss_obs(T=T, g1=g1, g2=g2)
    res = ngmix.run_admom(obs, guess=0.5, rng=np.random.RandomState(5))
    assert res["flags"] == 0
    assert abs(res["T"] / T - 1) < 1e-3
    e1, e2 = float(res["e1"]), float(res["e2"])
    # admom e is the linear ellipticity of the moments; convert truth
    from ngmix_tpu.shape import g1g2_to_e1e2

    e1t, e2t = g1g2_to_e1e2(g1, g2)
    assert abs(e1 - e1t) < 2e-3
    assert abs(e2 - e2t) < 2e-3


def test_fastexp_documented_accuracy():
    """the reference documents exp5_smooth rel err <= 2e-6 on [-15, 0]
    (fastexp_nb.py:235-238); our fast path must do at least as well"""
    from ngmix_tpu.fastexp import fexp

    x = jnp.linspace(-15.0, 0.0, 20001)
    rel = np.abs(np.asarray(fexp(x)) / np.exp(np.asarray(x)) - 1.0)
    assert rel.max() <= 2e-6


def test_reference_example_configuration_recovery():
    """the reference's documented LM example configuration
    (examples/fitting/fitting.py: exp hlr=0.5 flux=100 g=(0.05,-0.02),
    Moffat beta=2.5 fwhm=0.9 psf sheared (-0.01,-0.01), scale 0.263,
    noise 0.01, coellip-5 psf fit, prior-regularized exp fit via
    Bootstrapper). Docstring values: S/N 920.5, g1 0.0508 +/- 0.0096,
    g2 -0.0261 +/- 0.0096 (99.7%), flux 95.38 +/- 0.65.

    We render the true profiles through the k-space machinery on fixed
    121/49px stamps (galsim auto-sizes its stamps, which truncates the
    Moffat wings and biases its flux low; on full stamps the recovery
    is unbiased), so the anchors are: same S/N regime, shear recovery
    within the documented intervals, flux recovery at truth.
    """
    from ngmix_tpu.fitting.kspace_fitters import make_kspace_model_fn
    from ngmix_tpu.guessers import CoellipPSFGuesser, TPSFFluxAndPriorGuesser
    from ngmix_tpu.joint_prior import PriorSimpleSep
    from ngmix_tpu.metacal import kops

    rng = np.random.RandomState(31415)
    noise = 0.01
    dims, psf_dims = (121, 121), (49, 49)
    cen0, pcen0 = (dims[0] - 1) / 2, (psf_dims[0] - 1) / 2
    jac0 = ngmix.DiagonalJacobian(row=cen0, col=cen0, scale=SCALE)
    pjac = ngmix.DiagonalJacobian(row=pcen0, col=pcen0, scale=SCALE)

    N = kops.good_fft_size(3 * dims[0])
    kv, ku = kops.sky_kvu(N, jac0)
    pix = kops.pixel_kresponse(N)
    moffat = make_kspace_model_fn("moffat", size_type="fwhm")
    psf_khat, _ = moffat(
        jnp.asarray([0.0, 0.0, -0.01, -0.01, 0.9, 2.5, 1.0]), kv, ku
    )
    expf = make_kspace_model_fn("exp")
    dy, dx = rng.uniform(low=-SCALE / 2, high=SCALE / 2, size=2)
    gal_khat, _ = expf(
        jnp.asarray([0.0, 0.0, 0.05, -0.02, 0.5, 100.0]), kv, ku
    )
    im = np.array(
        kops.centered_ifft(
            gal_khat * psf_khat * pix,
            jnp.asarray([cen0 + dy / SCALE, cen0 + dx / SCALE]), dims,
        )
    )
    pim = np.array(
        kops.centered_ifft(
            psf_khat * pix, jnp.asarray([pcen0, pcen0]), psf_dims
        )
    )
    im += rng.normal(scale=noise, size=im.shape)
    pim += rng.normal(scale=1e-6, size=pim.shape)
    obs = ngmix.Observation(
        im, weight=np.full(dims, 1 / noise**2),
        jacobian=ngmix.DiagonalJacobian(
            row=cen0 + dy / SCALE, col=cen0 + dx / SCALE, scale=SCALE
        ),
        psf=ngmix.Observation(
            pim, weight=np.full(psf_dims, 1e12), jacobian=pjac
        ),
    )

    prior = PriorSimpleSep(
        cen_prior=ngmix.priors.CenPrior(0, 0, SCALE, SCALE, rng=rng),
        g_prior=ngmix.priors.GPriorBA(0.1, rng=rng),
        T_prior=ngmix.priors.FlatPrior(-1.0, 1e3, rng=rng),
        F_prior=ngmix.priors.FlatPrior(-100.0, 1e9, rng=rng),
    )
    boot = ngmix.Bootstrapper(
        runner=ngmix.Runner(
            fitter=ngmix.Fitter(model="exp", prior=prior),
            guesser=TPSFFluxAndPriorGuesser(rng=rng, T=0.25, prior=prior),
            ntry=2,
        ),
        psf_runner=ngmix.PSFRunner(
            fitter=ngmix.CoellipFitter(ngauss=5),
            guesser=CoellipPSFGuesser(rng=rng, ngauss=5),
            ntry=2,
        ),
    )
    res = boot.go(obs)
    assert res["flags"] == 0
    # same S/N regime as the documented run (920.5; stamps differ)
    assert 800 < res["s2n"] < 1100
    # shear within the documented 99.7% interval width about truth
    assert abs(res["g"][0] - 0.05) < 0.0096
    assert abs(res["g"][1] - (-0.02)) < 0.0096
    # flux at truth on full stamps (see docstring)
    assert abs(res["flux"] - 100.0) < 1.0
