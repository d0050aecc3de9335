import numpy as np
import pytest

from ngmix_tpu import (
    DiagonalJacobian,
    GMixModel,
    KObservation,
    Observation,
    make_kobs,
)
from ngmix_tpu.fitting import GalsimFitter, GalsimMoffatFitter, GalsimSpergelFitter

SCALE = 0.263


def _make_gauss_obs(rng, T=0.9, g1=0.05, g2=-0.03, flux=100.0, noise=1e-4,
                    Tpsf=0.3, dims=(49, 49), psf_dims=(25, 25)):
    gal = GMixModel([0.0, 0.0, g1, g2, T, flux], "gauss")
    psf = GMixModel([0.0, 0.0, 0.0, 0.0, Tpsf, 1.0], "gauss")
    cen = (np.array(dims) - 1.0) / 2.0
    pcen = (np.array(psf_dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
    pjac = DiagonalJacobian(row=pcen[0], col=pcen[1], scale=SCALE)
    img = gal.convolve(psf).make_image(dims, jacobian=jac, fast_exp=False)
    img = img + rng.normal(size=dims, scale=noise)
    pimg = psf.make_image(psf_dims, jacobian=pjac, fast_exp=False)
    obs = Observation(
        img, weight=np.full(dims, 1 / noise**2), jacobian=jac,
        psf=Observation(pimg, weight=np.full(psf_dims, 1e6), jacobian=pjac),
    )
    return obs


def test_make_kobs():
    rng = np.random.RandomState(1)
    obs = _make_gauss_obs(rng)
    mb_kobs = make_kobs(obs)
    assert len(mb_kobs) == 1
    kobs = mb_kobs[0][0]
    assert isinstance(kobs, KObservation)
    N = kobs.kimage.shape[0]
    assert N % 2 == 1  # odd dims like the reference
    # k=0 mode at the canonical center equals the image flux
    cen = N // 2
    assert np.allclose(kobs.kimage[cen, cen].real, obs.image.sum(), rtol=1e-8)
    # psf normalized to unit flux
    assert np.allclose(kobs.psf.kimage[cen, cen].real, 1.0, rtol=1e-10)


def test_kspace_gauss_fit():
    """gaussian k-space fit recovers the injected parameters"""
    rng = np.random.RandomState(2)
    T, g1, g2, flux = 0.9, 0.05, -0.03, 100.0
    obs = _make_gauss_obs(rng, T=T, g1=g1, g2=g2, flux=flux)

    from ngmix_tpu.moments import T_to_r50

    r50 = float(T_to_r50(T))
    guess = np.array([0.0, 0.0, 0.0, 0.0, r50 * 1.1, flux * 0.9])
    fitter = GalsimFitter(model="gauss")
    res = fitter.go(obs, guess)
    assert res["flags"] == 0
    assert np.allclose(res["pars"][2], g1, atol=2e-3)
    assert np.allclose(res["pars"][3], g2, atol=2e-3)
    assert np.allclose(res["pars"][4], r50, rtol=5e-3)
    assert np.allclose(res["pars"][5], flux, rtol=5e-3)
    assert res["s2n_r"] > 100


def test_kspace_exp_fit():
    """exp k-space fit on an exp-mixture image: the exact exponential
    FT vs the 6-gaussian rendering agree at the ~1e-3 level"""
    rng = np.random.RandomState(3)
    T, flux = 2.0, 100.0
    gal = GMixModel([0.0, 0.0, 0.04, 0.02, T, flux], "exp")
    psf = GMixModel([0.0, 0.0, 0.0, 0.0, 0.3, 1.0], "gauss")
    dims = (65, 65)
    cen = (np.array(dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
    pjac = DiagonalJacobian(row=12, col=12, scale=SCALE)
    noise = 1e-3
    img = gal.convolve(psf).make_image(dims, jacobian=jac, fast_exp=False)
    img = img + rng.normal(size=dims, scale=noise)
    pimg = psf.make_image((25, 25), jacobian=pjac, fast_exp=False)
    obs = Observation(
        img, weight=np.full(dims, 1 / noise**2), jacobian=jac,
        psf=Observation(pimg, weight=np.full((25, 25), 1e6), jacobian=pjac),
    )

    # r50 of the exp-mixture with this T: r0 = sqrt(T/6), r50 = 1.678 r0
    r50 = 1.6783469900166605 * np.sqrt(T / 6.0)
    guess = np.array([0.0, 0.0, 0.0, 0.0, r50, flux * 0.8])
    res = GalsimFitter(model="exp").go(obs, guess)
    assert res["flags"] == 0
    assert np.allclose(res["pars"][2], 0.04, atol=5e-3)
    assert np.allclose(res["pars"][4], r50, rtol=0.05)
    assert np.allclose(res["pars"][5], flux, rtol=0.05)


def test_kspace_spergel_fit():
    """spergel with nu=0.5 fit to a gaussian-ish object runs clean"""
    rng = np.random.RandomState(4)
    obs = _make_gauss_obs(rng, T=0.9, g1=0.02, g2=0.0, noise=1e-3)
    guess = np.array([0.0, 0.0, 0.0, 0.0, 0.45, 0.8, 90.0])
    res = GalsimSpergelFitter().go(obs, guess)
    assert res["flags"] == 0
    assert res["pars"].size == 7
    # large nu limit approaches a gaussian; expect nu to run high
    assert res["pars"][5] > 0.5
    assert np.allclose(res["pars"][6], 100.0, rtol=0.1)


def test_kspace_moffat_fit():
    """moffat profile fit via the Bessel k-table"""
    rng = np.random.RandomState(5)
    # render a turb (moffat-like) psf stamp and fit it without a psf
    psf = GMixModel([0.0, 0.0, 0.02, -0.01, 0.3, 100.0], "turb")
    dims = (33, 33)
    cen = (np.array(dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
    noise = 1e-3
    img = psf.make_image(dims, jacobian=jac, fast_exp=False)
    img = img + rng.normal(size=dims, scale=noise)
    obs = Observation(img, weight=np.full(dims, 1 / noise**2), jacobian=jac)

    mb_kobs = make_kobs(obs)
    guess = np.array([0.0, 0.0, 0.0, 0.0, 0.35, 3.0, 90.0])
    res = GalsimMoffatFitter().go(mb_kobs, guess)
    assert res["flags"] == 0
    assert np.allclose(res["pars"][5:7][1], 100.0, rtol=0.1)
    assert 1.5 < res["pars"][5] < 9.0


def test_moffat_ktable_oracle():
    """the tabulated Moffat k profile matches scipy directly"""
    from scipy.special import gamma, kv

    from ngmix_tpu.fitting.kspace_fitters import _moffat_kprofile

    beta = 3.3
    x = np.array([0.01, 0.1, 0.5, 1.0, 3.0, 10.0])
    nu = beta - 1
    oracle = 2.0 * (x / 2.0) ** nu * kv(nu, x) / gamma(nu)
    ours = np.asarray(_moffat_kprofile(x, beta))
    assert np.allclose(ours, oracle, rtol=2e-3, atol=1e-5)


def test_spergel_cnu_gauss_limit():
    """for nu -> large the spergel profile approaches a gaussian;
    check the nu=0.5 c value against a brute-force integral"""
    from scipy.integrate import quad
    from scipy.special import kv

    from ngmix_tpu.fitting.kspace_fitters import _SPERGEL_CS, _SPERGEL_NUS

    nu = 0.5
    c = np.interp(nu, _SPERGEL_NUS, _SPERGEL_CS)
    total = quad(lambda r: r ** (nu + 1) * kv(nu, r), 0, 50)[0]
    inner = quad(lambda r: r ** (nu + 1) * kv(nu, r), 0, c)[0]
    assert np.allclose(inner / total, 0.5, atol=1e-3)


def test_psf_flux_fitter_analytic_model():
    """analytic-model template fluxes (the reference's
    GalsimPSFFluxFitter with a model; galsim_fitters.py:123-156)"""
    from ngmix_tpu.fitting.kspace_fitters import KSpacePSFFluxFitter
    from ngmix_tpu.metacal import kops
    import jax.numpy as jnp

    rng = np.random.RandomState(31)
    noise = 1e-5
    flux_true = 100.0
    r50 = 0.5
    dims, psf_dims = (49, 49), (25, 25)
    cen = (np.array(dims) - 1.0) / 2.0
    pcen = (np.array(psf_dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
    pjac = DiagonalJacobian(row=pcen[0], col=pcen[1], scale=SCALE)
    psf = GMixModel([0.0, 0.0, 0.02, -0.01, 0.3, 1.0], "gauss")
    pimg = psf.make_image(psf_dims, jacobian=pjac, fast_exp=False)

    # render the galaxy through the same k-space machinery the
    # template uses, so the recovery is exact up to noise
    from ngmix_tpu.fitting.kspace_fitters import make_kspace_model_fn

    N = kops.good_fft_size(4 * max(dims))
    psfhat = kops.centered_fft(
        jnp.asarray(pimg / pimg.sum()), jnp.asarray(pcen), N
    )
    kv, ku = kops.sky_kvu(N, jac)
    model_fn = make_kspace_model_fn("exp")
    khat, bad = model_fn(
        jnp.asarray([0.0, 0.0, 0.0, 0.0, r50, flux_true]), kv, ku
    )
    assert not bool(bad)
    img = np.asarray(
        kops.centered_ifft(khat * psfhat, jnp.asarray(cen), dims)
    )
    img = img + rng.normal(size=dims, scale=noise)
    obs = Observation(
        img, weight=np.full(dims, 1 / noise**2), jacobian=jac,
        psf=Observation(
            pimg, weight=np.full(psf_dims, 1e6), jacobian=pjac
        ),
    )

    fitter = KSpacePSFFluxFitter(model={"model": "exp", "r50": r50})
    res = fitter.go(obs)
    assert res["flags"] == 0
    assert abs(res["flux"] - flux_true) < 5 * res["flux_err"]
    assert abs(res["flux"] / flux_true - 1) < 2e-3

    # a wrong-size template biases the flux but still runs
    res_wrong = KSpacePSFFluxFitter(
        model={"model": "exp", "r50": 2.5 * r50}
    ).go(obs)
    assert res_wrong["flags"] == 0
    assert abs(res_wrong["flux"] / flux_true - 1) > 0.05

    # psf-flux path (model=None) unchanged
    res_psf = KSpacePSFFluxFitter().go(obs)
    assert res_psf["flags"] == 0

    # spergel/moffat specs construct and fit
    for spec in (
        {"model": "spergel", "r50": r50, "nu": 0.5},
        {"model": "moffat", "fwhm": 2 * r50, "beta": 3.5},
        {"model": "gauss", "r50": r50},
        {"model": "dev", "r50": r50},
    ):
        r = KSpacePSFFluxFitter(model=spec).go(obs)
        assert r["flags"] == 0, spec
        assert np.isfinite(r["flux"])

    with pytest.raises(ValueError):
        KSpacePSFFluxFitter(model="exp")
