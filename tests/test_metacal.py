import numpy as np
import jax.numpy as jnp
import pytest

from ngmix_tpu import (
    DiagonalJacobian,
    Fitter,
    GaussMom,
    GMixModel,
    Jacobian,
    MetacalBootstrapper,
    Observation,
    PSFRunner,
    Runner,
    Shape,
)
from ngmix_tpu.guessers import SimplePSFGuesser
from ngmix_tpu.metacal import (
    MetacalDilatePSF,
    MetacalGaussPSF,
    get_all_metacal,
    kops,
)

SCALE = 0.263


def _make_obs(rng, gal_pars=(0.0, 0.0, 0.05, -0.03, 0.9, 100.0),
              psf_pars=(0.0, 0.0, 0.02, 0.01, 0.3, 1.0), psf_model="gauss",
              noise=0.0, dims=(49, 49), psf_dims=(25, 25)):
    gal = GMixModel(list(gal_pars), "gauss")
    psf = GMixModel(list(psf_pars), psf_model)
    cen = (np.array(dims) - 1.0) / 2.0
    pcen = (np.array(psf_dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
    pjac = DiagonalJacobian(row=pcen[0], col=pcen[1], scale=SCALE)
    img = gal.convolve(psf).make_image(dims, jacobian=jac, fast_exp=False)
    if noise > 0:
        img = img + rng.normal(size=dims, scale=noise)
        wt = np.full(dims, 1 / noise**2)
    else:
        wt = np.full(dims, 1e8)
    pimg = psf.make_image(psf_dims, jacobian=pjac, fast_exp=False)
    obs = Observation(
        img, weight=wt, jacobian=jac, psf=Observation(pimg, jacobian=pjac)
    )
    return obs, gal, psf


def test_remap_exact():
    """the FFT shear/scale remap is exact for band-limited data"""
    N = 96
    kr, kc = kops.kgrids(N)
    ksq = kr**2 + kc**2
    ghat = jnp.exp(-0.5 * 2.6**2 * ksq) + 0j
    S = kops.shear_matrix(0.01, -0.007)
    out = kops.remap_k(ghat, S.T)
    STk_r = S[0, 0] * kr + S[1, 0] * kc
    STk_c = S[0, 1] * kr + S[1, 1] * kc
    oracle = np.exp(-0.5 * 2.6**2 * (np.asarray(STk_r) ** 2 + np.asarray(STk_c) ** 2))
    assert np.abs(np.asarray(out.real) - oracle).max() < 1e-12

    # dilation (det != 1)
    out = kops.remap_k(ghat, np.eye(2) * 1.02)
    oracle = np.exp(-0.5 * 2.6**2 * 1.02**2 * np.asarray(ksq))
    assert np.abs(np.asarray(out.real) - oracle).max() < 1e-12


def test_good_fft_size():
    assert kops.good_fft_size(129) == 144
    assert kops.good_fft_size(128) == 128
    assert kops.good_fft_size(97) == 100


def test_metacal_gauss_oracle():
    """metacal images match the analytic gaussian-galaxy oracle to
    machine precision.

    The gaussian-target modes reconvolve WITHOUT the pixel (the
    deconvolution removed the pixelized psf and the reference never
    reapplies the pixel: drawImage(method='no_pixel'),
    ngmix/metacal/metacal.py:285,651-665), so the oracle is the
    gaussian density SAMPLED at pixel centers times the pixel area.
    """
    obs, gal, psf = _make_obs(
        np.random.RandomState(1),
        gal_pars=(0.0, 0.0, 0.05, 0.0, 0.9, 100.0),
        psf_pars=(0.0, 0.0, 0.0, 0.0, 0.3, 1.0),
    )
    m = MetacalGaussPSF(obs=obs, rng=None)
    odict = m.get_all()
    assert set(odict.keys()) == {"noshear", "1p", "1m", "2p", "2m"}

    Td = 2 * (m._target_sigma * 1.02) ** 2
    target = GMixModel([0.0, 0.0, 0.0, 0.0, Td, 1.0], "gauss")

    def sampled_img(gm, dims, cen, flux):
        d = gm.get_data()[0]
        irr, icc = d[3], d[5]
        r = (np.arange(dims[0]) - cen[0]) * SCALE
        c = (np.arange(dims[1]) - cen[1]) * SCALE
        dens = (
            np.exp(-0.5 * r[:, None] ** 2 / irr)
            * np.exp(-0.5 * c[None, :] ** 2 / icc)
            / (2 * np.pi * np.sqrt(irr * icc))
        )
        return flux * SCALE**2 * dens

    for t, sh in [("noshear", None), ("1p", (0.01, 0.0)), ("1m", (-0.01, 0.0))]:
        gs = gal.get_sheared(*sh) if sh else gal
        comb = gs.convolve(target)
        if abs(comb.get_data()[0][4]) > 1e-9:
            continue
        oracle = sampled_img(comb, (49, 49), (24, 24), 100.0)
        assert np.abs(odict[t].image - oracle).max() / oracle.max() < 1e-10


def test_metacal_psf_image_round():
    """the gauss-variant psf image is the round dilated target"""
    rng = np.random.RandomState(2)
    obs, _, _ = _make_obs(rng)
    m = MetacalGaussPSF(obs=obs, rng=rng)
    odict = m.get_all()
    pobs = odict["noshear"].psf
    # measure the psf shape: should be round
    res = GaussMom(fwhm=1.2).go(pobs)
    assert abs(float(res["e1"])) < 1e-4
    assert abs(float(res["e2"])) < 1e-4
    # weight was reset for the noisy psf image
    assert pobs.weight[0, 0] > 0


def test_metacal_dilate_types():
    rng = np.random.RandomState(3)
    obs, _, _ = _make_obs(rng)
    m = MetacalDilatePSF(obs=obs)
    odict = m.get_all()
    assert set(odict.keys()) == {
        "noshear", "1p", "1m", "2p", "2m",
        "1p_psf", "1m_psf", "2p_psf", "2m_psf",
    }
    # psf-sheared type: psf image differs from the unsheared-psf one
    p0 = odict["1p"].psf.image
    p1 = odict["1p_psf"].psf.image
    assert not np.allclose(p0, p1)
    # object is sheared in '1p' but not in '1p_psf': their images
    # differ by more than the small psf-kernel difference
    d_obj = np.abs(odict["1p"].image - odict["noshear"].image).max()
    d_psf_only = np.abs(odict["1p_psf"].image - odict["noshear"].image).max()
    assert d_obj > 2 * d_psf_only


def test_metacal_fixnoise():
    rng = np.random.RandomState(4)
    noise = 0.1
    obs, _, _ = _make_obs(rng, noise=noise)
    odict = get_all_metacal(obs, psf="gauss", rng=rng, fixnoise=True)
    ns = odict["noshear"]
    # fixnoise halves the weight (doubles the variance)
    assert np.allclose(ns.weight, 1 / (2 * noise**2), rtol=0.01)
    assert hasattr(ns, "image_orig")


def test_metacal_use_noise_image():
    rng = np.random.RandomState(5)
    noise = 0.1
    obs, _, _ = _make_obs(rng, noise=noise)
    obs.set_noise(rng.normal(size=obs.image.shape, scale=noise))
    odict = get_all_metacal(
        obs, psf="gauss", rng=rng, fixnoise=True, use_noise_image=True
    )
    assert np.allclose(odict["noshear"].weight, 1 / (2 * noise**2), rtol=0.01)


def test_metacal_obslist():
    from ngmix_tpu import ObsList

    rng = np.random.RandomState(6)
    obslist = ObsList()
    for _ in range(2):
        obs, _, _ = _make_obs(rng, noise=0.01)
        obslist.append(obs)
    odict = get_all_metacal(obslist, psf="gauss", rng=rng, fixnoise=False)
    assert isinstance(odict["noshear"], ObsList)
    assert len(odict["noshear"]) == 2


def test_metacal_fitgauss_runs():
    rng = np.random.RandomState(7)
    obs, _, _ = _make_obs(rng, noise=0.001, psf_model="turb")
    odict = get_all_metacal(obs, psf="fitgauss", rng=rng, fixnoise=False)
    assert "noshear" in odict
    res = GaussMom(fwhm=1.2).go(odict["noshear"].psf)
    assert abs(float(res["e1"])) < 1e-3


def test_metacal_azgauss_runs():
    rng = np.random.RandomState(8)
    obs, _, _ = _make_obs(rng, noise=0.001, psf_model="turb")
    odict = get_all_metacal(obs, psf="azgauss", rng=rng, fixnoise=False)
    assert "noshear" in odict


def test_metacal_shear_recovery():
    """north-star oracle: recover an applied shear with |m| < 1e-3

    the reference's equivalent (test_metacal_accuracy.py:65-77) gets
    m ~ 3.4e-4 from the same method-intrinsic residual
    """
    rng = np.random.RandomState(314)
    shear_true = 0.02
    step = 0.01
    noise = 1e-5

    psf_runner = PSFRunner(
        fitter=Fitter(model="gauss"),
        guesser=SimplePSFGuesser(rng=rng, guess_from_moms=True),
        ntry=3,
    )
    runner = Runner(fitter=GaussMom(fwhm=1.2))
    boot = MetacalBootstrapper(
        runner=runner, psf_runner=psf_runner, rng=rng, psf="gauss",
        types=["noshear", "1p", "1m"],
    )

    e1 = {k: [] for k in ["noshear", "1p", "1m"]}
    for i in range(5):
        gal = GMixModel([0.0, 0.0, 0.0, 0.0, 0.5, 100.0], "exp")
        gal = gal.get_sheared(shear_true, 0.0)
        psf = GMixModel([0.0, 0.0, 0.025, -0.01, 0.27, 1.0], "turb")
        off = rng.uniform(low=-0.5, high=0.5, size=2)
        jac = DiagonalJacobian(row=24 + off[0], col=24 + off[1], scale=SCALE)
        pjac = DiagonalJacobian(row=12, col=12, scale=SCALE)
        img = gal.convolve(psf).make_image((49, 49), jacobian=jac, fast_exp=False)
        img = img + rng.normal(size=img.shape) * noise
        pimg = psf.make_image((25, 25), jacobian=pjac, fast_exp=False)
        obs = Observation(
            img, weight=np.full((49, 49), 1 / noise**2), jacobian=jac,
            psf=Observation(pimg, jacobian=pjac),
        )
        resdict, _ = boot.go(obs)
        for k in e1:
            assert int(resdict[k]["flags"]) == 0
            e1[k].append(float(resdict[k]["e1"]))

    R11 = (np.mean(e1["1p"]) - np.mean(e1["1m"])) / (2 * step)
    sh = np.mean(e1["noshear"]) / R11
    m = sh / shear_true - 1
    assert abs(m) < 1.0e-3, m


def test_metacal_wcs_mismatch_raises():
    rng = np.random.RandomState(9)
    obs, _, _ = _make_obs(rng)
    bad_pjac = Jacobian(
        row=12, col=12, dvdrow=SCALE * 1.1, dvdcol=0, dudrow=0, dudcol=SCALE
    )
    obs.psf.set_jacobian(bad_pjac)
    with pytest.raises(ValueError):
        MetacalGaussPSF(obs=obs, rng=rng)


def test_metacal_requires_shape_type():
    rng = np.random.RandomState(10)
    obs, _, _ = _make_obs(rng)
    m = MetacalGaussPSF(obs=obs, rng=rng)
    with pytest.raises(TypeError):
        m.get_obs_galshear((0.01, 0.0))
    obs2 = m.get_obs_galshear(Shape(0.01, 0.0))
    assert obs2.image.shape == obs.image.shape


def test_partial_dft_matrices_exact():
    """idft2_crop and dft2_zeropad (the partial-output / partial-input
    DFT matmuls driving the fit-window fast path) match full FFTs to
    roundoff"""
    import numpy as np
    import jax.numpy as jnp
    from ngmix_tpu.metacal import kops

    rng = np.random.RandomState(5)
    N = 48
    # partial output: crop of an inverse transform
    khat = jnp.asarray(
        rng.normal(size=(3, N, N)) + 1j * rng.normal(size=(3, N, N))
    )
    full = jnp.fft.ifft2(khat)
    crop = kops.idft2_crop(khat, 7, 11, 19, 13)
    np.testing.assert_allclose(
        np.asarray(crop), np.asarray(full[:, 7:26, 11:24]),
        rtol=1e-10, atol=1e-12,
    )
    # partial input: forward transform of a zero-padded block
    img = jnp.asarray(rng.normal(size=(3, 21, 17)))
    pad = jnp.zeros((3, N, N)).at[:, :21, :17].set(img)
    np.testing.assert_allclose(
        np.asarray(kops.dft2_zeropad(img, N)),
        np.asarray(jnp.fft.fft2(pad)),
        rtol=1e-10, atol=1e-10,
    )


def test_sheared_refine_matches_full_lm():
    """MetacalConfig.sheared_refine (GN refinement of the sheared
    types from the noshear optimum) agrees with the full stacked LM to
    ~1e-7 in every parameter and yields the identical calibration"""
    import numpy as np
    from ngmix_tpu.batch import (
        MetacalConfig, metacal_pipeline, shear_response,
    )
    import sys
    import os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_batch_pipeline import _sim_batch, DIMS, PSF_DIMS, SCALE

    rng = np.random.RandomState(71)
    args = _sim_batch(rng, 16)
    conf0 = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2, fit_dims=(25, 25),
    )
    r0 = metacal_pipeline(*args, conf0, measure="exp-lm")
    r3 = metacal_pipeline(
        *args, conf0._replace(sheared_refine=3), measure="exp-lm"
    )
    for t in ("noshear", "1p", "2m"):
        assert np.all(np.asarray(r3[t]["flags"]) == 0)
        np.testing.assert_allclose(
            np.asarray(r3[t]["pars"]), np.asarray(r0[t]["pars"]),
            rtol=0, atol=1e-6,
        )
    s0, s3 = shear_response(r0), shear_response(r3)
    assert abs(float(s0["shear"][0]) - float(s3["shear"][0])) < 1e-7


def test_sheared_refine_bounded_bdf_on_bound():
    """the GN refiner shares the LM body's saturated-bound handling
    (pin + clip): bounded bdf on pure-exp truth (every lane's fracdev
    optimum ON the lower bound) refines cleanly and matches the full
    stacked LM calibration"""
    import numpy as np
    from ngmix_tpu.batch import (
        MetacalConfig, metacal_pipeline, shear_response,
    )
    import sys
    import os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_batch_pipeline import _sim_batch, DIMS, PSF_DIMS, SCALE

    rng = np.random.RandomState(73)
    args = _sim_batch(rng, 16)
    conf0 = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2, fit_dims=(25, 25),
    )
    lo = np.array([-2, -2, -0.99, -0.99, 1e-3, 0.0, 1e-3])
    hi = np.array([2, 2, 0.99, 0.99, 20.0, 1.0, 1e9])
    r0 = metacal_pipeline(
        *args, conf0, measure="bdf-lm", lm_bounds=(lo, hi)
    )
    r3 = metacal_pipeline(
        *args, conf0._replace(sheared_refine=3), measure="bdf-lm",
        lm_bounds=(lo, hi),
    )
    for t in ("noshear", "1p", "2m"):
        assert np.all(np.asarray(r3[t]["flags"]) == 0)
        # fracdev pinned at the bound in both paths (the pin engages
        # once the remaining move can't change the cost at the ftol
        # resolution, so lanes stop within ~1e-3 of the bound rather
        # than exactly on it)
        assert float(np.max(np.asarray(r3[t]["fracdev"]))) < 5e-3
    s0, s3 = shear_response(r0), shear_response(r3)
    assert abs(float(s0["shear"][0]) - float(s3["shear"][0])) < 1e-4


def test_fft_matmul_mode_matches_xla_fft():
    """the DFT-matmul FFT toggle is exact: both modes agree to f32
    roundoff on centered_fft/centered_ifft round trips"""
    import numpy as np
    import jax.numpy as jnp
    from ngmix_tpu.metacal import kops

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.normal(size=(2, 33, 33)))
    cen = jnp.asarray([[16.2, 15.8], [16.0, 16.4]])
    try:
        cen_b = cen[:, None, None, :]
        kops.set_fft_matmul(0)
        k0 = kops.centered_fft(img, cen_b, 48)
        out0 = kops.centered_ifft(k0, cen_b, (33, 33))
        kops.set_fft_matmul(128)
        k1 = kops.centered_fft(img, cen_b, 48)
        out1 = kops.centered_ifft(k1, cen_b, (33, 33))
    finally:
        kops.set_fft_matmul(0)
    np.testing.assert_allclose(np.asarray(k0), np.asarray(k1),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-8, atol=1e-10)
