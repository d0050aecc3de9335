import numpy as np
import pytest

from ngmix_tpu import DiagonalJacobian, GMixModel, KSigmaMom, Observation, PGaussMom
from ngmix_tpu.gexceptions import FFTRangeError

SCALE = 0.263


def _make_obs(rng, T=0.9, g1=0.05, g2=-0.03, flux=100.0, noise=0.0,
              Tpsf=0.3, dims=(49, 49), psf_dims=(33, 33)):
    gal = GMixModel([0.0, 0.0, g1, g2, T, flux], "gauss")
    psf = GMixModel([0.0, 0.0, 0.015, -0.007, Tpsf, 1.0], "gauss")
    cen = (np.array(dims) - 1.0) / 2.0
    pcen = (np.array(psf_dims) - 1.0) / 2.0
    jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
    pjac = DiagonalJacobian(row=pcen[0], col=pcen[1], scale=SCALE)
    img = gal.convolve(psf).make_image(dims, jacobian=jac, fast_exp=False)
    if noise > 0:
        img = img + rng.normal(size=dims, scale=noise)
        wt = np.full(dims, 1 / noise**2)
    else:
        wt = np.full(dims, 1e10)
    pimg = psf.make_image(psf_dims, jacobian=pjac, fast_exp=False)
    obs = Observation(
        img, weight=wt, jacobian=jac, psf=Observation(pimg, jacobian=pjac)
    )
    return obs, gal


@pytest.mark.parametrize("cls", [PGaussMom, KSigmaMom])
def test_prepsfmom_recovery(cls):
    """pre-psf moments recover the pre-seeing shape and flux of a
    gaussian through the psf"""
    rng = np.random.RandomState(42)
    T, g1, g2, flux = 0.9, 0.05, -0.03, 100.0
    obs, gal = _make_obs(rng, T=T, g1=g1, g2=g2, flux=flux)

    fitter = cls(fwhm=2.0)
    res = fitter.go(obs)
    assert res["flags"] == 0

    # oracle: moments of the pre-psf gaussian with the round weight.
    # for the gaussian kernel the weighted e is diluted by the weight,
    # e_meas = e_true * T_w_eff... instead check against the analytic
    # product-gaussian second moments (same math as gaussmom but pre-psf)
    from ngmix_tpu import moments as m
    from ngmix_tpu import shape as s

    if cls is PGaussMom:
        e1t, e2t = (float(x) for x in s.g1g2_to_e1e2(g1, g2))
        irr, irc, icc = (float(x) for x in m.e2mom(e1t, e2t, T))
        S_o = np.array([[irr, irc], [irc, icc]])
        T_w = float(m.fwhm_to_T(2.0))
        S_w = np.eye(2) * (T_w / 2)
        S = np.linalg.inv(np.linalg.inv(S_o) + np.linalg.inv(S_w))
        Tm = S[0, 0] + S[1, 1]
        e1m = (S[1, 1] - S[0, 0]) / Tm
        e2m = 2 * S[0, 1] / Tm
        assert np.allclose(float(res["e1"]), e1m, atol=3e-4)
        assert np.allclose(float(res["e2"]), e2m, atol=3e-4)
        assert np.allclose(float(res["T"]), Tm, rtol=2e-3)
        # pgauss flux = gaussian-weighted pre-psf flux
        flux_pred = flux * T_w / (T_w + T)
        assert np.allclose(float(res["flux"]), flux_pred, rtol=2e-3)
    else:
        # ksigma kernel: just check the shear direction and flux scale
        assert res["flux"] > 0.5 * flux
        assert np.sign(res["e1"]) == np.sign(g1)
        assert np.sign(res["e2"]) == np.sign(g2)


def test_prepsfmom_noise_errors():
    """reported errors track empirical scatter"""
    rng = np.random.RandomState(43)
    noise = 0.5
    fluxes, flux_errs = [], []
    fitter = PGaussMom(fwhm=2.0)
    for _ in range(100):
        obs, _ = _make_obs(rng, noise=noise)
        res = fitter.go(obs)
        if res["flags"] != 0:
            continue
        fluxes.append(float(res["flux"]))
        flux_errs.append(float(res["flux_err"]))
    assert len(fluxes) > 90
    assert np.allclose(np.std(fluxes), np.mean(flux_errs), rtol=0.25)


def test_prepsfmom_use_noise_image():
    rng = np.random.RandomState(44)
    noise = 0.5
    obs, _ = _make_obs(rng, noise=noise)
    obs.set_noise(rng.normal(size=obs.image.shape, scale=noise))
    res_w = PGaussMom(fwhm=2.0).go(obs)
    res_n = PGaussMom(fwhm=2.0, use_noise_image=True).go(obs)
    # white-noise and measured-noise errors agree for white noise
    assert np.allclose(
        float(res_w["flux_err"]), float(res_n["flux_err"]), rtol=0.15
    )


def test_prepsfmom_no_psf():
    rng = np.random.RandomState(45)
    obs, _ = _make_obs(rng)
    obs.set_psf(None)
    res = PGaussMom(fwhm=2.0).go(obs, no_psf=True)
    assert res["flags"] == 0
    with pytest.raises(RuntimeError):
        PGaussMom(fwhm=2.0).go(obs)


def test_prepsfmom_fft_range_error():
    rng = np.random.RandomState(46)
    obs, _ = _make_obs(rng)
    # tiny kernel: support does not fit the FFT grid
    with pytest.raises(FFTRangeError):
        KSigmaMom(fwhm=0.05).go(obs)


def test_prepsfmom_nonsquare_raises():
    rng = np.random.RandomState(47)
    obs, _ = _make_obs(rng)
    img = np.zeros((48, 50))
    with pytest.raises(ValueError):
        PGaussMom(fwhm=2.0).go(
            Observation(img, jacobian=DiagonalJacobian(row=24, col=25, scale=SCALE))
        )


def test_prepsfmom_fwhm_smooth():
    rng = np.random.RandomState(48)
    obs, _ = _make_obs(rng, noise=0.1)
    res0 = PGaussMom(fwhm=2.0).go(obs)
    res1 = PGaussMom(fwhm=2.0, fwhm_smooth=0.8).go(obs)
    assert res1["flags"] == 0
    # smoothing changes the moments
    assert not np.allclose(float(res0["T"]), float(res1["T"]))


def test_prepsfmom_batch():
    """the vmapped batch path matches single measurements"""
    import jax.numpy as jnp

    from ngmix_tpu.prepsfmom import prepsfmom_batch

    rng = np.random.RandomState(50)
    obs_list = [
        _make_obs(rng, T=0.8 + 0.1 * i, noise=0.01)[0] for i in range(3)
    ]
    images = jnp.stack([jnp.asarray(o.image) for o in obs_list])
    cens = jnp.stack(
        [jnp.asarray(o.jacobian.get_cen()) for o in obs_list]
    )
    psf_images = jnp.stack([jnp.asarray(o.psf.image) for o in obs_list])
    psf_cens = jnp.stack(
        [jnp.asarray(o.psf.jacobian.get_cen()) for o in obs_list]
    )
    tot_var = jnp.asarray(
        [float(np.sum(1.0 / o.weight[o.weight > 0])) for o in obs_list]
    )
    jac = obs_list[0].jacobian
    res = prepsfmom_batch(
        images, cens, psf_images, psf_cens, tot_var,
        target_dim=4 * 49, kernel="gauss",
        jac_tuple=(jac.dvdrow, jac.dvdcol, jac.dudrow, jac.dudcol),
        fwhm=2.0,
    )
    assert res["T"].shape == (3,)
    for i, o in enumerate(obs_list):
        single = PGaussMom(fwhm=2.0).go(o)
        assert np.allclose(float(res["T"][i]), float(single["T"]), rtol=1e-8)
        assert np.allclose(
            float(res["flux"][i]), float(single["flux"]), rtol=1e-8
        )


def test_prepsfmom_partial_modes_matches_fft_path():
    """the masked-mode partial-DFT batch path (no pad-factor grids)
    reproduces the full-FFT path to f8 roundoff for both kernels and a
    sheared WCS (ref: ngmix/prepsfmom.py:337-421 - the reductions are
    masked dot products there too)"""
    import jax.numpy as jnp

    import ngmix_tpu
    from ngmix_tpu.prepsfmom import prepsfmom_batch

    rng = np.random.RandomState(3)
    B, H, Hp = 4, 33, 25
    scale = 0.263
    psf = ngmix_tpu.GMixModel([0., 0., 0.02, -0.01, 0.27, 1.0], "turb")
    gal = ngmix_tpu.GMixModel([0., 0., 0.1, -0.05, 0.5, 100.0], "exp")
    conv = gal.convolve(psf)
    imgs = np.zeros((B, H, H))
    cens = np.zeros((B, 2))
    pims = np.zeros((B, Hp, Hp))
    pcens = np.full((B, 2), 12.0)
    pjac = ngmix_tpu.DiagonalJacobian(row=12, col=12, scale=scale)
    for i in range(B):
        off = rng.uniform(-0.5, 0.5, 2)
        jac = ngmix_tpu.DiagonalJacobian(
            row=16 + off[0], col=16 + off[1], scale=scale
        )
        imgs[i] = conv.make_image((H, H), jacobian=jac)
        imgs[i] += rng.normal(size=(H, H)) * 1e-4
        cens[i] = (16 + off[0], 16 + off[1])
        pims[i] = psf.make_image((Hp, Hp), jacobian=pjac)
    tot_var = np.full(B, 1e-8 * H * H)

    for kernel, fwhm in (("gauss", 2.0), ("ksigma", 1.2)):
        for jt in ((scale, 0, 0, scale), (scale, 0.01, -0.02, 0.95 * scale)):
            kw = dict(
                target_dim=4 * H, kernel=kernel, jac_tuple=jt, fwhm=fwhm
            )
            args = tuple(
                jnp.asarray(x) for x in (imgs, cens, pims, pcens, tot_var)
            )
            a = prepsfmom_batch(*args, partial_modes=False, **kw)
            b = prepsfmom_batch(*args, partial_modes=True, **kw)
            assert np.array_equal(
                np.asarray(a["flags"]), np.asarray(b["flags"])
            )
            for key in ("e1", "e2", "T", "flux", "s2n", "T_err", "flux_err"):
                np.testing.assert_allclose(
                    np.asarray(a[key]), np.asarray(b[key]),
                    rtol=1e-10, atol=1e-13, err_msg="%s %s" % (kernel, key),
                )


def test_prepsfmom_partial_modes_noise_image_cov():
    """with measured noise images, the partial-mode covariance (per-mode
    power at the masked modes) matches the FFT path
    (ref: ngmix/prepsfmom.py:197-221)"""
    import jax.numpy as jnp

    import ngmix_tpu
    from ngmix_tpu.prepsfmom import prepsfmom_batch

    rng = np.random.RandomState(13)
    B, H, Hp = 3, 33, 25
    scale = 0.263
    psf = ngmix_tpu.GMixModel([0., 0., 0.02, -0.01, 0.27, 1.0], "turb")
    gal = ngmix_tpu.GMixModel([0., 0., 0.1, -0.05, 0.5, 100.0], "exp")
    conv = gal.convolve(psf)
    jac = ngmix_tpu.DiagonalJacobian(row=16, col=16, scale=scale)
    pjac = ngmix_tpu.DiagonalJacobian(row=12, col=12, scale=scale)
    base = conv.make_image((H, H), jacobian=jac)
    imgs = np.stack([base + rng.normal(size=(H, H)) * 1e-3
                     for _ in range(B)])
    # correlated noise: smoothed white noise
    noise = np.stack([
        np.convolve(
            rng.normal(size=H * H), np.ones(3) / 3, mode="same"
        ).reshape(H, H) * 1e-3
        for _ in range(B)
    ])
    pims = np.tile(psf.make_image((Hp, Hp), jacobian=pjac), (B, 1, 1))
    cens = np.full((B, 2), 16.0)
    pcens = np.full((B, 2), 12.0)
    tot_var = np.full(B, 1e-6 * H * H)

    kw = dict(
        target_dim=4 * H, kernel="gauss", jac_tuple=(scale, 0, 0, scale),
        fwhm=2.0,
    )
    args = tuple(
        jnp.asarray(x) for x in (imgs, cens, pims, pcens, tot_var)
    )
    a = prepsfmom_batch(
        *args, partial_modes=False, noise_images=jnp.asarray(noise), **kw
    )
    b = prepsfmom_batch(
        *args, partial_modes=True, noise_images=jnp.asarray(noise), **kw
    )
    white = prepsfmom_batch(*args, partial_modes=True, **kw)
    for key in ("e1", "e2", "T", "flux", "s2n", "T_err", "flux_err"):
        np.testing.assert_allclose(
            np.asarray(a[key]), np.asarray(b[key]), rtol=1e-9,
            err_msg=key,
        )
    # the measured-power errors genuinely differ from the white model
    assert not np.allclose(
        np.asarray(b["flux_err"]), np.asarray(white["flux_err"]),
        rtol=1e-3,
    )
