import numpy as np
import jax.numpy as jnp
import pytest

import ngmix_tpu
from ngmix_tpu import DiagonalJacobian, GMix, GMixModel, UnitJacobian
from ngmix_tpu.gexceptions import GMixRangeError
from ngmix_tpu.gmix import core, tables
from ngmix_tpu.pixels import make_pixels


def _numpy_render(gm_data, dims, jac=None, apodize=False):
    """independent numpy oracle for rendering a mixture"""
    nrow, ncol = dims
    img = np.zeros(dims)
    if jac is None:
        cen = (np.array(dims) - 1.0) / 2.0
        row0, col0, dvdrow, dvdcol, dudrow, dudcol = cen[0], cen[1], 1, 0, 0, 1
    else:
        row0, col0 = jac.row0, jac.col0
        dvdrow, dvdcol, dudrow, dudcol = (
            jac.dvdrow,
            jac.dvdcol,
            jac.dudrow,
            jac.dudcol,
        )
    area = abs(dvdrow * dudcol - dvdcol * dudrow)
    for r in range(nrow):
        for c in range(ncol):
            v = dvdrow * (r - row0) + dvdcol * (c - col0)
            u = dudrow * (r - row0) + dudcol * (c - col0)
            tot = 0.0
            for p, grow, gcol, irr, irc, icc in gm_data:
                det = irr * icc - irc * irc
                dv, du = v - grow, u - gcol
                chi2 = (icc * dv * dv + irr * du * du - 2 * irc * dv * du) / det
                val = p / (2 * np.pi * np.sqrt(det)) * np.exp(-0.5 * chi2)
                if apodize:
                    if chi2 >= 25.0:
                        val = 0.0
                    elif chi2 > 20.0:
                        x = (25.0 - chi2) / 5.0
                        val *= x**3 * (10 + x * (-15 + 6 * x))
                tot += val * area
            img[r, c] = tot
    return img


def test_fill_tables_normalized():
    """exp/dev/turb/gauss expansions integrate to the flux and have
    mean T equal to the requested T"""
    for model in ("exp", "dev", "turb", "gauss"):
        pars = jnp.array([0.0, 0.0, 0.1, -0.2, 1.7, 3.5])
        gm, flags = core.gmix_fill(model, pars)
        assert int(flags) == 0
        assert gm.shape == (tables.get_model_ngauss(model), 6)
        psum = float(jnp.sum(gm[:, core.G_P]))
        assert np.allclose(psum, 3.5, rtol=1e-12)
        Tmean = float(
            jnp.sum(gm[:, core.G_P] * (gm[:, core.G_IRR] + gm[:, core.G_ICC]))
        ) / psum
        assert np.allclose(Tmean, 1.7, rtol=1e-7)


def test_fill_gauss_moments():
    g1, g2, T = 0.1, -0.2, 1.7
    pars = jnp.array([0.5, -0.25, g1, g2, T, 2.0])
    gm, _ = core.fill_gauss(pars)
    # oracle: e from g via tanh identity
    g = np.hypot(g1, g2)
    e = np.tanh(2 * np.arctanh(g))
    e1, e2 = e * g1 / g, e * g2 / g
    assert np.allclose(float(gm[0, core.G_IRR]), 0.5 * T * (1 - e1))
    assert np.allclose(float(gm[0, core.G_IRC]), 0.5 * T * e2)
    assert np.allclose(float(gm[0, core.G_ICC]), 0.5 * T * (1 + e1))
    assert np.allclose(float(gm[0, core.G_ROW]), 0.5)
    assert np.allclose(float(gm[0, core.G_COL]), -0.25)


def test_fill_flags_bad_g():
    pars = jnp.array([0.0, 0.0, 0.9, 0.9, 1.7, 3.5])
    _, flags = core.fill_exp(pars)
    assert int(flags) != 0


def test_fill_batched():
    pars = jnp.array(
        [[0.0, 0.0, 0.1, -0.2, 1.7, 3.5], [0.1, 0.2, 0.0, 0.1, 0.9, 1.0]]
    )
    gm, flags = core.fill_exp(pars)
    assert gm.shape == (2, 6, 6)
    assert flags.shape == (2,)
    gm0, _ = core.fill_exp(pars[0])
    assert np.allclose(np.asarray(gm[0]), np.asarray(gm0))


def test_get_cen_e1e2T():
    pars = jnp.array([0.5, -0.25, 0.1, -0.2, 1.7, 2.0])
    gm, _ = core.fill_exp(pars)
    row, col, psum = core.gmix_get_cen(gm)
    assert np.allclose([float(row), float(col)], [0.5, -0.25])
    assert np.allclose(float(psum), 2.0)
    e1, e2, T = core.gmix_get_e1e2T(gm)
    g = np.hypot(0.1, 0.2)
    e = np.tanh(2 * np.arctanh(g))
    assert np.allclose(float(e1), e * 0.1 / g, rtol=1e-6)
    assert np.allclose(float(e2), -e * 0.2 / g, rtol=1e-6)
    assert np.allclose(float(T), 1.7, rtol=1e-6)


def test_convolve_gauss_gauss():
    """gaussian x gaussian convolution sums second moments"""
    obj = GMixModel([0.0, 0.0, 0.1, -0.05, 1.0, 2.0], "gauss")
    psf = GMixModel([0.1, -0.1, 0.0, 0.0, 0.5, 1.0], "gauss")
    conv = obj.convolve(psf)
    od, pd, cd = obj.get_data(), psf.get_data(), conv.get_data()
    assert len(conv) == 1
    assert np.allclose(cd[0, core.G_IRR], od[0, core.G_IRR] + pd[0, core.G_IRR])
    assert np.allclose(cd[0, core.G_IRC], od[0, core.G_IRC] + pd[0, core.G_IRC])
    assert np.allclose(cd[0, core.G_ICC], od[0, core.G_ICC] + pd[0, core.G_ICC])
    # psf is recentered about its own center: object center preserved
    assert np.allclose(cd[0, core.G_ROW], 0.0)
    assert np.allclose(cd[0, core.G_COL], 0.0)
    # flux preserved (psf normalized away)
    assert np.allclose(cd[0, core.G_P], 2.0)


def test_convolve_counts():
    obj = GMixModel([0.0, 0.0, 0.1, -0.05, 1.0, 2.0], "exp")
    psf = GMixModel([0.0, 0.0, 0.0, 0.0, 0.5, 1.0], "turb")
    conv = obj.convolve(psf)
    assert len(conv) == 18
    assert np.allclose(conv.get_flux(), 2.0)


def test_render_oracle_exact():
    """make_image with fast_exp=False matches the direct numpy formula"""
    gm = GMixModel([0.0, 0.5, 0.1, -0.2, 4.0, 10.0], "gauss")
    dims = (25, 25)
    img = gm.make_image(dims, fast_exp=False)
    oracle = _numpy_render(gm.get_data(), dims)
    assert np.allclose(img, oracle, rtol=1e-10, atol=1e-14)


def test_render_oracle_apodized():
    gm = GMixModel([0.0, 0.5, 0.1, -0.2, 4.0, 10.0], "exp")
    dims = (25, 25)
    img = gm.make_image(dims, fast_exp=True)
    oracle = _numpy_render(gm.get_data(), dims, apodize=True)
    assert np.allclose(img, oracle, rtol=1e-12, atol=1e-15)


def test_render_with_jacobian():
    gm = GMixModel([0.0, 0.0, 0.05, 0.0, 1.0, 10.0], "gauss")
    jac = ngmix_tpu.Jacobian(
        row=12.1, col=11.8, dvdrow=0.25, dvdcol=0.01, dudrow=-0.02, dudcol=0.27
    )
    dims = (25, 25)
    img = gm.make_image(dims, jacobian=jac, fast_exp=False)
    oracle = _numpy_render(gm.get_data(), dims, jac=jac)
    assert np.allclose(img, oracle, rtol=1e-10)


def test_flux_integral():
    """rendered image sums to ~flux/pixel-area for a well-contained object"""
    scale = 0.5
    gm = GMixModel([0.0, 0.0, 0.0, 0.0, 2.0, 7.0], "gauss")
    jac = DiagonalJacobian(row=24, col=24, scale=scale)
    img = gm.make_image((49, 49), jacobian=jac, fast_exp=True)
    # fast path includes the area factor: sum(image) ~ flux
    assert np.allclose(img.sum(), 7.0, rtol=1e-3)


def test_loglike_oracle():
    rng = np.random.RandomState(42)
    gm = GMixModel([0.0, 0.0, 0.1, 0.0, 2.0, 7.0], "gauss")
    dims = (25, 25)
    jac = UnitJacobian(row=12, col=12)
    model_img = gm.make_image(dims, jacobian=jac, fast_exp=True)
    img = model_img + rng.normal(size=dims) * 0.01
    weight = np.ones(dims) / 0.01**2
    weight[0, 0] = 0.0  # one masked pixel

    pixels = make_pixels(img, weight, jac.to_device())
    loglike, s2n_numer, s2n_denom, npix = (
        np.asarray(x) for x in core.get_loglike(jnp.asarray(gm.get_data()), pixels)
    )

    # numpy oracle
    mask = weight > 0
    diff = model_img - img
    ll = -0.5 * np.sum(diff[mask] ** 2 * weight[mask])
    assert np.allclose(float(loglike), ll, rtol=1e-10)
    assert int(npix) == mask.sum()
    assert np.allclose(
        float(s2n_numer), np.sum(img[mask] * model_img[mask] * weight[mask])
    )
    assert np.allclose(
        float(s2n_denom), np.sum(model_img[mask] ** 2 * weight[mask])
    )


def test_fill_fdiff_oracle():
    rng = np.random.RandomState(3)
    gm = GMixModel([0.0, 0.0, 0.1, 0.0, 2.0, 7.0], "gauss")
    dims = (15, 15)
    jac = UnitJacobian(row=7, col=7)
    model_img = gm.make_image(dims, jacobian=jac, fast_exp=True)
    img = model_img + rng.normal(size=dims) * 0.01
    weight = np.ones(dims) / 0.01**2
    pixels = make_pixels(img, weight, jac.to_device())
    fdiff = np.asarray(core.fill_fdiff(jnp.asarray(gm.get_data()), pixels))
    oracle = ((model_img - img) * np.sqrt(weight)).ravel()
    assert np.allclose(fdiff, oracle, rtol=1e-10)


def test_gmix_class_basics():
    gm = GMix(pars=[1.0, 0.1, -0.1, 2.0, 0.1, 1.5])
    assert len(gm) == 1
    assert np.allclose(gm.get_flux(), 1.0)
    gm.set_flux(3.0)
    assert np.allclose(gm.get_flux(), 3.0)
    gm.set_cen(1.0, 2.0)
    assert np.allclose(gm.get_cen(), (1.0, 2.0))
    full = gm.get_full_pars()
    assert full.shape == (6,)

    gm2 = gm.copy()
    assert gm2 == gm

    with pytest.raises(ValueError):
        GMix(pars=[1, 2, 3])
    with pytest.raises(ValueError):
        GMix()


def test_gmix_model_raises_bad_g():
    with pytest.raises(GMixRangeError):
        GMixModel([0.0, 0.0, 0.99, 0.99, 1.0, 1.0], "exp")


def test_make_round():
    gm = GMixModel([0.0, 0.0, 0.2, -0.1, 2.0, 1.0], "gauss")
    rgm = gm.make_round()
    e1, e2, T = rgm.get_e1e2T()
    assert np.allclose([e1, e2], [0.0, 0.0], atol=1e-12)
    gsq = 0.2**2 + 0.1**2
    assert np.allclose(T, 2.0 * (1 - gsq) / (1 + gsq), rtol=1e-6)


def test_get_sheared():
    gm = GMixModel([0.0, 0.0, 0.0, 0.0, 2.0, 1.0], "gauss")
    sgm = gm.get_sheared(0.05, 0.0)
    g1, g2, _ = sgm.get_g1g2T()
    assert np.allclose([g1, g2], [0.05, 0.0], atol=1e-10)


def test_scale_T():
    gm = GMixModel([0.0, 0.0, 0.1, 0.0, 2.0, 1.0], "exp")
    gm.scale_T(2.0)
    assert np.allclose(gm.get_T(), 4.0, rtol=1e-6)


def test_cm_tfactor_gauss_limits():
    # fracdev=0 -> pure exp; Tfactor = 1/sum(p_exp * f_exp) ~ 1
    tf = float(core.get_cm_Tfactor(jnp.array(0.0), jnp.array(1.0)))
    pe, fe = tables.PVALS_EXP, tables.FVALS_EXP
    assert np.allclose(tf, 1.0 / np.sum(pe * fe))


def test_gmix_cm_T():
    from ngmix_tpu import GMixCM

    gm = GMixCM(0.5, 1.0, [0.0, 0.0, 0.1, 0.0, 2.0, 1.0])
    assert np.allclose(gm.get_T(), 2.0, rtol=1e-6)
    assert np.allclose(gm.get_flux(), 1.0)


def test_coellip():
    from ngmix_tpu import GMixCoellip

    gm = GMixCoellip([0.0, 0.0, 0.1, 0.0, 1.0, 2.0, 3.0, 4.0])
    assert len(gm) == 2
    assert np.allclose(gm.get_flux(), 7.0)


def test_gmix_concat():
    from ngmix_tpu.gmix import gmix_concat

    a = GMixModel([0.0, 0.0, 0.1, 0.0, 2.0, 1.0], "gauss")
    b = GMixModel([0.0, 0.0, 0.0, 0.1, 1.0, 2.0], "gauss")
    c = gmix_concat([a, b])
    assert len(c) == 2
    assert np.allclose(c.get_flux(), 3.0)


def test_weighted_sums_oracle():
    """weighted sums match a direct numpy computation"""
    rng = np.random.RandomState(11)
    gm = GMixModel([0.0, 0.0, 0.1, 0.0, 2.0, 7.0], "gauss")
    dims = (21, 21)
    jac = UnitJacobian(row=10, col=10)
    img = gm.make_image(dims, jacobian=jac, fast_exp=True)
    img += rng.normal(size=dims) * 0.001
    weight = np.ones(dims) * 1e6

    from ngmix_tpu.observation import Observation

    obs = Observation(img, weight=weight, jacobian=jac)
    wt = GMixModel([0.0, 0.0, 0.0, 0.0, 1.5, 1.0], "gauss")
    res = wt.get_weighted_sums(obs, maxrad=8.0)

    # oracle
    wd = wt.get_data()[0]
    det = wd[3] * wd[5] - wd[4] ** 2
    sums = np.zeros(6)
    cov = np.zeros((6, 6))
    wsum = 0.0
    npix = 0
    for r in range(21):
        for c in range(21):
            v, u = r - 10.0, c - 10.0
            rad2 = v * v + u * u
            if rad2 >= 64.0:
                continue
            chi2 = (wd[5] * v * v + wd[3] * u * u - 2 * wd[4] * v * u) / det
            w = wd[0] / (2 * np.pi * np.sqrt(det)) * np.exp(-0.5 * chi2)
            F = np.array([v, u, u * u - v * v, 2 * v * u, rad2, 1.0])
            var = 1.0 / 1e6
            sums += w * img[r, c] * F
            cov += w * w * var * np.outer(F, F)
            wsum += w
            npix += 1
    assert np.allclose(np.asarray(res["sums"]), sums, rtol=1e-8)
    assert np.allclose(np.asarray(res["sums_cov"]), cov, rtol=1e-8)
    assert np.allclose(float(res["wsum"]), wsum, rtol=1e-10)
    assert int(res["npix"]) == npix
