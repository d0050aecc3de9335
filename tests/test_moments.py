import numpy as np

from ngmix_tpu import flags as nf
from ngmix_tpu import moments


def test_fwhm_sigma_T_roundtrips():
    assert np.allclose(float(moments.fwhm_to_sigma(moments.sigma_to_fwhm(1.3))), 1.3)
    assert np.allclose(float(moments.fwhm_to_T(moments.T_to_fwhm(0.8))), 0.8)
    assert np.allclose(float(moments.r50_to_T(moments.T_to_r50(0.8))), 0.8)
    # for a gaussian, fwhm = 2.3548 sigma and T = 2 sigma^2
    sigma = 0.7
    assert np.allclose(float(moments.sigma_to_fwhm(sigma)), 2.3548200450309493 * sigma)
    assert np.allclose(float(moments.fwhm_to_T(moments.sigma_to_fwhm(sigma))), 2 * sigma**2)


def test_mom_e_g_roundtrip():
    irr, irc, icc = 0.8, 0.1, 1.2
    e1, e2, T = moments.mom2e(irr, irc, icc)
    irr2, irc2, icc2 = moments.e2mom(e1, e2, T)
    assert np.allclose([float(irr2), float(irc2), float(icc2)], [irr, irc, icc])

    g1, g2, T = moments.mom2g(irr, irc, icc)
    irr3, irc3, icc3 = moments.g2mom(g1, g2, T)
    assert np.allclose([float(irr3), float(irc3), float(icc3)], [irr, irc, icc])


def test_sheared_moments_zero_shear():
    irr, irc, icc = 0.8, 0.1, 1.2
    out = moments.get_sheared_moments(irr, irc, icc, 0.0, 0.0)
    assert np.allclose([float(x) for x in out], [irr, irc, icc])


def test_get_Tround_T_roundtrip():
    T = 1.7
    g1, g2 = 0.2, -0.1
    Tr = moments.get_Tround(T, g1, g2)
    assert np.allclose(float(moments.get_T(Tr, g1, g2)), T)


def test_make_mom_result_basic():
    # a clean measurement: flux 10 +- 1, T sum 5, M1 sum 1, M2 sum -0.5
    sums = np.array([0.1, -0.2, 1.0, -0.5, 5.0, 10.0])
    cov = np.diag([1.0, 1.0, 0.5, 0.5, 2.0, 1.0])
    res = moments.make_mom_result(sums, cov)
    assert int(res["flags"]) == 0
    assert np.allclose(float(res["flux"]), 10.0)
    assert np.allclose(float(res["flux_err"]), 1.0)
    assert np.allclose(float(res["s2n"]), 10.0)
    assert np.allclose(float(res["T"]), 0.5)
    assert np.allclose(float(res["e1"]), 1.0 / 5.0)
    assert np.allclose(float(res["e2"]), -0.5 / 5.0)
    # pars = [Mv_sum, Mu_sum, e1, e2, T, flux]
    assert np.allclose(
        np.asarray(res["pars"]), [0.1, -0.2, 0.2, -0.1, 0.5, 10.0]
    )
    # ratio error oracle for T
    a, b = 5.0, 10.0
    var = (a / b) ** 2 * (2.0 / a**2 + 1.0 / b**2)
    assert np.allclose(float(res["T_err"]), np.sqrt(var))
    # named moments normalized by flux
    assert np.allclose(float(res["MT"]), 0.5)
    assert np.allclose(float(res["M1"]), 0.1)


def test_make_mom_result_nonpos_flux():
    sums = np.array([0.0, 0.0, 0.0, 0.0, 1.0, -1.0])
    cov = np.eye(6)
    res = moments.make_mom_result(sums, cov)
    assert int(res["flags"]) & nf.NONPOS_FLUX
    assert int(res["T_flags"]) & nf.NONPOS_FLUX
    assert np.isnan(float(res["T"]))


def test_make_mom_result_nonpos_var():
    sums = np.array([0.0, 0.0, 0.0, 0.0, 1.0, 1.0])
    cov = np.eye(6)
    cov[5, 5] = -1.0
    res = moments.make_mom_result(sums, cov)
    assert int(res["flux_flags"]) & nf.NONPOS_VAR
    assert int(res["flags"]) & nf.NONPOS_VAR


def test_make_mom_result_batched():
    sums = np.tile(np.array([0.1, -0.2, 1.0, -0.5, 5.0, 10.0]), (4, 1))
    cov = np.tile(np.diag([1.0, 1.0, 0.5, 0.5, 2.0, 1.0]), (4, 1, 1))
    sums[2, 5] = -1.0  # one bad entry
    res = moments.make_mom_result(sums, cov)
    assert res["flags"].shape == (4,)
    assert int(res["flags"][0]) == 0
    assert int(res["flags"][2]) & nf.NONPOS_FLUX
    assert np.allclose(float(res["T"][0]), 0.5)


def test_regularize_mom_shapes():
    sums = np.array([0.1, -0.2, 1.0, -0.5, 5.0, 10.0])
    cov = np.diag([1.0, 1.0, 0.5, 0.5, 2.0, 1.0])
    res = moments.make_mom_result(sums, cov)
    fwhm_reg = 0.9
    resreg = moments.regularize_mom_shapes(res, fwhm_reg)
    T_reg = float(moments.fwhm_to_T(fwhm_reg))
    # e1 = M1 / (MT + T_reg * MF)
    assert np.allclose(float(resreg["e1"]), 1.0 / (5.0 + T_reg * 10.0))
    # T preserved from original
    assert np.allclose(float(resreg["T"]), float(res["T"]))


def test_result_to_host():
    sums = np.array([0.1, -0.2, 1.0, -0.5, 5.0, 10.0])
    cov = np.diag([1.0, 1.0, 0.5, 0.5, 2.0, 1.0])
    res = moments.make_mom_result(sums, cov)
    host = moments.result_to_host(res)
    assert host["flagstr"] == ""
    assert isinstance(host["flux"], np.ndarray)
