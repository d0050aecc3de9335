import numpy as np

from ngmix_tpu import GaussMom

from _sims import get_gauss_obs


def _product_gauss_moments(T_o, g1, g2, T_w):
    """analytic weighted moments of a gaussian object with a round
    gaussian weight: covariance of the product gaussian"""
    from ngmix_tpu import moments as m

    e1, e2 = (float(x) for x in __import__("ngmix_tpu").shape.g1g2_to_e1e2(g1, g2))
    irr, irc, icc = (float(x) for x in m.e2mom(e1, e2, T_o))
    S_o = np.array([[irr, irc], [irc, icc]])
    S_w = np.eye(2) * (T_w / 2.0)
    S = np.linalg.inv(np.linalg.inv(S_o) + np.linalg.inv(S_w))
    T = S[0, 0] + S[1, 1]
    e1m = (S[1, 1] - S[0, 0]) / T
    e2m = 2 * S[0, 1] / T
    return e1m, e2m, T


def test_gaussmom_gauss_recovery():
    rng = np.random.RandomState(5)
    T, g1, g2 = 2.0, 0.1, -0.05
    data = get_gauss_obs(rng=rng, T=T, g1=g1, g2=g2, noise=0.0)
    fwhm = 1.2
    fitter = GaussMom(fwhm=fwhm)
    res = fitter.go(data["obs"])
    assert int(res["flags"]) == 0

    from ngmix_tpu.moments import fwhm_to_T

    T_w = float(fwhm_to_T(fwhm))
    e1m, e2m, Tm = _product_gauss_moments(T, g1, g2, T_w)
    assert np.allclose(float(res["e1"]), e1m, atol=2e-4)
    assert np.allclose(float(res["e2"]), e2m, atol=2e-4)
    assert np.allclose(float(res["T"]), Tm, rtol=2e-3)


def test_gaussmom_flux_units():
    """flux comes out in flux units (independent of pixel area)"""
    rng = np.random.RandomState(6)
    res = {}
    for scale in (0.2, 0.263):
        data = get_gauss_obs(
            rng=rng, T=2.0, g1=0.0, g2=0.0, flux=100.0, noise=0.0,
            scale=scale, dims=(49, 49),
        )
        r = GaussMom(fwhm=10.0).go(data["obs"])
        res[scale] = float(r["flux"])
    # flux units: identical across pixel scales, and equal to the
    # analytic gaussian weighted flux F * T_w / (T_w + T_o)
    from ngmix_tpu.moments import fwhm_to_T

    T_w = float(fwhm_to_T(10.0))
    expected = 100.0 * T_w / (T_w + 2.0)
    assert np.allclose(res[0.2], res[0.263], rtol=1e-3)
    assert np.allclose(res[0.263], expected, rtol=1e-3)


def test_gaussmom_s2n_scaling():
    rng = np.random.RandomState(7)
    data_lo = get_gauss_obs(rng=rng, noise=0.01)
    data_hi = get_gauss_obs(rng=rng, noise=0.001)
    r_lo = GaussMom(fwhm=1.2).go(data_lo["obs"])
    r_hi = GaussMom(fwhm=1.2).go(data_hi["obs"])
    assert float(r_hi["s2n"]) > 5 * float(r_lo["s2n"])


def test_gaussmom_higher_order():
    rng = np.random.RandomState(8)
    data = get_gauss_obs(rng=rng, noise=0.0)
    res = GaussMom(fwhm=1.2, with_higher_order=True).go(data["obs"])
    assert res["sums"].shape == (17,)
    assert res["sums_cov"].shape == (17, 17)
    assert int(res["flags"]) == 0


def test_gaussmom_obslist_coadd():
    rng = np.random.RandomState(9)
    from ngmix_tpu import ObsList

    data1 = get_gauss_obs(rng=rng, noise=0.001)
    data2 = get_gauss_obs(rng=rng, noise=0.001)
    obslist = ObsList()
    obslist.append(data1["obs"])
    obslist.append(data2["obs"])
    res = GaussMom(fwhm=1.2).go(obslist)
    r1 = GaussMom(fwhm=1.2).go(data1["obs"])
    assert int(res["flags"]) == 0
    # coadd s2n ~ sqrt(2) x single
    assert float(res["s2n"]) > 1.3 * float(r1["s2n"])


def test_gaussmom_error_calibration():
    """reported errors match the empirical scatter over an ensemble"""
    rng = np.random.RandomState(10)
    noise = 0.05
    ntrial = 200
    e1s = []
    e1errs = []
    for i in range(ntrial):
        data = get_gauss_obs(rng=rng, T=2.0, g1=0.1, g2=0.0, noise=noise)
        res = GaussMom(fwhm=1.2).go(data["obs"])
        if int(res["flags"]) != 0:
            continue
        e1s.append(float(res["e1"]))
        e1errs.append(float(res["e_err"][0]))
    e1s = np.array(e1s)
    scatter = e1s.std()
    reported = np.mean(e1errs)
    assert np.allclose(scatter, reported, rtol=0.25)
