import jax.numpy as jnp
import numpy as np
import pytest

from ngmix_tpu import GMixModel, run_admom
from ngmix_tpu.admom import AdmomConf, AdmomFitter, admom_batch, find_cen_admom

from _sims import get_gauss_obs


def test_admom_gauss_recovery():
    """adaptive moments on a noiseless gaussian recover its moments"""
    rng = np.random.RandomState(21)
    T, g1, g2, flux = 2.0, 0.1, -0.05, 100.0
    data = get_gauss_obs(rng=rng, T=T, g1=g1, g2=g2, flux=flux, noise=0.0)

    res = run_admom(data["obs"], guess=T * 1.3, rng=rng)
    assert res["flags"] == 0

    from ngmix_tpu.shape import g1g2_to_e1e2

    e1t, e2t = (float(x) for x in g1g2_to_e1e2(g1, g2))
    assert np.allclose(res["e1"], e1t, atol=2e-3)
    assert np.allclose(res["e2"], e2t, atol=2e-3)
    assert np.allclose(res["T"], T, rtol=5e-3)
    # admom flux is the gaussian *weighted* flux; for weight == object
    # it is F * sqrt(det_w / det_{w+o}) = F/2 (cross-checked against
    # GaussMom below, as the reference does in
    # test_admom_comp_to_gaussmom_flux)
    assert np.allclose(res["flux"], flux / 2, rtol=1e-2)
    assert res["numiter"] > 1

    from ngmix_tpu import GaussMom
    from ngmix_tpu.moments import T_to_fwhm

    res_gmom = GaussMom(fwhm=float(T_to_fwhm(res["T"]))).go(data["obs"])
    # flux_err gets a looser tolerance: admom evaluates the weight with
    # the apodized-truncated kernel while gaussmom uses the exact one
    assert np.allclose(res["flux"], float(res_gmom["flux"]), atol=0, rtol=1e-2)
    assert np.allclose(
        res["flux_err"], float(res_gmom["flux_err"]), atol=0, rtol=3e-2
    )

    gm = res.get_gmix()
    g1f, g2f, Tf = gm.get_g1g2T()
    assert np.allclose([g1f, g2f], [g1, g2], atol=2e-3)

    im = res.make_image()
    assert im.shape == data["obs"].image.shape


def test_admom_noisy():
    rng = np.random.RandomState(22)
    T = 2.0
    data = get_gauss_obs(rng=rng, T=T, g1=0.1, g2=-0.05, noise=0.1)
    res = run_admom(data["obs"], guess=T, rng=rng)
    assert res["flags"] == 0
    assert res["s2n"] > 10
    assert np.isfinite(res["e1err"])


def test_admom_maxiter_flag():
    rng = np.random.RandomState(23)
    data = get_gauss_obs(rng=rng, T=2.0, noise=0.0)
    res = run_admom(data["obs"], guess=2.0, maxiter=2, rng=rng)
    from ngmix_tpu import flags as nf

    assert res["flags"] == nf.MAXITER


def test_admom_gmix_guess():
    rng = np.random.RandomState(24)
    data = get_gauss_obs(rng=rng, T=2.0, noise=0.0)
    guess = GMixModel([0.0, 0.0, 0.0, 0.0, 1.8, 1.0], "gauss")
    res = run_admom(data["obs"], guess=guess)
    assert res["flags"] == 0
    assert np.allclose(res["T"], 2.0, rtol=5e-3)


def test_admom_cen_shift_flag():
    rng = np.random.RandomState(25)
    data = get_gauss_obs(rng=rng, T=2.0, noise=0.0)
    # guess center far away with a tight shiftmax: object pulls it back
    guess = GMixModel([3.0, 3.0, 0.0, 0.0, 2.0, 1.0], "gauss")
    res = run_admom(data["obs"], guess=guess, shiftmax=0.3)
    from ngmix_tpu import flags as nf

    assert res["flags"] & (nf.CEN_SHIFT | nf.MAXITER)


def test_find_cen():
    rng = np.random.RandomState(26)
    data = get_gauss_obs(rng=rng, T=2.0, noise=0.0)
    res = find_cen_admom(data["obs"], fwhm=1.2, rng=rng, ntry=2)
    assert res["flags"] == 0
    assert np.allclose(res["cen"], [0.0, 0.0], atol=1e-3)


def test_admom_batch_consistency():
    """the vmapped batch path gives the same answers as single fits"""
    rng = np.random.RandomState(27)
    obs_list = []
    wt_list = []
    for i in range(4):
        T = 1.5 + 0.3 * i
        data = get_gauss_obs(
            rng=rng, T=T, g1=0.05 * (i - 2), g2=0.02 * i, noise=0.001
        )
        obs_list.append(data["obs"])
        # gmix-component layout (p, row, col, irr, irc, icc)
        wt_list.append([1.0, 0.0, 0.0, T * 1.1 / 2, 0.0, T * 1.1 / 2])

    import jax

    pixels = jax.tree.map(lambda *xs: jnp.stack(xs), *[o.pixels for o in obs_list])
    wt0 = jnp.asarray(wt_list)
    area = jnp.asarray([o.jacobian.area for o in obs_list])

    conf = AdmomConf()
    bres = admom_batch(pixels, wt0, area, conf)
    assert bres["flags"].shape == (4,)

    fitter = AdmomFitter()
    for i, obs in enumerate(obs_list):
        # the same guess as the batch row, via the model interface
        g = GMixModel(
            [0.0, 0.0, 0.0, 0.0, float(wt0[i, 3] + wt0[i, 5]), 1.0], "gauss"
        )
        sres = fitter.go(obs, g)
        assert int(bres["flags"][i]) == sres["flags"]
        if sres["flags"] == 0:
            assert np.allclose(float(bres["T"][i]), sres["T"], rtol=1e-10)
            assert np.allclose(float(bres["e1"][i]), sres["e1"], rtol=1e-8)
            assert np.allclose(
                float(bres["flux"][i]), sres["flux"], rtol=1e-10
            )


def test_admom_low_det_flag():
    rng = np.random.RandomState(28)
    data = get_gauss_obs(rng=rng, T=2.0, noise=0.0)
    guess = GMixModel([0.0, 0.0, 0.0, 0.0, 1e-280, 1.0], "gauss")
    res = AdmomFitter().go(data["obs"], guess)
    from ngmix_tpu import flags as nf

    assert res["flags"] & nf.LOW_DET


@pytest.mark.parametrize("noise", [0.01, 0.05])
def test_admom_error_calibration(noise):
    """reported e1 errors track the empirical scatter"""
    rng = np.random.RandomState(29)
    e1s, errs = [], []
    for _ in range(150):
        data = get_gauss_obs(rng=rng, T=2.0, g1=0.1, g2=0.0, noise=noise)
        res = run_admom(data["obs"], guess=2.0, rng=rng)
        if res["flags"] != 0:
            continue
        e1s.append(res["e1"])
        errs.append(res["e1err"])
    assert len(e1s) > 100
    assert np.allclose(np.std(e1s), np.mean(errs), rtol=0.35)
