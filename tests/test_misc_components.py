import numpy as np
import pytest

from ngmix_tpu import GMixList, GMixND, MultiBandGMixList, GMixModel
from ngmix_tpu import fastexp


def test_gmixnd_eval():
    rng = np.random.RandomState(1)
    weights = np.array([0.4, 0.6])
    means = np.array([[0.0, 1.0], [2.0, -1.0]])
    covars = np.array([np.eye(2) * 0.5, np.eye(2) * 1.5])
    gm = GMixND(weights=weights, means=means, covars=covars, rng=rng)

    # scipy oracle
    from scipy.stats import multivariate_normal

    pts = rng.normal(size=(20, 2))
    oracle = sum(
        w * multivariate_normal(mean=m, cov=c).pdf(pts)
        for w, m, c in zip(weights, means, covars)
    )
    ours = gm.get_prob_array(pts)
    assert np.allclose(ours, oracle, rtol=1e-10)
    assert np.allclose(
        gm.get_lnprob_array(pts), np.log(oracle), rtol=1e-10
    )
    # scalar + component paths
    assert np.allclose(gm.get_prob_scalar(pts[0]), oracle[0])
    lnp0 = gm.get_lnprob_scalar(pts[0], component=0)
    assert np.isfinite(lnp0)


def test_gmixnd_sample_stats():
    rng = np.random.RandomState(2)
    gm = GMixND(
        weights=[1.0], means=np.array([[1.0]]), covars=np.array([[[4.0]]]),
        rng=rng,
    )
    s = gm.sample(5000)
    assert abs(s.mean() - 1.0) < 0.1
    assert abs(s.std() - 2.0) < 0.1


def test_gmixnd_fit_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    data = np.concatenate(
        [rng.normal(-2, 0.5, size=2000), rng.normal(2, 0.5, size=2000)]
    )
    gm = GMixND(rng=rng)
    gm.fit(data, ngauss=2, n_iter=200)
    assert gm.ngauss == 2
    assert sorted(np.abs(gm.means[:, 0]).round(1)) == [2.0, 2.0]

    fname = str(tmp_path / "mix.npz")
    gm.save_mixture(fname)
    gm2 = GMixND(file=fname, rng=rng)
    assert np.allclose(gm2.weights, gm.weights)
    assert np.allclose(gm2.means, gm.means)


def test_gmix_lists():
    gl = GMixList()
    gl.append(GMixModel([0, 0, 0, 0, 1.0, 1.0], "gauss"))
    with pytest.raises(AssertionError):
        gl.append("not a gmix")
    mb = MultiBandGMixList()
    mb.append(gl)
    with pytest.raises(AssertionError):
        mb.append([1, 2])


def test_fastexp_shim():
    assert float(fastexp.fexp(-1.0)) == pytest.approx(np.exp(-1.0))
    assert fastexp.FASTEXP_MAX_CHI2 == 25.0
    # window continuity at the boundaries
    assert float(fastexp.apod_window(20.0)) == pytest.approx(1.0)
    assert float(fastexp.apod_window(25.0)) == pytest.approx(0.0)


def test_noise_cov():
    """white noise sandwich reproduces the chi2-scaled covariance"""
    import sys

    sys.path.insert(0, "tests")
    from _sims import get_model_obs
    from ngmix_tpu import Fitter

    rng = np.random.RandomState(4)
    noise = 0.5
    data = get_model_obs(
        rng=rng, model="gauss", T=1.2, g1=0.1, g2=0.0, flux=100.0,
        noise=noise,
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    obs.set_noise(rng.normal(size=obs.image.shape, scale=noise))

    guess = data["pars"] * rng.uniform(low=0.95, high=1.05, size=6)
    res_plain = Fitter(model="gauss").go(obs, guess)
    res_noise = Fitter(model="gauss", use_noise_image=True).go(obs, guess)
    assert res_noise["flags"] == 0
    # for white noise the sandwich is statistically equal to the
    # chi2-scaled covariance
    assert np.allclose(
        res_noise["pars_err"], res_plain["pars_err"], rtol=0.25
    )

    # requires the noise image
    obs2 = data["obs"].copy()
    obs2.set_noise(None)
    with pytest.raises(ValueError):
        Fitter(model="gauss", use_noise_image=True).go(obs2, guess)


def test_pallas_eval_interpret():
    """the Pallas gmix-eval kernel matches the jnp implementation
    (interpret mode so it runs on the CPU test backend)"""
    import jax.numpy as jnp

    from ngmix_tpu.gmix import core as gcore
    from ngmix_tpu.ops.pallas_gmix import eval_gmix_pallas

    rng = np.random.RandomState(5)
    B, P = 3, 200
    pars = jnp.asarray(np.tile([0.0, 0.0, 0.05, -0.02, 2.0, 100.0], (B, 1)))
    gmix, _ = __import__("ngmix_tpu").gmix.core.fill_exp(pars)
    v = jnp.asarray(rng.uniform(-3, 3, (B, P)))
    u = jnp.asarray(rng.uniform(-3, 3, (B, P)))
    for fast in (True, False):
        ref = gcore.eval_gmix(gmix, v, u, 0.069, fast=fast)
        out = eval_gmix_pallas(
            gmix, v, u, 0.069, fast=fast, interpret=True
        )
        assert np.allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_profiling_timed():
    from ngmix_tpu import profiling

    with profiling.timed("stage_a"):
        x = sum(range(1000))
    assert x > 0
    rep = profiling.report(reset=True)
    assert "stage_a" in rep
    assert rep["stage_a"][1] == 1


def test_checkpoint_roundtrip(tmp_path):
    from ngmix_tpu.checkpoint import ResultWriter, load_results

    outdir = str(tmp_path / "ckpt")
    w = ResultWriter(outdir)
    assert w.next_index() == 0
    for i in range(3):
        w.write(i, {"pars": np.full((4, 6), i, dtype=float),
                    "nested": {"flags": np.zeros(4, dtype=int)}})
    # resume sees all three done
    w2 = ResultWriter(outdir)
    assert w2.next_index() == 3
    table = load_results(outdir)
    assert table["pars"].shape == (12, 6)
    assert table["nested/flags"].shape == (12,)
    assert np.all(table["pars"][4:8] == 1)


def test_target_psf_compat_functions():
    """reference-named target-psf entry points return round GMixModels"""
    import jax.numpy as jnp
    import numpy as np

    from ngmix_tpu.metacal import (
        get_azgauss_target_psf,
        get_fitgauss_target_psf,
        kops,
    )

    # azgauss: gaussian psf in k -> target slightly larger than psf
    N = 64
    sig = 0.9 * 0.263
    from ngmix_tpu.jacobian import DiagonalJacobian
    jac = DiagonalJacobian(row=0, col=0, scale=0.263)
    ksq = kops.sky_ksq(N, jac)
    psfhat = jnp.exp(-0.5 * sig**2 * ksq)
    gm = get_azgauss_target_psf(psfhat, ksq, nbin=N)
    assert gm._model_name == "gauss" or len(gm) == 1
    T = gm.get_T()
    assert T > 2 * sig**2  # strictly larger (conservative pinning)
    assert T < 8 * sig**2

    # fitgauss: fit-then-dilate on a psf observation
    from _sims import get_model_obs

    rng = np.random.RandomState(3)
    data = get_model_obs(rng=rng, model="gauss", noise=0.01)
    psf_obs = data["obs"].psf
    gm2 = get_fitgauss_target_psf(psf_obs, rng)
    assert len(gm2) == 1
    assert gm2.get_T() > 0
    assert np.allclose(gm2.get_flux(), np.sum(psf_obs.image), rtol=1e-6)
