"""The fused Pallas normal-equation LM path (interpret mode on CPU)
must agree with the AD residual path."""
import jax
import jax.numpy as jnp
import numpy as np

from ngmix_tpu.batch import (
    MetacalConfig,
    _exp_lm_fdiff,
    _exp_lm_measure,
    _exp_normal_fn,
    _lm_planes,
    make_pixels_batch,
)
from ngmix_tpu.fitting.lm import LMConf
from ngmix_tpu.gmix import core as gcore

from test_batch_pipeline import DIMS, PSF_DIMS, SCALE, _sim_batch  # noqa


def _pixel_batch(B=6, noise=1e-3):
    rng = np.random.RandomState(19)
    imgs, weights, cens, _, _, _ = _sim_batch(rng, B, noise=noise)
    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE)
    )
    pixels = make_pixels_batch(imgs, weights, cens, conf)
    psf_gmix = jnp.zeros((B, 1, 6), imgs.dtype)
    sig = 0.9 * SCALE
    psf_gmix = psf_gmix.at[:, 0, 0].set(1.0)
    psf_gmix = psf_gmix.at[:, 0, 3].set(sig**2)
    psf_gmix = psf_gmix.at[:, 0, 5].set(sig**2)
    return pixels, psf_gmix, sig


def test_normal_eqs_match_ad():
    """kernel (cost, Jtr, JtJ) == reductions of the AD jacobian"""
    pixels, psf_gmix, _ = _pixel_batch()
    B = pixels.val.shape[0]
    rng = np.random.RandomState(3)
    pars = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(-0.1, 0.1, B),
                rng.uniform(-0.1, 0.1, B),
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(0.3, 0.8, B),
                rng.uniform(50, 150, B),
            ]
        )
    )

    cost, Jtr, JtJ = jax.jit(
        lambda p: _exp_normal_fn(p, _lm_planes(pixels), psf_gmix, interpret=True)
    )(pars)

    def one(p, px, pg):
        r, jvp = jax.linearize(lambda q: _exp_lm_fdiff(q, (px, pg)), p)
        J = jax.vmap(jvp, in_axes=0, out_axes=1)(jnp.eye(6, dtype=p.dtype))
        return jnp.sum(r * r), J.T @ r, J.T @ J

    cost_ad, Jtr_ad, JtJ_ad = jax.vmap(one)(pars, pixels, psf_gmix)

    assert np.allclose(np.asarray(cost), np.asarray(cost_ad), rtol=1e-10)
    assert np.allclose(
        np.asarray(Jtr), np.asarray(Jtr_ad), rtol=1e-8,
        atol=1e-8 * float(jnp.max(jnp.abs(Jtr_ad))),
    )
    assert np.allclose(
        np.asarray(JtJ), np.asarray(JtJ_ad), rtol=1e-8,
        atol=1e-8 * float(jnp.max(jnp.abs(JtJ_ad))),
    )


def test_normal_eqs_bad_pars_rejected():
    """|g| >= 1 gives the huge-cost sentinel, like fdiff = 1e10"""
    pixels, psf_gmix, _ = _pixel_batch(B=2)
    pars = jnp.asarray(
        [[0.0, 0.0, 0.99, 0.99, 0.5, 100.0], [0.0, 0.0, 0.0, 0.0, 0.5, 100.0]]
    )
    gm0, gflags = gcore.fill_exp(pars)
    assert int(gflags[0]) != 0
    cost, Jtr, JtJ = jax.jit(
        lambda p: _exp_normal_fn(p, _lm_planes(pixels), psf_gmix, interpret=True)
    )(pars)
    assert float(cost[0]) >= 1e29
    assert np.all(np.asarray(Jtr[0]) == 0)
    assert np.isfinite(float(cost[1])) and float(cost[1]) < 1e29


def test_lm_pallas_path_matches_ad_path():
    """full measure stage: pallas normal-equation LM == vmapped AD LM"""
    pixels, psf_gmix, sig = _pixel_batch(B=8, noise=1e-3)
    conf = LMConf()
    res_ad = jax.jit(
        lambda: _exp_lm_measure(pixels, sig, conf, use_pallas=False)
    )()
    res_pl = jax.jit(
        lambda: _exp_lm_measure(
            pixels, sig, conf, use_pallas=True, interpret=True
        )
    )()

    assert np.all(np.asarray(res_pl["flags"]) == 0)
    assert np.all(np.asarray(res_ad["flags"]) == 0)
    for key in ("e1", "e2", "T", "flux"):
        assert np.allclose(
            np.asarray(res_pl[key]), np.asarray(res_ad[key]),
            rtol=1e-5, atol=1e-7,
        ), key
    assert np.allclose(
        np.asarray(res_pl["pars_err"]), np.asarray(res_ad["pars_err"]),
        rtol=1e-3,
    )
    # same iteration behavior to within a step or two
    assert np.all(
        np.abs(
            np.asarray(res_pl["nfev"], dtype=int)
            - np.asarray(res_ad["nfev"], dtype=int)
        )
        <= 2
    )


def test_compaction_is_exact():
    """straggler compaction changes scheduling, not results"""
    pixels, psf_gmix, sig = _pixel_batch(B=8, noise=1e-3)
    conf = LMConf()
    res_full = jax.jit(
        lambda: _exp_lm_measure(
            pixels, sig, conf, use_pallas=False, compact_capacity=None
        )
    )()
    res_cmp = jax.jit(
        lambda: _exp_lm_measure(
            pixels, sig, conf, use_pallas=False, compact_capacity=3
        )
    )()
    for key in ("pars", "flags", "nfev", "ier", "cost", "pars_err"):
        assert np.allclose(
            np.asarray(res_cmp[key]), np.asarray(res_full[key]),
            rtol=1e-12, atol=0,
        ), key
