import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngmix_tpu.batch import MetacalConfig, metacal_pipeline, shear_response
from ngmix_tpu.parallel import make_mesh, make_sharded_pipeline_fn

from test_batch_pipeline import DIMS, PSF_DIMS, SCALE, _sim_batch


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device test mesh"
)
def test_sharded_pipeline_matches_single_device():
    """sharding the batch over the mesh changes nothing numerically"""
    rng = np.random.RandomState(7)
    args = _sim_batch(rng, 16)

    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )

    # single device reference
    res_single = metacal_pipeline(*args, conf, measure="gaussmom")
    calib_single = shear_response(res_single)

    # 8-device mesh
    mesh = make_mesh(jax.devices()[:8])
    fn, batch_sharding = make_sharded_pipeline_fn(
        conf, mesh, measure="gaussmom"
    )
    sharded_args = tuple(jax.device_put(a, batch_sharding) for a in args)
    res_sharded, calib_sharded = fn(*sharded_args)

    assert np.allclose(
        np.asarray(calib_sharded["R"]), np.asarray(calib_single["R"]),
        rtol=1e-10,
    )
    assert np.allclose(
        np.asarray(res_sharded["noshear"]["e1"]),
        np.asarray(res_single["noshear"]["e1"]),
        rtol=1e-10,
    )
    # results really are sharded over the mesh
    shard_devs = {
        s.device for s in res_sharded["noshear"]["e1"].addressable_shards
    }
    assert len(shard_devs) == 8


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device test mesh"
)
@pytest.mark.parametrize("measure", ["admom", "exp-lm"])
def test_sharded_pipeline_iterative_measures(measure):
    """the while_loop solvers (admom, LM with straggler compaction) run
    shard-local under shard_map and match the single-device pipeline"""
    rng = np.random.RandomState(11)
    args = _sim_batch(rng, 16)

    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    res_single = metacal_pipeline(*args, conf, measure=measure)
    calib_single = shear_response(res_single)

    mesh = make_mesh(jax.devices()[:8])
    fn, batch_sharding = make_sharded_pipeline_fn(conf, mesh, measure=measure)
    sharded_args = tuple(jax.device_put(a, batch_sharding) for a in args)
    res_sharded, calib_sharded = fn(*sharded_args)

    ok = np.asarray(res_single["noshear"]["flags"]) == 0
    assert np.allclose(
        np.asarray(res_sharded["noshear"]["e1"])[ok],
        np.asarray(res_single["noshear"]["e1"])[ok],
        rtol=1e-6, atol=1e-8,
    )
    assert np.allclose(
        np.asarray(calib_sharded["R"]), np.asarray(calib_single["R"]),
        rtol=1e-5,
    )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device test mesh"
)
def test_sharded_pipeline_kwargs_passthrough():
    """lm_bounds (and any pipeline kwarg) flow through
    make_sharded_pipeline_fn and match the single-device run.

    The comparison is tolerance-based, not bitwise: shard_map compiles
    a different program than the flat jit, so f32 rounding differs and
    LM accept/reject trajectories can diverge (different nfev) — both
    runs still land on the same optimum within the stopping tolerance
    (measured: pars agree to ~1e-7 absolute, centroids included).
    """
    rng = np.random.RandomState(13)
    args = _sim_batch(rng, 16)

    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    # wide production-style box (exercises the logistic transform)
    lo = np.array([-2, -2, -0.99, -0.99, 0.01, 1e-3])
    hi = np.array([2, 2, 0.99, 0.99, 10.0, 1e9])
    res_single = metacal_pipeline(
        *args, conf, measure="exp-lm", lm_bounds=(lo, hi)
    )

    mesh = make_mesh(jax.devices()[:8])
    fn, batch_sharding = make_sharded_pipeline_fn(
        conf, mesh, measure="exp-lm", lm_bounds=(lo, hi)
    )
    sharded_args = tuple(jax.device_put(a, batch_sharding) for a in args)
    res_sharded, calib_sharded = fn(*sharded_args)

    ok = np.asarray(res_single["noshear"]["flags"]) == 0
    ok &= np.asarray(res_sharded["noshear"]["flags"]) == 0
    assert ok.all()
    assert np.allclose(
        np.asarray(res_sharded["noshear"]["pars"])[ok],
        np.asarray(res_single["noshear"]["pars"])[ok],
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device test mesh"
)
def test_sharded_mb_pipeline_matches_single_device():
    """the multi-band multi-epoch pipeline shards over objects with a
    replicated band vector and matches the single-device run"""
    from ngmix_tpu.batch import metacal_pipeline_mb
    from ngmix_tpu.parallel import make_sharded_mb_pipeline_fn

    rng = np.random.RandomState(23)
    B, E, nband = 16, 3, 2
    flat = _sim_batch(rng, B)
    args = tuple(jnp.repeat(a[:, None], E, axis=1) for a in flat)
    band = jnp.asarray([0, 0, 1])

    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    res_single = metacal_pipeline_mb(*args, band, nband, conf)
    calib_single = shear_response(res_single)

    mesh = make_mesh(jax.devices()[:8])
    fn, sharding = make_sharded_mb_pipeline_fn(conf, mesh, band, nband)
    sharded_args = tuple(jax.device_put(a, sharding) for a in args)
    res_sharded, calib_sharded = fn(*sharded_args)

    ok = np.asarray(res_single["noshear"]["flags"]) == 0
    assert ok.any()
    assert np.allclose(
        np.asarray(res_sharded["noshear"]["e1"])[ok],
        np.asarray(res_single["noshear"]["e1"])[ok],
        rtol=1e-6, atol=1e-8,
    )
    assert np.allclose(
        np.asarray(calib_sharded["R"]), np.asarray(calib_single["R"]),
        rtol=1e-5,
    )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device test mesh"
)
def test_sharded_mb_per_object_band_maps():
    """a [B, E] epoch->band map shards with the batch: shards whose
    local slices carry DIFFERENT epoch->band assignments still match
    the single-device run, and each object's per-band fluxes follow
    its own map (swapped assignments swap the flux columns)"""
    from ngmix_tpu.batch import metacal_pipeline_mb
    from ngmix_tpu.parallel import make_sharded_mb_pipeline_fn

    rng = np.random.RandomState(29)
    B, E, nband = 16, 2, 2
    flat = _sim_batch(rng, B)
    args = tuple(jnp.repeat(a[:, None], E, axis=1) for a in flat)
    # scale epoch images per band flux so the two flux columns differ;
    # the first half of the batch (shards 0-3) sees [0, 1], the second
    # half (shards 4-7) the swapped [1, 0]
    band_be = np.tile([0, 1], (B, 1)).astype(np.int32)
    band_be[B // 2:] = [1, 0]
    sed = np.where(band_be == 0, 1.0, 0.6)  # band-0 flux / band-1 flux
    args = (args[0] * sed[:, :, None, None],) + args[1:]

    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    res_single = metacal_pipeline_mb(
        *args, jnp.asarray(band_be), nband, conf, measure="exp-lm"
    )

    mesh = make_mesh(jax.devices()[:8])
    fn, sharding = make_sharded_mb_pipeline_fn(
        conf, mesh, band_be, nband, measure="exp-lm"
    )
    sharded_args = tuple(jax.device_put(a, sharding) for a in args)
    res_sharded, calib = fn(*sharded_args)

    pars_s = np.asarray(res_sharded["noshear"]["pars"])
    flags = np.asarray(res_sharded["noshear"]["flags"])
    assert (flags == 0).all()
    np.testing.assert_allclose(
        pars_s, np.asarray(res_single["noshear"]["pars"]),
        rtol=1e-8, atol=1e-12,
    )
    # flux columns are per BAND, not per epoch: every object recovers
    # the same (band0, band1) fluxes regardless of its epoch ordering
    f0, f1 = pars_s[:, 5], pars_s[:, 6]
    assert np.allclose(f1 / f0, 0.6, rtol=0.05)
    assert np.allclose(f0[: B // 2], f0[B // 2:], rtol=0.05)
