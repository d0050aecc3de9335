"""Ragged catalogs: size bucketing + masked epochs (SURVEY 2.3 hard
part #3; ref compaction: ngmix/observation.py:814-830)."""
import jax.numpy as jnp
import numpy as np

from ngmix_tpu import DiagonalJacobian, GMixModel
from ngmix_tpu.batch import (
    MetacalConfig,
    metacal_pipeline,
    metacal_pipeline_mb,
)
from ngmix_tpu.ragged import metacal_pipeline_ragged, pack_ragged

SCALE = 0.263
PSF_DIMS = (25, 25)


def _one_object(rng, dims, nepoch=1, flux=100.0, noise=1e-4, band=None):
    psf = GMixModel([0.0, 0.0, 0.02, -0.01, 0.27, 1.0], "turb")
    pjac = DiagonalJacobian(row=12, col=12, scale=SCALE)
    pim = psf.make_image(PSF_DIMS, jacobian=pjac, fast_exp=False)
    gal = GMixModel(
        [0.0, 0.0, 0.0, 0.0, 0.5, flux], "exp"
    ).get_sheared(0.02, 0.0)
    conv = gal.convolve(psf)
    cen0 = (dims[0] - 1) / 2.0
    images, weights, noises, cens = [], [], [], []
    for _ in range(nepoch):
        off = rng.uniform(-0.5, 0.5, 2)
        jac = DiagonalJacobian(
            row=cen0 + off[0], col=cen0 + off[1], scale=SCALE
        )
        im = conv.make_image(dims, jacobian=jac, fast_exp=False)
        im = im + rng.normal(size=dims) * noise
        images.append(im)
        weights.append(np.full(dims, 1 / noise**2))
        noises.append(rng.normal(size=dims) * noise)
        cens.append([cen0 + off[0], cen0 + off[1]])
    obj = dict(
        image=images, weight=weights, cen=np.asarray(cens),
        psf_image=[pim] * nepoch,
        psf_cen=np.asarray([[12.0, 12.0]] * nepoch),
        noise=noises,
    )
    if band is not None:
        obj["band"] = band
    return obj


def test_pack_ragged_buckets_and_masks():
    rng = np.random.RandomState(10)
    catalog = [
        _one_object(rng, (33, 33), nepoch=1),
        _one_object(rng, (49, 49), nepoch=3),
        _one_object(rng, (33, 33), nepoch=2),
        _one_object(rng, (49, 49), nepoch=1),
    ]
    buckets = pack_ragged(catalog)
    assert len(buckets) == 2
    b33, b49 = buckets
    assert b33["dims"] == (33, 33) and b49["dims"] == (49, 49)
    assert list(b33["indices"]) == [0, 2]
    assert list(b49["indices"]) == [1, 3]
    assert b33["nepoch"] == 2 and b49["nepoch"] == 3
    # pad epochs: zero weight, mask off, psf copied from a real epoch
    assert not b33["epoch_mask"][0, 1]
    assert np.all(b33["weights"][0, 1] == 0)
    assert np.allclose(b33["psf_images"][0, 1], b33["psf_images"][0, 0])
    # all-real rows fully masked on
    assert np.all(b49["epoch_mask"][0])

    # coarse bucket_dims pad smaller stamps with zero weight
    coarse = pack_ragged(catalog, bucket_dims=[(49, 49)])
    assert len(coarse) == 1
    c = coarse[0]
    assert list(c["indices"]) == [0, 1, 2, 3]
    assert np.all(c["weights"][0, 0, 33:, :] == 0)
    assert np.all(c["weights"][0, 0, :, 33:] == 0)


def test_ragged_single_epoch_matches_direct():
    """a mixed 33/49 catalog reproduces the per-size rectangular runs
    exactly, reassembled in catalog order"""
    rng = np.random.RandomState(11)
    fluxes = [80.0, 120.0, 100.0, 90.0, 110.0]
    dims_list = [(33, 33), (49, 49), (33, 33), (49, 49), (33, 33)]
    catalog = [
        _one_object(rng, d, nepoch=1, flux=f)
        for d, f in zip(dims_list, fluxes)
    ]
    conf = MetacalConfig(
        dims=(0, 0), psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    res = metacal_pipeline_ragged(catalog, conf, measure="exp-lm")

    for dims in ((33, 33), (49, 49)):
        rows = [i for i, d in enumerate(dims_list) if d == dims]
        conf_d = conf._replace(dims=dims)
        args = tuple(
            jnp.asarray(np.stack([np.asarray(catalog[i][k][0]
                                  if isinstance(catalog[i][k], list)
                                  else catalog[i][k])
                                  for i in rows]))
            for k in ("image", "weight")
        )
        cens = jnp.asarray(np.stack([catalog[i]["cen"][0] for i in rows]))
        pims = jnp.asarray(
            np.stack([catalog[i]["psf_image"][0] for i in rows])
        )
        pcens = jnp.asarray(
            np.stack([catalog[i]["psf_cen"][0] for i in rows])
        )
        nse = jnp.asarray(
            np.stack([np.asarray(catalog[i]["noise"][0]) for i in rows])
        )
        direct = metacal_pipeline(
            args[0], args[1], cens, pims, pcens, nse, conf_d,
            measure="exp-lm",
        )
        for t in ("noshear", "1p", "2m"):
            assert np.array_equal(
                res[t]["pars"][rows], np.asarray(direct[t]["pars"])
            ), (dims, t)
            assert np.array_equal(
                res[t]["flags"][rows], np.asarray(direct[t]["flags"])
            )

    # recovered fluxes identify the objects -> catalog order held
    assert np.all(np.asarray(res["noshear"]["flags"]) == 0)
    got = res["noshear"]["flux"]
    order = np.argsort(got)
    assert list(order) == list(np.argsort(fluxes))


def test_ragged_epoch_padding_is_exact():
    """pad epochs (zero weight, zero image) change nothing: a 2-epoch
    object padded to 3 epochs fits identically to its rectangular run"""
    rng = np.random.RandomState(12)
    obj2 = _one_object(rng, (33, 33), nepoch=2)
    obj3 = _one_object(rng, (33, 33), nepoch=3)
    conf = MetacalConfig(
        dims=(33, 33), psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    res = metacal_pipeline_ragged([obj2, obj3], conf, measure="exp-lm")

    def stack(o, key, nep):
        return jnp.asarray(np.stack([np.asarray(x) for x in o[key]]))[None]

    direct2 = metacal_pipeline_mb(
        stack(obj2, "image", 2), stack(obj2, "weight", 2),
        jnp.asarray(obj2["cen"])[None], stack(obj2, "psf_image", 2),
        jnp.asarray(obj2["psf_cen"])[None], stack(obj2, "noise", 2),
        jnp.zeros(2, jnp.int32), 1, conf,
    )
    assert int(res["noshear"]["flags"][0]) == 0
    assert np.allclose(
        res["noshear"]["pars"][0],
        np.asarray(direct2["noshear"]["pars"][0]),
        rtol=0, atol=1e-11,
    )
    assert res["noshear"]["nfev"][0] == int(direct2["noshear"]["nfev"][0])
    # psf_sigma reports only the real epochs
    assert res["psf_sigma"][0].shape == (2,)
    assert res["psf_sigma"][1].shape == (3,)


def test_ragged_multiband():
    """per-object band assignments flow through the joint fit"""
    rng = np.random.RandomState(13)
    catalog = [
        _one_object(rng, (33, 33), nepoch=2, band=[0, 1]),
        _one_object(rng, (33, 33), nepoch=3, band=[0, 0, 1]),
        _one_object(rng, (33, 33), nepoch=1, band=[1]),
    ]
    conf = MetacalConfig(
        dims=(33, 33), psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    res = metacal_pipeline_ragged(catalog, conf, measure="exp-lm", nband=2)
    flags = np.asarray(res["noshear"]["flags"])
    pars = np.asarray(res["noshear"]["pars"])
    assert pars.shape == (3, 7)  # 5 + nband
    # objects covering both bands fit cleanly
    assert np.all(flags[:2] == 0)
    assert np.all(np.isfinite(pars[:2]))
    # fluxes recovered near truth (100) in constrained bands
    assert abs(pars[0, 5] - 100.0) < 5.0
    assert abs(pars[0, 6] - 100.0) < 5.0
    # the band-1-only object has an unconstrained band-0 flux: the
    # singular normal matrix must FLAG, not silently pass
    assert flags[2] != 0


def test_ragged_estimator_consistency():
    """ONE estimator runs over a catalog mixing epoch counts: admom
    everywhere (the multi-epoch bucket pools moment sums), never a
    silent switch to an LM fit (round-2 VERDICT item 3)"""
    rng = np.random.RandomState(18)
    cat = [
        _one_object(rng, (33, 33), nepoch=1),
        _one_object(rng, (33, 33), nepoch=2),
        _one_object(rng, (33, 33), nepoch=1),
    ]
    conf = MetacalConfig(
        dims=(33, 33), psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    res = metacal_pipeline_ragged(cat, conf, measure="admom")
    # admom-specific columns present for EVERY object, including the
    # multi-epoch one
    assert np.all(np.asarray(res["noshear"]["flags"]) == 0)
    assert res["noshear"]["rho4"].shape == (3,)
    assert np.allclose(res["noshear"]["rho4"], 2.0, rtol=0.3)
    assert res["dropped_keys"] == []

    # pre-psf measures refuse multi-epoch buckets rather than
    # switching estimators
    import pytest

    with pytest.raises(ValueError, match="per-epoch psf"):
        metacal_pipeline_ragged(cat, conf, measure="pgauss")


def test_ragged_mixed_flat_and_multiepoch_buckets():
    """a catalog mixing 1-epoch objects (flat pipeline) with
    multi-epoch objects (joint multi-epoch pipeline) merges on the
    common table keys instead of raising (regression: the flat
    pipeline reports keys like 'flux' the mb pipeline's raw output
    lacked, and the merge assumed identical key sets)"""
    rng = np.random.RandomState(17)
    cat = (
        [_one_object(rng, (33, 33), nepoch=1) for _ in range(3)]
        + [_one_object(rng, (49, 49), nepoch=2) for _ in range(2)]
    )
    conf = MetacalConfig(
        dims=(33, 33), psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    res = metacal_pipeline_ragged(cat, conf, measure="exp-lm")
    for t in ("noshear", "1p", "1m", "2p", "2m"):
        assert res[t]["pars"].shape[0] == 5
        assert res[t]["flux"].shape == (5,)
        assert np.all(res[t]["flags"] == 0)
        # both bucket kinds recover the common flux
        assert np.allclose(res[t]["flux"], 100.0, rtol=0.05)
    # psf_sigma stays a ragged per-object list
    assert len(res["psf_sigma"]) == 5
    assert res["psf_sigma"][4].shape == (2,)
