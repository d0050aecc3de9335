import numpy as np
import pytest

from ngmix_tpu import (
    DiagonalJacobian,
    GMixModel,
    Observation,
    ObsList,
    MultiBandObsList,
    get_mb_obs,
)


def _obs(rng, dims=(13, 13)):
    im = rng.normal(size=dims)
    wt = np.ones(dims)
    return Observation(
        im, weight=wt, jacobian=DiagonalJacobian(row=6, col=6, scale=0.2)
    )


def test_readonly_views():
    rng = np.random.RandomState(1)
    obs = _obs(rng)
    with pytest.raises(ValueError):
        obs.image[0, 0] = 1.0
    with pytest.raises(ValueError):
        obs.weight[0, 0] = 1.0


def test_writeable_context_updates_pixels():
    rng = np.random.RandomState(2)
    obs = _obs(rng)
    val0 = float(np.asarray(obs.pixels.val[0]))
    with obs.writeable():
        obs.image[0, 0] = 99.0
    assert float(np.asarray(obs.pixels.val[0])) == 99.0
    assert float(np.asarray(obs.pixels.val[0])) != val0


def test_zero_weight_masks_pixels():
    rng = np.random.RandomState(3)
    dims = (11, 11)
    im = rng.normal(size=dims)
    wt = np.ones(dims)
    wt[3:5, 3:5] = 0.0
    obs = Observation(
        im, weight=wt, jacobian=DiagonalJacobian(row=5, col=5, scale=0.2)
    )
    mask = np.asarray(obs.pixels.ierr).reshape(dims) > 0
    assert not mask[3, 3]
    assert mask[0, 0]
    assert mask.sum() == 121 - 4


def test_copy_and_eq():
    rng = np.random.RandomState(4)
    obs = _obs(rng)
    obs.set_gmix(GMixModel([0, 0, 0, 0, 1.0, 1.0], "gauss"))
    obs.set_bmask(np.zeros(obs.image.shape, dtype="i4"))
    obs2 = obs.copy()
    assert obs2 == obs
    with obs2.writeable():
        obs2.image[0, 0] += 1
    assert not (obs2 == obs)


def test_shape_change_asserts():
    rng = np.random.RandomState(5)
    obs = _obs(rng)
    with pytest.raises(AssertionError):
        obs.set_image(np.zeros((5, 5)))
    with pytest.raises(AssertionError):
        obs.set_weight(np.zeros((5, 5)))


def test_meta_contract():
    rng = np.random.RandomState(6)
    obs = _obs(rng)
    with pytest.raises(TypeError):
        obs.set_meta([1, 2])
    obs.update_meta_data({"a": 1})
    assert obs.meta["a"] == 1


def test_s2n_sums_containers():
    rng = np.random.RandomState(7)
    obs1 = _obs(rng)
    obs2 = _obs(rng)
    ol = ObsList()
    ol.append(obs1)
    ol.append(obs2)
    mb = MultiBandObsList()
    mb.append(ol)
    I1, V1, N1 = obs1.get_s2n_sums()
    Il, Vl, Nl = ol.get_s2n_sums()
    Im, Vm, Nm = mb.get_s2n_sums()
    assert Nl == 2 * N1 == Nm
    assert np.allclose(Vl, Vm)

    with pytest.raises(AssertionError):
        ol.append("not an obs")
    with pytest.raises(AssertionError):
        mb.append(obs1)


def test_get_mb_obs_promotion():
    rng = np.random.RandomState(8)
    obs = _obs(rng)
    mb = get_mb_obs(obs)
    assert isinstance(mb, MultiBandObsList)
    assert mb[0][0] is obs
    with pytest.raises(ValueError):
        get_mb_obs(42)


def test_store_pixels_toggle():
    rng = np.random.RandomState(9)
    obs = _obs(rng)
    obs.store_pixels = False
    assert obs.pixels is None
    obs.store_pixels = True
    assert obs.pixels is not None
