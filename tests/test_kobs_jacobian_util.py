"""Coverage for the k-space observation containers, jacobians, KDE,
random helpers, util, and flags (the analogs of the reference's
test_kobs / test_make_kobs / test_jacobian / test_kde /
test_priors_random / test_util / test_flags)."""
import numpy as np
import pytest

import ngmix_tpu as ngmix
from ngmix_tpu import DiagonalJacobian, Jacobian, Observation, UnitJacobian
from ngmix_tpu.flags import NAME_MAP, get_flags_str
from ngmix_tpu.kobs import (
    KMultiBandObsList,
    KObservation,
    KObsList,
    get_kmb_obs,
    make_kobs,
)
from ngmix_tpu.priors.kde import KDE
from ngmix_tpu.priors.random import make_rng, srandu
from ngmix_tpu.util import format_pars, get_ratio_error, print_pars

from _sims import get_model_obs


# ----------------------------------------------------------------------
# jacobians

def test_jacobian_basic():
    jac = Jacobian(
        row=10.0, col=11.0, dvdrow=0.25, dvdcol=0.01, dudrow=-0.02,
        dudcol=0.27,
    )
    det = 0.25 * 0.27 - 0.01 * (-0.02)
    assert np.allclose(jac.area, det)
    assert np.allclose(jac.scale, np.sqrt(det))
    # roundtrip rowcol <-> vu
    v, u = jac.get_vu(12.0, 14.0)
    r, c = jac.get_rowcol(v, u)
    assert np.allclose([r, c], [12.0, 14.0])
    cen = jac.get_cen()
    assert np.allclose(cen, [10.0, 11.0])

    j2 = jac.copy()
    j2.set_cen(row=0.0, col=0.0)
    assert np.allclose(jac.get_cen(), [10.0, 11.0])
    assert np.allclose(j2.get_cen(), [0.0, 0.0])


def test_diagonal_unit_jacobian():
    dj = DiagonalJacobian(row=5, col=6, scale=0.2)
    assert np.allclose(dj.area, 0.04)
    v, u = dj.get_vu(6.0, 7.0)
    assert np.allclose([v, u], [0.2, 0.2])
    uj = UnitJacobian(row=1, col=2)
    assert np.allclose(uj.scale, 1.0)
    assert np.allclose(uj.area, 1.0)


def test_jacobian_device_struct():
    dj = DiagonalJacobian(row=5, col=6, scale=0.2)
    dev = dj.to_device()
    assert float(dev.dvdrow) == 0.2
    assert float(dev.dudcol) == 0.2


# ----------------------------------------------------------------------
# k-space observations

def _kobs_pair(dim=33, scale=0.1):
    rng = np.random.RandomState(3)
    kim = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    pim = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    psf = KObservation(pim, scale=scale)
    return KObservation(kim, psf=psf, scale=scale), psf


def test_kobservation_basic():
    kobs, psf = _kobs_pair()
    assert kobs.has_psf()
    assert kobs.psf is psf
    # default weight is ones
    assert np.all(kobs.weight == 1.0)
    # jacobian centered on the k = 0 sample (odd dim -> (d-1)/2)
    assert np.allclose(kobs.jacobian.get_cen(), [16.0, 16.0])
    assert np.allclose(kobs.jacobian.scale, 0.1)


def test_kobservation_even_dim_center():
    dim = 32
    kim = np.zeros((dim, dim), dtype=complex)
    kobs = KObservation(kim, scale=0.1)
    assert np.allclose(kobs.jacobian.get_cen(), [16.0, 16.0])


def test_kobservation_errors():
    with pytest.raises(ValueError):
        KObservation(np.zeros((8, 8)))  # not complex
    kim = np.zeros((8, 8), dtype=complex)
    with pytest.raises(ValueError):
        KObservation(kim, weight=np.ones((4, 4)))
    psf_small = KObservation(np.zeros((4, 4), dtype=complex), scale=1.0)
    with pytest.raises(ValueError):
        KObservation(kim, psf=psf_small)


def test_make_kobs_structure():
    rng = np.random.RandomState(7)
    data = get_model_obs(rng=rng, model="gauss", noise=0.01)
    obs = data["obs"]
    mb_kobs = make_kobs(obs, pad_factor=2)
    assert isinstance(mb_kobs, KMultiBandObsList)
    assert len(mb_kobs) == 1 and len(mb_kobs[0]) == 1
    kobs = mb_kobs[0][0]
    # odd common dimension
    assert kobs.kimage.shape[0] % 2 == 1
    assert kobs.has_psf()
    assert kobs.psf.kimage.shape == kobs.kimage.shape
    # dk = 2 pi / (dim * scale)
    dim = kobs.kimage.shape[0]
    dk = 2 * np.pi / (dim * obs.jacobian.scale)
    assert np.allclose(kobs.scale, dk)
    # dc k-value equals the image sum (centered transform convention)
    cen = int((dim - 1) / 2)
    assert np.allclose(
        kobs.kimage[cen, cen].real, obs.image.sum(), rtol=1e-6
    )
    # psf kimage normalized: dc value 1
    assert np.allclose(kobs.psf.kimage[cen, cen].real, 1.0, rtol=1e-6)


def test_make_iilist_matches_make_kobs():
    """the make_iilist shim reports the same dim/dk as make_kobs and
    its ExactImageTransform entries reproduce the kobs kimages"""
    from ngmix_tpu import make_iilist

    rng = np.random.RandomState(8)
    data = get_model_obs(rng=rng, model="gauss", noise=0.01)
    obs = data["obs"]
    mb_iilist, dim, dk = make_iilist(obs, pad_factor=2)
    mb_kobs = make_kobs(obs, pad_factor=2)
    kobs = mb_kobs[0][0]
    assert dim == kobs.kimage.shape[0]
    assert np.allclose(dk, kobs.scale)

    entry = mb_iilist[0][0]
    assert entry["scale"] == obs.jacobian.scale
    assert np.array_equal(entry["realspace_gsimage"], np.asarray(obs.image))
    assert np.allclose(entry["ii"].kimage(dim), kobs.kimage)
    assert np.allclose(entry["psf_ii"].kimage(dim), kobs.psf.kimage)
    assert entry["ii"].nyquist_scale == np.pi / obs.jacobian.scale


def test_get_kmb_obs_promotion():
    kobs, _ = _kobs_pair()
    mb = get_kmb_obs(kobs)
    assert isinstance(mb, KMultiBandObsList)
    assert mb[0][0] is kobs
    kl = KObsList()
    kl.append(kobs)
    mb2 = get_kmb_obs(kl)
    assert mb2[0] is kl
    with pytest.raises(ValueError):
        get_kmb_obs(Observation(np.zeros((4, 4))))


# ----------------------------------------------------------------------
# kde, random, util, flags

def test_kde_1d_and_2d():
    rng = np.random.RandomState(9)
    data1 = rng.normal(size=2000)
    kde1 = KDE(data1, "scott", rng)
    s = kde1.sample()
    assert np.isscalar(s) or s.shape == ()
    s = kde1.sample(500)
    assert s.shape == (500,)
    assert abs(np.mean(s)) < 0.2 and abs(np.std(s) - 1.0) < 0.2

    data2 = rng.normal(size=(2000, 2)) * [1.0, 2.0]
    kde2 = KDE(data2, "scott", rng)
    s2 = kde2.sample(500)
    assert s2.shape == (500, 2)
    assert abs(np.std(s2[:, 1]) - 2.0) < 0.5


def test_srandu_make_rng():
    rng = make_rng(np.random.RandomState(5))
    vals = srandu(10000, rng=rng)
    assert vals.shape == (10000,)
    assert np.all(np.abs(vals) <= 1.0)
    assert abs(np.mean(vals)) < 0.05
    one = srandu(rng=make_rng(None))
    assert np.isscalar(one) or one.shape == ()


def test_util_ratio_error_and_print():
    # flux ratio error propagation against a monte carlo
    rng = np.random.RandomState(11)
    a, b = 10.0, 5.0
    sa, sb = 0.2, 0.1
    err = get_ratio_error(a, b, sa**2, sb**2, 0.0)
    draws = (a + rng.normal(size=200000) * sa) / (
        b + rng.normal(size=200000) * sb
    )
    assert np.allclose(err, np.std(draws), rtol=0.05)

    s = format_pars(np.array([1.0, 2.0]))
    assert "1" in s and "2" in s
    import io

    buf = io.StringIO()
    print_pars(np.array([1.0, 2.0]), front="pars:", stream=buf)
    assert "pars:" in buf.getvalue()


def test_flags_names():
    for bit, name in NAME_MAP.items():
        assert get_flags_str(bit) == name
    combo = get_flags_str(ngmix.flags.LOW_DET | ngmix.flags.MAXITER)
    assert ngmix.flags.NAME_MAP[ngmix.flags.LOW_DET] in combo
    assert ngmix.flags.NAME_MAP[ngmix.flags.MAXITER] in combo
