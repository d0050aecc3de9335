"""Observation containers: image + weight + jacobian (+psf, masks, noise).

API parity with ngmix/observation.py:66-1143 (Observation, ObsList,
MultiBandObsList, get_mb_obs). Host-side numpy storage with read-only
views and the ``with obs.writeable():`` mutation contract; the cached
``pixels`` attribute is the *device* Pixels struct (static-shape,
masked) consumed by all fitters. Batch packing across many observations
lives in ngmix_tpu.batch.
"""
import copy as _copy

import numpy as np

from .gmix.gmix import GMix
from .jacobian import Jacobian, UnitJacobian
from .pixels import make_pixels

__all__ = [
    "Observation",
    "ObsList",
    "MultiBandObsList",
    "get_mb_obs",
]


class MetadataMixin(object):
    @property
    def meta(self):
        return self._meta

    @meta.setter
    def meta(self, meta):
        self.set_meta(meta)

    def set_meta(self, meta):
        if meta is None:
            meta = {}
        if not isinstance(meta, dict):
            raise TypeError(
                "meta data must be in dictionary form, got %s" % type(meta)
            )
        self._meta = meta

    def update_meta_data(self, meta):
        if not isinstance(meta, dict):
            raise TypeError(
                "meta data must be in dictionary form, got %s" % type(meta)
            )
        self.meta.update(meta)


class Observation(MetadataMixin):
    """An image observation with weight map, WCS jacobian and optional
    psf/bmask/ormask/noise/mfrac/gmix attachments.

    Mutation requires the writeable() context, which re-derives the
    device pixels on exit (ref semantics: ngmix/observation.py:832-860).
    """

    def __init__(
        self,
        image,
        weight=None,
        bmask=None,
        ormask=None,
        noise=None,
        jacobian=None,
        gmix=None,
        psf=None,
        meta=None,
        mfrac=None,
        store_pixels=True,
        ignore_zero_weight=True,
    ):
        self._writeable = False
        self._ignore_zero_weight = ignore_zero_weight
        self._store_pixels = store_pixels

        self.set_image(image, update_pixels=False)
        self.set_weight(weight, update_pixels=False)
        self.set_jacobian(jacobian, update_pixels=False)
        self.update_pixels()

        self.set_meta(meta)
        self.set_bmask(bmask)
        self.set_ormask(ormask)
        self.set_noise(noise)
        self.set_gmix(gmix)
        self.set_psf(psf)
        self.set_mfrac(mfrac)

    # --- views -----------------------------------------------------------
    def _get_view(self, data):
        view = data.view()
        view.flags["WRITEABLE"] = self._writeable
        return view

    @property
    def image(self):
        return self._get_view(self._image)

    @image.setter
    def image(self, image):
        self.set_image(image)

    @property
    def weight(self):
        return self._get_view(self._weight)

    @weight.setter
    def weight(self, weight):
        self.set_weight(weight)

    @property
    def pixels(self):
        """device Pixels struct (always rebuilt on mutation, never
        writeable in place)"""
        return self._pixels

    @property
    def mfrac(self):
        return self._get_view(self._mfrac)

    @mfrac.setter
    def mfrac(self, mfrac):
        self.set_mfrac(mfrac)

    @property
    def bmask(self):
        return self._get_view(self._bmask)

    @bmask.setter
    def bmask(self, bmask):
        self.set_bmask(bmask)

    @property
    def ormask(self):
        return self._get_view(self._ormask)

    @ormask.setter
    def ormask(self, ormask):
        self.set_ormask(ormask)

    @property
    def noise(self):
        return self._get_view(self._noise)

    @noise.setter
    def noise(self, noise):
        self.set_noise(noise)

    @property
    def jacobian(self):
        return self.get_jacobian()

    @jacobian.setter
    def jacobian(self, jacobian):
        self.set_jacobian(jacobian)

    @property
    def gmix(self):
        return self.get_gmix()

    @gmix.setter
    def gmix(self, gmix):
        self.set_gmix(gmix)

    @property
    def psf(self):
        return self._psf

    @psf.setter
    def psf(self, psf):
        self.set_psf(psf)

    # --- setters -----------------------------------------------------------
    def set_image(self, image, update_pixels=True):
        image_old = getattr(self, "_image", None)
        image = np.asarray(image, dtype="f8")
        assert len(image.shape) == 2, "image must be 2d"
        if image_old is not None:
            assert image.shape == image_old.shape, (
                "old and new image must have same shape, to maintain "
                "consistency, got %s vs %s" % (image.shape, image_old.shape)
            )
        self._image = image
        if update_pixels:
            self.update_pixels()

    def set_weight(self, weight, update_pixels=True):
        image = self.image
        if weight is not None:
            weight = np.asarray(weight, dtype="f8")
            assert len(weight.shape) == 2, "weight must be 2d"
            assert weight.shape == image.shape, (
                "image and weight must be same shape"
            )
        else:
            weight = np.zeros(image.shape) + 1.0
        self._weight = weight
        if update_pixels:
            self.update_pixels()

    def set_jacobian(self, jacobian, update_pixels=True):
        if jacobian is None:
            cen = (np.array(self.image.shape) - 1.0) / 2.0
            jac = UnitJacobian(row=cen[0], col=cen[1])
        else:
            assert isinstance(jacobian, Jacobian), (
                "jacobian must be of type Jacobian, got %s" % type(jacobian)
            )
            jac = jacobian.copy()
        self._jacobian = jac
        if update_pixels:
            self.update_pixels()

    def get_jacobian(self):
        return self._jacobian.copy()

    def set_mfrac(self, mfrac):
        if mfrac is None:
            if self.has_mfrac():
                del self._mfrac
        else:
            mfrac = np.asarray(mfrac)
            assert len(mfrac.shape) == 2, "mfrac must be 2d"
            assert mfrac.shape == self.image.shape, (
                "image and mfrac must be same shape"
            )
            self._mfrac = mfrac

    def has_mfrac(self):
        return hasattr(self, "_mfrac")

    def set_bmask(self, bmask):
        if bmask is None:
            if self.has_bmask():
                del self._bmask
        else:
            bmask = np.asarray(bmask)
            assert len(bmask.shape) == 2, "bmask must be 2d"
            assert bmask.shape == self.image.shape, (
                "image and bmask must be same shape"
            )
            self._bmask = bmask

    def has_bmask(self):
        return hasattr(self, "_bmask")

    def set_ormask(self, ormask):
        if ormask is None:
            if self.has_ormask():
                del self._ormask
        else:
            ormask = np.asarray(ormask)
            assert len(ormask.shape) == 2, "ormask must be 2d"
            assert ormask.shape == self.image.shape, (
                "image and ormask must be same shape"
            )
            self._ormask = ormask

    def has_ormask(self):
        return hasattr(self, "_ormask")

    def set_noise(self, noise):
        if noise is None:
            if self.has_noise():
                del self._noise
        else:
            noise = np.asarray(noise)
            assert len(noise.shape) == 2, "noise must be 2d"
            assert noise.shape == self.image.shape, (
                "image and noise must be same shape"
            )
            self._noise = noise

    def has_noise(self):
        return hasattr(self, "_noise")

    def set_psf(self, psf):
        if self.has_psf():
            del self._psf
        if psf is not None:
            assert isinstance(psf, Observation), (
                "psf must be of Observation, got %s" % type(psf)
            )
            self._psf = psf

    def get_psf(self):
        if not self.has_psf():
            raise RuntimeError("this obs has no psf set")
        return self._psf

    def has_psf(self):
        return hasattr(self, "_psf")

    def get_psf_gmix(self):
        if not self.has_psf_gmix():
            raise RuntimeError("this obs has not psf set with a gmix")
        return self.psf.get_gmix()

    def has_psf_gmix(self):
        if self.has_psf():
            return self.psf.has_gmix()
        return False

    def set_gmix(self, gmix):
        if self.has_gmix():
            del self._gmix
        if gmix is not None:
            assert isinstance(gmix, GMix), (
                "gmix must be of type GMix, got %s" % type(gmix)
            )
            self._gmix = gmix.copy()

    def get_gmix(self):
        if not self.has_gmix():
            raise RuntimeError("this obs has not gmix set")
        return self._gmix.copy()

    def has_gmix(self):
        return hasattr(self, "_gmix")

    # --- statistics ----------------------------------------------------------
    def get_s2n(self):
        """simple s/n estimator sum(I)/sqrt(sum(1/w))"""
        Isum, Vsum, Npix = self.get_s2n_sums()
        if Vsum > 0.0:
            return Isum / np.sqrt(Vsum)
        return -9999.0

    def get_s2n_sums(self):
        image = self.image
        weight = self.weight
        w = np.where(weight > 0)
        if w[0].size > 0:
            Isum = image[w].sum()
            Vsum = (1.0 / weight[w]).sum()
            Npix = w[0].size
        else:
            Isum, Vsum, Npix = 0.0, 0.0, 0
        return Isum, Vsum, Npix

    # --- copying / equality ----------------------------------------------------
    def copy(self, memo=None):
        return Observation(
            self.image.copy(),
            weight=self.weight.copy(),
            bmask=self.bmask.copy() if self.has_bmask() else None,
            ormask=self.ormask.copy() if self.has_ormask() else None,
            noise=self.noise.copy() if self.has_noise() else None,
            gmix=self.gmix if self.has_gmix() else None,
            jacobian=self.jacobian,
            meta=_copy.deepcopy(self._meta, memo=memo),
            psf=self.psf.copy() if self.has_psf() else None,
            mfrac=self.mfrac.copy() if self.has_mfrac() else None,
            store_pixels=self._store_pixels,
            ignore_zero_weight=self._ignore_zero_weight,
        )

    def __copy__(self):
        return self.copy()

    def __deepcopy__(self, memo):
        result = self.copy(memo=memo)
        memo[id(self)] = result
        return result

    def __eq__(self, obs):
        if not isinstance(obs, Observation):
            raise ValueError(f"expected Observation, got {type(obs)}")
        if self.meta != obs.meta:
            return False
        for attr in ("image", "weight", "bmask", "ormask", "mfrac", "noise",
                     "psf", "gmix", "jacobian"):
            has = "has_" + attr
            self_has = getattr(self, has)() if hasattr(self, has) else True
            obs_has = getattr(obs, has)() if hasattr(obs, has) else True
            if self_has or obs_has:
                if self_has and obs_has:
                    a = getattr(self, attr)
                    b = getattr(obs, attr)
                    if isinstance(a, (Observation, GMix, Jacobian)):
                        if a != b:
                            return False
                    elif not np.all(a == b):
                        return False
                else:
                    return False
        return True

    # --- pixels ---------------------------------------------------------------
    @property
    def store_pixels(self):
        return self._store_pixels

    @store_pixels.setter
    def store_pixels(self, store_pixels):
        do_update = store_pixels != self._store_pixels
        self._store_pixels = store_pixels
        if do_update:
            self.update_pixels()

    @property
    def ignore_zero_weight(self):
        return self._ignore_zero_weight

    @ignore_zero_weight.setter
    def ignore_zero_weight(self, ignore_zero_weight):
        do_update = ignore_zero_weight != self._ignore_zero_weight
        self._ignore_zero_weight = ignore_zero_weight
        if do_update:
            self.update_pixels()

    def update_pixels(self):
        """rebuild the device Pixels struct"""
        if not self._store_pixels:
            self._pixels = None
            return
        self._pixels = make_pixels(
            self._image,
            self._weight,
            self._jacobian.to_device(),
            ignore_zero_weight=self._ignore_zero_weight,
        )

    def writeable(self):
        return self

    def __enter__(self):
        self._writeable = True
        return self

    def __exit__(self, exception_type, exception_value, traceback):
        self._writeable = False
        self.update_pixels()


class ObsList(list, MetadataMixin):
    """list of Observations (one band, many epochs)"""

    def __init__(self, meta=None):
        super().__init__()
        self.set_meta(meta)

    def append(self, obs):
        assert isinstance(obs, Observation), (
            "obs should be of type Observation, got %s" % type(obs)
        )
        super().append(obs)

    def get_s2n(self):
        Isum, Vsum, Npix = self.get_s2n_sums()
        if Vsum > 0.0:
            return Isum / np.sqrt(Vsum)
        return -9999.0

    def get_s2n_sums(self):
        Isum = Vsum = 0.0
        Npix = 0
        for obs in self:
            tI, tV, tN = obs.get_s2n_sums()
            Isum += tI
            Vsum += tV
            Npix += tN
        return Isum, Vsum, Npix

    def copy(self, memo=None):
        new = ObsList(meta=_copy.deepcopy(self._meta, memo))
        for obs in self:
            new.append(obs.copy(memo=memo))
        return new

    def __copy__(self):
        return self.copy()

    def __deepcopy__(self, memo):
        result = self.copy(memo=memo)
        memo[id(self)] = result
        return result

    def __eq__(self, obslist):
        if not isinstance(obslist, ObsList):
            raise ValueError(f"expected ObsList, got {type(obslist)}")
        if len(self) != len(obslist):
            return False
        return all(a == b for a, b in zip(self, obslist))

    def __setitem__(self, index, obs):
        assert isinstance(obs, Observation), (
            "obs should be of type Observation"
        )
        super().__setitem__(index, obs)


class MultiBandObsList(list, MetadataMixin):
    """list of ObsLists, one per band"""

    def __init__(self, meta=None):
        super().__init__()
        self.set_meta(meta)

    def append(self, obs_list):
        assert isinstance(obs_list, ObsList), (
            "obs_list should be of type ObsList"
        )
        super().append(obs_list)

    def get_s2n(self):
        Isum, Vsum, Npix = self.get_s2n_sums()
        if Vsum > 0.0:
            return Isum / np.sqrt(Vsum)
        return -9999.0

    def get_s2n_sums(self):
        Isum = Vsum = 0.0
        Npix = 0
        for obslist in self:
            tI, tV, tN = obslist.get_s2n_sums()
            Isum += tI
            Vsum += tV
            Npix += tN
        return Isum, Vsum, Npix

    def copy(self, memo=None):
        new = MultiBandObsList(meta=_copy.deepcopy(self._meta, memo=memo))
        for obslist in self:
            new.append(obslist.copy(memo=memo))
        return new

    def __copy__(self):
        return self.copy()

    def __deepcopy__(self, memo):
        result = self.copy(memo=memo)
        memo[id(self)] = result
        return result

    def __eq__(self, mbobs):
        if not isinstance(mbobs, MultiBandObsList):
            raise ValueError(f"expected MultiBandObsList, got {type(mbobs)}")
        if len(self) != len(mbobs):
            return False
        return all(a == b for a, b in zip(self, mbobs))

    def __setitem__(self, index, obs_list):
        assert isinstance(obs_list, ObsList), (
            "obs_list should be of type ObsList"
        )
        super().__setitem__(index, obs_list)


def get_mb_obs(obs_in):
    """promote Observation/ObsList to MultiBandObsList"""
    if isinstance(obs_in, Observation):
        obs_list = ObsList()
        obs_list.append(obs_in)
        obs = MultiBandObsList()
        obs.append(obs_list)
    elif isinstance(obs_in, ObsList):
        obs = MultiBandObsList()
        obs.append(obs_in)
    elif isinstance(obs_in, MultiBandObsList):
        obs = obs_in
    else:
        raise ValueError(
            "obs should be Observation, ObsList, or MultiBandObsList"
        )
    return obs


# k-space containers live in kobs.py; re-exported here for parity with
# the reference namespace (ngmix/observation.py:1147-1606). The import
# sits at module bottom because kobs imports the classes above.
from .kobs import (  # noqa: E402,F401
    DEFAULT_XINTERP,
    KMultiBandObsList,
    KObservation,
    KObsList,
    get_kmb_obs,
    make_kobs,
)

__all__ += [
    "KObservation",
    "KObsList",
    "KMultiBandObsList",
    "make_kobs",
    "get_kmb_obs",
]
