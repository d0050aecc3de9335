"""k-space observation containers, galsim-free.

Behavior parity with ngmix/observation.py:1147-1606 (KObservation,
KObsList, KMultiBandObsList, make_kobs, get_kmb_obs), with the galsim
Image/InterpolatedImage machinery replaced by centered FFTs of the
stamps: the DFT of a compact stamp IS its continuous transform on the
grid (trig-poly identity), so no interpolant is involved and the
interpolant response cancels nowhere because it never enters.

kimages are stored as plain complex numpy arrays in fftshift layout
(k = 0 at the canonical center, matching the reference's galsim
drawKImage bounds) with the grid spacing in the ``scale`` attribute.
"""
import numpy as np
import jax.numpy as jnp

from .jacobian import DiagonalJacobian
from .metacal import kops
from .observation import (
    _HasMetadata,
    MultiBandObsList,
    Observation,
    ObsList,
    get_mb_obs,
)

__all__ = [
    "KObservation",
    "KObsList",
    "KMultiBandObsList",
    "make_kobs",
    "make_iilist",
    "get_kmb_obs",
]

DEFAULT_XINTERP = "lanczos15"  # kept for API parity; unused (exact FFTs)


class KObservation(_HasMetadata):
    """a k-space observation: complex kimage + weight + optional psf"""

    def __init__(self, kimage, weight=None, psf=None, meta=None, scale=1.0):
        self._set_image(kimage, scale)
        self._set_weight(weight)
        self.set_psf(psf)
        self._set_jacobian()
        self.set_meta(meta)

    def _set_image(self, kimage, scale):
        kimage = np.asarray(kimage)
        if not np.iscomplexobj(kimage):
            raise ValueError("kimage must be complex")
        self.kimage = kimage
        self.scale = float(scale)

    def _set_weight(self, weight):
        if weight is None:
            weight = np.ones(self.kimage.shape)
        else:
            weight = np.asarray(weight)
            if weight.shape != self.kimage.shape:
                raise ValueError(
                    "weight kimage must have same shape as kimage"
                )
        self.weight = weight

    @property
    def psf(self):
        return self._psf

    def has_psf(self):
        return hasattr(self, "_psf")

    def set_psf(self, psf):
        if self.has_psf():
            del self._psf
        if psf is None:
            return
        assert isinstance(psf, KObservation)
        self._psf = psf
        if psf.kimage.shape != self.kimage.shape:
            raise ValueError("psf kimage must have same shape as kimage")
        assert np.allclose(psf.scale, self.scale)

    def _set_jacobian(self):
        """k = 0 sits at the canonical center
        (ref: observation.py:1251-1272)"""
        dims = self.kimage.shape
        cen = np.zeros(2)
        for i in range(2):
            if dims[i] % 2 == 0:
                cen[i] = (dims[i] - 1.0) / 2.0 + 0.5
            else:
                cen[i] = (dims[i] - 1.0) / 2.0
        self.jacobian = DiagonalJacobian(
            scale=self.scale, row=cen[0], col=cen[1]
        )


class KObsList(list, _HasMetadata):
    """list of KObservations"""

    def __init__(self, meta=None):
        super().__init__()
        self.set_meta(meta)

    def append(self, kobs):
        assert isinstance(kobs, KObservation), (
            "kobs should be of type KObservation, got %s" % type(kobs)
        )
        super().append(kobs)

    def __setitem__(self, index, kobs):
        assert isinstance(kobs, KObservation), (
            "kobs should be of type KObservation"
        )
        super().__setitem__(index, kobs)


class KMultiBandObsList(list, _HasMetadata):
    """list of KObsLists, one per band"""

    def __init__(self, meta=None):
        super().__init__()
        self.set_meta(meta)

    def append(self, kobs_list):
        assert isinstance(kobs_list, KObsList), (
            "kobs_list should be of type KObsList"
        )
        super().append(kobs_list)

    def __setitem__(self, index, kobs_list):
        assert isinstance(kobs_list, KObsList), (
            "kobs_list should be of type KObsList"
        )
        super().__setitem__(index, kobs_list)


def _kimage_of_obs(image, cen, dim, scale):
    """centered FFT of the stamp, fftshifted, with k in sky units.

    The phases are referenced to the jacobian center so the profile is
    centered at the origin; dk = 2 pi / (dim * scale).
    """
    khat = kops.centered_fft(
        jnp.asarray(image, dtype=jnp.float64) + 0j, jnp.asarray(cen), dim
    )
    return np.fft.fftshift(np.asarray(khat))


class ExactImageTransform:
    """galsim.InterpolatedImage stand-in for the 'ii' slots of
    make_iilist: holds the stamp and its center and evaluates the
    EXACT continuous transform on any k grid via the centered FFT
    (trig-poly identity; no interpolant enters, so there is no
    interpolant response to correct)."""

    def __init__(self, image, cen, scale):
        self.image = np.asarray(image)
        self.cen = np.asarray(cen, dtype=float)
        self.scale = float(scale)

    def kimage(self, dim):
        """[dim, dim] fftshifted k image; dk = 2 pi / (dim * scale)"""
        return _kimage_of_obs(self.image, self.cen, dim, self.scale)

    @property
    def nyquist_scale(self):
        return np.pi / self.scale


def make_iilist(obs, interp=DEFAULT_XINTERP, pad_factor=4):
    """compat shim for ngmix.observation.make_iilist
    (ref: observation.py:1363-1493): per-band-epoch dicts of
    "interpolated image" data plus the common (odd) dim and dk.

    The reference wraps each stamp in a galsim InterpolatedImage;
    here the 'ii'/'psf_ii' slots hold ExactImageTransform objects
    (exact DFT evaluation, no interpolant) and 'realspace_gsimage' is
    the plain numpy stamp. 'wcs' carries the Jacobian (galsim WCS
    objects don't exist in this build). dim follows the same
    odd-dimension rule as make_kobs.
    """
    del interp
    mb_obs = get_mb_obs(obs)

    maxdim = 0
    scale_at_max = None
    mb_iilist = []
    for obslist in mb_obs:
        iilist = []
        for o in obslist:
            scale = o.jacobian.scale
            entry = {
                "wcs": o.jacobian,
                "scale": scale,
                "ii": ExactImageTransform(
                    o.image, o.jacobian.get_cen(), scale
                ),
                "weight": o.weight,
                "meta": o.meta,
                "psf_ii": None,
                "psf_weight": None,
                "psf_meta": None,
                "realspace_gsimage": np.asarray(o.image),
            }
            this_dim = max(o.image.shape)
            if o.has_psf():
                psf = o.psf
                entry["psf_ii"] = ExactImageTransform(
                    psf.image / psf.image.sum(),
                    psf.jacobian.get_cen(), psf.jacobian.scale,
                )
                entry["psf_weight"] = psf.weight
                entry["psf_meta"] = psf.meta
                this_dim = max(this_dim, max(psf.image.shape))
            if this_dim > maxdim:
                maxdim = this_dim
                scale_at_max = scale
            iilist.append(entry)
        mb_iilist.append(iilist)

    dim = kops.good_fft_size(pad_factor * maxdim) + 1  # odd, like galsim
    dk = 2 * np.pi / (dim * scale_at_max)
    return mb_iilist, dim, dk


def make_kobs(mb_obs, interp=DEFAULT_XINTERP, pad_factor=4):
    """real-space observation(s) -> KMultiBandObsList with a common
    dim and dk (ref: observation.py:1493-1574)"""
    del interp
    mb_obs = get_mb_obs(mb_obs)

    # common (odd) dimension over all bands/epochs
    maxdim = 0
    for obslist in mb_obs:
        for obs in obslist:
            maxdim = max(maxdim, max(obs.image.shape))
            if obs.has_psf():
                maxdim = max(maxdim, max(obs.psf.image.shape))
    dim = kops.good_fft_size(pad_factor * maxdim) + 1  # odd, like galsim

    mb_kobs = KMultiBandObsList()
    for obslist in mb_obs:
        kobs_list = KObsList()
        for obs in obslist:
            scale = obs.jacobian.scale
            dk = 2 * np.pi / (dim * scale)
            kimage = _kimage_of_obs(
                obs.image, obs.jacobian.get_cen(), dim, scale
            )

            useweight = obs.weight.max()
            weight = np.full(kimage.shape, 0.5 * useweight)
            # parseval's theorem
            weight *= 1.0 / weight.size

            if obs.has_psf():
                pimage = obs.psf.image / obs.psf.image.sum()
                psf_kimage = _kimage_of_obs(
                    pimage, obs.psf.jacobian.get_cen(), dim,
                    obs.psf.jacobian.scale,
                )
                psf_useweight = obs.psf.weight.max()
                psf_weight = np.full(kimage.shape, 0.5 * psf_useweight)
                psf_weight *= 1.0 / psf_weight.size
                psf_kobs = KObservation(
                    psf_kimage, weight=psf_weight, meta=dict(obs.psf.meta),
                    scale=dk,
                )
            else:
                psf_kobs = None

            meta = dict(obs.meta)
            meta["scale"] = scale
            kobs_list.append(
                KObservation(
                    kimage, weight=weight, psf=psf_kobs, meta=meta, scale=dk
                )
            )
        mb_kobs.append(kobs_list)
    return mb_kobs


def get_kmb_obs(obs_in):
    """promote K observations to KMultiBandObsList
    (ref: observation.py:1576-1606)"""
    if isinstance(obs_in, KObservation):
        kobs_list = KObsList()
        kobs_list.append(obs_in)
        obs = KMultiBandObsList()
        obs.append(kobs_list)
    elif isinstance(obs_in, KObsList):
        obs = KMultiBandObsList()
        obs.append(obs_in)
    elif isinstance(obs_in, KMultiBandObsList):
        obs = obs_in
    else:
        raise ValueError(
            "obs should be KObservation, KObsList, or KMultiBandObsList"
        )
    return obs


# re-export into the observation namespace for API parity
Observation  # noqa: B018
ObsList  # noqa: B018
MultiBandObsList  # noqa: B018
