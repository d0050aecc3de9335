"""MEDS survey-cutout readers producing Observation containers.

Behavior parity: ngmix/medsreaders.py:13-329. Requires the optional
`meds` package (the survey I/O format); importing this module without
it raises a clear error at class construction, not import time.

For TPU-scale work pair this with ngmix_tpu.batch: read mbobs lists
here, then stack same-sized stamps into [B, H, W] arrays for the
batched pipeline.
"""
import logging
import os

import numpy as np

from .gexceptions import GMixFatalError
from .jacobian import Jacobian
from .observation import MultiBandObsList, Observation, ObsList

logger = logging.getLogger(__name__)

try:
    from meds import MEDS as _MEDS

    HAVE_MEDS = True
except ImportError:
    HAVE_MEDS = False

    class _MEDS(object):  # pragma: no cover - placeholder
        def __init__(self, *args, **kw):
            raise ImportError(
                "the `meds` package is required for NGMixMEDS; it is an "
                "optional dependency"
            )


class MultiBandNGMixMEDS(object):
    """interface to NGMixMEDS objects in more than one band"""

    def __init__(self, mlist):
        self.mlist = mlist

    @property
    def nband(self):
        return len(self.mlist)

    @property
    def size(self):
        return self.mlist[0].size

    def get_mbobs_list(self, indices=None, weight_type="weight"):
        if indices is None:
            indices = np.arange(self.mlist[0].size)
        return [
            self.get_mbobs(iobj, weight_type=weight_type) for iobj in indices
        ]

    def get_mbobs(self, iobj, weight_type="weight"):
        mbobs = MultiBandObsList()
        for m in self.mlist:
            mbobs.append(m.get_obslist(iobj, weight_type=weight_type))
        return mbobs


class NGMixMEDSMixin(object):
    """Observation-building logic over any MEDS-interface provider.

    The base (meds.MEDS or a duck-typed stand-in, e.g. the in-memory
    fake in tests/test_medsreaders.py) supplies the raw-access
    interface: ``_cat``, ``get_cutout``, ``get_jacobian``,
    ``get_image_info``, ``get_psf``/``has_psf`` and the derived weight
    builders (``get_uberseg``, ``get_cweight_cutout``,
    ``get_cseg_weight``).
    """

    def get_obslist(self, iobj, weight_type="weight"):
        obslist = ObsList()
        for icut in range(self._cat["ncutout"][iobj]):
            try:
                obs = self.get_obs(iobj, icut, weight_type=weight_type)
                obslist.append(obs)
            except GMixFatalError:
                logger.debug("zero weight observation found, skipping")

        if len(obslist) > 0:
            obs = obslist[0]
            if "flux" in obs.meta:
                obslist.meta["flux"] = obs.meta["flux"]
            if "T" in obs.meta:
                obslist.meta["T"] = obs.meta["T"]
        return obslist

    def get_ngmix_jacobian(self, iobj, icutout):
        jd = self.get_jacobian(iobj, icutout)
        return Jacobian(
            row=jd["row0"],
            col=jd["col0"],
            dudrow=jd["dudrow"],
            dudcol=jd["dudcol"],
            dvdrow=jd["dvdrow"],
            dvdcol=jd["dvdcol"],
        )

    def get_obs(self, iobj, icutout, weight_type="weight"):
        im = self.get_cutout(iobj, icutout, type="image")

        def _try(type_):
            try:
                return self.get_cutout(iobj, icutout, type=type_)
            except Exception:
                return None

        bmask = _try("bmask")
        ormask = _try("ormask")
        noise = _try("noise")
        mfrac = _try("mfrac")

        if weight_type == "uberseg":
            wt = self.get_uberseg(iobj, icutout)
        elif weight_type == "cweight":
            wt = self.get_cweight_cutout(iobj, icutout, restrict_to_seg=True)
        elif weight_type == "weight":
            wt = self.get_cutout(iobj, icutout, type="weight")
        elif weight_type == "cseg":
            wt = self.get_cseg_weight(iobj, icutout)
        elif weight_type == "cseg-canonical":
            wt = self.get_cseg_weight(iobj, icutout, use_canonical_cen=True)
        else:
            raise ValueError("bad weight type '%s'" % weight_type)

        jacobian = self.get_ngmix_jacobian(iobj, icutout)
        c = self._cat

        ii = self.get_image_info()
        file_id = c["file_id"][iobj, icutout]
        file_path = os.path.basename(ii["image_path"][file_id]).strip()

        meta = dict(
            id=c["id"][iobj],
            index=iobj,
            icut=icutout,
            cutout_index=icutout,
            file_id=file_id,
            file_path=file_path,
            orig_row=c["orig_row"][iobj, icutout],
            orig_col=c["orig_col"][iobj, icutout],
            orig_start_row=c["orig_start_row"][iobj, icutout],
            orig_start_col=c["orig_start_col"][iobj, icutout],
            scale=ii["scale"][file_id],
        )
        if "flux_auto" in c.dtype.names:
            meta["flux"] = c["flux_auto"][iobj]
        if "x2" in c.dtype.names and "y2" in c.dtype.names:
            meta["T"] = c["x2"][iobj] + c["y2"][iobj]
        if "number" in c.dtype.names:
            meta["number"] = c["number"][iobj]

        psf_obs = self.get_psf_obs(iobj, icutout) if self.has_psf() else None

        return Observation(
            im,
            weight=wt,
            bmask=bmask,
            ormask=ormask,
            noise=noise,
            meta=meta,
            jacobian=jacobian,
            psf=psf_obs,
            mfrac=mfrac,
        )

    def get_psf_obs(self, iobj, icutout):
        psf_im = self.get_psf(iobj, icutout)
        noise = psf_im.max() / 1000.0
        weight = psf_im * 0 + 1.0 / noise**2
        jacobian = self.get_ngmix_jacobian(iobj, icutout)
        row, col = self._get_psf_cen(iobj, icutout)
        jacobian.set_cen(row=row, col=col)
        return Observation(psf_im, weight=weight, jacobian=jacobian)

    def _get_psf_cen(self, iobj, icutout):
        c = self._cat
        return (
            c["psf_cutout_row"][iobj, icutout],
            c["psf_cutout_col"][iobj, icutout],
        )


class NGMixMEDS(NGMixMEDSMixin, _MEDS):
    """MEDS file reader building Observations"""
