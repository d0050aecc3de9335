"""MEDS reader exercised end-to-end against an in-memory duck-typed
MEDS object (no fitsio/meds needed; the reference writes a real FITS
file for the same purpose, ngmix/tests/_fakemeds.py:20-40)."""
import numpy as np

from ngmix_tpu import DiagonalJacobian, GMixModel
from ngmix_tpu.medsreaders import MultiBandNGMixMEDS, NGMixMEDSMixin
from ngmix_tpu.observation import MultiBandObsList, Observation, ObsList

SCALE = 0.263
BOX = 25
PSF_BOX = 17


class FakeMEDS(object):
    """in-memory stand-in for meds.MEDS: stores per-cutout stacks and
    implements the raw-access interface the mixin consumes"""

    def __init__(self, rng, nobj=4, ncutout_max=3, with_psf=True):
        self.with_psf = with_psf
        dt = [
            ("id", "i8"), ("number", "i8"), ("ncutout", "i4"),
            ("box_size", "i4"), ("file_id", "i4", (ncutout_max,)),
            ("orig_row", "f8", (ncutout_max,)),
            ("orig_col", "f8", (ncutout_max,)),
            ("orig_start_row", "i8", (ncutout_max,)),
            ("orig_start_col", "i8", (ncutout_max,)),
            ("psf_cutout_row", "f8", (ncutout_max,)),
            ("psf_cutout_col", "f8", (ncutout_max,)),
            ("flux_auto", "f8"), ("x2", "f8"), ("y2", "f8"),
        ]
        cat = np.zeros(nobj, dtype=dt)
        self._cat = cat
        self._cuts = {
            k: np.zeros((nobj, ncutout_max, BOX, BOX))
            for k in ("image", "weight", "noise", "seg")
        }
        self._cuts["bmask"] = np.zeros(
            (nobj, ncutout_max, BOX, BOX), dtype="i4"
        )
        self._psf = np.zeros((nobj, ncutout_max, PSF_BOX, PSF_BOX))

        psf = GMixModel([0.0, 0.0, 0.0, 0.0, 0.3, 1.0], "gauss")
        pjac = DiagonalJacobian(
            row=(PSF_BOX - 1) / 2, col=(PSF_BOX - 1) / 2, scale=SCALE
        )
        pim = psf.make_image((PSF_BOX, PSF_BOX), jacobian=pjac)
        noise = 1e-3
        for i in range(nobj):
            ncut = 1 + i % ncutout_max
            cat["id"][i] = 100 + i
            cat["number"][i] = i + 1
            cat["ncutout"][i] = ncut
            cat["box_size"][i] = BOX
            cat["flux_auto"][i] = 100.0
            cat["x2"][i] = 0.25
            cat["y2"][i] = 0.25
            gal = GMixModel(
                [0.0, 0.0, 0.05, -0.02, 0.5, 100.0], "exp"
            ).convolve(psf)
            for c in range(ncut):
                cen = (BOX - 1) / 2 + rng.uniform(-0.5, 0.5, 2)
                jac = DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
                im = gal.make_image((BOX, BOX), jacobian=jac)
                self._cuts["image"][i, c] = im + rng.normal(
                    size=im.shape, scale=noise
                )
                self._cuts["weight"][i, c] = 1 / noise**2
                self._cuts["noise"][i, c] = rng.normal(
                    size=im.shape, scale=noise
                )
                # central disk belongs to this object (seg=number),
                # one corner to a neighbor
                rr, cc = np.mgrid[:BOX, :BOX]
                rad = np.hypot(rr - cen[0], cc - cen[1])
                seg = np.zeros((BOX, BOX))
                seg[rad < 8] = cat["number"][i]
                seg[:4, :4] = cat["number"][i] + 1
                self._cuts["seg"][i, c] = seg
                self._psf[i, c] = pim
                cat["file_id"][i, c] = c
                # row0 = orig_row - orig_start_row = cen (the stamp
                # was rendered about cen)
                cat["orig_row"][i, c] = 1000 + cen[0]
                cat["orig_col"][i, c] = 2000 + cen[1]
                cat["orig_start_row"][i, c] = 1000
                cat["orig_start_col"][i, c] = 2000
                cat["psf_cutout_row"][i, c] = (PSF_BOX - 1) / 2
                cat["psf_cutout_col"][i, c] = (PSF_BOX - 1) / 2
            self._jrowcol = None

    @property
    def size(self):
        return self._cat.size

    def get_cutout(self, iobj, icut, type="image"):
        if type not in self._cuts:
            raise RuntimeError("no %s cutouts" % type)
        return self._cuts[type][iobj, icut].copy()

    def get_jacobian(self, iobj, icut):
        c = self._cat
        return dict(
            row0=c["orig_row"][iobj, icut] - c["orig_start_row"][iobj, icut],
            col0=c["orig_col"][iobj, icut] - c["orig_start_col"][iobj, icut],
            dudrow=0.0, dudcol=SCALE, dvdrow=SCALE, dvdcol=0.0,
        )

    def get_image_info(self):
        nim = self._cat["file_id"].max() + 1
        info = np.zeros(
            nim, dtype=[("image_path", "U32"), ("scale", "f8")]
        )
        for i in range(nim):
            info["image_path"][i] = "/x/epoch_%d.fits" % i
            info["scale"][i] = 1.0
        return info

    def has_psf(self):
        return self.with_psf

    def get_psf(self, iobj, icut):
        return self._psf[iobj, icut].copy()

    # --- derived weights (the real meds package provides these) -----
    def get_uberseg(self, iobj, icut):
        wt = self.get_cutout(iobj, icut, type="weight")
        seg = self.get_cutout(iobj, icut, type="seg")
        num = self._cat["number"][iobj]
        wt[(seg != 0) & (seg != num)] = 0.0
        return wt

    def get_cweight_cutout(self, iobj, icut, restrict_to_seg=False):
        wt = self.get_cutout(iobj, icut, type="weight")
        seg = self.get_cutout(iobj, icut, type="seg")
        num = self._cat["number"][iobj]
        if restrict_to_seg:
            wt[seg != num] = 0.0
        return wt

    def get_cseg_weight(self, iobj, icut, use_canonical_cen=False):
        return self.get_cweight_cutout(iobj, icut, restrict_to_seg=True)


class FakeNGMixMEDS(NGMixMEDSMixin, FakeMEDS):
    pass


def _make(rng=None, **kw):
    return FakeNGMixMEDS(rng or np.random.RandomState(8), **kw)


def test_meds_get_obs_fields():
    m = _make()
    obs = m.get_obs(0, 0)
    assert isinstance(obs, Observation)
    assert obs.image.shape == (BOX, BOX)
    assert obs.has_psf()
    assert obs.psf.image.shape == (PSF_BOX, PSF_BOX)
    assert obs.has_noise()
    assert obs.has_bmask()
    # jacobian center from the catalog row offsets
    row0, col0 = obs.jacobian.get_cen()
    c = m._cat
    assert np.allclose(
        row0, c["orig_row"][0, 0] - c["orig_start_row"][0, 0]
    )
    # metadata plumbing
    meta = obs.meta
    assert meta["id"] == 100 and meta["number"] == 1
    assert meta["file_path"] == "epoch_0.fits"
    assert meta["flux"] == 100.0 and meta["T"] == 0.5
    assert meta["orig_start_row"] == c["orig_start_row"][0, 0]


def test_meds_weight_types():
    m = _make()
    num = m._cat["number"][1]
    seg = m.get_cutout(1, 0, type="seg")
    neighbor = (seg != 0) & (seg != num)
    outside = seg == 0

    w_plain = m.get_obs(1, 0, weight_type="weight").weight
    assert np.all(w_plain > 0)

    w_uber = m.get_obs(1, 0, weight_type="uberseg").weight
    assert np.all(w_uber[neighbor] == 0)
    assert np.all(w_uber[outside] > 0)

    for wt_type in ("cweight", "cseg", "cseg-canonical"):
        w = m.get_obs(1, 0, weight_type=wt_type).weight
        assert np.all(w[seg == num] > 0)
        assert np.all(w[seg != num] == 0), wt_type

    try:
        m.get_obs(1, 0, weight_type="nope")
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_meds_obslist_and_multiband():
    rng = np.random.RandomState(8)
    m = _make(rng)
    # per-object epoch counts follow ncutout
    for iobj in range(m.size):
        obslist = m.get_obslist(iobj)
        assert isinstance(obslist, ObsList)
        assert len(obslist) == m._cat["ncutout"][iobj]
        assert obslist.meta["flux"] == 100.0

    mb = MultiBandNGMixMEDS([_make(rng), _make(rng)])
    assert mb.nband == 2 and mb.size == m.size
    mbobs = mb.get_mbobs(2, weight_type="uberseg")
    assert isinstance(mbobs, MultiBandObsList)
    assert len(mbobs) == 2
    assert len(mbobs[0]) == m._cat["ncutout"][2]

    mbobs_list = mb.get_mbobs_list(indices=[0, 3])
    assert len(mbobs_list) == 2


def test_meds_to_fit_end_to_end():
    """read -> bootstrap fit: the reader's observations feed the
    standard pipeline and recover the injected parameters"""
    from ngmix_tpu import Bootstrapper, Fitter, Runner, PSFRunner
    from ngmix_tpu.guessers import SimplePSFGuesser, TFluxGuesser

    rng = np.random.RandomState(88)
    m = _make(rng)
    obslist = m.get_obslist(3, weight_type="uberseg")
    boot = Bootstrapper(
        runner=Runner(
            fitter=Fitter(model="exp"),
            guesser=TFluxGuesser(rng=rng, T=0.5, flux=100.0), ntry=2,
        ),
        psf_runner=PSFRunner(
            fitter=Fitter(model="gauss"),
            guesser=SimplePSFGuesser(rng=rng), ntry=2,
        ),
    )
    res = boot.go(obslist)
    assert res["flags"] == 0
    assert abs(res["pars"][5] - 100.0) < 3.0
    assert abs(res["pars"][4] - 0.5) < 0.05
