"""Frozen multi-object-scene golden (tests/data/scene_golden.npz).

A fixed-seed scene of 120 varied objects - mixed stamp sizes, mixed
epoch counts, varied galaxy size/flux/intrinsic shape, per-object
anisotropic turb psfs, a sheared (non-diagonal) WCS - runs through
pack_ragged -> batched metacal -> four estimators (exp-lm, gaussmom,
admom, and bounded bdf-lm — the last freezes the bounded-solver
behavior), and EVERY catalog column is frozen. This is the cross-component drift detector the
per-piece goldens can't provide, in the spirit of the reference's
mdet_tests/test_mdet_regression.py:112-269 (fixed 120-galaxy scene,
all columns at rtol 1e-5).

Run:  python tests/make_scene_golden.py   (regenerates the file)
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))

SCENE_PATH = os.path.join(
    os.path.dirname(__file__), "data", "scene_golden.npz"
)

NOBJ = 120
SCALE = 0.263
# non-diagonal WCS, comparable to the reference oracle's ShearWCS
JAC = (SCALE * 1.02, SCALE * 0.01, SCALE * 0.015, SCALE * 0.98)
PSF_DIMS = (25, 25)
SHEAR = (0.02, 0.0)
# (name, extra pipeline kwargs); bdf-lm runs with production-style
# bounds to freeze the bounded-solver behavior (logistic transform +
# active-set pinning) into the cross-component golden
ESTIMATORS = (
    ("exp-lm", {}),
    ("gaussmom", {}),
    ("admom", {}),
    ("bdf-lm", {"lm_bounds": (
        np.array([-2.0, -2.0, -0.99, -0.99, 1.0e-3, 0.0, 1.0e-3]),
        np.array([2.0, 2.0, 0.99, 0.99, 20.0, 1.0, 1.0e9]),
    )}),
)
TYPES = ("noshear", "1p", "1m", "2p", "2m")


def build_scene():
    """the fixed-seed ragged catalog"""
    from ngmix_tpu import GMixModel, Jacobian

    rng = np.random.RandomState(24601)
    catalog = []
    for _ in range(NOBJ):
        dims = (33, 33) if rng.uniform() < 0.6 else (49, 49)
        nepoch = 1 if rng.uniform() < 0.7 else 2
        T = rng.uniform(0.3, 1.1)
        flux = rng.uniform(60.0, 140.0)
        g1i, g2i = rng.uniform(-0.2, 0.2, 2)
        gal = GMixModel(
            [0.0, 0.0, g1i, g2i, T, flux], "exp"
        ).get_sheared(*SHEAR)
        pg1, pg2 = rng.uniform(-0.03, 0.03, 2)
        pT = rng.uniform(0.24, 0.30)
        psf = GMixModel([0.0, 0.0, pg1, pg2, pT, 1.0], "turb")
        conv = gal.convolve(psf)

        pjac = Jacobian(
            row=12, col=12, dvdrow=JAC[0], dvdcol=JAC[1],
            dudrow=JAC[2], dudcol=JAC[3],
        )
        pim = psf.make_image(PSF_DIMS, jacobian=pjac, fast_exp=False)

        cen0 = (dims[0] - 1) / 2.0
        noise = 1.0e-4
        images, weights, noises, cens = [], [], [], []
        for _e in range(nepoch):
            off = rng.uniform(-0.5, 0.5, 2)
            jac = Jacobian(
                row=cen0 + off[0], col=cen0 + off[1], dvdrow=JAC[0],
                dvdcol=JAC[1], dudrow=JAC[2], dudcol=JAC[3],
            )
            im = conv.make_image(dims, jacobian=jac, fast_exp=False)
            images.append(im + rng.normal(size=dims) * noise)
            weights.append(np.full(dims, 1.0 / noise**2))
            noises.append(rng.normal(size=dims) * noise)
            cens.append([cen0 + off[0], cen0 + off[1]])
        catalog.append(dict(
            image=images, weight=weights, cen=np.asarray(cens),
            psf_image=[pim] * nepoch,
            psf_cen=np.asarray([[12.0, 12.0]] * nepoch),
            noise=noises,
        ))
    return catalog


def band_annotate(catalog, nband=2, seed=777):
    """derived nband=2 catalog slice: epochs round-robin over bands
    with per-object SED factors scaling image/noise (weights scale by
    1/sed^2 so the noise model stays consistent). Uses its OWN rng so
    the base scene's frozen streams are untouched."""
    rng = np.random.RandomState(seed)
    out = []
    for obj in catalog:
        sed = rng.uniform(0.6, 1.4, nband)
        nepoch = len(obj["image"])
        band = (np.arange(nepoch) % nband).astype(np.int32)
        fac = sed[band]
        out.append(dict(
            image=[im * fac[e] for e, im in enumerate(obj["image"])],
            weight=[w / fac[e] ** 2
                    for e, w in enumerate(obj["weight"])],
            noise=[nz * fac[e] for e, nz in enumerate(obj["noise"])],
            cen=obj["cen"], psf_image=obj["psf_image"],
            psf_cen=obj["psf_cen"], band=band,
        ))
    return out


def compute_scene_catalog():
    """scene -> {<estimator>/<type>/<column>: array} for every column"""
    from ngmix_tpu.batch import MetacalConfig
    from ngmix_tpu.ragged import metacal_pipeline_ragged

    catalog = build_scene()
    conf = MetacalConfig(
        dims=(0, 0), psf_dims=PSF_DIMS, jac=JAC, fixnoise=True,
        pad_factor=2,
    )
    out = {}
    for est, est_kw in ESTIMATORS:
        res = metacal_pipeline_ragged(catalog, conf, measure=est, **est_kw)
        for t in TYPES:
            for col, val in sorted(res[t].items()):
                arr = np.asarray(val)
                if arr.dtype.kind in "fiub":
                    out["%s/%s/%s" % (est, t, col)] = arr
        # sanity on the catalog itself, not just stability
        flags = np.asarray(res["noshear"]["flags"])
        assert (flags == 0).mean() > 0.95, (est, flags)

    # joint multi-band slice: the 2-epoch objects observed in 2 bands
    # (single-epoch objects would leave one band unconstrained)
    mb2 = band_annotate(
        [o for o in catalog if o["cen"].shape[0] == 2], nband=2
    )
    res = metacal_pipeline_ragged(mb2, conf, measure="exp-lm", nband=2)
    for t in TYPES:
        for col, val in sorted(res[t].items()):
            arr = np.asarray(val)
            if arr.dtype.kind in "fiub":
                out["exp-lm-mb2/%s/%s" % (t, col)] = arr
    flags = np.asarray(res["noshear"]["flags"])
    assert (flags == 0).mean() > 0.9, flags
    return out


def main():
    out = compute_scene_catalog()
    os.makedirs(os.path.dirname(SCENE_PATH), exist_ok=True)
    np.savez_compressed(SCENE_PATH, **out)
    print(
        "wrote %s: %d columns, %d objects"
        % (SCENE_PATH, len(out), NOBJ)
    )


if __name__ == "__main__":
    main()
