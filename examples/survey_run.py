"""End-to-end survey run: ragged catalog -> bucketed metacal pipeline
-> checkpointed result shards -> calibrated shear.

This is the production-shaped flow the reference achieves with external
process farming over MEDS chunks: here one process streams chunks
through the batched device pipeline, appends each completed chunk as a
resumable npz shard (ngmix_tpu.checkpoint.ResultWriter), and computes
the response-calibrated shear from the merged table. Kill it mid-run
and rerun: completed chunks are skipped.

The catalog is ragged on purpose - two stamp sizes and one- and
two-epoch objects - to exercise the size-bucketing layer
(ngmix_tpu.ragged): each chunk carries the same bucket composition so
every bucket shape compiles exactly once.

Run:  python examples/survey_run.py [nchunk]   (default 4, ~2 min CPU)
Expected: m within a few 1e-3 of zero at this catalog size, c ~ 0.
"""
import shutil
import sys
import tempfile

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import numpy as np

import ngmix_tpu as ngmix
from ngmix_tpu.batch import MetacalConfig
from ngmix_tpu.checkpoint import ResultWriter, load_results
from ngmix_tpu.ragged import metacal_pipeline_ragged

SCALE = 0.263
SHEAR_TRUE = 0.02
NOISE = 1.0e-3


def sim_object(rng, dims, nepoch):
    """one ragged catalog entry: sheared exp galaxy, gauss psf"""
    gal = ngmix.GMixModel(
        [0.0, 0.0, 0.0, 0.0, 0.5, 100.0], "exp"
    ).get_sheared(ngmix.Shape(SHEAR_TRUE, 0.0))
    psf = ngmix.GMixModel([0.0, 0.0, 0.02, -0.01, 0.3, 1.0], "gauss")

    pdims = (17, 17)
    pcen = ((pdims[0] - 1) / 2.0, (pdims[1] - 1) / 2.0)
    pjac = ngmix.DiagonalJacobian(row=pcen[0], col=pcen[1], scale=SCALE)
    pim = np.asarray(psf.make_image(pdims, jacobian=pjac))

    images, weights, noises, cens = [], [], [], []
    for _ in range(nepoch):
        off = rng.uniform(-0.5, 0.5, size=2)
        cen = ((dims[0] - 1) / 2.0 + off[0], (dims[1] - 1) / 2.0 + off[1])
        jac = ngmix.DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
        im = np.asarray(gal.convolve(psf).make_image(dims, jacobian=jac))
        images.append(im + rng.normal(size=dims) * NOISE)
        weights.append(np.full(dims, 1.0 / NOISE**2))
        noises.append(rng.normal(size=dims) * NOISE)
        cens.append(cen)
    return dict(
        image=images, weight=weights, noise=noises,
        cen=np.asarray(cens), psf_image=[pim] * nepoch, psf_cen=pcen,
    )


def sim_chunk(rng):
    """fixed bucket composition per chunk: 24 x (33px, 1 epoch) +
    8 x (49px, 2 epochs) - shapes repeat, so compiles don't"""
    cat = []
    for _ in range(24):
        cat.append(sim_object(rng, (33, 33), 1))
    for _ in range(8):
        cat.append(sim_object(rng, (49, 49), 2))
    return cat


def main(nchunk=4, outdir=None):
    cleanup = outdir is None
    outdir = outdir or tempfile.mkdtemp(prefix="survey_run_")
    writer = ResultWriter(outdir)
    conf = MetacalConfig(
        dims=(33, 33), psf_dims=(17, 17), jac=(SCALE, 0.0, 0.0, SCALE),
        fixnoise=True, pad_factor=2,
    )

    start = writer.next_index()
    if start:
        print(f"resuming at chunk {start}/{nchunk}")
    for i in range(start, nchunk):
        rng = np.random.RandomState(1000 + i)  # chunk-deterministic
        cat = sim_chunk(rng)
        res = metacal_pipeline_ragged(cat, conf, measure="exp-lm")
        res.pop("psf_sigma")  # ragged per-object list; not table-shaped
        writer.write(i, res)
        print(f"chunk {i + 1}/{nchunk}: {len(cat)} objects")

    table = load_results(outdir)
    means = {}
    for t in ("noshear", "1p", "1m", "2p", "2m"):
        ok = table[f"{t}/flags"] == 0
        means[t] = (
            table[f"{t}/e1"][ok].mean(), table[f"{t}/e2"][ok].mean(),
            ok.sum(),
        )
    R11 = (means["1p"][0] - means["1m"][0]) / 0.02
    R22 = (means["2p"][1] - means["2m"][1]) / 0.02
    g1 = means["noshear"][0] / R11
    g2 = means["noshear"][1] / R22
    n = means["noshear"][2]
    print(f"objects used: {n}  R11={R11:.4f} R22={R22:.4f}")
    print(f"recovered shear: g1={g1:.5f} (true {SHEAR_TRUE}), g2={g2:.5f}")
    print(f"m = {g1 / SHEAR_TRUE - 1:.2e}, c = {g2:.2e}")
    if cleanup:
        shutil.rmtree(outdir)
    return g1, g2


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
