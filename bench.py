"""Benchmark: stamps fitted/sec/chip for the full metacal workload.

Workload per stamp (the BASELINE.json headline config): derive the
round target psf from the psf stamp, build the 5-type metacal image set
with fixnoise (10 k-space pipelines), and fit an exp model with the
bounded LM fitter to every type - all one jitted batched program.

Correctness gate (MECHANICAL): the recovered multiplicative shear bias
m is computed from the same run — and from a heterogeneous-morphology
batch through the same compiled program — and the process exits
nonzero unless |m| < 1e-3 AND |hetero m| < 1e-3 AND n_failed is small
(`gate_ok` in the JSON). The hetero gate runs even with
NGMIX_BENCH_SECONDARY=0. Any change to the pipeline defaults (chunk
size, batch, pad factor, measure config) REQUIRES a full green bench
run at the new defaults before it ships: round 4 shipped a
chunk-shape change validated only by throughput A/Bs and the driver's
bench caught a silent 68x-over-gate hetero bias (see
ngmix_tpu/fitting/lm.py run_lm_normal_batched for the root cause).

Baseline: the reference publishes no throughput numbers; its metacal
example docstring reports "about a minute" for 1000 trials of the
lighter gaussmom-measure workload on a laptop CPU
(examples/metacal/metacal.py:48-57), i.e. ~16.7 stamps/s single-core.
vs_baseline is measured throughput relative to 50x that number (the
BASELINE.md north-star target), so vs_baseline >= 1 means the target is
met.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ngmix_tpu.batch import (
    MetacalConfig,
    make_metacal_pipeline_fn,
    shear_response,
)
from ngmix_tpu.gmix import core as gcore

NGMIX_SINGLE_CORE_STAMPS_PER_SEC = 16.7
TARGET_MULTIPLE = 50.0

SCALE = 0.263
DIMS = (49, 49)
PSF_DIMS = (25, 25)
SHEAR_TRUE = 0.02
NOISE = 1.0e-4


def make_sim_batch(key, B, dtype=jnp.float32):
    """render B exp-galaxy stamps with a turb psf, sheared by
    SHEAR_TRUE, with random subpixel offsets - one jitted program"""
    kc, ko, kn, knz = jax.random.split(key, 4)

    gal_pars = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.5, 100.0], dtype), (B, 6)
    )
    gal, _ = gcore.fill_exp(gal_pars)
    gal = gcore.gmix_get_sheared(gal, SHEAR_TRUE, 0.0)
    psf_pars = jnp.asarray([0.0, 0.0, 0.025, -0.01, 0.27, 1.0], dtype)
    psf, _ = gcore.fill_turb(psf_pars)
    conv = gcore.gmix_convolve(gal, jnp.broadcast_to(psf, (B, 3, 6)))

    offsets = jax.random.uniform(ko, (B, 2), dtype, -0.5, 0.5)
    cens = jnp.asarray([(DIMS[0] - 1) / 2.0, (DIMS[1] - 1) / 2.0], dtype) + offsets

    rows = jnp.arange(DIMS[0], dtype=dtype)
    cols = jnp.arange(DIMS[1], dtype=dtype)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    v = (rr.reshape(-1)[None, :] - cens[:, 0:1]) * SCALE
    u = (cc.reshape(-1)[None, :] - cens[:, 1:2]) * SCALE
    imgs = gcore.eval_gmix(conv, v, u, SCALE**2, fast=False)
    imgs = imgs.reshape(B, *DIMS)
    imgs = imgs + jax.random.normal(kn, imgs.shape, dtype) * NOISE

    pcen = jnp.asarray([(PSF_DIMS[0] - 1) / 2.0, (PSF_DIMS[1] - 1) / 2.0], dtype)
    prows = jnp.arange(PSF_DIMS[0], dtype=dtype)
    pcols = jnp.arange(PSF_DIMS[1], dtype=dtype)
    prr, pcc = jnp.meshgrid(prows, pcols, indexing="ij")
    pv = (prr.reshape(-1) - pcen[0]) * SCALE
    pu = (pcc.reshape(-1) - pcen[1]) * SCALE
    pimg = gcore.eval_gmix(psf, pv, pu, SCALE**2, fast=False).reshape(PSF_DIMS)
    pimgs = jnp.broadcast_to(pimg, (B,) + PSF_DIMS)

    weights = jnp.full((B,) + DIMS, 1.0 / NOISE**2, dtype)
    noise_field = jax.random.normal(knz, (B,) + DIMS, dtype) * NOISE
    pcens = jnp.broadcast_to(pcen, (B, 2))
    return imgs, weights, cens, pimgs, pcens, noise_field


def make_sim_batch_hetero(key, B, dtype=jnp.float32,
                          jac=(SCALE, 0.0, 0.0, SCALE),
                          shear=(SHEAR_TRUE, 0.0), nepoch=None,
                          gint_max=0.3, gal_model="exp", nband=None,
                          noise=NOISE):
    """heterogeneous sim batch: per-stamp size/flux/intrinsic shape and
    per-stamp psf shape/size variation, rendered under an arbitrary
    shared WCS (pass a non-diagonal ``jac`` for the sheared-WCS
    configuration of the reference's accuracy oracle,
    ngmix/tests/test_metacal_accuracy.py:95-117).

    Stamps come in +-g_int pairs sharing T/flux/psf (ring
    cancellation), so the linear shape-noise term drops out of the
    mean-shear statistics and m resolves at measurement-noise
    precision. One jitted program like make_sim_batch.

    gal_model="bdf" renders composite bulge+disk galaxies with
    per-stamp fracdev drawn from [0.1, 0.9] (paired) instead of pure
    exponentials — the matched-truth population for validating the
    bdf-lm measure away from the fracdev bounds.

    nband (with nepoch): per-stamp per-band SED factors drawn from
    [0.6, 1.4] (paired) scale each epoch's image by its band's factor,
    with epoch->band = arange(nepoch) % nband — the multi-band
    population for validating joint nband>=2 fits (the reference's
    multi-band fits slice a per-band flux, fitting/results.py:1013-1047).
    """
    assert B % 2 == 0, "pairing needs an even batch"
    H = B // 2
    kT, kf, kg, kth, kp, kpt, ko, kn, knz = jax.random.split(key, 9)
    # fold_in rather than widening the split: split(key, 10) would
    # change ALL nine pre-existing streams (threefry split output
    # depends on the count), silently shifting every recorded
    # fixed-seed validation number
    kfd = jax.random.fold_in(key, 99)

    def pair(x):
        return jnp.concatenate([x, x], axis=0)

    T = jax.random.uniform(kT, (H,), dtype, 0.3, 1.1)
    flux = jax.random.uniform(kf, (H,), dtype, 60.0, 140.0)
    # intrinsic shapes uniform on a disc |g| < gint_max
    r = jnp.sqrt(jax.random.uniform(kg, (H,), dtype)) * gint_max
    th = jax.random.uniform(kth, (H,), dtype, 0.0, 2.0 * jnp.pi)
    g1i = r * jnp.cos(th)
    g2i = r * jnp.sin(th)
    zeros = jnp.zeros((B,), dtype)
    shape_cols = [
        zeros, zeros,
        jnp.concatenate([g1i, -g1i]),
        jnp.concatenate([g2i, -g2i]),
        pair(T),
    ]
    if gal_model == "bdf":
        fracdev = jax.random.uniform(kfd, (H,), dtype, 0.1, 0.9)
        gal_pars = jnp.stack(
            shape_cols + [pair(fracdev), pair(flux)], axis=-1
        )
        gal, _ = gcore.fill_bdf(gal_pars)
    else:
        gal_pars = jnp.stack(shape_cols + [pair(flux)], axis=-1)
        gal, _ = gcore.fill_exp(gal_pars)
    gal = gcore.gmix_get_sheared(gal, shear[0], shear[1])

    # per-stamp turb psf (paired): shape +-0.03, T in [0.24, 0.30]
    pg = jax.random.uniform(kp, (H, 2), dtype, -0.03, 0.03)
    pT = jax.random.uniform(kpt, (H,), dtype, 0.24, 0.30)
    psf_pars = jnp.concatenate(
        [
            jnp.zeros((H, 2), dtype), pg, pT[:, None],
            jnp.ones((H, 1), dtype),
        ],
        axis=-1,
    )
    psf, _ = gcore.fill_turb(pair(psf_pars))
    conv = gcore.gmix_convolve(gal, psf)

    offsets = jax.random.uniform(ko, (B, 2), dtype, -0.5, 0.5)
    cens = jnp.asarray(
        [(DIMS[0] - 1) / 2.0, (DIMS[1] - 1) / 2.0], dtype
    ) + offsets

    dvdrow, dvdcol, dudrow, dudcol = jac
    area = abs(dvdrow * dudcol - dvdcol * dudrow)
    rows = jnp.arange(DIMS[0], dtype=dtype)
    cols = jnp.arange(DIMS[1], dtype=dtype)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    dr = rr.reshape(-1)[None, :] - cens[:, 0:1]
    dc = cc.reshape(-1)[None, :] - cens[:, 1:2]
    v = dvdrow * dr + dvdcol * dc
    u = dudrow * dr + dudcol * dc
    clean = gcore.eval_gmix(conv, v, u, area, fast=False).reshape(B, *DIMS)

    pcen = jnp.asarray(
        [(PSF_DIMS[0] - 1) / 2.0, (PSF_DIMS[1] - 1) / 2.0], dtype
    )
    prows = jnp.arange(PSF_DIMS[0], dtype=dtype)
    pcols = jnp.arange(PSF_DIMS[1], dtype=dtype)
    prr, pcc = jnp.meshgrid(prows, pcols, indexing="ij")
    pdr = (prr.reshape(-1) - pcen[0])[None, :]
    pdc = (pcc.reshape(-1) - pcen[1])[None, :]
    pv = dvdrow * pdr + dvdcol * pdc
    pu = dudrow * pdr + dudcol * pdc
    pimgs = gcore.eval_gmix(psf, pv, pu, area, fast=False)
    pimgs = pimgs.reshape(B, *PSF_DIMS)
    pcens = jnp.broadcast_to(pcen, (B, 2))

    if nepoch is not None:
        # [B, E, ...]: the same objects observed E times with
        # independent noise (the multi-epoch validation shape)
        E = nepoch
        clean_e = clean[:, None]
        if nband is not None and nband > 1:
            # fold_in (not a wider split) for the same stream-stability
            # reason as kfd above
            kse = jax.random.fold_in(key, 123)
            sed = pair(jax.random.uniform(
                kse, (H, nband), dtype, 0.6, 1.4
            ))  # [B, nband]
            band = jnp.arange(E, dtype=jnp.int32) % nband
            clean_e = clean_e * sed[:, band][:, :, None, None]
        imgs = clean_e + jax.random.normal(
            kn, (B, E) + DIMS, dtype
        ) * noise
        weights = jnp.full((B, E) + DIMS, 1.0 / noise**2, dtype)
        noise_field = jax.random.normal(knz, (B, E) + DIMS, dtype) * noise
        return (
            imgs, weights,
            jnp.broadcast_to(cens[:, None], (B, E, 2)),
            jnp.broadcast_to(pimgs[:, None], (B, E) + PSF_DIMS),
            jnp.broadcast_to(pcens[:, None], (B, E, 2)),
            noise_field,
        )

    imgs = clean + jax.random.normal(kn, clean.shape, dtype) * noise
    weights = jnp.full((B,) + DIMS, 1.0 / noise**2, dtype)
    noise_field = jax.random.normal(knz, (B,) + DIMS, dtype) * noise
    return imgs, weights, cens, pimgs, pcens, noise_field


def _fetch(res):
    """force execution: block_until_ready alone does not force remote
    tunnel backends"""
    float(jnp.sum(jax.tree.leaves(res)[0]))


def secondary_rates(args, B):
    """BASELINE.md configs 1-3: per-solver throughput on the same
    stamps (EM, admom, gaussmom, pre-psf moments, gaussmom metacal).
    Each is one jitted batched program, timed over 2 reps.

    The standalone solvers run at the headline batch (capped at the
    m-validated 10240 program-shape ceiling): they consume only the
    raw stamps, so HBM is no concern and bigger programs amortize
    dispatch (em1/admom read ~40% faster at 10240-18432-stamp
    programs than at 2048 — the round-4 vs round-5 secondary-rate
    delta was this measurement shape, not a code change). The pad-2
    metacal secondaries re-slice to 2048: their FFT grids at the
    headline batch press the 16G chip (round-4 bench OOM)."""
    from ngmix_tpu.admom import AdmomConf, admom_batch
    from ngmix_tpu.batch import make_pixels_batch
    from ngmix_tpu.em import EMConf, em_batch
    from ngmix_tpu.gaussmom import gaussmom_measure
    from ngmix_tpu.prepsfmom import prepsfmom_batch

    if B > 10240:
        B = 10240
        args = tuple(a[:B] for a in args)
    imgs, weights, cens, pimgs, pcens, noise = args
    dtype = imgs.dtype
    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0.0, 0.0, SCALE),
    )
    pixels = make_pixels_batch(imgs, weights, cens, conf)
    area = jnp.full((B,), SCALE**2, dtype)

    def rate(fn, *a, nrep=2, n=None):
        _fetch(fn(*a))
        t0 = time.time()
        for _ in range(nrep):
            _fetch(fn(*a))
        return round((n or B) / ((time.time() - t0) / nrep), 1)

    out = {}

    # (1) single-gaussian EM
    px_em = shifted = None
    try:
        im_min = imgs.min(axis=(1, 2))
        im_max = imgs.max(axis=(1, 2))
        sky = 0.001 * (im_max - im_min)
        shifted = imgs - im_min[:, None, None] + sky[:, None, None]
        px_em = make_pixels_batch(shifted, weights, cens, conf)
        gmix0 = jnp.zeros((B, 1, 6), dtype)
        gmix0 = gmix0.at[:, 0, 0].set(1.0)
        gmix0 = gmix0.at[:, 0, 3].set(0.3).at[:, 0, 5].set(0.3)
        psf_delta = jnp.zeros((B, 1, 6), dtype).at[:, 0, 0].set(1.0)
        emconf = EMConf()
        fn_em = jax.jit(
            lambda p, g, pp, s: em_batch(p, g, pp, s, emconf)
        )
        out["em1_stamps_per_sec"] = rate(fn_em, px_em, gmix0, psf_delta, sky)
    except Exception:
        out["em1_stamps_per_sec"] = None

    # (3a) adaptive moments
    try:
        wt0 = jnp.zeros((B, 6), dtype)
        wt0 = wt0.at[:, 0].set(1.0).at[:, 3].set(0.3).at[:, 5].set(0.3)
        aconf = AdmomConf()
        fn_am = jax.jit(lambda p, w, a: admom_batch(p, w, a, aconf))
        out["admom_stamps_per_sec"] = rate(fn_am, pixels, wt0, area)
    except Exception:
        out["admom_stamps_per_sec"] = None

    # (3b) gaussian weighted moments
    try:
        fn_gm = jax.jit(
            lambda p, a: gaussmom_measure(p, 1.2, a, use_pallas=True)
        )
        out["gaussmom_stamps_per_sec"] = rate(fn_gm, pixels, area)
    except Exception:
        out["gaussmom_stamps_per_sec"] = None

    # (3c) pre-psf moments (ksigma kernel, reference pad_factor 4)
    try:
        tot_var = jnp.full((B,), NOISE**2, dtype)
        fn_pp = jax.jit(
            lambda im, c, pim, pc, tv: prepsfmom_batch(
                im, c, pim, pc, tv, target_dim=4 * DIMS[0],
                kernel="ksigma", jac_tuple=(SCALE, 0.0, 0.0, SCALE),
                fwhm=2.0,
            )
        )
        out["prepsfmom_stamps_per_sec"] = rate(
            fn_pp, imgs, cens, pimgs, pcens, tot_var
        )
    except Exception:
        out["prepsfmom_stamps_per_sec"] = None

    # pad-2 metacal secondaries on a 2048 slice (HBM: see docstring);
    # free the standalone-solver pixel grids first
    pixels = area = px_em = shifted = None
    imgs = weights = cens = pimgs = pcens = noise = None
    if B > 2048:
        B = 2048
        args = tuple(a[:B] for a in args)
    import gc

    gc.collect()

    # full metacal with the (lighter) gaussmom measure - the workload
    # of the reference's metacal example (~16.7 stamps/s laptop-core)
    try:
        mconf = MetacalConfig(
            dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0.0, 0.0, SCALE),
            fixnoise=True, pad_factor=2, fit_dims=(19, 19),
        )
        fn_mc = make_metacal_pipeline_fn(mconf, measure="gaussmom")
        out["metacal_gaussmom_stamps_per_sec"] = rate(fn_mc, *args)
    except Exception:
        out["metacal_gaussmom_stamps_per_sec"] = None

    # multi-band multi-epoch exp fits (BASELINE config 5): identical
    # epochs tiled from the single-band sims, 3 epochs over 2 bands
    try:
        from ngmix_tpu.batch import metacal_pipeline_mb

        E, nband = 3, 2
        Bmb = min(B, 2048)  # mb knee: 4.0k obj/s @512, 4.5k @2048
        mb_args = tuple(
            jnp.repeat(a[:Bmb, None], E, axis=1) for a in args
        )
        band = jnp.asarray([0, 0, 1])
        mbconf = MetacalConfig(
            dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0.0, 0.0, SCALE),
            fixnoise=True, pad_factor=2, fit_dims=(19, 19),
        )
        fn_mb = jax.jit(
            lambda *a: metacal_pipeline_mb(*a, band, nband, mbconf)
        )
        r = rate(fn_mb, *mb_args, n=Bmb)
        out["metacal_mb_objects_per_sec"] = r
        out["metacal_mb_epoch_stamps_per_sec"] = round(r * E, 1)
    except Exception:
        out["metacal_mb_objects_per_sec"] = None

    # full metacal with adaptive moments (the metadetect-style
    # estimator)
    try:
        aconf2 = MetacalConfig(
            dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0.0, 0.0, SCALE),
            fixnoise=True, pad_factor=2, fit_dims=(19, 19),
        )
        fn_am = make_metacal_pipeline_fn(aconf2, measure="admom")
        out["metacal_admom_stamps_per_sec"] = rate(fn_am, *args)
    except Exception:
        out["metacal_admom_stamps_per_sec"] = None

    return out


def _probe_default_backend(timeout=420):
    # 420s: tunnel probes measured at 120-160s on live-but-loaded days
    # (2026-08-19); 150s misclassified a slow tunnel as dead and the
    # bench silently fell back to CPU
    """can the default (tunnel) backend run a trivial program?

    Probed in a SUBPROCESS: a dead tunnel hangs the client forever, so
    an in-process probe could never time out. The probe program is a
    64x64 matmul - trivial enough that an abandoned copy on a wedged
    queue is harmless.
    """
    import subprocess

    code = (
        "import jax, jax.numpy as jnp; "
        "x = jnp.ones((64, 64)); print(float((x @ x).sum()))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    # 10240: the largest |m|-VALIDATED single program (full gate green:
    # 30.6k stamps/s, m=3.9e-4, hetero 4.0e-4, 2026-08-19). B=20480
    # measured RESOURCE_EXHAUSTED on the 16G chip (the full sim batch
    # plus even one 10240-chunk program's working set,
    # tools/tpu_logs/ab_chunk_r5.log) - bigger batches need the
    # chunked closure AND sims built per chunk. Round 4's 6144-chunk
    # default was retuned on throughput alone and turned out to be an
    # XLA wrong-code artifact (the LM froze at its guess) - see
    # make_metacal_pipeline_fn's docstring.
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    nrep = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    # Tunnel-outage resilience: if the default backend cannot run a
    # trivial program (the axon tunnel has gone fully unresponsive for
    # >10h stretches), fall back to an honest, clearly-labeled CPU run
    # at reduced scale rather than dying with a backend error. The CPU
    # number is NOT the headline per-chip figure - tpu_unavailable is
    # set so no one mistakes it for one. NGMIX_BENCH_BACKEND=tpu
    # disables the fallback; =cpu forces it.
    forced = os.environ.get("NGMIX_BENCH_BACKEND", "")
    tpu_unavailable = False
    if forced != "tpu" and (
        forced == "cpu" or not _probe_default_backend()
    ):
        tpu_unavailable = forced != "cpu"
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        B = min(B, 512)
        nrep = min(nrep, 2)
        os.environ.setdefault("NGMIX_BENCH_SECONDARY", "0")
        if tpu_unavailable:
            print(
                "# WARNING: default backend unresponsive; CPU fallback "
                "at B=%d (NOT a per-chip number)" % B, file=sys.stderr,
            )

    key = jax.random.PRNGKey(314)
    args = jax.block_until_ready(make_sim_batch(key, B))

    # pad_factor 1.3 -> N=64 FFT grids: measured m-neutral from N=100
    # down to N=64 (3.6e-4 here and on the sheared-WCS Spergel/Moffat
    # config) and ~25% faster than pad 2
    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0.0, 0.0, SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )
    fn = make_metacal_pipeline_fn(conf, measure="exp-lm")

    def run_once(a):
        res = fn(*a)
        # fetch a scalar: block_until_ready alone does not force
        # execution on remote-tunnel backends
        float(jnp.sum(res["noshear"]["pars"]))
        return res

    # compile
    res = run_once(args)

    t0 = time.time()
    for _ in range(nrep):
        res = run_once(args)
    per = (time.time() - t0) / nrep
    stamps_per_sec = B / per

    sr = shear_response(res)
    m = float(sr["shear"][0]) / SHEAR_TRUE - 1.0
    nbad = int(np.sum(np.asarray(res["noshear"]["flags"]) != 0))
    # derived-column consistency: e1 IS pars[:, 2] in the program, so
    # any mismatch in the fetched arrays is compiled-program corruption
    # (one observed wrong-code mode at the cursed 6144 shape corrupted
    # only the derived columns while pars stayed correct - see
    # fitting/lm.py's wrong-code history note). Free to check here.
    cols_ok = bool(
        np.array_equal(
            np.asarray(res["noshear"]["e1"]),
            np.asarray(res["noshear"]["pars"][:, 2]),
        )
    )

    import gc

    # secondaries run while the headline sims are still resident: the
    # standalone-solver rates reuse the full batch (raw stamps only;
    # secondary_rates internally re-slices to 2048 for the pad-2
    # metacal configs)
    if os.environ.get("NGMIX_BENCH_SECONDARY", "1") != "0":
        secondary = secondary_rates(args, B)
    else:
        secondary = {}

    # free the full homogeneous set before building the hetero one:
    # sims + results + the hetero set all resident at B=18432 exhaust
    # the 16G chip (round-4 bench OOM)
    args = res = None
    gc.collect()

    # heterogeneous m-gate, computed UNCONDITIONALLY: the same pipeline
    # program over varied morphology (per-stamp T/flux/shape pairs,
    # varied anisotropic psfs) - the homogeneous headline sim can't
    # catch biases that only appear off the single-object operating
    # point, and round 4 shipped a 68x-over-gate hetero bias because
    # this check lived inside the skippable secondary block
    het_args = jax.block_until_ready(
        make_sim_batch_hetero(jax.random.PRNGKey(271), B)
    )
    het_sr = shear_response(fn(*het_args))
    het_m = float(het_sr["shear"][0]) / SHEAR_TRUE - 1.0
    het_args = het_sr = None
    gc.collect()

    secondary["hetero_shear_bias_m"] = float("%.3e" % het_m)

    # mechanical correctness gate (|m| ~ 3-5e-4 is the reference's
    # method-intrinsic level, ngmix/tests/test_metacal_accuracy.py:77;
    # >1e-3 means a real regression). A throughput number with a
    # failing gate is not a result: rc=1 so no driver/CI records it
    # as a success (BENCH_r04.json did exactly that).
    gate_ok = (
        abs(m) < 1.0e-3
        and abs(het_m) < 1.0e-3
        and nbad <= max(8, int(0.005 * B))
        and cols_ok
    )

    out = {
        "metric": "metacal_exp_lm_stamps_per_sec_per_chip",
        "value": round(stamps_per_sec, 1),
        "unit": "stamps/s/chip",
        "vs_baseline": round(
            stamps_per_sec / (NGMIX_SINGLE_CORE_STAMPS_PER_SEC * TARGET_MULTIPLE), 3
        ),
        "extra": {
            "batch": B,
            "sec_per_batch": round(per, 4),
            "shear_bias_m": float(f"{m:.3e}"),
            "n_failed": nbad,
            "gate_ok": gate_ok,
            "backend": jax.default_backend(),
            "note": "vs_baseline is relative to 50x ngmix single-core "
                    "(~16.7 stamps/s); >=1 meets the north-star target",
            **secondary,
        },
    }
    if tpu_unavailable:
        out["extra"]["tpu_unavailable"] = True
        out["extra"]["note"] = (
            "TPU tunnel unresponsive: CPU fallback at reduced batch - "
            "NOT a per-chip figure; last TPU readings are in README/"
            "CLAUDE.md. " + out["extra"]["note"]
        )
    print(json.dumps(out))
    if not gate_ok:
        print(
            f"# GATE FAILED: m={m:.3e} hetero_m={het_m:.3e} "
            f"n_failed={nbad} cols_ok={cols_ok} "
            f"(gate: |m|<1e-3, |hetero m|<1e-3, derived cols intact)",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
