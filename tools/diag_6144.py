"""Triage the round-4 headline m regression at the 6144-stamp shape.

BENCH_r04.json measured m=-2.76e-3 / hetero m=-2.67e-2 at the new
default (B=18432 chunked into three 6144-stamp programs) with
n_failed=0 — past the |m|<1e-3 gate.  Round 3 documented a
deterministic XLA TPU miscompile at exactly B=6144 (garbage noshear
moments guesses, clean at B=2048 and on CPU).  This tool localizes it:

  gen  B mode             (CPU) render sims with a fixed seed -> npz
  run  B mode tag [opts]  run the pipeline over the saved sims as ONE
                          program of size --program (default B), save
                          per-lane results -> npz
  cmp  a.npz b.npz        per-lane diff; counts gross outliers and
                          prints their lane indices + per-type m

Options for `run`:
  --cpu             force the CPU backend (default: whatever jax has)
  --program N       split the B sims into N-lane programs (N=B: one)
  --stage S         pipeline (default) | guess (image set + moments
                    guesses only — the round-3 corruption site)

Identical inputs on every backend: sims are rendered once by `gen` on
CPU and loaded from npz, so any per-lane difference is the pipeline's.
"""
import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

SIMS = "/root/repo/tools/tpu_logs/diag_sims_{mode}_{B}.npz"


def _conf():
    from ngmix_tpu.batch import MetacalConfig
    import bench

    return MetacalConfig(
        dims=bench.DIMS, psf_dims=bench.PSF_DIMS,
        jac=(bench.SCALE, 0.0, 0.0, bench.SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )


def gen(B, mode):
    import bench

    key = jax.random.PRNGKey(314 if mode == "hom" else 271)
    if mode == "hom":
        args = bench.make_sim_batch(key, B)
    else:
        args = bench.make_sim_batch_hetero(key, B)
    names = ["imgs", "weights", "cens", "pimgs", "pcens", "noise"]
    np.savez(
        SIMS.format(mode=mode, B=B),
        **{n: np.asarray(a) for n, a in zip(names, args)},
    )
    print("wrote", SIMS.format(mode=mode, B=B))


def load_sims(B, mode):
    d = np.load(SIMS.format(mode=mode, B=B))
    return tuple(
        jnp.asarray(d[n])
        for n in ["imgs", "weights", "cens", "pimgs", "pcens", "noise"]
    )


def run(B, mode, tag, program, stage):
    import time

    from ngmix_tpu.batch import make_metacal_pipeline_fn

    args = load_sims(B, mode)
    conf = _conf()

    out = {}
    if stage == "pipeline":
        fn = make_metacal_pipeline_fn(
            conf, measure="exp-lm", max_chunk=program if program < B else None
        )
        t0 = time.time()
        res = fn(*args)
        res = jax.tree.map(np.asarray, res)
        dt = time.time() - t0
        for t, r in res.items():
            if t == "psf_sigma":
                continue
            for k in ("pars", "flags", "e1", "e2", "s2n", "nfev", "ier",
                      "cost", "s_sq"):
                if k in r:
                    out[f"{t}.{k}"] = np.asarray(r[k])
        print(f"ran pipeline B={B} program={program} in {dt:.1f}s")
    elif stage == "guess":
        out = run_guess_stage(args, conf, program)
    else:
        raise SystemExit("bad --stage " + stage)

    path = f"/root/repo/tools/tpu_logs/diag_{tag}.npz"
    np.savez(path, **out)
    print("wrote", path)
    # quick m summary if this was a full pipeline run
    if stage == "pipeline":
        print_m(out)


def run_guess_stage(args, conf, program):
    """image set + fixnoise + pixels + moments guesses, chunked into
    `program`-lane programs — the sub-pipeline where round 3's
    miscompile corrupted lanes."""
    from ngmix_tpu.batch import (
        _moments_lm_guess,
        make_pixels_batch,
        metacal_image_set,
        prepare_psf_kdata,
    )

    types_cell = []

    @jax.jit
    def stage_fn(images, weights, cens, psf_images, psf_cens, noise):
        psfdata = prepare_psf_kdata(psf_images, psf_cens, conf)
        fh, fw = conf.fit_dims
        crop = (
            (conf.dims[0] - fh) // 2, (conf.dims[1] - fw) // 2, fh, fw
        )
        odict, sigma = metacal_image_set(
            images, cens, psf_images, psf_cens, conf, psfdata=psfdata,
            crop=crop,
        )
        cen_c = jnp.full_like(cens, (conf.dims[0] - 1) / 2.0)
        noise_rot = jnp.rot90(noise, k=1, axes=(-2, -1))
        ndict, _ = metacal_image_set(
            noise_rot, cen_c, psf_images, psf_cens, conf, psfdata=psfdata,
            crop=crop,
        )
        for t in odict:
            odict[t] = odict[t] + jnp.rot90(ndict[t], k=3, axes=(-2, -1))
        weights = weights * 0.5

        types = list(odict.keys())
        ims_all = jnp.concatenate([odict[t] for t in types], axis=0)
        wt_all = jnp.tile(weights, (len(types), 1, 1))
        cens_all = jnp.tile(cens, (len(types), 1))
        r0, c0 = crop[0], crop[1]
        wt_all = wt_all[:, r0:r0 + fh, c0:c0 + fw]
        cens_all = cens_all - jnp.asarray([r0, c0], cens_all.dtype)
        conf_fit = conf._replace(dims=(fh, fw))
        pixels = make_pixels_batch(ims_all, wt_all, cens_all, conf_fit)
        dilation = 1.0 + 2.0 * conf.step
        sig_d = sigma * dilation
        Tpsf = jnp.tile(2.0 * sig_d**2, (len(types),))
        guess5, wsum = _moments_lm_guess(pixels, Tpsf)
        if not types_cell:
            types_cell.extend(types)
        return {
            "guess5": guess5, "wsum": wsum,
            "ims_sum": jnp.sum(ims_all, axis=(-2, -1)),
        }

    B = args[0].shape[0]
    parts = []
    for i in range(0, B, program):
        r = stage_fn(*[a[i:i + program] for a in args])
        parts.append(jax.tree.map(np.asarray, r))
    types = list(types_cell)
    ntype = len(types)
    out = {}
    for k in parts[0]:
        # each part is [ntype*chunk, ...]; reassemble per type
        for ti, t in enumerate(types):
            segs = []
            for p, i in zip(parts, range(0, B, program)):
                c = p[k].shape[0] // ntype
                segs.append(p[k][ti * c:(ti + 1) * c])
            out[f"{t}.{k}"] = np.concatenate(segs, axis=0)
    return out


def print_m(out):
    import bench

    need = ["noshear.e1", "1p.e1", "1m.e1"]
    if not all(k in out for k in need):
        return
    ok = {
        t: out[f"{t}.flags"] == 0
        for t in ("noshear", "1p", "1m")
        if f"{t}.flags" in out
    }
    sel = np.ones(out["noshear.e1"].shape[0], bool)
    for v in ok.values():
        sel &= v
    e1 = out["noshear.e1"][sel].mean()
    R11 = (out["1p.e1"][sel].mean() - out["1m.e1"][sel].mean()) / 0.02
    m = (e1 / R11) / bench.SHEAR_TRUE - 1.0
    print(
        f"m = {m:.3e}  R11={R11:.4f}  n_ok={sel.sum()}/{sel.size}  "
        f"nbad_flags={int((~sel).sum())}"
    )


def cmp(pa, pb):
    a = np.load(pa)
    b = np.load(pb)
    keys = sorted(set(a.files) & set(b.files))
    bad_lanes = set()
    for k in keys:
        xa, xb = a[k], b[k]
        if xa.shape != xb.shape:
            print(f"{k}: SHAPE {xa.shape} vs {xb.shape}")
            continue
        if xa.dtype.kind in "iu":
            neq = xa != xb
            n = int(np.sum(neq))
            if n:
                idx = np.unique(np.nonzero(neq)[0])
                bad_lanes |= set(idx.tolist())
                print(f"{k}: {n} int mismatches, lanes {idx[:10]}…")
            continue
        d = np.abs(xa - xb)
        scale = np.maximum(np.abs(xa), np.abs(xb)) + 1e-3
        rel = d / scale
        gross = rel > 1e-2
        n = int(np.sum(gross))
        print(
            f"{k}: max_rel={rel.max():.2e} n_gross(>1e-2)={n}"
        )
        if n:
            idx = np.unique(np.nonzero(gross)[0])
            bad_lanes |= set(idx.tolist())
            print(f"   gross lanes: {sorted(idx.tolist())[:20]}…"
                  f" ({idx.size} lanes)")
    if bad_lanes:
        sl = sorted(bad_lanes)
        print(f"TOTAL gross lanes: {len(sl)}; first 40: {sl[:40]}")
    else:
        print("NO gross per-lane differences")
    for tag, x in (("A", a), ("B", b)):
        if "noshear.e1" in x.files:
            print(f"--- m[{tag}] ({tag=='A' and pa or pb})")
            print_m({k: x[k] for k in x.files})


def main():
    cmdargs = [x for x in sys.argv[1:] if not x.startswith("--")]
    cmd = cmdargs[0]
    if cmd == "gen":
        gen(int(cmdargs[1]), cmdargs[2])
    elif cmd == "run":
        B = int(cmdargs[1])
        program = B
        stage = "pipeline"
        if "--program" in sys.argv:
            program = int(sys.argv[sys.argv.index("--program") + 1])
        if "--stage" in sys.argv:
            stage = sys.argv[sys.argv.index("--stage") + 1]
        run(B, cmdargs[2], cmdargs[3], program, stage)
    elif cmd == "cmp":
        cmp(cmdargs[1], cmdargs[2])
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
