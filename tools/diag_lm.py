"""Isolate the 6144-shape miscompile to (or away from) the LM solver.

gen (CPU): replicate metacal_pipeline up to the measurement inputs for
the saved hom sims at B=6144 — stacked pixels [5*6144=30720 lanes],
psf moments, and the moments-based guesses — and save them.

run NB tag [--cpu] [--nocascade] [--barrier]: load the stacked pixel
set, run _exp_lm_measure on the first NB lanes as ONE program, save
pars/nfev/ier/flags (+ the solver-visible guess).  Comparing
NB=30720 against NB=10240 slices over identical input bits tells
whether the solver alone reproduces the corruption.

cmp a b: per-lane diff over the common prefix.
"""
import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

PIX = "/root/repo/tools/tpu_logs/diag_lm_inputs.npz"


def gen():
    from diag_6144 import _conf, load_sims
    from ngmix_tpu.batch import (
        make_pixels_batch,
        metacal_image_set,
        prepare_psf_kdata,
    )

    args = load_sims(6144, "hom")
    images, weights, cens, psf_images, psf_cens, noise = args
    conf = _conf()

    @jax.jit
    def stage(images, weights, cens, psf_images, psf_cens, noise):
        psfdata = prepare_psf_kdata(psf_images, psf_cens, conf)
        fh, fw = conf.fit_dims
        crop = ((conf.dims[0] - fh) // 2, (conf.dims[1] - fw) // 2, fh, fw)
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
        psf_moms = jnp.tile(
            jnp.stack(
                [sig_d**2, jnp.zeros_like(sig_d), sig_d**2], axis=-1
            ),
            (len(types), 1),
        )
        return pixels, psf_moms

    pixels, psf_moms = stage(*args)
    np.savez(
        PIX,
        v=np.asarray(pixels.v), u=np.asarray(pixels.u),
        area=np.asarray(pixels.area), val=np.asarray(pixels.val),
        ierr=np.asarray(pixels.ierr), psf_moms=np.asarray(psf_moms),
    )
    print("wrote", PIX, "lanes:", pixels.val.shape)


def run(NB, tag, cascade=True, barrier=False):
    import time

    from ngmix_tpu.batch import _exp_lm_measure
    from ngmix_tpu.fitting.lm import LMConf
    from ngmix_tpu.pixels import Pixels

    d = np.load(PIX)
    pixels = Pixels(
        v=jnp.asarray(d["v"][:NB]), u=jnp.asarray(d["u"][:NB]),
        area=jnp.asarray(d["area"][:NB]), val=jnp.asarray(d["val"][:NB]),
        ierr=jnp.asarray(d["ierr"][:NB]),
    )
    psf_moms = jnp.asarray(d["psf_moms"][:NB])

    kw = {}
    if not cascade:
        kw["compact_capacity"] = None

    @jax.jit
    def fn(px, pm):
        return _exp_lm_measure(px, pm, LMConf(), **kw)

    t0 = time.time()
    res = fn(pixels, psf_moms)
    res = jax.tree.map(np.asarray, res)
    dt = time.time() - t0
    out = {
        k: np.asarray(res[k])
        for k in ("pars", "flags", "nfev", "ier", "e1", "e2", "cost")
        if k in res
    }
    path = f"/root/repo/tools/tpu_logs/diaglm_{tag}.npz"
    np.savez(path, **out)
    nf = out["nfev"]
    print(
        f"NB={NB} cascade={cascade} {dt:.1f}s  nfev mean={nf.mean():.2f} "
        f"p50={np.median(nf):.0f} max={nf.max()}  "
        f"ier hist={np.bincount(out['ier'], minlength=6).tolist()}  "
        f"nbad={int((out['flags'] != 0).sum())}"
    )
    print("wrote", path)


def cmp(pa, pb):
    a, b = np.load(pa), np.load(pb)
    n = min(a["pars"].shape[0], b["pars"].shape[0])
    d = np.abs(a["pars"][:n] - b["pars"][:n])
    scale = np.maximum(np.abs(a["pars"][:n]), np.abs(b["pars"][:n])) + 1e-3
    gross = (d / scale > 1e-2).any(axis=-1)
    print(f"common lanes {n}: gross-diff lanes {int(gross.sum())}")
    neq = a["nfev"][:n] != b["nfev"][:n]
    print(f"nfev mismatches: {int(neq.sum())}")
    if gross.sum():
        idx = np.nonzero(gross)[0]
        print("first lanes:", idx[:15].tolist())
        i = idx[0]
        print("A pars:", a["pars"][i], "nfev", a["nfev"][i], "ier", a["ier"][i])
        print("B pars:", b["pars"][i], "nfev", b["nfev"][i], "ier", b["ier"][i])


if __name__ == "__main__":
    cmdargs = [x for x in sys.argv[1:] if not x.startswith("--")]
    if cmdargs[0] == "gen":
        gen()
    elif cmdargs[0] == "run":
        run(
            int(cmdargs[1]), cmdargs[2],
            cascade="--nocascade" not in sys.argv,
            barrier="--barrier" in sys.argv,
        )
    elif cmdargs[0] == "cmp":
        cmp(cmdargs[1], cmdargs[2])
    else:
        raise SystemExit(__doc__)
