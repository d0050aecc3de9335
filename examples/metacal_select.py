"""Metacalibration with object selection (the analog of the
reference's examples/metacal/metacal_select.py).

Selections (an s/n cut at moderate s/n here) bias the mean shear
because the cut correlates with the sheared measurements; the selection
response
R_sel corrects it: the selection derived from each sheared catalog is
applied to the NOSHEAR ellipticities (Sheldon & Huff 2017). This
example runs the batched TPU pipeline on stamps with a spread of
fluxes, applies a cut at the median s/n, and recovers the shear with
(R + R_sel)^-1.

Run:  python examples/metacal_select.py [batch]
"""
import sys

import jax

# this is a BATCHED pipeline demo: run on the default accelerator.
# x64 only on cpu (the TPU pipeline is validated in f32; x64 there
# would run emulated)
if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ngmix_tpu.batch import (
    MetacalConfig,
    make_metacal_pipeline_fn,
    shear_response_select,
    shear_response_select_consistent,
)
from ngmix_tpu.gmix import core as gcore

SCALE = 0.263
DIMS = (49, 49)
PSF_DIMS = (25, 25)
SHEAR = 0.02
NOISE = 0.04


def make_sims(rng, B):
    """exp galaxies with a 10x flux spread so an s/n cut selects"""
    flux = rng.uniform(15.0, 40.0, B)
    pars = np.zeros((B, 6))
    pars[:, 4] = 0.5
    pars[:, 5] = flux
    gal, _ = gcore.fill_exp(jnp.asarray(pars))
    gal = gcore.gmix_get_sheared(gal, SHEAR, 0.0)
    psf, _ = gcore.fill_turb(jnp.asarray([0.0, 0.0, 0.02, -0.01, 0.27, 1.0]))
    conv = gcore.gmix_convolve(gal, jnp.broadcast_to(psf, (B, 3, 6)))

    cens = np.full((B, 2), (DIMS[0] - 1) / 2.0) + rng.uniform(-0.5, 0.5, (B, 2))
    rr, cc = np.meshgrid(np.arange(DIMS[0]), np.arange(DIMS[1]), indexing="ij")
    v = (rr.reshape(-1)[None, :] - cens[:, :1]) * SCALE
    u = (cc.reshape(-1)[None, :] - cens[:, 1:]) * SCALE
    imgs = np.array(
        gcore.eval_gmix(conv, jnp.asarray(v), jnp.asarray(u), SCALE**2, fast=False)
    ).reshape(B, *DIMS)
    imgs += rng.normal(size=imgs.shape) * NOISE

    pcen = np.full(2, (PSF_DIMS[0] - 1) / 2.0)
    prr, pcc = np.meshgrid(np.arange(PSF_DIMS[0]), np.arange(PSF_DIMS[1]), indexing="ij")
    pv = (prr.reshape(-1) - pcen[0]) * SCALE
    pu = (pcc.reshape(-1) - pcen[1]) * SCALE
    pimg = np.array(
        gcore.eval_gmix(psf, jnp.asarray(pv), jnp.asarray(pu), SCALE**2, fast=False)
    ).reshape(PSF_DIMS)

    return (
        jnp.asarray(imgs),
        jnp.full((B,) + DIMS, 1 / NOISE**2),
        jnp.asarray(cens),
        jnp.broadcast_to(jnp.asarray(pimg), (B,) + PSF_DIMS),
        jnp.broadcast_to(jnp.asarray(pcen), (B, 2)),
        jnp.asarray(rng.normal(size=(B,) + DIMS) * NOISE),
    )


def main(B=4000):
    rng = np.random.RandomState(31415)
    args = make_sims(rng, B)
    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0.0, 0.0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    # jitted: eager complex ops (fft) are unimplemented on some
    # accelerator backends, and this is the fast path anyway
    res = make_metacal_pipeline_fn(conf, measure="gaussmom")(*args)

    s2n_cut = float(np.median(np.asarray(res["noshear"]["s2n"])))

    def select(r):
        return r["s2n"] > s2n_cut

    nokeep = int(np.sum(np.asarray(select(res["noshear"]))))
    print("s2n cut: %.1f  kept %d/%d" % (s2n_cut, nokeep, B))

    sr = shear_response_select(res, select)

    # statistical uncertainty of the mean shear (dominates at this
    # batch size; the selection response is a ~1e-3-level correction
    # that needs ~1e6+ stamps to resolve - this example demonstrates
    # the estimator, like the reference's, not a detection)
    ok = np.asarray(
        (res["noshear"]["flags"] == 0) & select(res["noshear"])
    )
    e1 = np.asarray(res["noshear"]["e1"])[ok]
    sig = e1.std() / np.sqrt(e1.size) / float(sr["R"][0, 0])

    naive = np.asarray(
        jnp.linalg.solve(sr["R"], sr["e_mean"])
    )
    print("R11 = %.4f  R_sel,11 = %.5f" % (sr["R"][0, 0], sr["R_sel"][0, 0]))
    print("naive (no R_sel):  shear = %.5f" % naive[0])
    print(
        "with R_sel:        shear = %.5f +/- %.5f (99.7%%)  [true %.3f]"
        % (float(sr["shear"][0]), 3 * sig, SHEAR)
    )

    # the shear-consistent estimator (each type selected by its own
    # catalog; the selection response is absorbed into R) - preferred
    # at survey noise, where the two-term split's cross-type flag
    # intersections bias m at the ~1e-3 level (see
    # shear_response_select_consistent's docstring)
    src = shear_response_select_consistent(res, select)
    print(
        "consistent-sel:    shear = %.5f (R11 = %.4f)"
        % (float(src["shear"][0]), float(src["R"][0, 0]))
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000)
