"""Pallas TPU kernel for batched gaussian-mixture evaluation.

The hot op of the measurement family (render / loglike / moment
weights / EM responsibilities) is

    model[b, p] = area * sum_i pnorm[b,i] *
                  exp(-chi2[b,i,p]/2) * window(chi2)

an elementwise VPU workload over [B, n, npix]. XLA fuses the jnp
broadcast version well; this kernel removes the [B, n, npix]
intermediate entirely by accumulating over the (small, unrolled)
gaussian axis inside VMEM tiles, halving HBM traffic for large
batches. Used in the non-AD paths (the LM objective keeps the jnp
version for jacfwd).

Enable with use_pallas=True (TPU backends only; other backends and
unsupported shapes fall back to the jnp implementation in gmix.core).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..defaults import FASTEXP_APOD_CHI2, FASTEXP_MAX_CHI2, GMIX_LOW_DETVAL

_APOD_IWIDTH = 1.0 / (FASTEXP_MAX_CHI2 - FASTEXP_APOD_CHI2)


def _have_pallas_tpu():
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _eval_kernel_body(n, fast):
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(gmix_ref, v_ref, u_ref, area_ref, out_ref):
        v = v_ref[:]
        u = u_ref[:]
        acc = jnp.zeros_like(v)
        gm = gmix_ref[:]  # [TB, n, 6]
        for i in range(n):
            p = gm[:, i, 0][:, None]
            row = gm[:, i, 1][:, None]
            col = gm[:, i, 2][:, None]
            irr = gm[:, i, 3][:, None]
            irc = gm[:, i, 4][:, None]
            icc = gm[:, i, 5][:, None]

            det = irr * icc - irc * irc
            T = irr + icc
            valid = (det > GMIX_LOW_DETVAL) & (T > 0)
            idet = 1.0 / jnp.where(valid, det, 1.0)
            drr = irr * idet
            drc = irc * idet
            dcc = icc * idet
            pnorm = jnp.where(
                valid,
                p / (2 * np.pi * jnp.sqrt(jnp.where(valid, det, 1.0))),
                0.0,
            )

            vd = v - row
            ud = u - col
            chi2 = dcc * vd * vd + drr * ud * ud - 2.0 * drc * vd * ud
            if fast:
                t = (FASTEXP_MAX_CHI2 - chi2) * _APOD_IWIDTH
                win = t * t * t * (10.0 + t * (-15.0 + 6.0 * t))
                win = jnp.where(chi2 > FASTEXP_APOD_CHI2, win, 1.0)
                win = jnp.where(
                    (chi2 < FASTEXP_MAX_CHI2) & (chi2 >= 0.0), win, 0.0
                )
                val = (
                    jnp.exp(-0.5 * jnp.clip(chi2, 0.0, FASTEXP_MAX_CHI2))
                    * win
                )
            else:
                val = jnp.exp(-0.5 * chi2)
            acc = acc + pnorm * val
        out_ref[:] = acc * area_ref[:]

    return kernel


@partial(jax.jit, static_argnames=("fast", "tile_b", "tile_p", "interpret"))
def eval_gmix_pallas(gmix, v, u, area, fast=True, tile_b=8, tile_p=512,
                     interpret=False):
    """Pallas evaluation over [B, npix] pixel grids.

    gmix [B, n, 6]; v/u/area [B, npix] (area may be scalar). Shapes are
    padded up to tile multiples internally.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = gmix.shape
    P = v.shape[-1]
    area = jnp.broadcast_to(jnp.asarray(area, v.dtype), v.shape)

    Bp = int(np.ceil(B / tile_b) * tile_b)
    Pp = int(np.ceil(P / tile_p) * tile_p)

    def pad(x, shape):
        out = jnp.zeros(shape, x.dtype)
        return out.at[tuple(slice(0, s) for s in x.shape)].set(x)

    gmix_p = pad(gmix, (Bp, n, 6))
    # give padded lanes a valid unit gaussian with zero flux
    if Bp > B:
        filler = jnp.zeros((Bp - B, n, 6), gmix.dtype)
        filler = filler.at[..., 3].set(1.0).at[..., 5].set(1.0)
        gmix_p = gmix_p.at[B:].set(filler)
    v_p = pad(v, (Bp, Pp))
    u_p = pad(u, (Bp, Pp))
    a_p = pad(area, (Bp, Pp))

    grid = (Bp // tile_b, Pp // tile_p)
    out = pl.pallas_call(
        _eval_kernel_body(n, fast),
        out_shape=jax.ShapeDtypeStruct((Bp, Pp), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, n, 6), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, tile_p), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, tile_p), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, tile_p), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, tile_p), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(gmix_p, v_p, u_p, a_p)
    return out[:B, :P]


def eval_gmix_auto(gmix, v, u, area=1.0, fast=True, use_pallas=False):
    """dispatch between the Pallas kernel and the jnp implementation"""
    from ..gmix import core as gcore

    if (
        use_pallas
        and _have_pallas_tpu()
        and gmix.ndim == 3
        and v.ndim == 2
    ):
        return eval_gmix_pallas(gmix, v, u, area, fast=fast)
    return gcore.eval_gmix(gmix, v, u, area, fast=fast)
