"""Pallas TPU kernel for the LM normal equations of a gmix model fit.

Each Levenberg-Marquardt iteration needs (cost, J^T r, J^T J) of the
apodized objective at the candidate parameters. The AD path
(jax.linearize of fill_fdiff) materializes [B, n, npix] residual and
tangent intermediates in HBM ~7 times per iteration; this kernel does
one pass over the pixels per iteration, everything resident in VMEM,
emitting only the 1+6+36 reduction values per stamp.

Measured reality check (TPU v5e, B=5120, P=625, n=6): this kernel runs
at 7.3 ms/iteration while the ENTIRE AD iteration (linearize + both
reductions, XLA-fused) takes 8.2 ms - the ~216 per-lane
scalar-broadcast FMAs of the chain application compile poorly in
Mosaic, and the op count is irreducible for a dense
6-gaussian -> 6-parameter mixing however the sums are reorganized. It
is therefore OFF by default (batch._exp_lm_measure use_pallas=False);
its O(B*P) HBM footprint - no [B, n, npix] intermediates - makes it
the right tool only when batch * pixels presses HBM capacity.

The trick that keeps the kernel model-agnostic is a reparameterization.
For each gaussian of the (psf-convolved) mixture define

    q = (N, row, col, Fvv, Fvu, Fuu)

with N = p / (2 pi sqrt(det)) the peak-normalized amplitude and F the
inverse covariance, so the pixel value is

    val = N * exp(-chi2 / 2) * window(chi2) * area,
    chi2 = Fvv dv^2 + 2 Fvu dv du + Fuu du^2.

d val / d q is closed-form in-register (the role of the reference's
analytic per-pixel derivative kernels, ngmix/fitting/derivs_nb.py), and
the chain matrix C[g] = d q[g] / d pars is the jacfwd of the (tiny)
fill + convolve + reparam map, evaluated outside the kernel - exact AD,
so the jacobian agrees with the pure-AD path to rounding.

The derivative of the objective includes the apodization window term
(window' - window/2), matching jacfwd through eval_gmix exactly.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..defaults import FASTEXP_APOD_CHI2, FASTEXP_MAX_CHI2, GMIX_LOW_DETVAL

_APOD_IWIDTH = 1.0 / (FASTEXP_MAX_CHI2 - FASTEXP_APOD_CHI2)

# packed output layout per lane: [cost, Jtr(6), JtJ(36)] padded to 128
_NOUT = 1 + 6 + 36


def gmix_reparam(gmix):
    """[..., n, 6] (p,row,col,irr,irc,icc) -> (N,row,col,Fvv,Fvu,Fuu).

    AD-safe: invalid gaussians (det or T at/below the floor) get a unit
    inverse covariance and N = 0, so downstream evaluation stays finite;
    the caller must reject such parameter points via gmix_flags.
    """
    p = gmix[..., 0]
    row = gmix[..., 1]
    col = gmix[..., 2]
    irr = gmix[..., 3]
    irc = gmix[..., 4]
    icc = gmix[..., 5]
    det = irr * icc - irc * irc
    T = irr + icc
    valid = (det > GMIX_LOW_DETVAL) & (T > 0)
    det_s = jnp.where(valid, det, 1.0)
    idet = 1.0 / det_s
    N = jnp.where(valid, p / (2.0 * np.pi * jnp.sqrt(det_s)), 0.0)
    Fvv = jnp.where(valid, icc * idet, 1.0)
    Fvu = jnp.where(valid, -irc * idet, 0.0)
    Fuu = jnp.where(valid, irr * idet, 1.0)
    return jnp.stack([N, row, col, Fvv, Fvu, Fuu], axis=-1)


def _normal_kernel_body(n):
    def kernel(rp_ref, ch_ref, v_ref, u_ref, ia_ref, ve_ref, out_ref):
        v = v_ref[:]
        u = u_ref[:]
        ia = ia_ref[:]   # ierr * area
        ve = ve_ref[:]   # val * ierr
        rp = rp_ref[:]   # [TB, n, 6]
        ch = ch_ref[:]   # [TB, n, 6, 6]  d q[g, j] / d pars[k]

        f = jnp.zeros_like(v)
        J = [jnp.zeros_like(v) for _ in range(6)]
        for g in range(n):
            N = rp[:, g, 0][:, None]
            row = rp[:, g, 1][:, None]
            col = rp[:, g, 2][:, None]
            Fvv = rp[:, g, 3][:, None]
            Fvu = rp[:, g, 4][:, None]
            Fuu = rp[:, g, 5][:, None]

            dv = v - row
            du = u - col
            gv = Fvv * dv + Fvu * du
            gu = Fvu * dv + Fuu * du
            chi2 = gv * dv + gu * du

            t = (FASTEXP_MAX_CHI2 - chi2) * _APOD_IWIDTH
            win = t * t * t * (10.0 + t * (-15.0 + 6.0 * t))
            tmt = t * (1.0 - t)
            dwin = -30.0 * tmt * tmt * _APOD_IWIDTH
            inwin = (chi2 < FASTEXP_MAX_CHI2) & (chi2 >= 0.0)
            hot = chi2 > FASTEXP_APOD_CHI2
            win = jnp.where(hot, win, 1.0)
            win = jnp.where(inwin, win, 0.0)
            dwin = jnp.where(hot & inwin, dwin, 0.0)

            e = jnp.exp(-0.5 * jnp.clip(chi2, 0.0, FASTEXP_MAX_CHI2))
            mw = e * win
            f = f + N * mw
            # d(N e(chi2) w(chi2)) / d chi2
            c = N * e * (dwin - 0.5 * win)

            d0 = mw                    # d/dN
            d1 = -2.0 * c * gv         # d/drow
            d2 = -2.0 * c * gu         # d/dcol
            d3 = c * dv * dv           # d/dFvv
            d4 = 2.0 * c * dv * du     # d/dFvu
            d5 = c * du * du           # d/dFuu
            dq = (d0, d1, d2, d3, d4, d5)
            for k in range(6):
                acc = J[k]
                for j in range(6):
                    acc = acc + ch[:, g, j, k][:, None] * dq[j]
                J[k] = acc

        fd = f * ia - ve
        Jw = [Jk * ia for Jk in J]

        cols = [jnp.sum(fd * fd, axis=-1)]
        for k in range(6):
            cols.append(jnp.sum(Jw[k] * fd, axis=-1))
        for k in range(6):
            for m in range(6):
                cols.append(jnp.sum(Jw[k] * Jw[m], axis=-1))
        packed = jnp.stack(cols, axis=-1)  # [TB, 43]
        pad = out_ref.shape[-1] - packed.shape[-1]
        out_ref[:] = jnp.pad(packed, ((0, 0), (0, pad)))

    return kernel


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def gmix_normal_eqs_pallas(rp, chain, v, u, ia, ve, tile_b=16,
                           interpret=False):
    """Normal-equation reductions for a batch of gmix model fits.

    Parameters
    ----------
    rp : [B, n, 6] reparameterized mixtures (gmix_reparam output)
    chain : [B, n, 6, 6] d rp[g, j] / d pars[k]
    v, u : [B, P] pixel coordinates
    ia : [B, P] pixels.ierr * pixels.area
    ve : [B, P] pixels.val * pixels.ierr

    Returns
    -------
    cost [B], Jtr [B, 6], JtJ [B, 6, 6] of the apodized chi^2 objective
    sum(((model - val) * ierr)^2) w.r.t. the 6 model parameters.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = rp.shape
    P = v.shape[-1]
    dtype = v.dtype

    Bp = int(np.ceil(B / tile_b) * tile_b)
    Pp = int(np.ceil(P / 128) * 128)

    def pad(x, shape):
        # no-op when already aligned, so iteration-invariant inputs
        # padded by the caller cost nothing inside a solver loop
        if x.shape == shape:
            return x
        out = jnp.zeros(shape, x.dtype)
        return out.at[tuple(slice(0, s) for s in x.shape)].set(x)

    rp_p = pad(rp, (Bp, n, 6))
    if Bp > B:
        # padded lanes: unit inverse covariance, zero amplitude
        filler = jnp.zeros((Bp - B, n, 6), rp.dtype)
        filler = filler.at[..., 3].set(1.0).at[..., 5].set(1.0)
        rp_p = rp_p.at[B:].set(filler)
    ch_p = pad(chain, (Bp, n, 6, 6))
    v_p = pad(v, (Bp, Pp))
    u_p = pad(u, (Bp, Pp))
    ia_p = pad(ia, (Bp, Pp))
    ve_p = pad(ve, (Bp, Pp))

    grid = (Bp // tile_b,)
    plane = pl.BlockSpec(
        (tile_b, Pp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _normal_kernel_body(n),
        out_shape=jax.ShapeDtypeStruct((Bp, 128), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, n, 6), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, n, 6, 6), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            plane, plane, plane, plane,
        ],
        out_specs=pl.BlockSpec(
            (tile_b, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(rp_p, ch_p, v_p, u_p, ia_p, ve_p)

    out = out[:B]
    cost = out[:, 0]
    Jtr = out[:, 1:7]
    JtJ = out[:, 7:43].reshape(B, 6, 6)
    return cost, Jtr, JtJ
