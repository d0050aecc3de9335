"""Pixel structs: static-shape, masked device arrays.

TPU re-design of ngmix/pixels/pixels_nb.py:7-94. The reference compacts
each stamp to a ragged 1-d array of positive-weight pixels; XLA needs
static shapes, so here every stamp keeps its full H*W pixel grid and
zero/negative-weight pixels are masked by setting ierr = 0. All kernels
treat ierr == 0 as "pixel absent".
"""
from typing import NamedTuple

import jax.numpy as jnp

from .jacobian import Jac


class Coords(NamedTuple):
    """tangent-plane coordinate grid; all [..., npix]"""

    v: jnp.ndarray
    u: jnp.ndarray
    area: jnp.ndarray


class Pixels(NamedTuple):
    """pixel struct; all fields [..., npix]"""

    v: jnp.ndarray
    u: jnp.ndarray
    area: jnp.ndarray
    val: jnp.ndarray
    ierr: jnp.ndarray

    @property
    def coords(self):
        return Coords(self.v, self.u, self.area)

    @property
    def mask(self):
        return self.ierr > 0


def grid_rowcol(dims, dtype=None):
    """flat (row, col) index grids [H*W] for a stamp of shape dims"""
    nrow, ncol = dims
    rows = jnp.arange(nrow, dtype=dtype)
    cols = jnp.arange(ncol, dtype=dtype)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    return rr.reshape(-1), cc.reshape(-1)


def make_coords(dims, jac: Jac):
    """coordinate grid for rendering (ref: pixels_nb.py:62-94).

    dims is static (H, W); jac fields may carry leading batch dims,
    which broadcast against the [npix] grids.
    """
    rows, cols = grid_rowcol(dims)
    v, u = jac.get_vu(
        rows + jnp.zeros_like(jnp.asarray(jac.row0)[..., None]),
        cols + jnp.zeros_like(jnp.asarray(jac.col0)[..., None]),
    )
    area = jnp.broadcast_to(jnp.asarray(jac.area)[..., None], v.shape)
    return Coords(v, u, area)


def make_pixels(image, weight, jac: Jac, ignore_zero_weight=True):
    """image [..., H, W] + weight + jacobian -> Pixels [..., H*W].

    ref behavior: pixels_nb.py:7-58; compaction is replaced by masking
    (ierr = 0 where weight <= 0). If ignore_zero_weight is False the
    pixels keep ierr = 0 but are NOT masked out of coordinate grids
    (identical here since nothing is dropped).
    """
    image = jnp.asarray(image)
    dims = image.shape[-2:]
    coords = make_coords(dims, jac)
    val = image.reshape(image.shape[:-2] + (-1,))
    w = jnp.asarray(weight).reshape(val.shape)
    ierr = jnp.sqrt(jnp.clip(w, 0.0, None))
    del ignore_zero_weight
    v = jnp.broadcast_to(coords.v, val.shape)
    u = jnp.broadcast_to(coords.u, val.shape)
    area = jnp.broadcast_to(coords.area, val.shape)
    return Pixels(v=v, u=u, area=area, val=val, ierr=ierr)
