"""Ragged survey catalogs under static XLA shapes: size bucketing.

The reference handles arbitrary per-object stamp sizes and epoch
counts by compacting each observation into its own pixel list
(ngmix/observation.py:814-830) and looping objects in python. XLA
needs static shapes, so the TPU design (SURVEY 2.3, hard part #3)
replaces compaction with *bucketing + masking*:

- objects are grouped into stamp-size buckets; each bucket runs the
  batched metacal pipeline as one jit with that bucket's static dims
  (a handful of compilations for a whole survey);
- smaller stamps inside a bucket are zero-padded with zero WEIGHT, so
  the pad pixels carry ierr=0 and drop out of every measurement (the
  mask plays the role of the reference's pixel compaction);
- objects with fewer epochs than their bucket's maximum get pad
  epochs: zero image, zero weight (zero residual rows and zero
  normal-equation contributions - exact, since x + 0 = x), and a
  copy of a real epoch's psf stamp so the k-space engine stays finite;
- results are scattered back to catalog order.

Entry points: pack_ragged (grouping + padding) and
metacal_pipeline_ragged (per-bucket pipeline + reassembly).
"""
import logging

import numpy as np

import jax.numpy as jnp

from .batch import MetacalConfig, metacal_pipeline, metacal_pipeline_mb

__all__ = ["pack_ragged", "metacal_pipeline_ragged"]

logger = logging.getLogger(__name__)


def _as_epoch_list(x):
    """normalize a bare [H, W] array or a list of epoch arrays to a list"""
    if isinstance(x, (list, tuple)):
        return list(x)
    x = np.asarray(x)
    if x.ndim == 3:
        return [x[i] for i in range(x.shape[0])]
    return [x]


def _normalize_object(obj):
    """one catalog entry -> per-epoch lists with consistent lengths.

    Accepted keys: image/weight/cen/psf_image/psf_cen and optional
    noise/band; single-epoch entries may use bare arrays, multi-epoch
    entries lists (or stacked [E, ...] arrays). All epochs of one
    object must share a stamp size (MEDS cutouts do).
    """
    images = _as_epoch_list(obj["image"])
    weights = _as_epoch_list(obj["weight"])
    psf_images = _as_epoch_list(obj["psf_image"])
    nepoch = len(images)

    cens = np.atleast_2d(np.asarray(obj["cen"], dtype=float))
    psf_cens = np.atleast_2d(np.asarray(obj["psf_cen"], dtype=float))
    if cens.shape[0] == 1:
        cens = np.repeat(cens, nepoch, axis=0)
    if psf_cens.shape[0] == 1:
        psf_cens = np.repeat(psf_cens, nepoch, axis=0)

    if "noise" in obj and obj["noise"] is not None:
        noises = _as_epoch_list(obj["noise"])
    else:
        noises = [np.zeros_like(np.asarray(im)) for im in images]
    band = np.atleast_1d(
        np.asarray(obj.get("band", 0), dtype=np.int32)
    )
    if band.shape[0] == 1:
        band = np.repeat(band, nepoch)

    dims = {np.asarray(im).shape for im in images}
    if len(dims) != 1:
        raise ValueError(
            "all epochs of one object must share a stamp size; got %s"
            % sorted(dims)
        )
    if not (
        len(weights) == len(psf_images) == len(noises) == nepoch
        and cens.shape[0] == psf_cens.shape[0] == band.shape[0] == nepoch
    ):
        raise ValueError("inconsistent epoch counts within one object")
    return dict(
        images=images, weights=weights, cens=cens,
        psf_images=psf_images, psf_cens=psf_cens, noises=noises,
        band=band, nepoch=nepoch, dims=next(iter(dims)),
    )


def _pad_stamp(img, dims, fill=0.0):
    """place a stamp at the top-left of a [dims] canvas (the pixel
    coordinate system - and so the center - is unchanged)"""
    img = np.asarray(img)
    out = np.full(dims, fill, dtype=img.dtype)
    out[: img.shape[0], : img.shape[1]] = img
    return out


def pack_ragged(catalog, bucket_dims=None):
    """group a ragged catalog into static-shape buckets.

    catalog: list of per-object dicts (see _normalize_object).
    bucket_dims: optional list of (H, W) bucket sizes; by default every
    distinct stamp size gets its own bucket (no pad waste, one compile
    per size). Pass 2-3 coarse sizes to trade pad FLOPs for fewer
    compilations. Each object lands in the smallest bucket that fits.

    Returns a list of bucket dicts with keys: indices [Bb] (catalog
    rows), dims, psf_dims, nepoch (bucket max), epoch_mask [Bb, E],
    and stacked arrays images/weights/cens/psf_images/psf_cens/noises
    [Bb, E, ...] plus band [Bb, E].
    """
    objs = [_normalize_object(o) for o in catalog]

    if bucket_dims is None:
        sizes = sorted({o["dims"] for o in objs})
    else:
        sizes = sorted(tuple(d) for d in bucket_dims)
        for o in objs:
            if not any(
                o["dims"][0] <= s[0] and o["dims"][1] <= s[1]
                for s in sizes
            ):
                raise ValueError(
                    "stamp %s fits no bucket in %s" % (o["dims"], sizes)
                )

    def bucket_of(dims):
        for s in sizes:
            if dims[0] <= s[0] and dims[1] <= s[1]:
                return s
        raise AssertionError

    groups = {}
    for idx, o in enumerate(objs):
        groups.setdefault(bucket_of(o["dims"]), []).append(idx)

    buckets = []
    for dims in sorted(groups):
        indices = groups[dims]
        members = [objs[i] for i in indices]
        E = max(o["nepoch"] for o in members)
        psf_dims = (
            max(np.asarray(o["psf_images"][0]).shape[0] for o in members),
            max(np.asarray(o["psf_images"][0]).shape[1] for o in members),
        )
        Bb = len(members)
        images = np.zeros((Bb, E) + dims)
        weights = np.zeros((Bb, E) + dims)
        noises = np.zeros((Bb, E) + dims)
        psf_images = np.zeros((Bb, E) + psf_dims)
        cens = np.zeros((Bb, E, 2))
        psf_cens = np.zeros((Bb, E, 2))
        band = np.zeros((Bb, E), np.int32)
        epoch_mask = np.zeros((Bb, E), bool)
        for row, o in enumerate(members):
            for e in range(E):
                src = min(e, o["nepoch"] - 1)
                real = e < o["nepoch"]
                epoch_mask[row, e] = real
                # pad epochs replicate a real epoch's psf (finite
                # k-ops) but carry zero image/weight/noise
                psf_images[row, e] = _pad_stamp(
                    o["psf_images"][src], psf_dims
                )
                psf_cens[row, e] = o["psf_cens"][src]
                cens[row, e] = o["cens"][src]
                band[row, e] = o["band"][src] if real else 0
                if real:
                    images[row, e] = _pad_stamp(o["images"][e], dims)
                    weights[row, e] = _pad_stamp(o["weights"][e], dims)
                    noises[row, e] = _pad_stamp(o["noises"][e], dims)
        buckets.append(
            dict(
                indices=np.asarray(indices), dims=dims,
                psf_dims=psf_dims, nepoch=E, epoch_mask=epoch_mask,
                images=images, weights=weights, cens=cens,
                psf_images=psf_images, psf_cens=psf_cens,
                noises=noises, band=band,
            )
        )
    return buckets


def metacal_pipeline_ragged(catalog, conf: MetacalConfig,
                            measure="gaussmom", nband=1,
                            bucket_dims=None, **measure_kw):
    """batched metacal over a ragged catalog: one jit per size bucket,
    results reassembled in catalog order.

    conf.dims / conf.psf_dims are overridden per bucket. ONE estimator
    runs over the whole catalog (matching the reference's one-fitter-
    per-run contract, ngmix/bootstrap.py:67-102): single-epoch
    single-band buckets take the flat pipeline, multi-epoch (or
    multi-band) buckets take the mb pipeline with the SAME ``measure``
    - LM measures become joint multi-epoch fits, gaussmom/admom pool
    the epochs' moment sums, and the pre-psf measures (pgauss/ksigma)
    raise on multi-epoch buckets rather than silently switching
    estimators.

    Returns {type: {key: [Ncat, ...] arrays}} in catalog order, plus
    "psf_sigma" as a per-object list (epoch counts differ) and
    "dropped_keys", the result columns that could not be merged across
    buckets (each is also warned about once; see below).
    """
    buckets = pack_ragged(catalog, bucket_dims=bucket_dims)
    ncat = sum(len(b["indices"]) for b in buckets)

    merged = None
    dropped = set()
    seen_keys = {}
    psf_sigma = [None] * ncat
    for b in buckets:
        conf_b = conf._replace(dims=b["dims"], psf_dims=b["psf_dims"])
        if b["nepoch"] == 1 and nband == 1:
            res = metacal_pipeline(
                jnp.asarray(b["images"][:, 0]),
                jnp.asarray(b["weights"][:, 0]),
                jnp.asarray(b["cens"][:, 0]),
                jnp.asarray(b["psf_images"][:, 0]),
                jnp.asarray(b["psf_cens"][:, 0]),
                jnp.asarray(b["noises"][:, 0]),
                conf_b, measure=measure, **measure_kw,
            )
        else:
            res = metacal_pipeline_mb(
                jnp.asarray(b["images"]),
                jnp.asarray(b["weights"]),
                jnp.asarray(b["cens"]),
                jnp.asarray(b["psf_images"]),
                jnp.asarray(b["psf_cens"]),
                jnp.asarray(b["noises"]),
                jnp.asarray(b["band"]), nband, conf_b,
                measure=measure, **measure_kw,
            )

        sig = np.asarray(res.pop("psf_sigma"))
        for row, idx in enumerate(b["indices"]):
            nep = int(b["epoch_mask"][row].sum())
            psf_sigma[idx] = (
                sig[row, :nep] if sig.ndim == 2 else sig[row]
            )

        if merged is None:
            merged = {
                t: {
                    k: _alloc_catalog(v, ncat)
                    for k, v in tres.items()
                    if hasattr(v, "shape")
                    and v.ndim >= 1
                    and v.shape[0] == len(b["indices"])
                }
                for t, tres in res.items()
            }
        # merge the COMMON table keys: a catalog can mix flat
        # (1-epoch) and multi-epoch buckets whose pipelines report
        # slightly different key sets (e.g. flat [6] pars vs mb
        # [5+nband]); keys missing from (or shape-incompatible with)
        # any bucket are dropped from the catalog table - loudly, and
        # recorded in the returned "dropped_keys" so callers can
        # detect the reduced schema
        for t, tres in res.items():
            # track every column any bucket reports: the merged schema
            # is seeded from the FIRST bucket, so a column that only
            # later buckets produce must still end up in dropped_keys
            # rather than vanishing without a trace
            for k, v in tres.items():
                if (
                    hasattr(v, "shape") and v.ndim >= 1
                    and v.shape[0] == len(b["indices"])
                ):
                    seen_keys.setdefault(t, set()).add(k)
            for k in list(merged[t]):
                v = tres.get(k)
                dst = merged[t][k]
                if (
                    v is None
                    or not hasattr(v, "shape")
                    or v.shape[1:] != dst.shape[1:]
                ):
                    if k not in dropped:
                        dropped.add(k)
                        logger.warning(
                            "metacal_pipeline_ragged: dropping result "
                            "column %r from the merged catalog: the "
                            "size buckets report it with inconsistent "
                            "shapes (or not at all); returned under "
                            "'dropped_keys'", k,
                        )
                    del merged[t][k]
                    continue
                dst[b["indices"]] = np.asarray(v)

    for t, keys in seen_keys.items():
        for k in sorted(keys - set(merged.get(t, {}))):
            if k not in dropped:
                dropped.add(k)
                logger.warning(
                    "metacal_pipeline_ragged: result column %r was "
                    "reported by some size buckets but not the first, "
                    "so it is absent from the merged catalog; "
                    "returned under 'dropped_keys'", k,
                )
    merged["psf_sigma"] = psf_sigma
    merged["dropped_keys"] = sorted(dropped)
    return merged


def _alloc_catalog(template, ncat):
    t = np.asarray(template)
    return np.zeros((ncat,) + t.shape[1:], t.dtype)
