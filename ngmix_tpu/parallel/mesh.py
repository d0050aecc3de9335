"""Multi-chip scale-out: shard the stamp batch over a device mesh.

The workload is embarrassingly parallel at the object level (SURVEY
2.3): stamps shard over a 1-d mesh axis, each chip runs the identical
metacal+measure program on its slice, and only the O(1) calibration
statistics (per-type ellipticity sums and counts) cross chips as
explicit psums riding the ICI.

The pipeline body runs under shard_map rather than jit auto-sharding:
the batched LM's straggler compaction gathers lanes at data-dependent
indices, and under auto-sharding XLA would have to conservatively turn
those gathers into cross-chip collectives; shard_map pins them
shard-local by construction (each chip compacts its own lanes), which
is also bitwise-identical - compaction never changes per-lane results.

The reference has no distributed layer at all; it farms processes
externally. Here a 100k-stamp catalog on a v5e-8 pod slice is one jit.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exports shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from ..batch import (
    MetacalConfig,
    metacal_pipeline,
    shear_response,
    shear_response_from_sums,
    shear_response_sums,
)


def make_mesh(devices=None, axis_name="batch"):
    """1-d mesh over all (or the given) devices"""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def make_sharded_pipeline_fn(conf: MetacalConfig, mesh, measure="gaussmom",
                             measure_fwhm=1.2, axis_name="batch",
                             **pipeline_kw):
    """jitted pipeline with the stamp axis sharded over the mesh.

    Each device runs the full pipeline on its local slice (shard_map);
    per-stamp results come back batch-sharded while the calibration
    statistics are psum'd across the mesh and replicated. The batch
    must divide by the mesh size. Extra keywords (lm_conf / lm_prior /
    lm_bounds) pass through to metacal_pipeline.
    """
    batch_sharding = NamedSharding(mesh, P(axis_name))

    def local_step(images, weights, cens, psf_images, psf_cens, noise):
        results = metacal_pipeline(
            images, weights, cens, psf_images, psf_cens, noise, conf,
            measure=measure, measure_fwhm=measure_fwhm, **pipeline_kw,
        )
        local = shear_response_sums(results)
        total = jax.tree.map(
            lambda x: jax.lax.psum(x, axis_name), local
        )
        calib = shear_response_from_sums(total, step=conf.step)
        return results, calib

    smapped = _shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis_name),) * 6,
        out_specs=(P(axis_name), P()),
    )
    return jax.jit(smapped), batch_sharding


def make_sharded_mb_pipeline_fn(conf: MetacalConfig, mesh, band, nband,
                                axis_name="batch", **pipeline_kw):
    """multi-band multi-epoch pipeline sharded over the object axis.

    band: [E] per-epoch band assignment shared by all objects
    (replicated across the mesh), or [B, E] when the epoch->band map
    varies per object (sharded with the batch like every other
    per-object input); everything else shards on axis 0 as in
    make_sharded_pipeline_fn.
    """
    from ..batch import metacal_pipeline_mb

    batch_sharding = NamedSharding(mesh, P(axis_name))
    band = jax.numpy.asarray(band)
    per_object_band = band.ndim == 2

    def local_step(images, weights, cens, psf_images, psf_cens, noise,
                   band_arg):
        results = metacal_pipeline_mb(
            images, weights, cens, psf_images, psf_cens, noise,
            band_arg, nband, conf, **pipeline_kw,
        )
        local = shear_response_sums(results)
        total = jax.tree.map(
            lambda x: jax.lax.psum(x, axis_name), local
        )
        calib = shear_response_from_sums(total, step=conf.step)
        return results, calib

    band_spec = P(axis_name) if per_object_band else P()
    smapped = _shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis_name),) * 6 + (band_spec,),
        out_specs=(P(axis_name), P()),
    )

    def fn(images, weights, cens, psf_images, psf_cens, noise):
        return smapped(
            images, weights, cens, psf_images, psf_cens, noise, band
        )

    return jax.jit(fn), batch_sharding


def sharded_shear_response(results, mesh, step=0.01, axis_name="batch"):
    """replicated calibration statistics from sharded per-stamp results"""
    replicated = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda r: shear_response(r, step=step), out_shardings=replicated
    )
    return fn(results)
