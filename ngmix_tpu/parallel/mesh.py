"""Multi-chip scale-out: shard the stamp batch over a device mesh.

The workload is embarrassingly parallel at the object level (SURVEY
2.3): stamps shard over a 1-d mesh axis, each chip runs the identical
metacal+measure program on its slice, and only the O(1) calibration
statistics (mean ellipticities, the response matrix R) cross chips -
XLA lowers those reductions to psums riding the ICI.

The reference has no distributed layer at all; it farms processes
externally. Here a 100k-stamp catalog on a v5e-8 pod slice is one jit.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch import MetacalConfig, metacal_pipeline, shear_response


def make_mesh(devices=None, axis_name="batch"):
    """1-d mesh over all (or the given) devices"""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def make_sharded_pipeline_fn(conf: MetacalConfig, mesh, measure="gaussmom",
                             measure_fwhm=1.2, axis_name="batch"):
    """jitted pipeline with the stamp axis sharded over the mesh.

    Inputs are placed with batch-axis sharding; the per-stamp results
    stay sharded while the calibration statistics (shear_response) are
    replicated - XLA inserts the cross-chip reductions.
    """
    batch_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def step(images, weights, cens, psf_images, psf_cens, noise):
        results = metacal_pipeline(
            images, weights, cens, psf_images, psf_cens, noise, conf,
            measure=measure, measure_fwhm=measure_fwhm,
        )
        calib = shear_response(results, step=conf.step)
        return results, calib

    in_shardings = tuple([batch_sharding] * 6)
    fn = jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=(batch_sharding, replicated),
    )
    return fn, batch_sharding


def sharded_shear_response(results, mesh, step=0.01, axis_name="batch"):
    """replicated calibration statistics from sharded per-stamp results"""
    replicated = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda r: shear_response(r, step=step), out_shardings=replicated
    )
    return fn(results)
