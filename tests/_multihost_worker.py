"""Worker process for the two-process CPU multi-host dryrun test.

Each process configures a 4-device virtual CPU backend, joins the
jax.distributed job, builds ONLY ITS host slice of a deterministic sim
(per-host I/O sharding), assembles the global batch, and runs the
sharded metacal pipeline. Process 0 writes the replicated calibration
statistics and its local catalog rows to the output path.

Invoked as: python _multihost_worker.py <pid> <nproc> <port> <out.npz>
"""
import sys


def build_sim(B):
    """deterministic sim; every process builds the same full catalog
    host-side, then slices - a stand-in for per-host MEDS reads"""
    import numpy as np

    from ngmix_tpu import DiagonalJacobian, GMixModel

    SCALE = 0.263
    DIMS, PSF_DIMS = (33, 33), (17, 17)
    rng = np.random.RandomState(42)
    psf = GMixModel([0.0, 0.0, 0.02, -0.01, 0.27, 1.0], "turb")
    pim = psf.make_image(
        PSF_DIMS, jacobian=DiagonalJacobian(row=8, col=8, scale=SCALE)
    )
    gal = GMixModel([0.0, 0.0, 0.0, 0.0, 0.5, 100.0], "exp").get_sheared(
        0.02, 0.0
    )
    conv = gal.convolve(psf)
    imgs = np.zeros((B,) + DIMS)
    cens = np.zeros((B, 2))
    for i in range(B):
        off = rng.uniform(-0.5, 0.5, 2)
        jac = DiagonalJacobian(row=16 + off[0], col=16 + off[1], scale=SCALE)
        imgs[i] = conv.make_image(DIMS, jacobian=jac)
        imgs[i] += rng.normal(size=DIMS) * 1e-4
        cens[i] = (16 + off[0], 16 + off[1])
    weights = np.full((B,) + DIMS, 1e8)
    noise = rng.normal(size=(B,) + DIMS) * 1e-4
    pimgs = np.tile(pim, (B, 1, 1))
    pcens = np.full((B, 2), 8.0)
    return imgs, weights, cens, pimgs, pcens, noise


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outpath = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_enable_x64", True)

    from ngmix_tpu.parallel import (
        distributed as dist,
        make_mesh,
        make_sharded_pipeline_fn,
    )

    dist.initialize(
        "localhost:%d" % port, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc
    assert len(jax.local_devices()) == 4

    import numpy as np

    from ngmix_tpu.batch import MetacalConfig

    B = 16
    full = build_sim(B)
    lo, hi = dist.host_shard_bounds(B)
    local = tuple(a[lo:hi] for a in full)

    mesh = make_mesh()
    conf = MetacalConfig(
        dims=(33, 33), psf_dims=(17, 17), jac=(0.263, 0, 0, 0.263),
        fixnoise=True, pad_factor=2,
    )
    fn, _ = make_sharded_pipeline_fn(conf, mesh, measure="gaussmom")
    gargs = dist.global_batch_from_local(mesh, *local)
    results, calib = fn(*gargs)

    calib_h = dist.replicated_to_host(calib)
    local_rows = dist.local_results(
        {"e1": results["noshear"]["e1"]}, mesh
    )
    if pid == 0:
        np.savez(
            outpath,
            R=calib_h["R"],
            shear=calib_h["shear"],
            local_e1=local_rows["e1"],
            lo=lo,
            hi=hi,
        )
    print("worker %d done" % pid, flush=True)


if __name__ == "__main__":
    main()
