"""Multi-host survey run: jax.distributed + per-host I/O sharding.

The multi-host shape of examples/survey_run.py: every host runs THIS
SAME program; each loads only its slice of the catalog
(host_shard_bounds - the per-host I/O sharding of MEDS-style input),
the batch shards over a global mesh spanning every host's chips, the
calibration statistics come back replicated via psum, and each host
writes its own catalog rows (local_results).

Run single-process (degenerate, 4 virtual CPU devices):

    python examples/survey_run_multihost.py

Simulate 2 hosts on one machine (two processes, 8 global devices):

    python examples/survey_run_multihost.py --launch 2

On a real multi-host pod, run the worker on every host with its
process id (or rely on the TPU environment's auto-detection and drop
the explicit initialize arguments).
"""
import argparse
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

SCALE = 0.263
SHEAR_TRUE = 0.02
NOISE = 1.0e-3
NOBJ = 64
DIMS = (33, 33)
PSF_DIMS = (17, 17)


def build_catalog_slice(lo, hi):
    """deterministic per-object sim; a real run would read MEDS rows
    [lo, hi) here - only this host's slice is ever materialized"""
    import ngmix_tpu as ngmix

    psf = ngmix.GMixModel([0.0, 0.0, 0.02, -0.01, 0.3, 1.0], "gauss")
    pjac = ngmix.DiagonalJacobian(row=8, col=8, scale=SCALE)
    pim = np.asarray(psf.make_image(PSF_DIMS, jacobian=pjac))
    gal = ngmix.GMixModel(
        [0.0, 0.0, 0.0, 0.0, 0.5, 100.0], "exp"
    ).get_sheared(ngmix.Shape(SHEAR_TRUE, 0.0))
    conv = gal.convolve(psf)

    n = hi - lo
    imgs = np.zeros((n,) + DIMS)
    cens = np.zeros((n, 2))
    noise = np.zeros((n,) + DIMS)
    for row, i in enumerate(range(lo, hi)):
        rng = np.random.RandomState(5000 + i)  # object-deterministic
        off = rng.uniform(-0.5, 0.5, 2)
        cen = ((DIMS[0] - 1) / 2 + off[0], (DIMS[1] - 1) / 2 + off[1])
        jac = ngmix.DiagonalJacobian(row=cen[0], col=cen[1], scale=SCALE)
        imgs[row] = np.asarray(conv.make_image(DIMS, jacobian=jac))
        imgs[row] += rng.normal(size=DIMS) * NOISE
        noise[row] = rng.normal(size=DIMS) * NOISE
        cens[row] = cen
    weights = np.full((n,) + DIMS, 1.0 / NOISE**2)
    pimgs = np.tile(pim, (n, 1, 1))
    pcens = np.full((n, 2), 8.0)
    return imgs, weights, cens, pimgs, pcens, noise


def worker(pid, nproc, port, outdir):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 4)
    except Exception:
        pass
    jax.config.update("jax_enable_x64", True)

    from ngmix_tpu.batch import MetacalConfig
    from ngmix_tpu.parallel import (
        distributed as dist,
        make_mesh,
        make_sharded_pipeline_fn,
    )

    if nproc > 1:
        dist.initialize(
            "localhost:%d" % port, num_processes=nproc, process_id=pid
        )

    lo, hi = dist.host_shard_bounds(NOBJ)
    print("process %d: loading catalog rows [%d, %d)" % (pid, lo, hi))
    local = build_catalog_slice(lo, hi)

    mesh = make_mesh()
    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0, 0, SCALE),
        fixnoise=True, pad_factor=2,
    )
    fn, _ = make_sharded_pipeline_fn(conf, mesh, measure="exp-lm")
    gargs = dist.global_batch_from_local(mesh, *local)
    results, calib = fn(*gargs)

    # each host persists its own rows
    rows = dist.local_results(
        {k: results["noshear"][k] for k in ("e1", "e2", "T", "flux",
                                            "s2n", "flags")},
        mesh,
    )
    np.savez(os.path.join(outdir, "rows_%03d.npz" % pid), **rows)

    calib_h = dist.replicated_to_host(calib)
    g1 = float(calib_h["shear"][0])
    if pid == 0:
        print(
            "devices=%d processes=%d  R11=%.4f  g1=%.5f (true %.3f)  "
            "m=%.2e"
            % (len(jax.devices()), jax.process_count(),
               float(calib_h["R"][0, 0]), g1, SHEAR_TRUE,
               g1 / SHEAR_TRUE - 1)
        )


def launch(nproc):
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    outdir = tempfile.mkdtemp(prefix="survey_mh_")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--pid", str(p),
             "--nproc", str(nproc), "--port", str(port),
             "--outdir", outdir],
            env=env,
        )
        for p in range(nproc)
    ]
    rcs = [p.wait() for p in procs]
    if any(rcs):
        raise SystemExit("worker failed: rcs=%s" % rcs)
    shards = sorted(os.listdir(outdir))
    n = sum(
        len(np.load(os.path.join(outdir, f))["e1"]) for f in shards
    )
    print("result shards: %s (%d rows total)" % (shards, n))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--launch", type=int, default=0,
                   help="spawn N local worker processes")
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--nproc", type=int, default=1)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--outdir", default=None)
    a = p.parse_args()
    if a.launch:
        launch(a.launch)
    else:
        outdir = a.outdir or tempfile.mkdtemp(prefix="survey_mh_")
        worker(a.pid, a.nproc, a.port, outdir)


if __name__ == "__main__":
    main()
