"""Two-process CPU multi-host dryrun: jax.distributed + per-host input
sharding must reproduce the single-process sharded pipeline exactly.

SURVEY 2.3's distributed slot ("single-controller jax.distributed +
mesh over {batch} ... I/O sharding of MEDS-style inputs per host"); the
reference has no distributed layer to compare against, so the oracle is
this package's own single-process path.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_matches_single_process(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    out = str(tmp_path / "mh.npz")
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = here + os.pathsep + repo + os.pathsep + env.get(
        "PYTHONPATH", ""
    )

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(here, "_multihost_worker.py"),
             str(pid), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), (
        "worker failed:\n--- worker 0 ---\n%s\n--- worker 1 ---\n%s"
        % tuple(logs)
    )
    with np.load(out) as d:
        mh = {k: d[k] for k in d.files}

    # single-process oracle on the identical sim
    sys.path.insert(0, here)
    import jax
    import jax.numpy as jnp

    from _multihost_worker import build_sim
    from ngmix_tpu.batch import MetacalConfig, metacal_pipeline, shear_response

    B = 16
    args = tuple(jnp.asarray(a) for a in build_sim(B))
    conf = MetacalConfig(
        dims=(33, 33), psf_dims=(17, 17), jac=(0.263, 0, 0, 0.263),
        fixnoise=True, pad_factor=2,
    )
    res = metacal_pipeline(*args, conf, measure="gaussmom")
    calib = jax.tree.map(np.asarray, shear_response(res))

    # collectives reduce in a different order than the single-
    # device sum: exact equality only up to f8 reassociation
    np.testing.assert_allclose(mh["R"], calib["R"], rtol=1e-8, atol=1e-13)
    np.testing.assert_allclose(mh["shear"], calib["shear"], rtol=1e-8, atol=1e-13)
    # process 0's local rows are the first half of the catalog
    assert (int(mh["lo"]), int(mh["hi"])) == (0, 8)
    np.testing.assert_allclose(
        mh["local_e1"], np.asarray(res["noshear"]["e1"])[:8], rtol=1e-10
    )


def test_local_results_replicated_passthrough_and_uneven_guard():
    """replicated leaves pass through whole (regression: one copy per
    local device was concatenated) and uneven catalog splits raise"""
    import jax
    import jax.numpy as jnp
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ngmix_tpu.parallel import distributed as dist, make_mesh

    mesh = make_mesh(jax.devices()[:4])
    rep = jax.device_put(
        jnp.arange(3.0), NamedSharding(mesh, P())
    )
    shd = jax.device_put(
        jnp.arange(8.0), NamedSharding(mesh, P("batch"))
    )
    out = dist.local_results({"rep": rep, "rows": shd}, mesh)
    assert out["rep"].shape == (3,)
    np.testing.assert_array_equal(out["rep"], np.arange(3.0))
    assert out["rows"].shape == (8,)
    np.testing.assert_array_equal(out["rows"], np.arange(8.0))

    with pytest.raises(ValueError, match="does not divide"):
        dist.host_shard_bounds(10, process_index=0, process_count=3)
    assert dist.host_shard_bounds(12, 1, 3) == (4, 8)
