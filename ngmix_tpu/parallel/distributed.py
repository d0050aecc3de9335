"""Multi-host scale-out: single-controller jax.distributed.

SURVEY 2.3's distributed slot. The reference has no distributed layer
at all - survey production farms independent single-core processes over
MEDS chunks externally. The TPU-native equivalent is a single
multi-host program: one controller process per host, a global 1-d mesh
over every chip of every host, the stamp batch sharded so each host
feeds only its local slice (per-host I/O sharding of MEDS-style input),
and the O(1) calibration statistics psum'd by XLA - riding ICI within a
pod slice and DCN across slices. The per-shard compute program is the
same shard_map body as the single-host path (parallel/mesh.py), so
multi-host changes only where data comes from, never what is computed.

Usage on each host (identical program, different process_id):

    from ngmix_tpu.parallel import distributed as dist
    dist.initialize(coordinator, num_processes=N, process_id=i)
    mesh = make_mesh()                     # global: all hosts' devices
    fn, _ = make_sharded_pipeline_fn(conf, mesh, measure="exp-lm")
    lo, hi = dist.host_shard_bounds(ncatalog)
    local = load_meds_slice(lo, hi)        # this host's I/O only
    gargs = dist.global_batch_from_local(mesh, *local)
    results, calib = fn(*gargs)            # calib replicated everywhere
"""
import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kw):
    """bring up the jax.distributed runtime (no-op when already up).

    On TPU pods all three arguments are inferred from the environment;
    pass them explicitly for CPU/GPU multi-process runs (e.g. the
    two-process CPU dryrun in tests/test_multihost.py).
    """
    if is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kw,
    )


def is_initialized():
    """whether the distributed runtime is up (multi-process mode)"""
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift fallback
        return jax.process_count() > 1


def host_shard_bounds(nobj, process_index=None, process_count=None):
    """[start, stop) catalog slice this host should load.

    Contiguous equal split: the per-host I/O sharding for MEDS-style
    input. The local slices concatenate in process order to the global
    batch, matching global_batch_from_local. The catalog size must
    divide by the process count — uneven local sizes are rejected by
    jax.make_array_from_process_local_data (non-uniform sharding), and
    the shard_map'd pipelines additionally need divisibility by the
    device count; pad the catalog (ngmix_tpu.ragged pads with
    zero-weight entries) to a divisible size instead.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if int(nobj) % n:
        raise ValueError(
            "catalog size %d does not divide by %d processes; pad the "
            "catalog to a divisible size (uneven local slices cannot "
            "be assembled into one uniformly-sharded global batch)"
            % (nobj, n)
        )
    per = int(nobj) // n
    return p * per, (p + 1) * per


def global_batch_from_local(mesh, *local_arrays, axis_name="batch"):
    """assemble global batch-sharded jax.Arrays from per-host slices.

    Each process passes only the slice it loaded (host_shard_bounds);
    jax.make_array_from_process_local_data places it on the process's
    local devices without any cross-host transfer. Single-process, this
    is just device_put with the batch sharding.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return tuple(
            jax.device_put(np.asarray(a), sharding) for a in local_arrays
        )
    return tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in local_arrays
    )


def replicated_to_host(tree):
    """fetch a fully-replicated result pytree (e.g. the psum'd
    calibration statistics) to host numpy on every process"""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def local_results(results, mesh, axis_name="batch"):
    """this host's slice of a batch-sharded result pytree as numpy.

    Per-stamp catalogs stay sharded; each host persists its own rows
    (the write-side analog of host_shard_bounds). Fully-addressable
    arrays (replicated scalars) pass through whole.
    """

    def pull(x):
        # replicated leaves (psum'd calibration scalars) pass through
        # whole: concatenating their per-device copies would duplicate
        # rows once per local device
        if not hasattr(x, "addressable_shards") or x.is_fully_replicated:
            return np.asarray(x)
        shards = sorted(
            x.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree.map(pull, results)
