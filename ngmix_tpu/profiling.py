"""Profiling and per-stage timing hooks.

The reference has no instrumentation beyond debug logging (SURVEY 5);
survey-scale TPU runs need to know where the step time goes. This
module provides:

- ``timed(name)``: a context manager accumulating wall times per stage
  into a global registry (blocking on device results so the numbers
  mean what they say);
- ``trace(logdir)``: a context manager around jax.profiler for
  capturing device traces viewable in TensorBoard/Perfetto;
- ``report()``: the accumulated stage table.
"""
import contextlib
import time
from collections import defaultdict

import jax

_STAGES = defaultdict(lambda: [0.0, 0])


@contextlib.contextmanager
def timed(name, sync=None):
    """accumulate wall time for a named stage.

    If ``sync`` (a pytree of device arrays) is given, block on it
    before stopping the clock so async dispatch doesn't hide the cost.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        _STAGES[name][0] += dt
        _STAGES[name][1] += 1


@contextlib.contextmanager
def trace(logdir):
    """capture a device trace with jax.profiler"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def report(reset=False):
    """dict stage -> (total_seconds, calls, seconds_per_call)"""
    out = {
        k: (v[0], v[1], v[0] / v[1] if v[1] else 0.0)
        for k, v in _STAGES.items()
    }
    if reset:
        _STAGES.clear()
    return out


def print_report(reset=False, stream=None):
    import sys

    stream = stream or sys.stdout
    rep = report(reset=reset)
    width = max((len(k) for k in rep), default=10)
    stream.write(
        "%-*s %10s %8s %12s\n" % (width, "stage", "total[s]", "calls",
                                  "per-call[s]")
    )
    for k, (tot, n, per) in sorted(rep.items(), key=lambda kv: -kv[1][0]):
        stream.write("%-*s %10.3f %8d %12.5f\n" % (width, k, tot, n, per))
