"""Poll the axon tunnel until a tiny jitted matmul completes; then exit 0.

Used at round start to detect recovery from tunnel outages (see CLAUDE.md
2026-08-17/18 incident).
"""
import subprocess, sys, time

PROBE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128,128));"
    "print('OK', float(jnp.sum(jax.jit(lambda a: a@a)(x))))"
)

def main():
    interval = 120
    while True:
        t0 = time.time()
        try:
            # A timed-out tiny probe is safe to kill: the queued program is a
            # microsecond matmul, unlike the big benches CLAUDE.md warns about.
            p = subprocess.run([sys.executable, "-c", PROBE], capture_output=True,
                               text=True, timeout=180)
        except subprocess.TimeoutExpired:
            print(f"[{time.strftime('%H:%M:%S')}] tunnel dead (probe timeout)",
                  flush=True)
            time.sleep(interval)
            continue
        if p.returncode == 0 and "OK" in p.stdout:
            print(f"[{time.strftime('%H:%M:%S')}] tunnel RESPONSIVE "
                  f"({time.time()-t0:.0f}s probe)", flush=True)
            return 0
        print(f"[{time.strftime('%H:%M:%S')}] tunnel dead (rc={p.returncode}, "
              f"{time.time()-t0:.0f}s)", flush=True)
        time.sleep(interval)

if __name__ == "__main__":
    sys.exit(main())
