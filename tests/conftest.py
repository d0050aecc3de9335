"""Test configuration: CPU backend with a virtual 8-device mesh and
float64 enabled, so numerics match the reference's f8 semantics and
multi-chip sharding paths are exercised without TPU hardware.

jax may already be pre-imported in this environment (with the axon TPU
platform), so use runtime config updates rather than env vars.
"""
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - backend already initialized
    pass
jax.config.update("jax_enable_x64", True)
