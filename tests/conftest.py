"""Test configuration: CPU backend with a virtual 8-device mesh and
float64 enabled, so numerics match the reference's f8 semantics and
multi-chip sharding paths are exercised without TPU hardware.

jax may already be pre-imported in this environment (with the axon TPU
platform), so use runtime config updates rather than env vars.
"""
import os

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - backend already initialized
    pass
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite's cost is dominated by
# recompiling near-identical pipeline programs; warm reruns skip it
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_ngmix_tpu_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - older jax
    pass

# `pytest -m quick`: one representative fast test per subsystem, for
# iteration (~2-3 min). The full suite stays the gate.
QUICK_TESTS = {
    "test_shape.py::test_g_e_roundtrip",
    "test_moments.py::test_fwhm_sigma_T_roundtrips",
    "test_gmix.py::test_fill_tables_normalized",
    "test_observation.py::test_readonly_views",
    "test_kobs_jacobian_util.py::test_jacobian_basic",
    "test_gaussmom.py::test_gaussmom_gauss_recovery",
    "test_admom.py::test_admom_gauss_recovery",
    "test_em.py::test_em_1gauss",
    "test_fitting_lm.py::test_lm_linear_problem",
    "test_prepsfmom.py::test_prepsfmom_recovery",
    "test_metacal.py::test_remap_exact",
    "test_priors.py::test_normal",
    "test_guessers.py::test_tflux_guesser",
    "test_runners_bootstrap.py::test_bootstrap_full",
    "test_medsreaders.py::test_meds_get_obs_fields",
    "test_simobs_gaussap.py::test_simulate_obs_with_model",
    "test_small_linalg.py::test_chol_solve_matches_numpy",
    "test_misc_components.py::test_gmixnd_eval",
    "test_kspace_fitters.py::test_kspace_gauss_fit",
    "test_ragged.py::test_pack_ragged_buckets_and_masks",
    "test_parallel.py::test_sharded_pipeline_matches_single_device",
    "test_batch_pipeline.py::test_batch_pipeline_m_bias",
    "test_noise_cov.py::test_noise_cov_white_matches_standard",
    "test_anchors.py::test_gaussmom_closed_form_oracle",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = item.nodeid.split("[")[0].rsplit("/", 1)[-1]
        if key in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)
