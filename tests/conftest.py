"""Test configuration: CPU backend with 8 virtual devices and float64 enabled.

The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
must run on local CPU (f64 available, no per-dispatch network latency), so we
override unconditionally before jax initializes. Multi-chip sharding paths
are exercised on the virtual 8-device CPU mesh (the driver's dryrun does the
same).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-bound (hundreds of
# distinct jit signatures); re-runs hit the on-disk cache instead.
# Namespaced by a host fingerprint: XLA:CPU AOT entries are machine-specific,
# and a shared checkout can be exercised from more than one machine — foreign
# entries fail to load with a SIGILL-risk warning per jit signature (observed
# 2026-08-19) and force recompiles anyway.
import hashlib
import platform

_host = hashlib.sha1(
    (platform.machine() + ":" + (platform.processor() or "")
     + ":" + platform.node()).encode()
).hexdigest()[:8]
_cache_dir = os.path.join(
    os.path.dirname(__file__), "..", f".jax_cache_{_host}"
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402

# Fast/slow tiers: nodeids measured >= ~13 s on the 1-CPU CI box (full-suite
# --durations=0 run, 2026-08-16) are auto-marked slow so the default
# `pytest -m "not slow"` gate stays fast. Explicit @pytest.mark.slow in test
# files composes with this list.
_SLOW_NODEIDS = {
    "tests/test_tutorials_smoke.py::test_tutorial[02_differentiating_theseus_layer.py]",
    "tests/test_tutorials_smoke.py::test_tutorial[04_motion_planning.py]",
    "tests/test_tutorials_smoke.py::test_tutorial[05_differentiable_motion_planning.py]",
    "tests/optim/test_pcg.py::test_pcg_end_to_end_and_gradients",
    "tests/optim/test_pallas_kernels.py::test_fused_path_gradients",
    "tests/parallel/test_sharding.py::test_shard_map_fused_kernel_parity",
    "tests/parallel/test_sharding.py::test_sharded_unroll_grad_parity",
    "tests/embodied/test_tactile.py::test_tactile_trainer_step",
    "tests/embodied/test_measurements.py::test_mini_pgo_converges[GaussNewton-kw0]",
    "tests/optim/test_sparse.py::test_sparse_backward_modes[unroll]",
    "tests/optim/test_sparse.py::test_sparse_backward_modes[dlm]",
    "tests/optim/test_pallas_kernels.py::test_fused_reprojection_in_ba_step",
    "tests/test_pgo_golden.py::test_pgo_learned_radius_golden[dense]",
    "tests/embodied/test_tactile.py::test_tactile_estimator_solves_and_differentiates",
    "tests/optim/test_sparse.py::test_sparse_backward_modes[truncated]",
    "tests/optim/test_sparse.py::test_sparse_backward_modes[implicit]",
    "tests/optim/test_pallas_kernels.py::test_fused_path_in_full_solve",
    "tests/parallel/test_sharding.py::test_shard_map_solve_parity[sparse]",
    "tests/optim/test_pallas_kernels.py::test_fused_between_matches_reference",
    "tests/optim/test_pcg.py::test_pcg_delta_matches_direct",
    "tests/embodied/test_measurements.py::test_mini_pgo_converges[LevenbergMarquardt-kw1]",
    "tests/optim/test_pallas_kernels.py::test_fused_reprojection_matches_autodiff",
    "tests/optim/test_utils_extra.py::test_lie_optimizer_adam",
    "tests/test_pgo_golden.py::test_pgo_learned_radius_golden[sparse]",
    "tests/test_pgo_golden.py::test_pgo_learned_radius_golden_f32[dense]",
    "tests/test_pgo_golden.py::test_pgo_learned_radius_golden_f32[sparse]",
    "tests/optim/test_schur.py::test_schur_delta_matches_dense",
    "tests/optim/test_refine.py::test_refined_f32_reaches_f64_plateau_at_scale",
    "tests/core/test_layer_features.py::test_compute_samples_sparse_matches_dense_cov",
    "tests/optim/test_sparse.py::test_sparse_matches_dense_pgo[mixed-dof]",
    "tests/embodied/test_measurements.py::test_between_analytic_matches_autodiff[SE3]",
    "tests/optim/test_bundle_adjustment.py::test_ba_converges[dense]",
    "tests/optim/test_sparse.py::test_sparse_lm_dogleg[LevenbergMarquardt-kw0]",
    "tests/optim/test_sparse.py::test_sparse_matches_dense_pgo[uniform]",
    "tests/optim/test_sparse.py::test_block_cholesky_matches_dense[12-6-3-amd]",
    "tests/optim/test_sparse.py::test_block_solve_custom_vjp",
    "tests/optim/test_schur.py::test_schur_ba_end_to_end",
    "tests/optim/test_utils_extra.py::test_manifold_update_descends",
    "tests/embodied/test_measurements.py::test_between_analytic_matches_autodiff[SO3]",
    "tests/embodied/test_measurements.py::test_between_analytic_matches_autodiff[SE2]",
    "tests/optim/test_sparse.py::test_block_cholesky_matches_dense[6-3-2-natural]",
    "tests/optim/test_sparse.py::test_sparse_lm_dogleg[Dogleg-kw1]",
    "tests/parallel/test_sharding.py::test_sharded_solution_parity[sparse]",
    "tests/core/test_layer_dense.py::test_backward_modes_match_fd[unroll]",
    "tests/parallel/test_sharding.py::test_sharded_implicit_grad_parity",
    "tests/optim/test_extras.py::test_compute_samples",
    "tests/embodied/test_measurements.py::test_moving_frame_between_jacobians",
    "tests/core/test_layer_features.py::test_dcem_layer_truncated_grad",
    "tests/embodied/test_measurements.py::test_mini_pgo_converges[Dogleg-kw2]",
    "tests/parallel/test_sharding.py::test_sharded_solution_parity[dense]",
    "tests/core/test_layer_dense.py::test_backward_modes_match_fd[implicit]",
    "tests/test_reference_parity.py::test_se3_ops_match_reference",
    "tests/optim/test_utils_extra.py::test_easyaug",
    "tests/optim/test_utils_extra.py::test_easyaug_classes",
    "tests/optim/test_pallas_kernels.py::test_pallas_level_factorize_matches_jax",
    "tests/optim/test_pallas_kernels.py::test_pallas_assemble_matches_jax",
    "tests/optim/test_pallas_kernels.py::test_pallas_substitution_matches_jax",
    "tests/lie/test_ops.py::test_vmap_composes",
    "tests/core/test_layer_dense.py::test_backward_modes_match_fd[truncated]",
    "tests/core/test_layer_dense.py::test_curve_fit_converges[GaussNewton]",
    "tests/core/test_layer_dense.py::test_backward_modes_match_fd[dlm]",
    "tests/embodied/test_measurements.py::test_local_analytic_matches_autodiff[SO3]",
    "tests/test_reference_parity.py::test_gn_error_history_matches_reference",
    "tests/parallel/test_sharding.py::test_shard_map_solve_parity[dense]",
    "tests/lie/test_ops.py::test_jcompose_jinverse_jlocal_vs_fd[SO3]",
    "tests/optim/test_bundle_adjustment.py::test_ba_converges[sparse]",
    "tests/optim/test_sparse.py::test_block_cholesky_matches_dense[6-3-2-amd]",
    # round-3 additions (measured on the same box)
    "tests/optim/test_level_runs.py::test_pallas_kernels_inside_run_scan_interpret",
    "tests/optim/test_level_runs.py::test_run_solve_with_dense_tail",
    "tests/optim/test_level_runs.py::test_run_gradients_match_unrolled",
    "tests/optim/test_level_runs.py::test_full_lm_solve_unchanged_under_runs",
    "tests/optim/test_gbp.py::test_gbp_optimizer_converges_loopy",
    "tests/optim/test_gbp.py::test_gbp_layer_backward_modes",
    "tests/optim/test_gbp.py::test_gbp_marginals_exact_on_tree",
    "tests/parallel/test_gbp_sharding.py::test_gbp_sharded_solution_parity",
    "tests/kin/test_ik.py::test_ik_outer_gradient_flows",
    "tests/test_tutorials_smoke.py::test_tutorial[06_gaussian_belief_propagation.py]",
    "tests/core/test_covariances.py::test_covariances_match_oracle[dense]",
    "tests/core/test_covariances.py::test_covariances_match_oracle[sparse]",
    "tests/core/test_covariances.py::test_covariances_gbp_backend_tree",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if nodeid in _SLOW_NODEIDS:
            item.add_marker(pytest.mark.slow)
