"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run against XLA's
host-platform device emulation. NOTE: this environment preloads jax via a
sitecustomize hook with JAX_PLATFORMS=axon (the TPU tunnel), so env vars set
here are too late — we must switch platform via jax.config. CPU is required
because the TPU path emulates float64 transcendentals at reduced precision
and the golden-reference solvers need true f64. Benchmarks run on the real
chip outside pytest.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# interpret-mode fused-kernel tests pay the full padded SUBLANES*128 batch
# on CPU — pin the small tile (the TPU default is 8; see ops/fused_al_sqp)
os.environ.setdefault("MPC_FUSED_SUBLANES", "2")

import pytest  # noqa: E402

import jax  # noqa: E402 (may already be preloaded by sitecustomize)

jax.config.update("jax_platforms", "cpu")
# float64 available for golden-reference solvers; TPU-path code is explicitly
# dtype-disciplined (takes/casts float32) so this does not change its behavior.
jax.config.update("jax_enable_x64", True)
# NOTE: the persistent compilation cache is deliberately NOT enabled here —
# this machine's XLA:CPU AOT artifacts are compiled with target features the
# host doesn't report (prefer-no-scatter/gather), and reloading them across
# processes triggers machine-feature-mismatch warnings with SIGILL risk.


# --------------------------------------------------------------------------- #
# test tiers: `pytest -m "not slow"` is the fast inner-loop tier (< 5 min on
# 4 workers); the full suite (slow included) is the merge gate. Slow tests are
# the compile-heavy ones (closed loops, interpret-mode fused-kernel
# equivalence, golden sweeps) — listed centrally here instead of per-file
# decorators so the tier stays auditable in one place.
# --------------------------------------------------------------------------- #
SLOW_TESTS = {
    # f64 escalation tier (each compiles a full-depth f64 CPU solve)
    "test_controller_f64_fallback_batched_converges_what_f32_left",
    "test_f64_fallback_improves_stragglers_and_preserves_converged",
    # fused-kernel interpret-mode equivalence (each compiles the whole solve)
    "test_fused_matches_xla_end_to_end",
    "test_fused_dynamic_obstacles_match_xla",
    "test_fused_unicycle_and_fixed_dt",
    "test_auto_wrapper_falls_back_on_cpu",
    "test_warm_cycle_through_fused_matches_policy",
    "test_fused_quadratic_form_with_ball_matches_xla",
    "test_fused_quadratic_integral_trapezoidal_hybrid_variable_dt",
    "test_fused_quadratic_integral_left_sum",
    "test_fused_models_match_xla",
    "test_fused_two_circles_footprint_matches_xla",
    "test_fused_line_footprint_matches_xla",
    "test_fused_line_obstacles_match_xla",
    "test_fused_polygon_obstacles_match_xla",
    "test_fused_mixed_slots_canonical_carlike",
    "test_fused_collocation_rules_match_xla",
    "test_fused_via_points_match_xla",
    "test_fused_polygon_footprint_matches_xla",
    "test_fused_shooting_matches_xla",
    "test_fused_random_inscope_spec_fuzz",
    "test_fused_nonuniform_dt_matches_xla",
    "test_fused_nonuniform_trapezoidal_quadratic_matches_xla",
    "test_fused_far_goal_terminal_residual_not_wrapped",
    "test_fused_sublane8_tile_geometry_smoke",
    "test_min_time_floor_objective_binds_not_switch_stages",
    "test_quadratic_warm_floor_within_1e2",
    "test_polish_launches_shrink_min_time_switch_floor",
    # closed loops / grid adaptation
    "test_closed_loop_horizon_shrinks_toward_goal",
    "test_closed_loop_horizon_grows_when_goal_recedes",
    "test_closed_loop_nonuniform_redundant_controls",
    "test_precompile_ladder_populates_program_cache",
    "test_controller_closed_loop_reaches_goal",
    "test_kinematic_bicycle_canonical_config",
    "test_local_planner_end_to_end_with_costmap",
    "test_closed_loop_task_mpc_reaches_goal_and_records",
    "test_controller_dispatch_lsq_lm_reaches_goal",
    "test_fleet_warm_cycles_and_per_scenario_goal_reinit",
    "test_bucketed_ladder_matches_unbucketed_per_bucket",
    "test_mixed_unicycle_and_carlike_fleet",
    # scenario worlds
    "test_scenario_reaches_goal_with_clearance",
    "test_pedestrian_crossing_anticipated",
    "test_carlike_min_time_two_rooms",
    # golden sweeps and solver-heavy feature tests
    "test_batched_solve_matches_unbatched",
    "test_obstacle_avoidance_matches_golden",
    "test_baseline1_unicycle_quadratic_matches_golden",
    "test_carlike_quadratic_matches_golden",
    "test_min_time_unicycle_matches_golden_horizon",
    "test_config3_carlike_min_time_n50_matches_golden",
    "test_config2_diffdrive_obstacles_matches_golden",
    "test_trapezoidal_solver_matches_golden",
    "test_collocation_rules_differ_from_forward",
    "test_kinematic_bicycle_quadratic_matches_golden",
    "test_min_time_via_points_matches_golden",
    "test_ordered_vs_unordered_solver_trajectories_differ",
    "test_mixed_obstacle_types_respected_by_solver",
    "test_polygon_footprint_solver_avoidance",
    "test_polygon_obstacles_flow_into_solver",
    "test_dynamic_obstacle_prediction_shifts_avoidance",
    "test_via_points_attract_trajectory",
    "test_integral_form_and_hybrid_cost",
    "test_shooting_ocp_solves_and_matches_collocation",
    "test_shooting_rk6_rk7_defect_zero_and_golden_solve",
    "test_shooting_variable_dt_min_time",
    "test_carlike_min_time_ensemble_f32",
    "test_dynamic_converter_feeds_velocity_to_solver",
    "test_reconfigure_structural_change_resets_state",
    "test_reconfigure_weights_keeps_warm_state_and_takes_effect",
    "test_controller_state_roundtrip",
    # infra-heavy
    "test_two_process_cpu_cluster",
    "test_sharded_solve_matches_unsharded",
    "test_sharded_per_shard_rescue_matches_manual_blocks",
    "test_xla_trace_writes_profile",
    "test_profile_solver_phases_returns_positive_times",
    "test_convergence_report_counters",
    "test_active_constraints_report_counts_by_class",
    "test_pscan_batched_vmap",
    "test_pscan_matches_sequential",
    "test_polygon_signed_distance_rigid_invariance",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
