"""Test config: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware, and keep everything deterministic.

Note: this environment's axon TPU plugin force-sets jax_platforms="axon,cpu"
at import time (env var JAX_PLATFORMS is ignored), so we must override via
jax.config.update() after importing jax but before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intent_mpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

# ---------------------------------------------------------------------------
# The "cumulative XLA:CPU segfault" is vm.max_map_count exhaustion: each
# compiled executable holds ~3 mappings per fused kernel (~1,830 per
# engine-class program), so one process accumulating the whole suite's
# programs crosses Linux's default 65,530 ceiling and the compiler aborts
# on a failed mmap (see intent_mpc_tpu/utils/hostlimits.py and
# benchmark/xla_cpu_probe.py for the bisect). Remedy 1: raise the ceiling
# (works when privileged — this image runs as root). Remedy 2 (fallback,
# unprivileged): the map-budget guard below ends the session cleanly with
# exit code 77 before the ceiling; tests/run_suite.sh resumes the
# remaining tests in a fresh process (state file = executed node ids).
# ---------------------------------------------------------------------------
from intent_mpc_tpu.utils import hostlimits  # noqa: E402

_HEADROOM = hostlimits.ensure_map_headroom()
MAPGUARD_EXIT_CODE = 77          # segment ended for headroom, all tests passed
MAPGUARD_FAILED_EXIT_CODE = 78   # segment ended for headroom WITH failures —
                                 # run_suite.sh must not let a later clean
                                 # segment's exit 0 mask them

import pytest  # noqa: E402


def pytest_report_header(config):
    return (f"vm.max_map_count={_HEADROOM['limit']} "
            f"(raised={_HEADROOM['raised']}); XLA:CPU holds ~1.8k maps per "
            f"engine program — see utils/hostlimits.py")


def pytest_runtest_teardown(item, nextitem):
    state = os.environ.get("MAPGUARD_STATE")
    if state:
        with open(state, "a") as f:
            f.write(item.nodeid + "\n")
    if (nextitem is not None
            and hostlimits.map_budget_remaining() < hostlimits.GUARD_MARGIN):
        code = (MAPGUARD_FAILED_EXIT_CODE if item.session.testsfailed > 0
                else MAPGUARD_EXIT_CODE)
        pytest.exit(
            "vm.max_map_count nearly exhausted (XLA:CPU JIT mappings); "
            "ending the session before the compiler aborts. Resume the "
            "remaining tests in a fresh process — tests/run_suite.sh "
            "automates this.", returncode=code)

# ---------------------------------------------------------------------------
# Two-tier suite: `pytest -m "not slow"` is the smoke gate (~2-4 min);
# the thorough gate is `sh tests/run_slow_tier.sh` (~12 min, TWO
# processes). RUN EVERY TIER AS A SEPARATE PROCESS: one pytest process
# accumulating every compiled program eventually segfaults inside
# XLA:CPU's compiler on this image (observed twice in round 2 at the
# tier boundary — cache-load path and backend_compile_and_load — and
# twice in round 3 INSIDE the one-process slow tier after its program
# count grew, e.g. at test_adaptive_rho_recovers_bad_initialization,
# which passes alone; an XLA host issue, not a test bug). The slow tier
# therefore runs as two alphabetical halves (tests/run_slow_tier.sh).
# Tests measured >~12 s on the CPU mesh (cold compilation cache) are
# marked slow here, by function name, so the split lives in one place.
# test_episode_reaches_goal_clear_path stays fast-tier on purpose: the
# smoke gate keeps one full closed-loop episode.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_checkpoint_resume_bit_exact",
    "test_harness_checkpointed_matches_plain",
    "test_sharded_matches_unsharded",
    "test_two_process_fleet_matches_single_process",
    "test_admm_matches_oracle_f64",
    "test_shared_factor_matches_per_candidate_solve",
    "test_horizon30_qp_matches_native_oracle",
    "test_clear_map_first_iteration_valid",
    "test_odd_shapes_build_and_solve",
    "test_psum_reduction_collects_fleet_stats",
    "test_shared_factor_episode_matches_baseline",
    "test_fov_rows_constrain_behind",
    "test_episode_batched_vmap",
    "test_make_plan_nonpred_solves_and_warm_starts",
    "test_global_scenario_feed_matches_host_stack",
    "test_obstacle_in_path_is_avoided",
    "test_fov_mode_flies_with_heading_state",
    "test_episode_is_deterministic",
    "test_rollouts_match_reference",
    "test_pallas_matches_xla_path",
    "test_repeat_path_re_tracks",
    "test_solver_failure_holds_position",
    "test_nonpredictor_engine_mode",
    "test_plan_next_view_targets_frontier",
    "test_polish_matches_oracle",
    "test_woodbury_candidates_match_exact_solve",
    "test_episode_with_polish",
    "test_fleet_kernel_matches_xla_shared_path",
    "test_fleet_kernel_in_engine_vmap",
    "test_adaptive_rho_recovers_bad_initialization",
    "test_horizon30_real_osqp_anchors_parity",
    "test_real_osqp_closed_loop_short_episode",
    "test_production_program_inventory",
}


def pytest_collection_modifyitems(config, items):
    # full collection size BEFORE any filtering — tests/test_meta.py
    # asserts the documented suite count against this so doc drift fails
    # loudly (VERDICT r4 item 8)
    config._full_collection_count = len(items)
    config._mapguard_resumed = False
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
    # map-budget resume (tests/run_suite.sh): skip node ids a previous
    # segment of this logical run already executed
    state = os.environ.get("MAPGUARD_STATE")
    if state and os.path.exists(state):
        with open(state) as f:
            done = set(f.read().split())
        if done:
            items[:] = [it for it in items if it.nodeid not in done]
            config._mapguard_resumed = True
