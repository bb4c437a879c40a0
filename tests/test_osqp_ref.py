"""External anchor: parity against the reference's ACTUAL vendored libosqp.

Every other oracle in this repo (oracle/numpy_ref.py, native/qp_solver.cpp)
was written by the same author from the same spec — a shared-bug risk.
These tests put identical QP matrices through the very solver binary the
reference links (trajectory_planner/.../lib/x86/libosqp.so, OSQP 0.6.2)
and pin the whole parity chain to it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.oracle import numpy_ref, osqp_ref
from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig

needs_osqp = pytest.mark.skipif(not osqp_ref.available(),
                                reason="vendored libosqp.so not present")


@needs_osqp
def test_abi_and_demo_qp():
    """ABI self-check (runs inside _load: default settings must round-trip
    through our struct layout) + the canonical OSQP demo QP."""
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 0.0, 0.0])
    u = np.array([1.0, 0.7, 0.7])
    r = osqp_ref.solve_converged(P, q, A, l, u, eps=1e-9, max_iter=10000)
    assert r["status_val"] in (osqp_ref.OSQP_SOLVED,
                               osqp_ref.OSQP_SOLVED_INACCURATE)
    np.testing.assert_allclose(r["x"], [0.3, 0.7], atol=1e-6)


@needs_osqp
def test_numpy_oracle_machine_precision_vs_real_osqp():
    """On a clean dense QP where OSQP's polish succeeds, the self-built
    f64 oracle must agree with real OSQP to machine precision — this is
    the shared-bug check at the algorithmic root (measured: 1.6e-15)."""
    rng = np.random.RandomState(3)
    n, m = 40, 60
    M = rng.randn(n, n)
    P = M @ M.T + 0.1 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n)
    z0 = A @ rng.randn(n)
    l = z0 - rng.rand(m)
    u = z0 + rng.rand(m)
    r = osqp_ref.solve(P, q, A, l, u, eps_abs=1e-9, eps_rel=1e-9,
                       max_iter=100000, polish=True)
    assert r["status_val"] == osqp_ref.OSQP_SOLVED
    assert r["status_polish"] == 1, "polish must land the active set here"
    x_np, _ = numpy_ref.solve_qp_dense(P, q, A, l, u, max_iter=100000,
                                       eps=1e-11, polish=True)
    assert np.abs(x_np - r["x"]).max() < 1e-9


@needs_osqp
def test_horizon30_real_osqp_anchors_parity():
    """The round-2 north-star numbers were measured against self-built
    oracles; this anchors them to real OSQP at full benchmark scale.

    OSQP's own polish is structurally unsuccessful on this QP class
    (status_polish = -1 at every delta in {1e-6..1e-3}: the reduced KKT
    from the slack-variable rows defeats its regularized refinement), and
    the reference flies with polish OFF anyway (constants.h POLISH(0),
    never overridden at mpcPlanner.cpp:439-444). Ground truth is
    therefore the tight-eps ADMM limit, and we additionally verify the
    limit DIRECTION: OSQP's iterate approaches the polished numpy oracle
    monotonically as eps tightens (measured pos 1.2e-3 -> 4.0e-4 ->
    5.3e-5 across eps 1e-5/1e-6/1e-7), i.e. the self-built oracles sit at
    real OSQP's limit point."""
    from intent_mpc_tpu.ops.admm import admm_solve
    from intent_mpc_tpu.ops import polish as polish_lib
    import tests.test_qp as tq

    cfg = PlannerConfig(horizon=30, max_obstacles=8,
                        solver=SolverConfig(max_iter=2000, refine_iters=1))
    qp, (P, q, A, l, u), _ = tq._build_both(cfg, 8, 4, with_static=True)
    H, W = cfg.horizon, cfg.mpc_window

    def errs(xv, ref):
        xv = np.asarray(xv, np.float64)
        ref = np.asarray(ref, np.float64)
        pos = (xv[:8 * H].reshape(H, 8)[:, :3]
               - ref[:8 * H].reshape(H, 8)[:, :3])
        acc = (xv[8 * H:].reshape(W, 5)[:, :3]
               - ref[8 * H:].reshape(W, 5)[:, :3])
        return np.abs(pos).max(), np.abs(acc).max()

    x_np, _ = numpy_ref.solve_qp_dense(P, q, A, l, u, max_iter=20000,
                                       eps=1e-9, polish=True)
    errs_by_eps = []
    for eps in (1e-5, 1e-6, 1e-7):
        r = osqp_ref.solve(P, q, A, l, u, eps_abs=eps, eps_rel=eps,
                           max_iter=300000)
        assert r["status_val"] == osqp_ref.OSQP_SOLVED
        errs_by_eps.append(errs(x_np, r["x"]))
    x_osqp = r["x"]
    # monotone approach to the polished oracle in both pos and acc
    for k in (0, 1):
        assert errs_by_eps[0][k] > errs_by_eps[1][k] > errs_by_eps[2][k], \
            f"OSQP does not converge toward the oracle: {errs_by_eps}"
    pos_np, acc_np = errs_by_eps[-1]
    assert pos_np < 2e-4 and acc_np < 5e-2, (pos_np, acc_np)

    # the f32 runtime pipeline (ADMM + compensated polish, no f64
    # anywhere) against REAL OSQP at its tightest practical convergence:
    # north-star 1e-3 positions (measured 7.2e-6 pos / 2.4e-3 acc vs the
    # eps=1e-9 iterate)
    res = admm_solve(cfg, qp)
    pr = polish_lib.polish(cfg, qp, res.x, res.y)
    assert bool(pr.accepted)
    pos_f32, acc_f32 = errs(pr.x, x_osqp)
    assert pos_f32 < 1e-3, f"f32 pipeline vs real OSQP: pos {pos_f32:.2e}"
    assert acc_f32 < 1e-1, f"f32 pipeline vs real OSQP: acc {acc_f32:.2e}"


def test_real_osqp_fleet_artifact_brackets_runtime():
    """Pin the 8-seed real-OSQP closed-loop artifact (results/osqp_loop,
    produced by `oracle_loop.py --solver osqp --max-obstacles 64`) and its
    headline reading: the reference's actual solver at the reference's
    runtime settings flies with violation rates BETWEEN the f32 runtime
    and the converged f64 oracle, with 100% success / 0 collisions —
    i.e. the commanded-limit violations are formulation-inherent and the
    fixed-iteration budget reproduces the reference's truncated-solve
    flight regime (RESULTS.md round-3 anchor table)."""
    import json
    import os
    base = os.path.join(os.path.dirname(__file__), "..", "results")
    path = os.path.join(base, "osqp_loop", "summary.json")
    if not os.path.exists(path):
        pytest.skip("results/osqp_loop artifact not present")
    d = json.load(open(path))
    assert d["config"]["solver"] == "osqp"
    assert d["config"]["max_obstacles"] == 64
    assert len(d["config"]["seeds"]) >= 8
    agg = d["oracle"]
    assert agg["success_rate"] == 1.0
    assert agg["collision_rate"] == 0.0
    # between the f32 runtime (0.50 on the same seeds) and the converged
    # f64 oracle (0.66) — generous band so reruns with solver-timing
    # jitter (the 0.05 s wall-clock limit is host-speed-dependent) pass
    assert 0.45 < agg["vel_violation_rate"] < 0.66, agg
    oracle_path = os.path.join(base, "oracle_loop_cap64", "summary.json")
    if os.path.exists(oracle_path):
        conv = json.load(open(oracle_path))["oracle"]
        assert agg["vel_violation_rate"] < conv["vel_violation_rate"]
        assert agg["jerk_violation_rate"] < conv["jerk_violation_rate"]


@needs_osqp
def test_real_osqp_closed_loop_short_episode():
    """Fly a short closed-loop episode with the REAL OSQP as the candidate
    solver at the reference's exact runtime protocol (fresh setup per
    candidate, warm primal from previous solution, 0.05 s time limit
    after the first solve, defaults otherwise) — the configuration the
    reference actually executes (mpcPlanner.cpp:439-527). Checks the
    full engine path end-to-end: finite outputs, forward progress, and
    the firstTime time-limit gate."""
    import dataclasses
    from intent_mpc_tpu.benchmark.oracle_loop import make_osqp_override
    from intent_mpc_tpu.engine.closed_loop import run_episode, summarize
    from intent_mpc_tpu.models.world import (generate_scenario,
                                             straight_line_ref_traj)
    from intent_mpc_tpu.utils.config import IntentMPCConfig

    cfg = IntentMPCConfig()
    cfg = cfg.replace(
        planner=dataclasses.replace(cfg.planner, max_obstacles=8),
        world=dataclasses.replace(cfg.world, num_obstacles=40),
        engine=dataclasses.replace(cfg.engine, timeout=6.0))
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    override = make_osqp_override(cfg.planner, time_limit=0.05)
    sc = generate_scenario(seed=0, cfg=cfg.world)
    carry, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                           solve_override=override)
    row = summarize(cfg, carry)
    assert np.isfinite(row["path_length"])
    assert row["path_length"] > 1.0, "no forward progress under real OSQP"
    assert not row["collision"]
