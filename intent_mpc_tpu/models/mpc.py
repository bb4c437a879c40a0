"""MPC planner: intent-weighted multi-hypothesis candidate solve & selection.

TPU-native rebuild of trajPlanner::mpcPlanner (trajectory_planner/
mpcPlanner.cpp). The reference solves <=6 candidate QPs sequentially under
a 0.15 s wall-clock budget (makePlanWithPred, :571-661); here all 6
candidates are a batch axis solved simultaneously by the vmapped ADMM
solver, and the wall-clock budget becomes a per-solve iteration budget.

Reference quirks reproduced deliberately:
  * candidate ordering sorts intent combos by descending probability, but
    evaluateTraj indexes the weight vector with the *sorted position*
    (makePlanWithPred pushes loop index i as intentType, :622, while the
    weight vector in evaluateTraj :868-873 is indexed by original combo
    id). We replicate that weight permutation.
  * findClosestObstacle's 10-step loop reads statesSol[0]/statesSol[1]
    only (:689-697), so the score reduces to
    d * (a - cos(trajDir - obsDir)) * sum_j exp(-j); the constant factor
    cannot change the argmin and is dropped.
  * the first solve of an episode runs with no obstacle constraints
    (firstTime branch, :593-602): we zero the obstacle-active mask, which
    makes all 6 candidates identical to the unconstrained solve.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models.predictor import FORWARD, LEFT, RIGHT, STOP, Prediction
from intent_mpc_tpu.ops import qp as qplib
from intent_mpc_tpu.ops.admm import admm_solve
from intent_mpc_tpu.utils.config import PlannerConfig

_PREC = jax.lax.Precision.HIGHEST


class PlannerState(NamedTuple):
    """Warm-start / bookkeeping carry (mpcPlanner member state)."""

    states_sol: jnp.ndarray     # (H, 8) previous solution states
    controls_sol: jnp.ndarray   # (W, 5)
    first_time: jnp.ndarray     # bool  (mpcPlanner::firstTime_)
    has_solution: jnp.ndarray   # bool  (any successful solve yet)
    last_ref_start: jnp.ndarray  # int32 (lastRefStartIdx_)
    xref: jnp.ndarray           # (H, 3) last reference window (ref_)
    rho: jnp.ndarray            # scalar: temporally-adapted ADMM penalty
    # carried shared factor (solver.factor_reuse_cycles > 1 only; None
    # otherwise so the default carry stays lean): Ruiz scaling + explicit
    # inverse reused across cycles, refreshed every k-th cycle
    fac_d: Optional[jnp.ndarray] = None       # (n,)
    fac_e: Optional[qplib.ConVec] = None      # constraint-space scaling
    fac_c: Optional[jnp.ndarray] = None       # scalar cost scaling
    fac_minv: Optional[jnp.ndarray] = None    # (n, n)
    fac_gref: Optional[jnp.ndarray] = None    # (W, Kmax, 3) active obstacle
                                              # gradients at the last factor
                                              # refresh (drift-aware reuse,
                                              # SolverConfig.factor_drift_refresh)


class PlanOutput(NamedTuple):
    state: PlannerState
    valid: jnp.ndarray          # bool: this cycle produced a usable new traj
    best_idx: jnp.ndarray       # int32 chosen candidate (sorted order)
    candidate_states: jnp.ndarray  # (6, H, 8)
    solved: jnp.ndarray         # (6,) bool
    prim_res: jnp.ndarray       # (6,)


def init_planner_state(cfg: PlannerConfig) -> PlannerState:
    H, W = cfg.horizon, cfg.mpc_window
    if cfg.solver.factor_reuse_cycles > 1:
        # identity-preconditioner placeholder: usable (CG still converges
        # against the true normal operator) until the first refresh at
        # cycle 0 / after a mid-flight planner reset
        n = cfg.num_vars
        # static clustering appends cluster_slots rows to every QP, so
        # the carried factor's obs slots must match that program shape
        K = cfg.max_obstacles + (cfg.cluster_slots
                                 if cfg.static_clustering else 0)
        fac = dict(
            fac_d=jnp.ones(n, jnp.float32),
            fac_e=qplib.ConVec(eq=jnp.ones((H, 8), jnp.float32),
                               sb=jnp.ones((H, 8), jnp.float32),
                               cb=jnp.ones((W, 5), jnp.float32),
                               # K slots + 1 second-series slot (QPs with
                               # fewer obstacles slice; see the reuse
                               # branch in make_plan_with_pred)
                               obs=jnp.ones((W, K + 1), jnp.float32)),
            fac_c=jnp.ones((), jnp.float32),
            # dtype must match admm_factor's output (the factor-reuse
            # lax.cond carries it): bf16 when the shared preconditioner
            # is stored bf16 (SolverConfig.minv_dtype)
            fac_minv=jnp.eye(n, dtype=(jnp.bfloat16
                                       if cfg.solver.minv_dtype == "bf16"
                                       else jnp.float32)))
        if cfg.solver.factor_drift_refresh > 0:
            # zeros force a refresh on the first drift check (the rel
            # drift against an empty snapshot is large)
            fac["fac_gref"] = jnp.zeros((W, K + 1, 3), jnp.float32)
    else:
        fac = {}
    return PlannerState(
        states_sol=jnp.zeros((H, 8), jnp.float32),
        controls_sol=jnp.zeros((W, 5), jnp.float32),
        first_time=jnp.asarray(True),
        has_solution=jnp.asarray(False),
        last_ref_start=jnp.asarray(0, jnp.int32),
        xref=jnp.zeros((H, 3), jnp.float32),
        rho=jnp.asarray(cfg.solver.rho, jnp.float32),
        **fac,
    )


def reference_window(cfg: PlannerConfig, input_traj: jnp.ndarray,
                     traj_len: jnp.ndarray, curr_pos: jnp.ndarray,
                     last_start: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """getReferenceTraj (mpcPlanner.cpp:1199-1231): windowed nearest-point
    search <= 3 s forward of the monotone last start index; pads the last
    waypoint. Returns (xref (H,3), new_start)."""
    L = input_traj.shape[0]
    max_fwd = int(round(cfg.max_ref_forward_time / cfg.ts))
    idxs = last_start + jnp.arange(max_fwd)
    in_range = idxs < traj_len
    pts = input_traj[jnp.clip(idxs, 0, L - 1)]
    d = jnp.linalg.norm(pts - curr_pos[None, :], axis=-1)
    d = jnp.where(in_range, d, jnp.inf)
    start = last_start + jnp.argmin(d).astype(jnp.int32)
    ref_idx = jnp.clip(start + jnp.arange(cfg.horizon), 0, traj_len - 1)
    xref = input_traj[jnp.clip(ref_idx, 0, L - 1)]
    return xref, start


def find_closest_obstacle(cfg: PlannerConfig, state: PlannerState,
                          curr_pos: jnp.ndarray, nominal_pos: jnp.ndarray,
                          visible: jnp.ndarray) -> jnp.ndarray:
    """findClosestObstacle (mpcPlanner.cpp:663-708). nominal_pos (O,3) is
    predPos[i][FORWARD][0] (updatePredObstacles freezes it, :351-359)."""
    d = jnp.linalg.norm(curr_pos[None, :] - nominal_pos, axis=-1)   # (O,)

    p0 = state.states_sol[0, 0:3]
    p1 = state.states_sol[1, 0:3]
    traj_dir = jnp.arctan2(p1[1] - p0[1], p1[0] - p0[0])
    obs_dir = jnp.arctan2(nominal_pos[:, 1] - p0[1], nominal_pos[:, 0] - p0[0])
    d_sol = jnp.linalg.norm(p0[None, :] - nominal_pos, axis=-1)
    a = cfg.direction_weight_a
    directional = d_sol * (a - jnp.cos(traj_dir - obs_dir))

    score = jnp.where(state.first_time | ~state.has_solution, d, directional)
    score = jnp.where(visible, score, jnp.inf)
    return jnp.argmin(score).astype(jnp.int32)


def intent_comb_weights(prob: jnp.ndarray) -> jnp.ndarray:
    """Per-combo weights of the closest obstacle (getIntentComb :722-727 /
    evaluateTraj :868-873): [STOP, LEFT, RIGHT, FORWARD, max(L,F), max(R,F)]."""
    return jnp.stack([
        prob[STOP], prob[LEFT], prob[RIGHT], prob[FORWARD],
        jnp.maximum(prob[LEFT], prob[FORWARD]),
        jnp.maximum(prob[RIGHT], prob[FORWARD]),
    ])


# combo -> (first series intent, second series intent or -1)
_COMBO_FIRST = jnp.array([STOP, LEFT, RIGHT, FORWARD, LEFT, RIGHT])
_COMBO_SECOND = jnp.array([-1, -1, -1, -1, FORWARD, FORWARD])


def build_candidates(cfg: PlannerConfig, pred: Prediction, visible: jnp.ndarray,
                     closest: jnp.ndarray):
    """Per-candidate obstacle series arrays (getIntentComb :710-769).

    Slot layout (K = O + 1): slot j<O holds obstacle j — the closest
    obstacle carries the combo's first intent series, every other visible
    obstacle its argmax-intent series; slot O holds the combo's second
    series of the closest obstacle (combos 4/5 only).

    Returns pos (6, H, K, 3), size (6, H, K, 3), active (6, K) — series
    indexed by prediction step (H <= P+1).
    """
    O = pred.pos.shape[0]
    H = cfg.horizon
    am = jnp.argmax(pred.intent_prob, axis=-1)                    # (O,)
    base_pos = jnp.take_along_axis(
        pred.pos, am[:, None, None, None], axis=1)[:, 0, :H]      # (O,H,3)
    base_size = jnp.take_along_axis(
        pred.size, am[:, None, None, None], axis=1)[:, 0, :H]

    cl_pos = pred.pos[closest, :, :H]                             # (4,H,3)
    cl_size = pred.size[closest, :, :H]

    first_pos = cl_pos[_COMBO_FIRST]                              # (6,H,3)
    first_size = cl_size[_COMBO_FIRST]
    second_pos = cl_pos[jnp.maximum(_COMBO_SECOND, 0)]
    second_size = cl_size[jnp.maximum(_COMBO_SECOND, 0)]
    has_second = _COMBO_SECOND >= 0                               # (6,)

    is_cl = jnp.arange(O) == closest                              # (O,)
    pos = jnp.where(is_cl[None, :, None, None],
                    first_pos[:, None], base_pos[None])           # (6,O,H,3)
    size = jnp.where(is_cl[None, :, None, None],
                     first_size[:, None], base_size[None])
    pos = jnp.concatenate([pos, second_pos[:, None]], axis=1)     # (6,O+1,H,3)
    size = jnp.concatenate([size, second_size[:, None]], axis=1)

    active = jnp.broadcast_to(visible[None, :], (6, O))
    active = jnp.concatenate(
        [active, (has_second & visible[closest])[:, None]], axis=1)  # (6,O+1)
    # (6, H, K, 3) step-major like the QP expects
    return (jnp.swapaxes(pos, 1, 2), jnp.swapaxes(size, 1, 2),
            active.astype(pos.dtype))


def _scores(cfg: PlannerConfig, cand_states, prev_states, have_prev, xref,
            obs_pos, obs_size, obs_active):
    """getTrajectoryScore components (mpcPlanner.cpp:771-848), vectorized
    over the candidate axis.

    cand_states (6,H,8); obs_pos/size (6,H,K,3); obs_active (6,K)."""
    H = cfg.horizon
    p = cand_states[:, :, 0:3]                                    # (6,H,3)

    # consistency (:780-800): mean over first 10 steps vs previous solution
    ncs = min(cfg.consistency_steps, H)
    dc = jnp.linalg.norm(p[:, :ncs] - prev_states[None, :ncs, 0:3], axis=-1)
    consistency = jnp.maximum(jnp.mean(dc, axis=-1), 0.1)
    consistency = jnp.where(have_prev, consistency, 0.0)

    # detour (:802-814): mean distance to reference
    dd = jnp.linalg.norm(p - xref[None], axis=-1)
    detour = jnp.maximum(jnp.mean(dd, axis=-1), 0.1)

    # safety (:816-848): tanh-weighted 2D distance to obstacles
    pz0 = p.at[:, :, 2].set(0.0)
    op = obs_pos.at[..., 2].set(0.0)
    d = jnp.linalg.norm(pz0[:, :, None, :] - op, axis=-1)         # (6,H,K)
    max_size = jnp.sqrt(obs_size[..., 0] ** 2 + obs_size[..., 1] ** 2)
    w = 1.0 - jnp.tanh(jnp.arctanh(0.5) / (cfg.dynamic_safety_dist + max_size) * d)
    w = w * obs_active[:, None, :]
    tw = jnp.sum(w, axis=-1)
    step_score = jnp.sum(d * w, axis=-1) / jnp.maximum(tw, 1e-12)
    safety = jnp.mean(step_score, axis=-1)
    return consistency, detour, safety


def evaluate_candidates(cfg: PlannerConfig, consistency, detour, safety,
                        weights_sorted, solved):
    """evaluateTraj (mpcPlanner.cpp:850-887): batch-average-normalized
    scores, weighted by the (position-permuted, see module docstring)
    intent weights; masked argmax over successful candidates."""
    ok = solved.astype(consistency.dtype)
    n_ok = jnp.maximum(jnp.sum(ok), 1.0)

    def avg(v):
        return jnp.sum(v * ok) / n_ok

    cons = jnp.where(consistency > 0, avg(consistency) / jnp.maximum(consistency, 1e-12), 0.0)
    det = avg(detour) / jnp.maximum(detour, 1e-12)
    saf = safety / jnp.maximum(avg(safety), 1e-12)
    weighted = weights_sorted * (cons + det + saf)
    weighted = jnp.where(solved, weighted, -jnp.inf)
    return jnp.argmax(weighted).astype(jnp.int32)


def fov_halfspaces(curr_pos: jnp.ndarray, curr_yaw: jnp.ndarray,
                   fov_deg: float = 87.0):
    """updateFovParam (mpcPlanner.cpp:274-295): two half-planes bounding
    the camera FOV. Returns (half_max (3,), half_min (3,)) as (a, b, c)."""
    half = fov_deg / 2.0 * jnp.pi / 180.0
    max_a = curr_yaw - half
    min_a = curr_yaw + half
    a1, b1 = jnp.sin(max_a), -jnp.cos(max_a)
    c1 = a1 * curr_pos[0] + b1 * curr_pos[1]
    a2, b2 = jnp.sin(min_a), -jnp.cos(min_a)
    c2 = a2 * curr_pos[0] + b2 * curr_pos[1]
    return jnp.stack([a1, b1, c1]), jnp.stack([a2, b2, c2])


def make_plan_with_pred(cfg: PlannerConfig, state: PlannerState,
                        curr_pos: jnp.ndarray, curr_vel: jnp.ndarray,
                        input_traj: jnp.ndarray, traj_len: jnp.ndarray,
                        pred: Prediction, visible: jnp.ndarray,
                        max_iter: Optional[int] = None,
                        curr_yaw: Optional[jnp.ndarray] = None,
                        solve_override=None,
                        cycle_idx: Optional[jnp.ndarray] = None,
                        static_obs=None,
                        dyn_safety: Optional[jnp.ndarray] = None
                        ) -> PlanOutput:
    """One replanning cycle (mpcCB body + makePlanWithPred).

    All 6 intent-combination QPs are assembled and solved as one batch.
    curr_yaw enables the FOV half-space rows (the reference's 3-argument
    updateCurrStates; the DYNUS benchmark uses the 2-argument form with
    numHalfSpace = 0).
    solve_override: optional `(qps, warm6) -> ADMMResult` replacing the
    batched ADMM — used by benchmark/oracle_loop.py to fly the closed
    loop on the native f64 oracle (everything else identical).
    static_obs: optional (centroid (S,3), size (S,3), yaw (S,), active
    (S,)) rotated static boxes from obstacle clustering — identical rows
    appended to every candidate QP with the static safety distance,
    static slack column, and rotated-ellipsoid yaw (updateObstacleParam
    :1186-1195; the real-perception composition, where statics reach the
    MPC via map -> clustering instead of the fake detector). Scoring
    stays dynamic-only like the reference's getTrajectoryScore.
    dyn_safety: optional traced scalar overriding cfg.dynamic_safety_dist
    in the QP obstacle rows (the engine's opt-in goal-approach
    relaxation, EngineConfig.goal_relax — a beyond-reference feature;
    the reference's fixed 1.5 m inflation is what parks it ~1 m from an
    obstacle-occluded goal, RESULTS.md adjudication table). Scoring
    keeps the configured distance.
    """
    H, W = cfg.horizon, cfg.mpc_window
    O = pred.pos.shape[0]

    # Cap the QP's obstacle slots at cfg.max_obstacles: keep the NEAREST
    # visible obstacles (the binding set; a 3 s horizon reaches ~15 m
    # while the sensor sees 30 m). The reference constrains every
    # in-range obstacle (updateObstacleParam); this cap is the
    # fixed-shape analogue — world-sized slot counts (200+) would carry
    # ~6000 constraint rows per QP of which the far half can never bind.
    if O > cfg.max_obstacles:
        d2 = jnp.linalg.norm(pred.pos[:, FORWARD, 0, 0:2]
                             - curr_pos[None, 0:2], axis=-1)
        score = jnp.where(visible, -d2, -jnp.inf)
        _, keep = jax.lax.top_k(score, cfg.max_obstacles)
        pred = Prediction(pos=pred.pos[keep], size=pred.size[keep],
                          intent_prob=pred.intent_prob[keep])
        visible = visible[keep]
        O = cfg.max_obstacles

    xref, new_start = reference_window(
        cfg, input_traj, traj_len, curr_pos, state.last_ref_start)

    any_visible = jnp.any(visible)
    nominal = pred.pos[:, FORWARD, 0]                             # (O,3)
    closest = find_closest_obstacle(cfg, state, curr_pos, nominal, visible)

    cand_pos, cand_size, cand_active = build_candidates(
        cfg, pred, visible, closest)                              # (6,H,K,*)

    # sort combos by (weight, combo-id) descending (getIntentComb :728-756,
    # std::sort on pair<double,int> read back-to-front). A stable ascending
    # argsort reversed gives descending weight with descending id on ties.
    w6 = intent_comb_weights(pred.intent_prob[closest])
    order = jnp.flip(jnp.argsort(w6, stable=True))
    cand_pos = cand_pos[order]
    cand_size = cand_size[order]
    cand_active = cand_active[order]

    # firstTime / no-pred: no obstacle constraints (makePlanWithPred :593-602)
    any_static = (jnp.any(static_obs[3]) if static_obs is not None
                  else jnp.asarray(False))
    use_obs = (~state.first_time) & (any_visible | any_static)
    cand_active = cand_active * use_obs.astype(cand_active.dtype)

    # obstacle param conversion (updateObstacleParam :1148-1197):
    # semi-axes = size/2 + dynamic safety; yaw 0; all dynamic.
    ds = cfg.dynamic_safety_dist if dyn_safety is None else dyn_safety
    qsize = cand_size[:, :W] / 2.0 + ds
    qpos = cand_pos[:, :W]
    qp_active = cand_active
    qyaw = jnp.zeros(qpos.shape[:-1])
    qdyn = jnp.ones(qpos.shape[:-1])
    if static_obs is not None:
        sc, ss, sy, sa = static_obs
        S = sc.shape[0]
        qpos = jnp.concatenate(
            [qpos, jnp.broadcast_to(sc[None, None], (6, W, S, 3))], axis=2)
        qsize = jnp.concatenate(
            [qsize, jnp.broadcast_to(
                ss[None, None] / 2.0 + cfg.static_safety_dist,
                (6, W, S, 3))], axis=2)
        qyaw = jnp.concatenate(
            [qyaw, jnp.broadcast_to(sy[None, None], (6, W, S))], axis=2)
        qdyn = jnp.concatenate([qdyn, jnp.zeros((6, W, S))], axis=2)
        sact = (sa.astype(qp_active.dtype)
                * use_obs.astype(qp_active.dtype))
        qp_active = jnp.concatenate(
            [qp_active, jnp.broadcast_to(sact[None], (6, S))], axis=1)
    if curr_yaw is not None:
        # two spare slots for FOV half-space rows (QP only; scoring uses the
        # un-padded obstacle set)
        pad = lambda a, fill: jnp.concatenate(
            [a, jnp.full(a.shape[:2] + (2,) + a.shape[3:], fill, a.dtype)],
            axis=2)
        qpos = pad(qpos, 0.0)
        qsize = pad(qsize, 1.0)
        qyaw = pad(qyaw, 0.0)
        qdyn = pad(qdyn, 1.0)
        qp_active = jnp.concatenate(
            [qp_active, jnp.zeros(qp_active.shape[:1] + (2,))], axis=1)
        fov = fov_halfspaces(curr_pos, curr_yaw)
    else:
        fov = None

    # linearization points: previous solution states or current position
    lin = jnp.where(state.has_solution,
                    state.states_sol[:W, 0:3],
                    jnp.broadcast_to(curr_pos, (W, 3)))

    x0 = jnp.concatenate([curr_pos, curr_vel])

    def build_one(op, os, oy, od, act):
        return qplib.build_qp(cfg, x0, xref, op, os, oy, od,
                              jnp.broadcast_to(act[None, :], op.shape[:-1]),
                              lin, fov_rows=fov)
    qps = jax.vmap(build_one)(qpos, qsize, qyaw, qdyn, qp_active)

    warm = jnp.where(state.has_solution,
                     qplib.merge_z(state.states_sol, state.controls_sol),
                     jnp.zeros(cfg.num_vars))
    warm6 = jnp.broadcast_to(warm, (6,) + warm.shape)

    fac_carry = None          # set by the factor-reuse branch below
    if solve_override is not None:
        res = solve_override(qps, warm6)
    elif cfg.solver.fused_solve:
        # Fleet-fused Pallas kernel (ops/pallas_fused.py). custom_vmap:
        # called per scenario the primal path runs the XLA shared-factor
        # solve; under the engine's scenario vmap JAX calls the batched
        # rule ONCE with the whole fleet, which runs all iterations of
        # all problems in one VMEM-resident kernel.
        from intent_mpc_tpu.ops.admm import admm_factor
        from intent_mpc_tpu.ops.pallas_fused import fleet_admm

        @jax.custom_batching.custom_vmap
        def solve6(qps_, warm_, rho_):
            qp_mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), qps_)
            qp_mean = qp_mean._replace(
                obs_active=jnp.max(qps_.obs_active, axis=0))
            fac = admm_factor(cfg, qp_mean, rho_override=rho_)
            return jax.vmap(lambda q, x: admm_solve(
                cfg, q, x, max_iter, rho_override=rho_,
                factor=fac))(qps_, warm_)

        @solve6.def_vmap
        def _solve6_batched(axis_size, in_batched, qps_, warm_, rho_):
            qps_ = jax.tree.map(
                lambda a, b: a if b else jnp.broadcast_to(
                    a[None], (axis_size,) + a.shape),
                qps_, in_batched[0])
            if not in_batched[1]:
                warm_ = jnp.broadcast_to(warm_[None],
                                         (axis_size,) + warm_.shape)
            if not in_batched[2]:
                rho_ = jnp.broadcast_to(rho_, (axis_size,))
            res_b = fleet_admm(cfg, qps_, warm_, max_iter=max_iter,
                               rho_override=rho_)
            return res_b, jax.tree.map(lambda _: True, res_b)

        res = solve6(qps, warm6, state.rho)
    elif cfg.solver.shared_factor:
        # one factorization per scenario: factor the candidate-mean QP with
        # union obstacle activity (over-regularized rows keep the shared
        # Minv a contraction for every candidate), then refine each
        # candidate against its own normal matrix in closed form
        from intent_mpc_tpu.ops.admm import admm_factor
        qp_mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), qps)
        qp_mean = qp_mean._replace(
            obs_active=jnp.max(qps.obs_active, axis=0))
        if cfg.solver.woodbury_candidates:
            # candidates differ from the mean QP only in the closest
            # obstacle's slot and the second-series slot
            # (build_candidates). Factor the mean QP with those rows
            # REMOVED: every candidate's normal matrix is then a purely
            # positive low-rank update of the base, solved EXACTLY by a
            # Woodbury correction inside admm_solve (diff_slots=...)
            diff_slots = jnp.stack([closest.astype(jnp.int32),
                                    jnp.asarray(O, jnp.int32)])
            Kq = qps.G.shape[2]
            slot_mask = 1.0 - jnp.max(
                jax.nn.one_hot(diff_slots, Kq, dtype=qp_mean.obs_active.dtype),
                axis=0)
            qp_base = qp_mean._replace(
                obs_active=qp_mean.obs_active * slot_mask[None, :])
            fac = admm_factor(cfg, qp_base, rho_override=state.rho)
            res = jax.vmap(lambda q, x: admm_solve(
                cfg, q, x, max_iter, rho_override=state.rho,
                factor=fac, diff_slots=diff_slots))(qps, warm6)
        else:
            from intent_mpc_tpu.ops.admm import Factor
            k_reuse = cfg.solver.factor_reuse_cycles
            if (k_reuse > 1 and cycle_idx is not None
                    and curr_yaw is None and state.fac_minv is not None):
                # temporal factor reuse (VERDICT r2 item 8): refresh the
                # Ruiz scaling + structured inverse only every k-th
                # cycle; the CG refinement against each candidate's own
                # fresh normal operator absorbs the drift. The predicate
                # is the batch-uniform cycle counter, so under the
                # engine's scenario vmap the cond stays a real branch
                # and the skipped factorization is not computed.
                Kq = qps.G.shape[2]   # runtime slots (O + second-series)

                def fresh(_):
                    f = admm_factor(cfg, qp_mean, rho_override=state.rho)
                    return f.D, f.E, f.c, f.Minv

                def reuse(_):
                    # the carried obs scaling is allocated at the config
                    # maximum; slice to this QP's slot count
                    e = state.fac_e._replace(obs=state.fac_e.obs[:, :Kq])
                    return state.fac_d, e, state.fac_c, state.fac_minv

                refresh = cycle_idx % k_reuse == 0
                drift_t = cfg.solver.factor_drift_refresh
                if drift_t > 0 and state.fac_gref is not None:
                    # drift-aware refresh (VERDICT r4 item 6): the factor
                    # drifts with the obstacle ellipsoid gradients (the
                    # only cycle-varying rows of the normal matrix), so a
                    # relative Frobenius drift of the ACTIVE gradients
                    # since the last refresh triggers an early refactor;
                    # k_reuse stays the ceiling
                    g_now = qp_mean.G * qp_mean.obs_active[..., None]
                    gref = state.fac_gref[:, :Kq]
                    rel = jnp.linalg.norm(g_now - gref) \
                        / (jnp.linalg.norm(gref) + 1e-6)
                    refresh = refresh | (rel > drift_t)
                fD, fE, fc2, fM = jax.lax.cond(refresh, fresh, reuse, None)
                fac = Factor(D=fD, E=fE, c=fc2, Minv=fM, qp_mean=None)
                e_pad = state.fac_e.obs.at[:, :Kq].set(fE.obs)
                fac_carry = (fD, fE._replace(obs=e_pad), fc2, fM)
                if drift_t > 0 and state.fac_gref is not None:
                    g_pad = state.fac_gref.at[:, :Kq].set(g_now)
                    fac_carry = fac_carry + (jnp.where(refresh, g_pad,
                                                       state.fac_gref),)
            else:
                fac = admm_factor(cfg, qp_mean, rho_override=state.rho)
            res = jax.vmap(lambda q, x: admm_solve(
                cfg, q, x, max_iter, rho_override=state.rho,
                factor=fac))(qps, warm6)
    else:
        res = jax.vmap(lambda q, x: admm_solve(
            cfg, q, x, max_iter, rho_override=state.rho))(qps, warm6)
    states6 = jax.vmap(lambda x: qplib.split_z(x, cfg)[0])(res.x)  # (6,H,8)
    controls6 = jax.vmap(lambda x: qplib.split_z(x, cfg)[1])(res.x)

    # Acceptance mirrors the reference: it never checks OSQP's status —
    # solveProblem only fails on workspace errors, so infeasible / timed-out
    # QPs still return their last ADMM iterate and that iterate is executed
    # (mpcPlanner.cpp:513-526). We only reject numerically broken results.
    accepted = jnp.isfinite(res.prim_res) & (res.prim_res < 1e3) \
        & jnp.all(jnp.isfinite(res.x), axis=-1)

    consistency, detour, safety = _scores(
        cfg, states6, state.states_sol, state.has_solution & ~state.first_time,
        xref, cand_pos, cand_size, cand_active)

    # weight permutation quirk: sorted position i gets weight of combo id i
    best = evaluate_candidates(cfg, consistency, detour, safety, w6, accepted)

    valid = jnp.any(accepted)
    x_best = res.x[best]
    if cfg.solver.polish:
        # OSQP polish semantics on the CHOSEN candidate only
        # (mpcPlanner.cpp executes only the winner): exact active-set KKT
        # solve with compensated residuals (ops/polish.py). The gate
        # rejects (returns the raw iterate) when the active set is
        # untrustworthy — in particular on the chronically-infeasible
        # DYNUS QPs — so this is off by default for the benchmark
        # throughput config and on for parity / feasible regimes.
        from intent_mpc_tpu.ops.polish import polish as _polish
        qp_best = jax.tree.map(lambda a: a[best], qps)
        y_best = jax.tree.map(lambda a: a[best], res.y)
        x_best = _polish(cfg, qp_best, x_best, y_best).x
    Xb, Ub = qplib.split_z(x_best, cfg)
    new_states = jnp.where(valid, Xb, state.states_sol)
    new_controls = jnp.where(valid, Ub, state.controls_sol)

    new_state = PlannerState(
        states_sol=new_states,
        controls_sol=new_controls,
        first_time=state.first_time & ~valid,
        has_solution=state.has_solution | valid,
        last_ref_start=new_start,
        xref=jnp.where(valid, xref, state.xref),
        rho=(res.rho_suggest[best] if cfg.solver.temporal_rho
             else state.rho),
        fac_d=fac_carry[0] if fac_carry is not None else state.fac_d,
        fac_e=fac_carry[1] if fac_carry is not None else state.fac_e,
        fac_c=fac_carry[2] if fac_carry is not None else state.fac_c,
        fac_minv=fac_carry[3] if fac_carry is not None else state.fac_minv,
        fac_gref=(fac_carry[4] if fac_carry is not None
                  and len(fac_carry) > 4 else state.fac_gref),
    )
    return PlanOutput(state=new_state, valid=valid, best_idx=best,
                      candidate_states=states6, solved=res.solved,
                      prim_res=res.prim_res)


def make_plan(cfg: PlannerConfig, state: PlannerState,
              curr_pos: jnp.ndarray, curr_vel: jnp.ndarray,
              input_traj: jnp.ndarray, traj_len: jnp.ndarray,
              obs_pos: jnp.ndarray, obs_vel: jnp.ndarray,
              obs_size: jnp.ndarray, visible: jnp.ndarray,
              max_iter: Optional[int] = None,
              curr_yaw: Optional[jnp.ndarray] = None,
              static_obs=None,
              dyn_safety: Optional[jnp.ndarray] = None) -> PlanOutput:
    """Non-predictor replanning cycle (mpcPlanner::makePlan :543-569 fed by
    updateDynamicObstacles :316-341): each obstacle held at its current
    position/size for the whole horizon, single QP solve.

    obs_pos/vel/size (O,3); the velocity is carried for parity with
    updateDynamicObstacles' stored fields (the QP only uses pos/size).

    static_obs: optional (centroid (S,3), size (S,3), yaw (S,), active (S,))
    from obstacle clustering (getStaticObstacles); static rows use the
    static safety distance, static slack column, and rotated-ellipsoid yaw
    (updateObstacleParam :1186-1195)."""
    H, W = cfg.horizon, cfg.mpc_window
    O = obs_pos.shape[0]
    xref, new_start = reference_window(
        cfg, input_traj, traj_len, curr_pos, state.last_ref_start)

    S = 0 if static_obs is None else static_obs[0].shape[0]
    K = O + S + (2 if curr_yaw is not None else 0)
    qpos = jnp.zeros((W, K, 3)).at[:, :O].set(
        jnp.broadcast_to(obs_pos[None], (W, O, 3)))
    ds = cfg.dynamic_safety_dist if dyn_safety is None else dyn_safety
    qsize = jnp.ones((W, K, 3)).at[:, :O].set(
        jnp.broadcast_to(obs_size[None] / 2.0 + ds, (W, O, 3)))
    qyaw = jnp.zeros((W, K))
    qdyn = jnp.ones((W, K))
    active = jnp.zeros((W, K)).at[:, :O].set(
        jnp.broadcast_to(visible[None], (W, O)).astype(jnp.float32))
    if static_obs is not None:
        sc, ss, sy, sa = static_obs
        qpos = qpos.at[:, O:O + S].set(jnp.broadcast_to(sc[None], (W, S, 3)))
        qsize = qsize.at[:, O:O + S].set(jnp.broadcast_to(
            ss[None] / 2.0 + cfg.static_safety_dist, (W, S, 3)))
        qyaw = qyaw.at[:, O:O + S].set(jnp.broadcast_to(sy[None], (W, S)))
        qdyn = qdyn.at[:, O:O + S].set(0.0)
        active = active.at[:, O:O + S].set(
            jnp.broadcast_to(sa[None], (W, S)).astype(jnp.float32))
    use_obs = (~state.first_time) & (jnp.any(visible)
                                     | (jnp.any(static_obs[3])
                                        if static_obs is not None
                                        else jnp.asarray(False)))
    active = active * use_obs.astype(active.dtype)
    fov = fov_halfspaces(curr_pos, curr_yaw) if curr_yaw is not None else None

    lin = jnp.where(state.has_solution,
                    state.states_sol[:W, 0:3],
                    jnp.broadcast_to(curr_pos, (W, 3)))
    x0 = jnp.concatenate([curr_pos, curr_vel])
    qp = qplib.build_qp(cfg, x0, xref, qpos, qsize, qyaw,
                        qdyn, active, lin, fov_rows=fov)
    warm = jnp.where(state.has_solution,
                     qplib.merge_z(state.states_sol, state.controls_sol),
                     jnp.zeros(cfg.num_vars))
    res = admm_solve(cfg, qp, warm, max_iter, rho_override=state.rho)
    Xs, Us = qplib.split_z(res.x, cfg)
    accepted = jnp.isfinite(res.prim_res) & (res.prim_res < 1e3) \
        & jnp.all(jnp.isfinite(res.x))
    new_state = PlannerState(
        states_sol=jnp.where(accepted, Xs, state.states_sol),
        controls_sol=jnp.where(accepted, Us, state.controls_sol),
        first_time=state.first_time & ~accepted,
        has_solution=state.has_solution | accepted,
        last_ref_start=new_start,
        xref=jnp.where(accepted, xref, state.xref),
        rho=(res.rho_suggest if cfg.solver.temporal_rho else state.rho),
        # carried shared-factor fields pass through untouched (the
        # non-predictor path factors per solve)
        fac_d=state.fac_d, fac_e=state.fac_e, fac_c=state.fac_c,
        fac_minv=state.fac_minv)
    one = jnp.zeros(6, bool).at[0].set(accepted)
    return PlanOutput(state=new_state, valid=accepted,
                      best_idx=jnp.asarray(0, jnp.int32),
                      candidate_states=jnp.broadcast_to(Xs[None], (6, H, 8)),
                      solved=one, prim_res=jnp.full(6, res.prim_res))


# ---------------------------------------------------------------------------
# Trajectory sampling (getPos/getVel/getAcc/getRef, mpcPlanner.cpp:1257-1324)
# ---------------------------------------------------------------------------

def sample_pos(cfg: PlannerConfig, states_sol: jnp.ndarray, t) -> jnp.ndarray:
    return _interp(states_sol[:, 0:3], cfg.ts, t)


def sample_vel(cfg: PlannerConfig, states_sol: jnp.ndarray, t) -> jnp.ndarray:
    return _interp(states_sol[:, 3:6], cfg.ts, t)


def sample_acc(cfg: PlannerConfig, controls_sol: jnp.ndarray, t) -> jnp.ndarray:
    return _interp(controls_sol[:, 0:3], cfg.ts, t)


def sample_ref(cfg: PlannerConfig, xref: jnp.ndarray, t) -> jnp.ndarray:
    return _interp(xref, cfg.ts, t)


def _interp(rows: jnp.ndarray, ts: float, t) -> jnp.ndarray:
    """Linear interpolation with end clamping: idx = floor(t/ts), clamped;
    next = min(idx+1, N-1)."""
    n = rows.shape[0]
    idx = jnp.clip(jnp.floor(t / ts).astype(jnp.int32), 0, n - 1)
    nxt = jnp.minimum(idx + 1, n - 1)
    frac = (t - idx.astype(rows.dtype) * ts) / ts
    return rows[idx] + (rows[nxt] - rows[idx]) * frac
