"""Configuration dataclasses for the TPU-native Intent-MPC framework.

Default values mirror the reference benchmark configuration
(`autonomous_flight/cfg/mpc_navigation/*.yaml` in kotakondo/Intent-MPC):

- planner:   planner_param.yaml (mpc_planner/*)
- predictor: predictor_param.yaml
- detector:  fake_detector_param.yaml + mapping_param.yaml (robot_size)
- world:     dynus_obstacles_ros1/src/dynus_obstacles_node.cpp:53-90
- flight:    flight_base.yaml
- control:   tracking_controller/cfg/controller_param.yaml

All configs are frozen (hashable) so they can be closed over by jitted
functions as static arguments.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
import math
from typing import Tuple


@dataclass(frozen=True)
class WorldConfig:
    """Seeded DYNUS-style obstacle world.

    Reference: dynus_obstacles_ros1/src/dynus_obstacles_node.cpp:53-152.
    """

    num_obstacles: int = 200
    dynamic_ratio: float = 0.65
    x_range: Tuple[float, float] = (5.0, 105.0)
    y_range: Tuple[float, float] = (-15.0, 15.0)
    z_range: Tuple[float, float] = (0.0, 7.0)
    slower_range: Tuple[float, float] = (4.0, 6.0)
    scale_range: Tuple[float, float] = (2.0, 4.0)
    offset_range: Tuple[float, float] = (0.0, 3.0)
    bbox_dynamic: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    bbox_static_vert: Tuple[float, float, float] = (0.4, 0.4, 4.0)
    bbox_static_horiz: Tuple[float, float, float] = (0.4, 4.0, 0.4)
    percentage_vert: float = 0.35  # fraction of static obstacles that are pillars


@dataclass(frozen=True)
class DetectorConfig:
    """Ground-truth detector with finite-difference state estimation.

    Reference: onboard_detector/include/onboard_detector/fakeDetector.cpp:138-258
    (stateCB finite differencing), :525-553 (history getter), and
    fake_detector_param.yaml (history_size=100, color_distance=30).
    """

    history_size: int = 100
    sensor_range: float = 30.0          # color_distance: 2D range gate
    robot_size: Tuple[float, float, float] = (0.5, 0.5, 0.3)  # mapping_param.yaml
    fd_period: float = 0.1              # min dT for velocity/acceleration finite diff
    history_period: float = 1.0 / 30.0  # histCB timer (fakeDetector.cpp:69)


@dataclass(frozen=True)
class RealDetectorConfig:
    """Depth-camera dynamic-detector stack flown in the closed loop
    (EngineConfig.use_fake_detector=False): rendered depth -> projected
    points -> DBSCAN clusters -> AABBs -> const-vel KF tracks -> dynamic
    classification votes -> predictor-format histories.

    Reference: onboard_detector/dynamicDetector.cpp detectionCB/trackingCB/
    classificationCB selected over the fake detector by use_fake_detector
    (mpcNavigation.cpp:129-136); camera knobs from dynamic_detector_param
    (depth intrinsics, depth_min/max_value, dbscan_min_points_cluster)."""

    im_h: int = 64
    im_w: int = 96
    fx: float = 80.0
    fy: float = 80.0
    cx: float = 48.0
    cy: float = 32.0
    depth_min: float = 0.3
    depth_max: float = 9.0
    skip: int = 2                     # depth_skip_pixel
    cam_z_offset: float = 0.0         # camera height above body origin
    dbscan_eps: float = 0.5           # dbscan_search_range_epsilon
    dbscan_min_pts: int = 6           # dbscan_min_points_cluster
    min_cluster_pts: int = 6          # cluster -> detection threshold
    min_box_size: float = 0.2         # AABB floor (front-face clusters)
    max_detections: int = 8           # detection slots per frame
    max_tracks: int = 8               # track table size (history slots)
    match_max_dist: float = 1.5       # association gate
    dyn_vote_thresh: float = 2.0      # classification votes -> dynamic
    dyn_vel_thresh: float = 0.3       # dynamic_velocity_threshold
    miss_max: int = 10                # coasting frames before a track dies
    kf_size_inflation: float = 0.0    # inflate each track's reported size
                                      # by this multiple of its KF
                                      # position std (sqrt diag P[0:3]) —
                                      # uncertainty-aware safety margin,
                                      # the track-level analogue of the
                                      # predictor's z-score sample-std
                                      # size inflation (genTraj,
                                      # dynamicPredictor.cpp:503-538).
                                      # Motivated by the round-5 veto
                                      # A/B: spurious static tracks were
                                      # ACCIDENTAL conservatism, and
                                      # removing them exposed the 0.69 m
                                      # track RMSE at 2/32 knife-edge
                                      # seeds. VERDICT (32-seed sweep,
                                      # results/real_dynus32_final):
                                      # measured NEGATIVE — KF-std
                                      # inflation under-covers the
                                      # systematically biased visible-
                                      # face tracks (3/32 collisions vs
                                      # 0/32 no-veto). Stays OFF; see
                                      # RESULTS.md "Spurious-rate
                                      # attack"
    static_map_veto: bool = False     # veto dynamic classification for
                                      # tracks sitting inside the prebuilt
                                      # static map's occupied cells (the
                                      # dynamicMap composition's converse:
                                      # the map already feeds those
                                      # obstacles to the MPC via
                                      # clustering rows, and a static
                                      # pillar's visible-face centroid
                                      # moves with the viewpoint, which
                                      # the centroid-velocity vote — a
                                      # TPU-shaped stand-in for the
                                      # reference's per-POINT voting,
                                      # classificationCB :809-914 —
                                      # misreads as motion. Works as
                                      # perception metrology (spurious
                                      # 0.37 -> 0.03, RMSE unchanged)
                                      # but the phantom rows are load-
                                      # bearing safety margin: every
                                      # veto variant collides at
                                      # protocol scale (1-3 per 28-32
                                      # seeds) where no-veto is 0/32.
                                      # Stays OFF in flight; RESULTS.md
                                      # "Spurious-rate attack"


@dataclass(frozen=True)
class PredictorConfig:
    """Markov-chain intent predictor + multi-hypothesis rollouts.

    Reference: dynamic_predictor/include/dynamic_predictor/dynamicPredictor.cpp
    and predictor_param.yaml.
    """

    num_pred: int = 30                # prediction_size
    dt: float = 0.1                   # prediction_time_step
    z_score: float = 0.674            # prediction_z_score
    min_turning_time: float = 2.0
    max_turning_time: float = 3.0
    max_front_prob: float = 0.5
    front_angle_deg: float = 25.0
    stop_vel: float = 0.1             # stop_velocity_thereshold
    pscale: float = 5.0               # prob_scale_param

    # Fixed-shape sample-grid sizes (the reference uses data-dependent
    # `for(double i=min; i<max; i+=step)` loops, dynamicPredictor.cpp:365-366,
    # :438-440; we use padded grids + validity masks).
    forward_angle_step: float = 0.1
    forward_speed_step: float = 0.1
    max_forward_speed_samples: int = 32
    turning_speed_step: float = 0.2
    turning_angvel_step: float = 0.2
    turning_end_step: float = 0.2
    max_turning_speed_samples: int = 16

    # ---- derived parameters (dynamicPredictor.cpp:66-106) ----
    @property
    def front_angle(self) -> float:
        return self.front_angle_deg * math.pi / 180.0

    @property
    def param_l(self) -> float:
        return (1.0 - self.max_front_prob) / (3.0 * self.max_front_prob - 1.0)

    @property
    def param_r(self) -> float:
        return self.param_l

    @property
    def param_f(self) -> float:
        fa = self.front_angle
        pl = self.param_l
        return math.sqrt(fa * fa / (-2.0 * math.log(pl * (1.0 + math.sin(fa)) - pl)))

    @property
    def param_s(self) -> float:
        return math.atanh(0.5) / self.stop_vel

    @property
    def num_forward_angle_samples(self) -> int:
        # for(i=minAngle; i<maxAngle; i+=0.1) over a 2*front_angle span
        return int(math.ceil(2.0 * self.front_angle / self.forward_angle_step - 1e-12))

    @property
    def num_turning_angvel_samples(self) -> int:
        lo = (math.pi / 2.0) / self.max_turning_time
        hi = (math.pi / 2.0) / self.min_turning_time
        return int(math.ceil((hi - lo) / self.turning_angvel_step - 1e-12))

    @property
    def num_turning_end_samples(self) -> int:
        span = math.pi - 2.0 * self.front_angle
        return int(math.ceil(span / self.turning_end_step - 1e-12))


@dataclass(frozen=True)
class SolverConfig:
    """OSQP-style ADMM settings for the batched QP solver.

    The reference vendors OsqpEigen over libosqp (trajectory_planner/
    third_party/OsqpEigen), warm-started, time-limited to 0.05 s per solve
    (mpcPlanner.cpp:436-527). We replace the wall-clock cap with a fixed
    iteration budget (static shapes for XLA).
    """

    rho: float = 0.1
    rho_eq_scale: float = 1e3         # OSQP uses rho*1e3 on equality rows
    sigma: float = 1e-6
    alpha: float = 1.6
    max_iter: int = 100               # production default. Round 5 shipped
                                      # the 75-iteration frontier point
                                      # (+21% throughput, jerk RMS on the
                                      # real-OSQP anchor's 181) on 64-seed
                                      # evidence, then 256-seed validation
                                      # exposed a collision tail the 64
                                      # seeds cannot see: 2/256 collide at
                                      # 75 iters (seeds 84, 130 — normal-
                                      # transit grazes; 84 passes at 9 mm
                                      # on CPU rounding) where 100 iters
                                      # is 0/256 and the reference's own
                                      # solver flies both seeds clean
                                      # (results/dynus_256_r5 vs
                                      # dynus_256_it100, osqp_84_130).
                                      # The default keeps the 0-collision
                                      # record; the 75-iter anchored-
                                      # smoothness regime stays available
                                      # as --iters 75 with its measured
                                      # 0.8% tail documented (RESULTS.md
                                      # "256-seed validation", round 5).
                                      # The 0.05 s OSQP time limit lands
                                      # mid-ramp (mpcPlanner.cpp:442-444)
    warm_start: bool = True
    scaling_iters: int = 3            # Ruiz equilibration sweeps (0 disables)
    refine_iters: int = 0             # iterative-refinement steps per x-update.
                                      # 0 halves the HBM-bound factor traffic per
                                      # iteration; measured f32 floor cost is only
                                      # ~1.5e-3 in positions (tests use 1 for the
                                      # tightest parity)
    eps_abs: float = 1e-3             # residual reporting; with
                                      # truncation="osqp" also the
                                      # termination tolerances
    eps_rel: float = 1e-3
    truncation: str = "fixed"         # "fixed": run exactly max_iter
                                      # iterations (static schedule, the
                                      # throughput default). "osqp":
                                      # emulate OSQP 0.6.2's runtime
                                      # termination (VERDICT r3 item 3b):
                                      # check the UNSCALED residuals
                                      # every term_check_interval
                                      # iterations (check_termination=25)
                                      # against eps_abs/eps_rel, FREEZE a
                                      # problem at its own convergence
                                      # point, cap at max_iter (the
                                      # 0.05 s time-limit analogue).
                                      # Batched solves run until every
                                      # lane terminates, so this trades
                                      # throughput for solution
                                      # consistency (the anchor-gap
                                      # experiment, RESULTS.md)
    term_check_interval: int = 25     # iterations between termination
                                      # checks (OSQP check_termination)
    factor_drift_refresh: float = 0.0  # drift-aware factor refresh
                                      # (VERDICT r4 item 6): when > 0,
                                      # the shared-factor reuse branch
                                      # ALSO refactors whenever the
                                      # active obstacle-row gradients'
                                      # relative Frobenius drift since
                                      # the last refresh exceeds this
                                      # threshold; factor_reuse_cycles
                                      # stays the fixed ceiling. 0 keeps
                                      # the pure counter predicate
    adaptive_rho: bool = False        # OSQP's in-solve rho adaptation +
                                      # refactorization every
                                      # adapt_interval iterations
                                      # (standalone factor=None solves;
                                      # the structured factorization makes
                                      # refactors cheap). Off in the
                                      # closed loop: the shared-factor
                                      # path covers it and the infeasible
                                      # DYNUS regime measured unstable
                                      # under rho adaptation (see
                                      # temporal_rho)
    adapt_interval: int = 25          # iterations between adaptation
                                      # checks (OSQP default)
    structured_factor: bool = True    # factor the x-update normal matrix
                                      # via its block-tridiagonal horizon
                                      # structure (ops/block_chol.py)
                                      # instead of a dense (n,n) Cholesky +
                                      # triangular solves — the dense
                                      # factorization was the measured
                                      # on-chip setup hotspot (RESULTS.md)
    shared_factor: bool = True        # factor the x-update normal matrix
                                      # ONCE per scenario (union-activity
                                      # mean QP) instead of once per intent
                                      # candidate; candidates refine
                                      # against their own M in closed form.
                                      # The on-chip profile (RESULTS.md) is
                                      # setup-dominated, so this removes
                                      # ~5/6 of the Cholesky cost: measured
                                      # 3100 -> 4757 solves/s at batch 32
                                      # with identical DYNUS quality
    fused_solve: bool = False         # solve the whole fleet's candidate
                                      # QPs in ONE VMEM-resident Pallas
                                      # kernel (ops/pallas_fused.py) via
                                      # custom_vmap under the engine's
                                      # scenario vmap. Hardware-correct
                                      # and DYNUS-gated (16/16, 0
                                      # collisions) but MEASURED SLOWER
                                      # than the XLA path (4525 vs 5736
                                      # solves/s at batch 32): the
                                      # infeasible-regime dual ramps force
                                      # bf16x6 dots, at which the x-update
                                      # is MXU-pass-bound and VMEM
                                      # residency buys nothing (RESULTS.md
                                      # kernel post-mortem) -> off
    woodbury_candidates: bool = False  # shared-factor solves with known
                                      # differing slots (the engine path)
                                      # apply an EXACT Woodbury correction
                                      # for the candidate's obstacle rows
                                      # instead of iterative refinement:
                                      # M_c^{-1} = Minv - Minv U C^{-1}
                                      # U^T Minv over the 4W rank-1 terms
                                      # of the two differing slots (the
                                      # shared factor is built with those
                                      # rows removed, so C is SPD).
                                      # Measured on v5e at batch 32:
                                      # 4585 solves/s vs 5037 for 3-step
                                      # refinement (per-candidate U/T HBM
                                      # reads each iteration) with equal
                                      # DYNUS quality -> off by default on
                                      # the XLA path; it is the exact
                                      # x-update for the fused kernel
    block_refine: bool = False        # refinement via (H,13,13) block
                                      # apply (ops/block_chol.block_apply).
                                      # MEASURED NEGATIVE on v5e: 13-wide
                                      # blocks pad to 128 lanes whether
                                      # lowered as dot_general or
                                      # broadcast-multiply-reduce (44 ms vs
                                      # 32 ms/cycle at batch 32), so the
                                      # closed-form round trip stays the
                                      # default refinement operator
    folded_refine: bool = False       # refinement normal-operator apply
                                      # with D/E/rho pre-folded into the
                                      # constraint data once per solve
                                      # (ops/admm.make_folded_m_op).
                                      # MEASURED NEGATIVE on v5e: equal
                                      # at batch 32 (6288 vs 6311
                                      # solves/s), 40% SLOWER at batch
                                      # 128 (5643 vs 9330) — XLA already
                                      # fuses the scaled a_s/at_s round
                                      # trip to its cost floor, and the
                                      # folded form's concats/rescale
                                      # passes break that fusion at
                                      # large batch. Kept as a tested
                                      # equivalent operator (test_qp)
    shared_refine_mode: str = "cg"    # x-update refinement recurrence:
                                      # "cg" preconditioned CG on this
                                      # candidate's normal system
                                      # (Krylov-optimal step scalars; one
                                      # fewer Minv read than stationary at
                                      # equal normal-operator count), or
                                      # "stationary" x += Minv r. Measured
                                      # on v5e at batch 32: cg-2 6247
                                      # solves/s with FULL DYNUS gate
                                      # (16/16, 0 collisions, travel
                                      # 25.7 s) vs stationary-3 5699-5736;
                                      # stationary-2 and cg-1 both fail
                                      # the gate (timeouts)
    shared_refine_warm_frac: float = 0.0  # fraction of the iteration budget
                                      # run with shared_refine_warm
                                      # refinement steps before switching
                                      # to shared_refine_iters (0 = uniform)
    shared_refine_warm: int = 1       # cheap-phase refinement count
    shared_refine_x0: str = "prev"    # CG x-update initial guess:
                                      # "prev" (default) = the previous
                                      # ADMM iteration's x-tilde — the
                                      # iterates drift slowly, so the
                                      # Krylov correction starts closer
                                      # AND one of the three HBM-bound
                                      # Minv applies per iteration is
                                      # saved. Measured (round 3): 9245
                                      # -> 10583 solves/s at batch 128,
                                      # 6224 -> 6824 at batch 32, with an
                                      # identical 16-seed DYNUS gate
                                      # (16/16, 0 collisions, in-family
                                      # violation stats). "minv" =
                                      # round-2 behavior (preconditioner
                                      # apply Minv @ rhs)
    shared_refine_iters: int = 2      # refinement steps per x-update when
                                      # solving with a shared factor.
                                      # cg-2 keeps full DYNUS closed-loop
                                      # quality (16/16 success, 0
                                      # collisions); stationary needed 3
                                      # (2 showed 2/16 timeouts), cg-1
                                      # fails (7/16 timeouts) — the gate
                                      # results live in RESULTS.md
    minv_dtype: str = "f32"           # dtype of the SHARED x-update
                                      # factor (admm_factor's explicit
                                      # inverse). "bf16" would halve the
                                      # iteration's dominant HBM term
                                      # (the (n,n) inverse re-read per
                                      # preconditioner apply) and is
                                      # formally safe — CG evaluates the
                                      # exact f32 normal operator — but
                                      # MEASURED NEGATIVE on quality
                                      # grounds before perf was even
                                      # timed: the ~0.4% preconditioner
                                      # perturbation collapses CG-2's
                                      # per-iteration residual reduction
                                      # on this ill-conditioned QP class
                                      # (standalone horizon-10 solve:
                                      # prim_res 1.03 vs ~1e-2 f32 at a
                                      # 400-iteration budget —
                                      # test_qp.test_bf16_...). Same
                                      # landmine as the fused kernel's
                                      # bf16x6 dots (RESULTS.md
                                      # post-mortem); kept as a flag +
                                      # pinned negative
    ew_kernel: bool = False           # fuse the per-iteration elementwise
                                      # relax/project/dual/x-blend chain
                                      # (plus the next iteration's
                                      # rho*z - y) into ONE Pallas VPU
                                      # kernel dispatch per iteration
                                      # (ops/pallas_ew.py) — the
                                      # roofline's dispatch-gap attack
                                      # with NO matmuls in-kernel (the
                                      # bf16-dot landmine of the fused
                                      # fleet kernel is never touched).
                                      # Math identical to the grouped
                                      # chain (test_pallas_ew pins it);
                                      # measured numbers in RESULTS.md
    flat_iter: bool = False           # run the shared-factor ADMM scan in
                                      # FLAT constraint space: z/y as one
                                      # (m,) vector, the qp-invariant
                                      # eq/sb/cb rows of A and A^T as a
                                      # single matmul against a static
                                      # (625, n) constant, obstacle rows
                                      # via pre-folded coefficients —
                                      # ~4x fewer ops per iteration (the
                                      # roofline's dispatch-gap lever).
                                      # Same math as the grouped path
                                      # (test_qp pins the iterates);
                                      # measured numbers in RESULTS.md
    factor_reuse_cycles: int = 4      # recompute the shared x-update
                                      # factor (Ruiz scaling + structured
                                      # inverse) only every k-th replan
                                      # cycle, reusing the previous
                                      # cycle's from the planner carry in
                                      # between — the 10 Hz QP sequence
                                      # evolves slowly and the CG
                                      # refinement absorbs the drift
                                      # (VERDICT r2 item 8). 1 = every
                                      # cycle (round-2 behavior); 4 is
                                      # the measured default (RESULTS.md:
                                      # +4-9% solves/s on top of the
                                      # warm-start x-update, identical
                                      # 16-seed gate). After a mid-flight
                                      # planner reset the carried factor
                                      # is an identity preconditioner for
                                      # <= k-1 cycles (CG still corrects
                                      # against the true operator). The
                                      # stale-factor branch rides a
                                      # scalar-predicate lax.cond (the
                                      # cycle counter is batch-uniform),
                                      # so the skipped factorization is
                                      # genuinely not computed under
                                      # vmap. Ignored when FOV rows are
                                      # on (the carried factor has no
                                      # FOV slots). Measured: see
                                      # RESULTS.md
    temporal_rho: bool = False        # carry OSQP's adaptive-rho suggestion
                                      # across replan cycles. Off by default:
                                      # in the chronically-infeasible DYNUS
                                      # regime the adaptation destabilizes
                                      # the compromise iterates (measured
                                      # collision-rate regression)
    # --- OSQP-style active-set polish (ops/polish.py) ---
    polish: bool = False              # polish the CHOSEN candidate's
                                      # solution each replan (engine path);
                                      # the standalone parity tests call
                                      # ops.polish.polish directly
    polish_reg: float = 3e-6          # ridge on the Jacobi-scaled
                                      # condensed Schur complement (the
                                      # f32 analogue of OSQP's polish
                                      # `delta`; compensated defect
                                      # correction removes its bias)
    polish_iters: int = 12            # compensated defect-correction steps
    polish_rounds: int = 2            # primal-dual active-set passes:
                                      # round k>1 re-detects from round
                                      # k-1's exact KKT point and duals
                                      # (violated rows pin, wrong-sign
                                      # duals drop)
    polish_tol: float = 1e-5          # bound-proximity tie-break for rows
                                      # whose slack AND dual are both ~0
                                      # (the decisive criterion is OSQP's
                                      # slack-vs-dual comparison)
    polish_accept_tol: float = 1e-4   # feasibility gate on inactive rows


@dataclass(frozen=True)
class PlannerConfig:
    """MPC planner parameters.

    Reference: planner_param.yaml (mpc_planner/*) and flight_base.yaml
    (desired_velocity/acceleration become max_vel/max_acc, mpcNavigation.cpp:161-162).
    """

    horizon: int = 30
    ts: float = 0.1
    y_range: Tuple[float, float] = (-5.0, 5.0)
    z_range: Tuple[float, float] = (0.5, 4.5)
    static_safety_dist: float = 0.8
    dynamic_safety_dist: float = 1.5
    static_slack: float = 0.01        # static_constraint_slack_ratio
    dynamic_slack: float = 0.2        # dynamic_constraint_slack_ratio
    position_weight: float = 1000.0
    velocity_weight: float = 0.0
    acceleration_weight: float = 10.0
    dummy_state_weights: Tuple[float, float] = (100.0, 1000.0)  # mpcPlanner.cpp:928
    slack_control_weights: Tuple[float, float] = (1.0, 1.0)     # mpcPlanner.cpp:930
    max_vel: float = 5.0
    max_acc: float = 20.0
    max_obstacles: int = 64           # padded obstacle-slot count (fixed shapes)
    static_clustering: bool = False   # cluster the local static map into
                                      # rotated-box MPC rows each cycle
                                      # (getStaticObstacles; the
                                      # real-perception composition —
                                      # statics reach the planner via
                                      # map -> obstacleClustering instead
                                      # of the fake detector. The DYNUS GT
                                      # bench disables clustering,
                                      # mpcPlanner.cpp:191-193)
    cluster_window: Tuple[int, int, int] = (48, 48, 24)
                                      # local-cloud voxel window around
                                      # the drone (x ~9.6 m at 0.2 m res)
    cluster_points: int = 512         # fixed local-cloud size (top-k
                                      # nearest occupied voxel centers)
    cluster_slots: int = 16           # StaticObstacles slots appended to
                                      # every candidate QP (ClusteringConfig
                                      # max_clusters=4, tree_level=2)
    num_intent_candidates: int = 6    # intent combos per replan (mpcPlanner.cpp:715)
    consistency_steps: int = 10       # getConsistencyScore (mpcPlanner.cpp:781)
    direction_weight_a: float = 3.0   # findClosestObstacle (mpcPlanner.cpp:696)
    max_ref_forward_time: float = 3.0 # getReferenceTraj window (mpcPlanner.cpp:1210)
    solver: SolverConfig = SolverConfig()

    @property
    def mpc_window(self) -> int:
        return self.horizon - 1

    @property
    def num_vars(self) -> int:
        return 8 * self.horizon + 5 * self.mpc_window


@dataclass(frozen=True)
class ControlConfig:
    """Cascaded PID tracking controller (acceleration output mode).

    Reference: tracking_controller/cfg/controller_param.yaml and
    trackingController.cpp:426-523 (computeAttitudeAndAccRef).
    """

    position_p: Tuple[float, float, float] = (2.0, 2.0, 1.8)
    position_i: Tuple[float, float, float] = (0.0, 0.0, 0.1)
    position_d: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    velocity_p: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    velocity_i: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    velocity_d: Tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclass(frozen=True)
class EngineConfig:
    """Closed-loop engine timing and termination.

    The reference runs mpcCB at 10 Hz, trajExeCB/controller at 100 Hz,
    detector history at 30 Hz (mpcNavigation.cpp:176-188, fakeDetector.cpp:69).
    Our engine uses a 100 Hz base tick with an outer scan over 10 Hz MPC
    cycles and an inner loop of `ticks_per_cycle` control ticks.
    """

    control_dt: float = 0.01
    ticks_per_cycle: int = 10            # MPC every 10 control ticks (10 Hz)
    hist_ticks: Tuple[int, ...] = (0, 3, 6)  # ~30 Hz history snapshots per cycle
    timeout: float = 100.0               # run_mpc_benchmark.py --timeout default
    goal_dist_threshold: float = 0.5     # run_mpc_benchmark.py:269
    goal_vel_threshold: float = 0.1
    goal_stop_threshold: float = 0.3     # replanCheckCB goal-dist (mpcNavigation.cpp:423)
    plant: str = "double_integrator"     # closed-loop plant:
                                         # "double_integrator" (the array
                                         # plant of the DYNUS bench) or
                                         # "quadrotor" — the Gazebo
                                         # quadcopterPlugin acc-control
                                         # rigid body (models/quad_plant)
    perfect_tracking: bool = False       # True: odom == commanded target
    use_predictor: bool = True           # autonomous_flight/use_predictor:
                                         # False -> constant-obstacle MPC
                                         # (updateDynamicObstacles + makePlan)
    use_fake_detector: bool = True       # mpcNavigation.cpp:129-136: True
                                         # selects the GT fake detector
                                         # (models/detector.py, the DYNUS
                                         # bench path); False flies the
                                         # REAL perception stack — rendered
                                         # depth -> DBSCAN -> KF tracks ->
                                         # classification votes
                                         # (models/real_detector.py) — at
                                         # the ~30 Hz hist ticks, with the
                                         # predictor/MPC consuming track
                                         # histories instead of GT
    use_fov: bool = False                # FOV half-space rows in the MPC
                                         # (the reference's 3-argument
                                         # updateCurrStates with the camera
                                         # wedge; off in the DYNUS bench).
                                         # The engine then carries a yaw
                                         # state following the trajectory
                                         # heading (trajExeCB :543-555)
    repeat_path: int = 1                 # execute_path_times: re-track the
                                         # reference path N times before the
                                         # goal stop (replanCheckCB :438-455)
    replan_check: bool = True            # committed-trajectory collision
                                         # monitor each cycle (replanCheckCB
                                         # mpcHasCollision :631-656 +
                                         # hasDynamicCollision :669-700).
                                         # Predefined-goal mode: counted +
                                         # replan-while-executing (:414-422,
                                         # a no-op here — the engine replans
                                         # every cycle). Goal mode: triggers
                                         # stop+replan (:474-480)
    goal_mode: bool = False              # interactive-goal navigation
                                         # (usePredefinedGoal_=false): goal
                                         # stop at 0.3 m without the 3 s
                                         # tracking gate (:482-494), invalid-
                                         # goal stop when the goal region is
                                         # statically occupied (:460-471 via
                                         # goalHasCollision :612-629), and
                                         # stop+replan on committed-traj
                                         # collision with the reference
                                         # re-anchored at the stop position
                                         # (the straight-line equivalent of
                                         # the 2-waypoint min-snap rebuild,
                                         # mpcCB :268-288)
    predictor_stale_hist: bool = False   # measurement knob (VERDICT r4
                                         # item 7): feed the predictor the
                                         # detector history as of the LAST
                                         # 30 Hz tick of the previous
                                         # cycle instead of the fresh
                                         # cycle-start push — bounds the
                                         # reference's 30 Hz-timer
                                         # staleness (predCB fires up to
                                         # 33 ms before mpcCB consumes,
                                         # dynamicPredictor.cpp:146).
                                         # Default False = the engine's
                                         # 0 ms-stale at-MPC-time cadence
    render_static_grid: bool = True      # real-detector camera also ray-
                                         # marches the static occupancy
                                         # grid (prebuilt-map scenes whose
                                         # statics exist ONLY in the map).
                                         # Set False when the statics are
                                         # already scenario boxes (the
                                         # DYNUS protocol world) — the box
                                         # render images them at physical
                                         # size; marching the inflated
                                         # grid too would double-render
                                         # them 0.3 m too large
    yaw_lookahead: float = 1.0           # trajExeCB :536-553: target yaw
                                         # points at the first reference-
                                         # trajectory point >= this distance
                                         # ahead of getRef(t); hold yaw if
                                         # none. <= 0 restores the round-2
                                         # velocity-heading behavior
    # ---- goal-mode MPC input-trajectory composition (ref_builder) ----
    ref_mode: str = "linspace"           # "linspace": straight-segment input
                                         # traj (round-3 behavior, valid over
                                         # an empty map); "minsnap": the
                                         # reference's 2-waypoint corridor-
                                         # constrained min-snap
                                         # (mpcNavigation.cpp:267-289);
                                         # "global": RRT route first
                                         # (useGlobalPlanner_, :240-265)
    ref_vel: float = 1.0                 # polyTraj desired velocity
                                         # (poly_traj/desired_velocity)
    ref_waypoints: int = 8               # RRT-route resample count (static
                                         # min-snap shape; global mode)
    ref_rrt_iters: int = 512             # RRT iteration budget
    ref_rrt_step: float = 0.5            # RRT incremental_dist; raise for
                                         # long corridors (105 m DYNUS
                                         # routes need step ~2.5 so the
                                         # 64-slot path cap holds)
    ref_rrt_shortcut: float = 3.0        # shortcutting max segment length
    ref_bounds_margin: float = 2.0       # RRT sampling box beyond start/goal
    ref_z_min: float = 0.3               # RRT sampling floor
    ref_corridor_radius: float = 0.5     # poly_traj/initial_radius
    ref_poly_iters: int = 400            # min-snap dense-ADMM iterations
    ref_angular_vel: float = 1.0         # pwl-failsafe rotation rate; keep
                                         # rotation holds shorter than the
                                         # MPC window (horizon*ts) or the
                                         # monotone nearest-point reference
                                         # search can pin at the hold (the
                                         # reference shares this quirk at
                                         # rotations > 3 s,
                                         # getReferenceTraj :1199-1231)
    vel_limit: float = 5.0               # DYNUS Linf violation limits
    acc_limit: float = 20.0
    jerk_limit: float = 100.0
    violation_tol: float = 1e-3
    # ---- goal-approach safety relaxation (opt-in, BEYOND-reference) ----
    # The benchmark's only failure mode (5.1% of 256 seeds; externally
    # adjudicated — the reference's own solver fails the same 13 seeds
    # 0/13, RESULTS.md round-5 adjudication) is a goal-occlusion
    # standoff: dynamic obstacles dwelling at the goal keep the fixed
    # 1.5 m safety ellipsoids over the 0.5 m goal criterion and the
    # drone parks ~1 m out forever. With goal_relax=True the engine
    # counts consecutive stalled cycles (near goal, low speed, not yet
    # arrived) and anneals the DYNAMIC safety distance fed to the QP
    # obstacle rows, floor-clamped; leaving the stall region resets.
    # Static safety, scoring, and the collision monitor are untouched.
    goal_relax: bool = False
    goal_relax_radius: float = 4.0       # stall region: dist-to-goal below
    goal_relax_speed: float = 0.4        # ... and speed below (m/s)
    goal_relax_grace: int = 20           # stalled cycles (2 s) before
                                         # annealing starts
    goal_relax_rate: float = 0.02        # safety shed per stalled cycle
                                         # past grace (m); 0.02 -> full
                                         # 1.5->0.5 anneal over 7 s
    goal_relax_floor: float = 0.5        # never below this dynamic safety.
                                         # A deeper second-stage floor
                                         # (0.25 after a 20 s hard stall)
                                         # was a measured NEGATIVE: on the
                                         # one residual seed (238, an
                                         # obstacle constellation parked ON
                                         # the goal all episode) it grazes
                                         # to 0.02 m without converting the
                                         # criterion — the feature
                                         # correctly refuses to trade
                                         # contact for the goal (RESULTS.md
                                         # round 5)

    @property
    def num_cycles(self) -> int:
        cycle_dt = self.control_dt * self.ticks_per_cycle
        return int(round(self.timeout / cycle_dt))


@dataclass(frozen=True)
class IntentMPCConfig:
    """Top-level bundle."""

    world: WorldConfig = WorldConfig()
    detector: DetectorConfig = DetectorConfig()
    real_detector: RealDetectorConfig = RealDetectorConfig()
    predictor: PredictorConfig = PredictorConfig()
    planner: PlannerConfig = PlannerConfig()
    control: ControlConfig = ControlConfig()
    engine: EngineConfig = EngineConfig()
    start: Tuple[float, float, float] = (0.0, 0.0, 2.0)
    goal: Tuple[float, float, float] = (105.0, 0.0, 2.0)

    def replace(self, **kwargs) -> "IntentMPCConfig":
        return dataclasses.replace(self, **kwargs)


def small_config(num_obstacles: int = 8, horizon: int = 10, timeout: float = 2.0,
                 max_obstacles: int = 8, hist: int = 12) -> IntentMPCConfig:
    """A tiny config for tests and dry runs."""
    c = IntentMPCConfig()
    return c.replace(
        world=dataclasses.replace(c.world, num_obstacles=num_obstacles),
        detector=dataclasses.replace(c.detector, history_size=hist),
        predictor=dataclasses.replace(c.predictor, num_pred=horizon),
        planner=dataclasses.replace(
            c.planner, horizon=horizon, max_obstacles=max_obstacles,
            solver=dataclasses.replace(c.planner.solver, max_iter=30)),
        engine=dataclasses.replace(c.engine, timeout=timeout),
    )
