"""Incremental dynamic exploration planner (DEP) — the roadmap-reuse port.

Rebuild of global_planner's DEP (global_planner/include/global_planner/
dep.cpp, 1388 LoC) with the INCREMENTAL structure the one-shot
frontier planner (models/exploration.py) lacks — VERDICT r2 items
"missing 5 / next 9". The reference's makePlan cycle (dep.cpp:309-353):

  detectFrontierRegion -> buildRoadMap (grow a PERSISTENT PRM by
  frontier-weighted sampling, :516-560) -> pruneNodes (drop nodes
  invalidated by new occupancy, :656-687) -> updateInformationGain
  (per-node unknown-voxel counts binned per yaw, :688-719 +
  calculateUnknown :1022-1070) -> getBestViewCandidates (gain priority
  queue with the minVoxelThresh cutoff, :721-787) -> findCandidatePath
  (A* on the roadmap, :789-812) -> findBestPath (score =
  unknown / (dist/vel + yawPenalty * yawDist/angularVel), :813-862).

Array-native formulation: the roadmap is a fixed-capacity node pool
carried across exploration steps (`RoadmapState`); sampling, pruning,
gain evaluation, shortest paths, and scoring are masked fixed-shape
ops, so a batch of explorers vmaps.

Documented deviations from dep.cpp, each a TPU-shaped substitution:
  * node growth samples frontier voxels directly (voxel-uniform sampling
    IS the reference's region-size weighting, :524-529) with the
    distThresh spacing check against existing nodes, instead of kNN
    extension from existing nodes;
  * roadmap shortest paths use masked Bellman-Ford relaxation over the
    radius/line-of-sight adjacency (exact shortest path — a superset of
    the reference's A* result) without the shortcut pass;
  * per-node gains recompute densely for all live nodes each step
    (vectorized); the reference's staleness bookkeeping (:688-719) is a
    CPU-budget workaround whose values findBestPath re-fresches along
    candidate paths anyway (:830-845), so scoring semantics match;
  * line-of-sight visibility for the gain (sensorFOVCondition :398-410)
    samples `los_samples` points along each node->voxel segment
    (0 disables, giving DEP's coarse occlusion-free bound).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models.exploration import ExplorationConfig, classify, frontiers


class DEPConfig(NamedTuple):
    capacity: int = 128          # roadmap node pool size
    samples_per_step: int = 16   # frontier samples tried per cycle
    dist_thresh: float = 0.8     # min node spacing (distThresh_)
    sensor_range: float = 5.0    # dmax_
    horizontal_fov: float = 1.57  # horizontalFOV_ (rad)
    vertical_fov: float = 1.0    # verticalFOV_ (rad)
    yaw_bins: int = 32           # yaws_ discretization (calculateUnknown)
    min_voxel_thresh: float = 0.1  # gain cutoff vs best (minVoxelThresh_)
    max_candidates: int = 8      # maxCandidateNum_
    connect_radius: float = 2.5  # roadmap edge radius
    edge_los_samples: int = 5    # collision samples per edge
    los_samples: int = 0         # gain visibility samples (0 = coarse)
    vel: float = 2.0             # vel_ (path-time scoring)
    angular_vel: float = 1.0     # angularVel_
    yaw_penalty: float = 1.0     # yawPenaltyWeight_
    max_path_len: int = 16       # Bellman-Ford relaxations / path walk
    explore: ExplorationConfig = ExplorationConfig()


class RoadmapState(NamedTuple):
    pos: jnp.ndarray        # (N, 3)
    valid: jnp.ndarray      # (N,) bool
    gain: jnp.ndarray       # (N,) total unknown voxels in sensor range
    yaw_gain: jnp.ndarray   # (N, B) unknown voxels per yaw bin


class DEPPlan(NamedTuple):
    path: jnp.ndarray       # (L, 3) start -> best view (padded by repeat)
    path_len: jnp.ndarray   # int32 live waypoints
    viewpoint: jnp.ndarray  # (3,)
    best_yaw: jnp.ndarray   # () heading maximizing gain at the viewpoint
    gain: jnp.ndarray       # () unknown voxels along the chosen path
    score: jnp.ndarray      # () findBestPath score of the winner
    success: jnp.ndarray    # () bool


def dep_init(cfg: DEPConfig, start: jnp.ndarray) -> RoadmapState:
    N, B = cfg.capacity, cfg.yaw_bins
    pos = jnp.zeros((N, 3), jnp.float32).at[0].set(start)
    return RoadmapState(
        pos=pos,
        valid=jnp.zeros(N, bool).at[0].set(True),
        gain=jnp.zeros(N, jnp.float32),
        yaw_gain=jnp.zeros((N, B), jnp.float32))


def _voxel_centers(shape, origin, res):
    ii, jj, kk = [jnp.arange(s) for s in shape]
    return jnp.stack(jnp.meshgrid(
        origin[0] + (ii + 0.5) * res,
        origin[1] + (jj + 0.5) * res,
        origin[2] + (kk + 0.5) * res, indexing="ij"), axis=-1)


def _grid_lookup(mask: jnp.ndarray, origin, res, pts: jnp.ndarray):
    """mask value at each point (False outside)."""
    idx = jnp.floor((pts - origin) / res).astype(jnp.int32)
    dims = jnp.array(mask.shape)
    inside = jnp.all((idx >= 0) & (idx < dims), axis=-1)
    idx = jnp.clip(idx, 0, dims - 1)
    return mask[idx[..., 0], idx[..., 1], idx[..., 2]] & inside


def node_gains(cfg: DEPConfig, log_odds: jnp.ndarray, origin, res,
               nodes: jnp.ndarray, valid: jnp.ndarray):
    """calculateUnknown (dep.cpp:1022-1070), vectorized over nodes x
    voxels: unknown voxels inside the sensor box (xy radius dmax, z range
    dmax*tan(vFOV/2)), not occupied, optionally line-of-sight visible;
    binned into a per-yaw histogram then window-summed over the
    horizontal FOV. Returns (gain (N,), yaw_gain (N, B))."""
    unknown, _, occupied = classify(log_odds, cfg.explore)
    centers = _voxel_centers(log_odds.shape, jnp.asarray(origin), res)
    flat_c = centers.reshape(-1, 3)                       # (V, 3)
    flat_u = (unknown & ~occupied).reshape(-1)            # (V,)
    B = cfg.yaw_bins
    z_range = cfg.sensor_range * jnp.tan(cfg.vertical_fov / 2.0)

    def one(p, ok):
        d = flat_c - p[None, :]
        dist = jnp.linalg.norm(d, axis=-1)
        in_box = ((dist <= cfg.sensor_range)
                  & (jnp.abs(d[:, 2]) <= z_range))
        vis = flat_u & in_box
        if cfg.los_samples > 0:
            ts = (jnp.arange(cfg.los_samples) + 1.0) / (cfg.los_samples + 1)
            seg = p[None, None, :] + ts[None, :, None] * d[:, None, :]
            blocked = jnp.any(_grid_lookup(occupied, jnp.asarray(origin),
                                           res, seg), axis=-1)
            vis = vis & ~blocked
        ang = jnp.arctan2(d[:, 1], d[:, 0])               # (V,)
        binidx = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * B).astype(
            jnp.int32) % B
        hist = jnp.zeros(B).at[binidx].add(vis.astype(jnp.float32))
        # circular window sum over the horizontal FOV
        half_bins = jnp.maximum(
            jnp.floor(cfg.horizontal_fov / 2.0 / (2 * jnp.pi / B)), 0
        ).astype(jnp.int32)
        offs = jnp.arange(-(B // 2), B // 2 + 1)
        win = (jnp.abs(offs) <= half_bins).astype(jnp.float32)
        idx = (jnp.arange(B)[:, None] + offs[None, :]) % B
        ygain = jnp.sum(hist[idx] * win[None, :], axis=-1)
        total = jnp.sum(vis)
        return jnp.where(ok, total, 0.0), jnp.where(ok, ygain, 0.0)

    return jax.vmap(one)(nodes, valid)


def dep_step(cfg: DEPConfig, log_odds: jnp.ndarray, origin, res,
             state: RoadmapState, curr_pos: jnp.ndarray,
             curr_yaw: jnp.ndarray, key) -> tuple[RoadmapState, DEPPlan]:
    """One exploration cycle: grow / prune / re-gain the persistent
    roadmap, then pick and route to the best view (dep.cpp makePlan)."""
    origin = jnp.asarray(origin, jnp.float32)
    unknown, free, occupied = classify(log_odds, cfg.explore)
    N = cfg.capacity

    # ---- buildRoadMap: frontier-weighted + free-space growth ----
    # dep.cpp grows from frontier samples first (:524-560) and then from
    # local/global free-space sampling (the localSampleThresh_/
    # globalSampleThresh_ loops that follow) — the free-space samples are
    # what keeps the roadmap CONNECTED between the explorer and the
    # frontier band. Half the step budget each.
    fr = frontiers(log_odds, cfg.explore).reshape(-1)
    k1, k2, k3 = jax.random.split(key, 3)
    S = cfg.samples_per_step
    S_fr = S - S // 2
    logits_fr = jnp.where(fr, 0.0, -jnp.inf)
    logits_free = jnp.where(free.reshape(-1), 0.0, -jnp.inf)
    idx_fr = jax.random.categorical(
        k1, logits_fr[None, :].repeat(S_fr, 0), axis=-1)
    idx_free = jax.random.categorical(
        k3, logits_free[None, :].repeat(S // 2, 0), axis=-1)
    sample_idx = jnp.concatenate([idx_fr, idx_free])
    dims = jnp.array(log_odds.shape)
    vox = jnp.stack([sample_idx // (dims[1] * dims[2]),
                     (sample_idx // dims[2]) % dims[1],
                     sample_idx % dims[2]], axis=-1)
    jitter = jax.random.uniform(k2, (S, 3))
    samples = origin + (vox + jitter) * res                # (S, 3)

    # validity: on a frontier (free) voxel, spaced from existing nodes
    # AND from earlier samples of this step (the reference inserts
    # sequentially, so each insert sees the previous ones)
    dist_to_nodes = jnp.linalg.norm(
        samples[:, None, :] - state.pos[None, :, :], axis=-1)
    dist_to_nodes = jnp.where(state.valid[None, :], dist_to_nodes, jnp.inf)
    spaced = jnp.min(dist_to_nodes, axis=-1) >= cfg.dist_thresh
    d_ss = jnp.linalg.norm(samples[:, None, :] - samples[None, :, :],
                           axis=-1)
    earlier = jnp.tril(jnp.ones((S, S), bool), k=-1)
    close_prior = jnp.any(earlier & (d_ss < cfg.dist_thresh), axis=-1)
    on_free = _grid_lookup(free, origin, res, samples)
    had_frontier = jnp.any(fr)
    new_ok = spaced & ~close_prior & on_free & had_frontier

    # insert into the first free slots (reference: roadmap_->insert)
    slot_order = jnp.argsort(state.valid)                  # invalid first
    slots = slot_order[: cfg.samples_per_step]
    can_insert = new_ok & ~state.valid[slots]
    pos = state.pos.at[slots].set(
        jnp.where(can_insert[:, None], samples, state.pos[slots]))
    valid = state.valid.at[slots].set(state.valid[slots] | can_insert)

    # ---- pruneNodes (:656-687): drop nodes the map now occupies ----
    node_occ = _grid_lookup(occupied, origin, res, pos)
    valid = valid & ~node_occ
    # the explorer's own position is always a valid node anchor (slot of
    # the nearest node re-anchors the graph to the drone)
    near = jnp.argmin(jnp.where(valid, jnp.linalg.norm(
        pos - curr_pos[None, :], axis=-1), jnp.inf))

    # ---- updateInformationGain (:688-719, dense re-evaluation) ----
    gain, yaw_gain = node_gains(cfg, log_odds, origin, res, pos, valid)

    # ---- getBestViewCandidates (:721-787) ----
    max_gain = jnp.max(jnp.where(valid, gain, 0.0))
    eligible = valid & (gain >= cfg.min_voxel_thresh * max_gain) \
        & (gain > 0)
    cand_score = jnp.where(eligible, gain, -jnp.inf)
    _, cand_idx = jax.lax.top_k(cand_score, cfg.max_candidates)
    cand_ok = cand_score[cand_idx] > 0

    # ---- roadmap adjacency + masked Bellman-Ford from the start node ----
    d_mat = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    conn = (d_mat <= cfg.connect_radius) & valid[:, None] & valid[None, :]
    ts = (jnp.arange(cfg.edge_los_samples) + 1.0) / (cfg.edge_los_samples + 1)
    seg = pos[:, None, None, :] + ts[None, None, :, None] * (
        pos[None, :, None, :] - pos[:, None, None, :])
    edge_blocked = jnp.any(_grid_lookup(occupied, origin, res, seg), axis=-1)
    conn = conn & ~edge_blocked & ~jnp.eye(N, dtype=bool)
    w = jnp.where(conn, d_mat, jnp.inf)

    dist0 = jnp.full(N, jnp.inf).at[near].set(0.0)
    pred0 = jnp.full(N, -1, jnp.int32)

    def relax(carry, _):
        dist, predv = carry
        through = dist[:, None] + w                        # (N, N)
        best_src = jnp.argmin(through, axis=0)
        best_d = jnp.min(through, axis=0)
        better = best_d < dist
        return (jnp.where(better, best_d, dist),
                jnp.where(better, best_src.astype(jnp.int32), predv)), None

    (dist, pred), _ = jax.lax.scan(relax, (dist0, pred0), None,
                                   length=cfg.max_path_len)

    # ---- findBestPath scoring (:813-862) over the candidates ----
    L = cfg.max_path_len

    def walk(goal_i):
        # back-walk the predecessor chain (goal -> start), fixed shape
        def step(node, _):
            nxt = jnp.where(node >= 0, pred[jnp.maximum(node, 0)], -1)
            return nxt, node
        _, rev = jax.lax.scan(step, goal_i, None, length=L)
        live = rev >= 0
        n_live = jnp.sum(live)
        # forward order with the start first; pad tail by repeating goal
        order = jnp.clip(n_live - 1 - jnp.arange(L), 0, L - 1)
        fwd = jnp.where(jnp.arange(L) < n_live, rev[order], goal_i)
        return fwd, n_live

    def score_candidate(ci, ok):
        nodes_i, n_live = walk(ci)
        pts = pos[nodes_i]                                  # (L, 3)
        nxt = jnp.roll(pts, -1, axis=0)
        seg_live = jnp.arange(L) < (n_live - 1)
        seg_len = jnp.where(seg_live,
                            jnp.linalg.norm(nxt - pts, axis=-1), 0.0)
        ang = jnp.arctan2(nxt[:, 1] - pts[:, 1], nxt[:, 0] - pts[:, 0])
        B = cfg.yaw_bins
        binidx = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * B).astype(
            jnp.int32) % B
        # unknown along the path: each intermediate node contributes its
        # yaw-gain toward the next waypoint; the goal its best yaw
        node_g = yaw_gain[nodes_i, binidx]                  # (L,)
        unk = jnp.sum(jnp.where(seg_live, node_g, 0.0)) \
            + jnp.max(yaw_gain[ci])
        best_yaw_bin = jnp.argmax(yaw_gain[ci])
        byaw = -jnp.pi + (best_yaw_bin + 0.5) * 2 * jnp.pi / B
        angs = jnp.where(seg_live, ang, 0.0)
        prev = jnp.concatenate([curr_yaw[None], angs[:-1]])
        dyaw = jnp.abs(jnp.arctan2(jnp.sin(angs - prev),
                                   jnp.cos(angs - prev)))
        yaw_dist = jnp.sum(jnp.where(seg_live, dyaw, 0.0)) \
            + jnp.abs(jnp.arctan2(
                jnp.sin(byaw - jnp.where(n_live > 1, angs[jnp.maximum(
                    n_live - 2, 0)], curr_yaw)),
                jnp.cos(byaw - jnp.where(n_live > 1, angs[jnp.maximum(
                    n_live - 2, 0)], curr_yaw))))
        t_path = jnp.sum(seg_len) / cfg.vel \
            + cfg.yaw_penalty * yaw_dist / cfg.angular_vel
        reachable = jnp.isfinite(dist[ci]) & ok
        score = jnp.where(reachable & (t_path > 1e-6),
                          unk / jnp.maximum(t_path, 1e-6), -jnp.inf)
        return score, (pts, n_live, byaw, unk)

    scores, (paths, n_lives, byaws, unks) = jax.vmap(score_candidate)(
        cand_idx, cand_ok)
    bi = jnp.argmax(scores)
    success = jnp.isfinite(scores[bi]) & (scores[bi] > 0)

    plan = DEPPlan(path=paths[bi], path_len=n_lives[bi].astype(jnp.int32),
                   viewpoint=pos[cand_idx[bi]], best_yaw=byaws[bi],
                   gain=unks[bi], score=scores[bi], success=success)
    return RoadmapState(pos=pos, valid=valid, gain=gain,
                        yaw_gain=yaw_gain), plan
