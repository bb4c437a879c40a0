"""Global planners: goal-biased RRT with shortcutting, RRT* with rewiring,
PRM roadmap, and a grid wavefront planner.

Rebuild of global_planner/ (rrtOccMap.h goal-biased RRT + shortcut,
rrtBase.h, rrtStarOctomap.h RRT*, PRMKDTree.cpp / PRMAstar.h). TPU-native
redesign:

  * RRT (rrtOccMap::makePlan :183-290): the incremental tree lives in
    fixed-size arrays (nodes (N,3), parent (N,)); each lax.scan iteration
    samples (goal-biased), finds the nearest tree node by masked argmin
    (the KD-tree of the reference is pointer-chasing — a dense masked
    argmin is the array-native equivalent and exact), steers by the
    incremental distance, collision-checks the edge by sampled occupancy
    lookups, and appends under a mask. Whole *batches of planning
    problems* vmap over this.
  * shortcutting (shortcutWaypointPaths :317+): fixed rounds of
    try-connect-ahead with masked waypoint compaction.
  * PRM: sample a fixed node set, build a radius graph with edge
    collision checks, then run value iteration (min-plus relaxation) to
    extract shortest paths — replaces incremental KD-tree PRM + A*
    (PRMKDTree.cpp, PRMAstar.h) with a one-shot batched roadmap.
  * grid wavefront: value iteration directly on the occupancy grid
    (bsplineTraj's A* path-search equivalent, path_search/astarOcc.cpp).

Config mirrors global_planner yaml: incremental_distance 0.5,
goal_reach_distance 0.4, connect_goal_ratio 0.2, max_shortcut_dist 3.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models.occupancy import OccupancyGrid, is_occupied
from intent_mpc_tpu.models.octo import OctoMap, is_blocked


def occupied_at(m, p):
    """Point-collision dispatch: planners take either the unified
    OccupancyGrid (rrtOccMap backend) or an OctoMap (rrtOctomap /
    rrtStarOctomap backend with unknown-space semantics)."""
    if isinstance(m, OctoMap):
        return is_blocked(m, p)
    return is_occupied(m, p)


class RRTConfig(NamedTuple):
    max_iters: int = 512
    incremental_dist: float = 0.5
    goal_reach_dist: float = 0.4
    connect_goal_ratio: float = 0.2
    edge_checks: int = 8           # collision samples per edge
    max_path_len: int = 64
    shortcut_rounds: int = 3
    max_shortcut_dist: float = 3.0


class RRTResult(NamedTuple):
    path: jnp.ndarray        # (max_path_len, 3) start..goal, padded with goal
    length: jnp.ndarray      # int32 valid waypoints
    success: jnp.ndarray     # bool


def _edge_free(occ: OccupancyGrid, a, b, checks: int):
    fr = (jnp.arange(checks) + 1.0) / checks
    pts = a[None, :] + (b - a)[None, :] * fr[:, None]
    return ~jnp.any(occupied_at(occ, pts))


def rrt_plan(occ: OccupancyGrid, start: jnp.ndarray, goal: jnp.ndarray,
             bounds_lo, bounds_hi, key, cfg: RRTConfig = RRTConfig()
             ) -> RRTResult:
    """Goal-biased RRT. bounds_lo/hi: (3,) sampling box."""
    N = cfg.max_iters + 2
    nodes = jnp.zeros((N, 3)).at[0].set(start)
    parent = jnp.full(N, -1, jnp.int32)
    count = jnp.asarray(1, jnp.int32)
    lo = jnp.asarray(bounds_lo, jnp.float32)
    hi = jnp.asarray(bounds_hi, jnp.float32)

    def body(carry, it):
        nodes, parent, count, done, goal_idx = carry
        k = jax.random.fold_in(key, it)
        k1, k2 = jax.random.split(k)
        toward_goal = jax.random.uniform(k1) < cfg.connect_goal_ratio
        q_rand = jnp.where(toward_goal, goal,
                           jax.random.uniform(k2, (3,)) * (hi - lo) + lo)

        mask = jnp.arange(N) < count
        d = jnp.linalg.norm(nodes - q_rand[None, :], axis=-1)
        d = jnp.where(mask, d, jnp.inf)
        ni = jnp.argmin(d)
        q_near = nodes[ni]
        vec = q_rand - q_near
        dist = jnp.linalg.norm(vec)
        q_new = q_near + vec / jnp.maximum(dist, 1e-9) \
            * jnp.minimum(dist, cfg.incremental_dist)

        ok = _edge_free(occ, q_near, q_new, cfg.edge_checks) \
            & ~occupied_at(occ, q_new) & ~done
        nodes = nodes.at[count].set(jnp.where(ok, q_new, nodes[count]))
        parent = parent.at[count].set(jnp.where(ok, ni, parent[count]))
        reached = ok & (jnp.linalg.norm(q_new - goal) <= cfg.goal_reach_dist)
        goal_idx = jnp.where(reached & ~done, count, goal_idx)
        count = count + ok.astype(jnp.int32)
        done = done | reached
        return (nodes, parent, count, done, goal_idx), None

    init = (nodes, parent, count, jnp.asarray(False),
            jnp.asarray(-1, jnp.int32))
    (nodes, parent, count, done, goal_idx), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.max_iters))

    # backtrack (fixed depth); path stored goal->start then reversed
    L = cfg.max_path_len

    def walk(carry, _):
        idx = carry
        nxt = jnp.where(idx >= 0, parent[idx], -1)
        return nxt, idx

    _, chain = jax.lax.scan(walk, goal_idx, None, length=L)   # (L,) indices
    valid = chain >= 0
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # reverse into start-first order, pad with goal
    order = n_valid - 1 - jnp.arange(L)
    src = jnp.where(order >= 0, chain[jnp.clip(order, 0, L - 1)], 0)
    pts = jnp.where((jnp.arange(L) < n_valid)[:, None],
                    nodes[src], goal[None, :])
    pts = jnp.where(done, pts, jnp.broadcast_to(start, (L, 3)))

    pts, n_valid = _shortcut(occ, pts, n_valid, cfg)
    return RRTResult(path=pts, length=jnp.where(done, n_valid, 0),
                     success=done)


def _shortcut(occ: OccupancyGrid, path, n, cfg: RRTConfig):
    """String-pulling shortcut (shortcutWaypointPaths): from each anchor,
    jump to the farthest waypoint reachable by a collision-free segment of
    length <= max_shortcut_dist; repeat from there."""
    L = path.shape[0]
    idx = jnp.arange(L)

    def step(carry, _):
        cur, out_n = carry
        a = path[cur]
        free = jax.vmap(lambda b: _edge_free(occ, a, b,
                                             cfg.edge_checks * 2))(path)
        near = jnp.linalg.norm(path - a[None, :], axis=-1) \
            <= cfg.max_shortcut_dist
        cand = free & near & (idx > cur) & (idx < n)
        any_c = jnp.any(cand)
        far = jnp.max(jnp.where(cand, idx, cur))
        nxt = jnp.where(any_c, far, jnp.minimum(cur + 1, n - 1))
        at_end = cur >= n - 1
        nxt = jnp.where(at_end, cur, nxt)
        out_n = out_n + (~at_end).astype(jnp.int32)
        return (nxt, out_n), nxt

    (final, out_n), chain = jax.lax.scan(
        step, (jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32)),
        None, length=L - 1)
    picks = jnp.concatenate([jnp.zeros(1, jnp.int32), chain])
    newp = path[jnp.clip(picks, 0, L - 1)]
    # entries past out_n repeat the endpoint (scan clamps at n-1)
    return newp, jnp.minimum(out_n, n)


class RRTStarConfig(NamedTuple):
    max_iters: int = 512
    incremental_dist: float = 0.5
    goal_reach_dist: float = 0.4
    connect_goal_ratio: float = 0.2
    edge_checks: int = 8
    max_path_len: int = 64
    neighborhood_radius: float = 1.0   # rrtStarOctomap.h rNeighborhood
    cost_sweeps: int = 64              # parent-chain cost refresh depth


def rrt_star_plan(occ: OccupancyGrid, start: jnp.ndarray, goal: jnp.ndarray,
                  bounds_lo, bounds_hi, key,
                  cfg: RRTStarConfig = RRTStarConfig()) -> RRTResult:
    """RRT* (rrtStarOctomap.h:1-347 redesigned): goal-biased sampling with
    choose-parent over a fixed neighborhood radius and neighbor rewiring.

    Array-native differences from the reference: the tree lives in dense
    (N,3)/(N,)/(N,) node/parent/cost arrays with masked argmin nearest
    (exact, MXU-friendly) instead of a KD-tree; rewiring updates parent
    pointers in one vectorized step; descendant costs (which the pointer
    implementation updates recursively) are refreshed by `cost_sweeps`
    rounds of cost[i] = cost[parent[i]] + |edge| after growth — exact once
    sweeps >= tree depth."""
    N = cfg.max_iters + 2
    nodes = jnp.zeros((N, 3)).at[0].set(start)
    parent = jnp.full(N, -1, jnp.int32)
    cost = jnp.full(N, jnp.inf).at[0].set(0.0)
    count = jnp.asarray(1, jnp.int32)
    lo = jnp.asarray(bounds_lo, jnp.float32)
    hi = jnp.asarray(bounds_hi, jnp.float32)
    idx_all = jnp.arange(N)

    def body(carry, it):
        nodes, parent, cost, count = carry
        k = jax.random.fold_in(key, it)
        k1, k2 = jax.random.split(k)
        toward_goal = jax.random.uniform(k1) < cfg.connect_goal_ratio
        q_rand = jnp.where(toward_goal, goal,
                           jax.random.uniform(k2, (3,)) * (hi - lo) + lo)

        mask = idx_all < count
        d = jnp.linalg.norm(nodes - q_rand[None, :], axis=-1)
        ni = jnp.argmin(jnp.where(mask, d, jnp.inf))
        q_near = nodes[ni]
        vec = q_rand - q_near
        dist = jnp.linalg.norm(vec)
        q_new = q_near + vec / jnp.maximum(dist, 1e-9) \
            * jnp.minimum(dist, cfg.incremental_dist)
        free_new = ~occupied_at(occ, q_new)

        # choose-parent: min cost-through over free in-radius neighbors
        # (the nearest node is always in radius: steer caps the step at
        # incremental_dist <= neighborhood_radius)
        dn = jnp.linalg.norm(nodes - q_new[None, :], axis=-1)
        near = mask & (dn <= cfg.neighborhood_radius)
        efree = jax.vmap(lambda b: _edge_free(occ, b, q_new,
                                              cfg.edge_checks))(nodes)
        cand = near & efree
        through = jnp.where(cand, cost + dn, jnp.inf)
        pi = jnp.argmin(through)
        have_parent = jnp.isfinite(through[pi])
        pi = jnp.where(have_parent, pi, ni)
        new_cost = jnp.where(have_parent, through[pi], cost[ni] + dist)
        ok = free_new & have_parent

        nodes = nodes.at[count].set(jnp.where(ok, q_new, nodes[count]))
        parent = parent.at[count].set(jnp.where(ok, pi, parent[count]))
        cost = cost.at[count].set(jnp.where(ok, new_cost, cost[count]))

        # rewire: neighbors whose path through q_new is cheaper
        better = cand & (new_cost + dn < cost) & (idx_all != pi) & ok
        parent = jnp.where(better, count, parent)
        cost = jnp.where(better, new_cost + dn, cost)

        count = count + ok.astype(jnp.int32)
        return (nodes, parent, cost, count), None

    (nodes, parent, cost, count), _ = jax.lax.scan(
        body, (nodes, parent, cost, count), jnp.arange(cfg.max_iters))

    # refresh descendant costs invalidated by rewiring
    dpar = jnp.linalg.norm(nodes - nodes[jnp.clip(parent, 0, N - 1)],
                           axis=-1)

    def sweep(c, _):
        cp = jnp.where(parent >= 0, c[jnp.clip(parent, 0, N - 1)] + dpar, c)
        return jnp.where(idx_all == 0, 0.0, cp), None

    cost, _ = jax.lax.scan(sweep, cost, None, length=cfg.cost_sweeps)

    # best goal-reaching node (min total cost), not first-reaching
    mask = idx_all < count
    near_goal = mask & (jnp.linalg.norm(nodes - goal[None, :], axis=-1)
                        <= cfg.goal_reach_dist)
    total = jnp.where(near_goal, cost, jnp.inf)
    goal_idx = jnp.argmin(total)
    done = jnp.isfinite(total[goal_idx])
    goal_idx = jnp.where(done, goal_idx, -1)

    L = cfg.max_path_len

    def walk(idx, _):
        nxt = jnp.where(idx >= 0, parent[jnp.clip(idx, 0, N - 1)], -1)
        return nxt, idx

    _, chain = jax.lax.scan(walk, goal_idx.astype(jnp.int32), None, length=L)
    valid = chain >= 0
    n_valid = jnp.sum(valid.astype(jnp.int32))
    order = n_valid - 1 - jnp.arange(L)
    src = jnp.where(order >= 0, chain[jnp.clip(order, 0, L - 1)], 0)
    pts = jnp.where((jnp.arange(L) < n_valid)[:, None],
                    nodes[src], goal[None, :])
    pts = jnp.where(done, pts, jnp.broadcast_to(start, (L, 3)))
    return RRTResult(path=pts, length=jnp.where(done, n_valid, 0),
                     success=done)


# ---------------------------------------------------------------------------
# PRM roadmap + min-plus shortest path
# ---------------------------------------------------------------------------

class PRMConfig(NamedTuple):
    num_samples: int = 256
    connect_radius: float = 2.0
    edge_checks: int = 8
    relax_iters: int = 64
    max_path_len: int = 64


def prm_plan(occ: OccupancyGrid, start, goal, bounds_lo, bounds_hi, key,
             cfg: PRMConfig = PRMConfig()) -> RRTResult:
    """Probabilistic roadmap: batch-sample nodes, radius graph with edge
    collision checks, Bellman-Ford relaxation from start, greedy descent."""
    lo = jnp.asarray(bounds_lo, jnp.float32)
    hi = jnp.asarray(bounds_hi, jnp.float32)
    S = cfg.num_samples
    samples = jax.random.uniform(key, (S, 3)) * (hi - lo) + lo
    nodes = jnp.concatenate([start[None], goal[None], samples])  # (S+2,3)
    free = ~occupied_at(occ, nodes)

    d = jnp.linalg.norm(nodes[:, None, :] - nodes[None, :, :], axis=-1)
    within = (d <= cfg.connect_radius) & (d > 1e-6)
    ef = jax.vmap(jax.vmap(
        lambda a, b: _edge_free(occ, a, b, cfg.edge_checks),
        in_axes=(None, 0)), in_axes=(0, None))(nodes, nodes)
    adj = within & ef & free[:, None] & free[None, :]
    w = jnp.where(adj, d, jnp.inf)

    dist0 = jnp.full(S + 2, jnp.inf).at[0].set(0.0)

    def relax(dist, _):
        nd = jnp.minimum(dist, jnp.min(dist[:, None] + w, axis=0))
        return nd, None

    dist, _ = jax.lax.scan(relax, dist0, None, length=cfg.relax_iters)
    success = jnp.isfinite(dist[1])

    # greedy descent from goal to start over dist
    L = cfg.max_path_len

    def step(idx, _):
        nbr_cost = jnp.where(adj[idx], dist + w[idx], jnp.inf)
        nxt = jnp.argmin(nbr_cost)
        better = nbr_cost[nxt] < dist[idx] + 1e-6
        at_start = idx == 0
        return jnp.where(at_start | ~better, idx, nxt), idx

    _, chain = jax.lax.scan(step, jnp.asarray(1, jnp.int32), None, length=L)
    valid = jnp.concatenate([jnp.array([True]), chain[1:] != chain[:-1]])
    n_valid = jnp.sum(valid.astype(jnp.int32))
    order = n_valid - 1 - jnp.arange(L)
    src = jnp.where(order >= 0, chain[jnp.clip(order, 0, L - 1)], 0)
    pts = jnp.where((jnp.arange(L) < n_valid)[:, None],
                    nodes[src], goal[None, :])
    pts = jnp.where(success, pts, jnp.broadcast_to(start, (L, 3)))
    return RRTResult(path=pts, length=jnp.where(success, n_valid, 0),
                     success=success)


def grid_wavefront(occ_grid: jnp.ndarray, start_idx, goal_idx,
                   iters: int) -> jnp.ndarray:
    """Value iteration on a voxel grid: cost-to-go from the goal with
    6-connected steps (astarOcc equivalent for guide-path extraction).
    Returns the cost field; descend it greedily for a path."""
    big = jnp.asarray(1e9, jnp.float32)
    cost = jnp.full(occ_grid.shape, big).at[tuple(goal_idx)].set(0.0)
    blocked = occ_grid > 0

    def relax(c, _):
        best = c
        for ax in range(3):
            best = jnp.minimum(best, jnp.roll(c, 1, axis=ax) + 1.0)
            best = jnp.minimum(best, jnp.roll(c, -1, axis=ax) + 1.0)
        best = jnp.where(blocked, big, best)
        return jnp.minimum(c, best), None

    cost, _ = jax.lax.scan(relax, cost, None, length=iters)
    return cost
