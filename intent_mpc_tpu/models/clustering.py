"""Static-obstacle clustering: DBSCAN -> 2-means tree refinement -> rotated
bounding boxes.

Rebuild of trajectory_planner/clustering (obstacleClustering.cpp, DBSCAN.h,
Kmeans.cpp). Fixed-shape design for XLA:

  * DBSCAN (eps=0.5, minPts=15): pairwise-distance core-point test + label
    propagation over the core adjacency graph (min-label iteration to a
    fixed point) instead of the reference's queue-based region growing —
    identical clusters, no data-dependent control flow.
  * 2-means split (runKmeans :129-227): farthest-point-pair init, fixed
    Lloyd iterations, membership masks instead of point lists.
  * getOrientation (:230-283): 20-angle sweep maximizing point density of
    the rotated bbox, vectorized over (angle, point).
  * the refinement tree (run :14-95): `tree_level` rounds of conditional
    splitting on density < 0.9; cluster slots are a padded array that
    doubles per level (max_clusters * 2^tree_level slots).

The DYNUS benchmark disables this module (mpcPlanner.cpp:191-193 — all
obstacles arrive via the fake detector), but it is part of the planner
library surface (mpcPlanner::makePlan uses getStaticObstacles).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ClusteringConfig(NamedTuple):
    eps: float = 0.5
    min_pts: int = 15
    tree_level: int = 3
    angle_num: int = 20
    density_thresh: float = 0.9
    kmeans_iters: int = 10
    resolution: float = 0.2
    max_clusters: int = 8          # DBSCAN slot count before refinement


class StaticObstacles(NamedTuple):
    centroid: jnp.ndarray   # (C, 3)
    size: jnp.ndarray       # (C, 3)
    yaw: jnp.ndarray        # (C,)
    active: jnp.ndarray     # (C,) bool


def dbscan(points: jnp.ndarray, valid: jnp.ndarray, eps: float,
           min_pts: int) -> jnp.ndarray:
    """Labels (P,): cluster id = min point index in the cluster; -1 noise."""
    P = points.shape[0]
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    adj = (d2 <= eps * eps) & valid[:, None] & valid[None, :]
    degree = jnp.sum(adj, axis=-1)
    core = (degree >= min_pts) & valid

    # labels propagate through core points only; border points attach after
    idx = jnp.arange(P)
    labels0 = jnp.where(core, idx, P)

    core_adj = adj & core[:, None] & core[None, :]

    def body(state):
        labels, _ = state
        neigh = jnp.where(core_adj, labels[None, :], P)
        new = jnp.minimum(labels, jnp.min(neigh, axis=-1))
        new = jnp.where(core, new, labels)
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.asarray(True)))

    # border points: attach to the minimum core-neighbor label
    border_neigh = jnp.where(adj & core[None, :], labels[None, :], P)
    border_label = jnp.min(border_neigh, axis=-1)
    labels = jnp.where(core, labels, border_label)
    return jnp.where(valid & (labels < P), labels, -1)


def _masked_bbox(points, w):
    big = 1e9
    mn = jnp.min(jnp.where(w[:, None] > 0, points, big), axis=0)
    mx = jnp.max(jnp.where(w[:, None] > 0, points, -big), axis=0)
    return mn, mx


def kmeans_split(points: jnp.ndarray, w: jnp.ndarray, iters: int):
    """Split one cluster (membership weights w) into two via 2-means with
    farthest-point-pair initialization (runKmeans :134-166)."""
    mn, mx = _masked_bbox(points, w)
    centroid = (mn + mx) / 2.0
    d0 = jnp.linalg.norm(points - centroid, axis=-1) * w
    f = points[jnp.argmax(d0)]
    d1 = jnp.linalg.norm(points - f[None, :], axis=-1) * w
    ff = points[jnp.argmax(d1)]
    c = jnp.stack([f, ff])

    def lloyd(c, _):
        d = jnp.linalg.norm(points[:, None, :] - c[None, :, :], axis=-1)
        assign = jnp.argmin(d, axis=-1)
        w0 = w * (assign == 0)
        w1 = w * (assign == 1)
        c0 = jnp.sum(points * w0[:, None], 0) / jnp.maximum(jnp.sum(w0), 1e-9)
        c1 = jnp.sum(points * w1[:, None], 0) / jnp.maximum(jnp.sum(w1), 1e-9)
        return jnp.stack([c0, c1]), None

    c, _ = jax.lax.scan(lloyd, c, None, length=iters)
    d = jnp.linalg.norm(points[:, None, :] - c[None, :, :], axis=-1)
    assign = jnp.argmin(d, axis=-1)
    return w * (assign == 0), w * (assign == 1)


def best_orientation(cfg: ClusteringConfig, points: jnp.ndarray,
                     w: jnp.ndarray):
    """Angle sweep maximizing bbox point density (getOrientation :230-283).

    Returns (centroid, dimension, yaw, density)."""
    mn, mx = _masked_bbox(points, w)
    centroid = (mn + mx) / 2.0
    angles = jnp.pi * jnp.arange(cfg.angle_num) / cfg.angle_num
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    rel = points - centroid[None, :]
    rx = ca[:, None] * rel[None, :, 0] - sa[:, None] * rel[None, :, 1]
    ry = sa[:, None] * rel[None, :, 0] + ca[:, None] * rel[None, :, 1]
    rz = jnp.broadcast_to(rel[None, :, 2], rx.shape)
    rot = jnp.stack([rx, ry, rz], axis=-1)            # (A, P, 3)

    big = 1e9
    wm = w[None, :, None]
    mn_a = jnp.min(jnp.where(wm > 0, rot, big), axis=1)
    mx_a = jnp.max(jnp.where(wm > 0, rot, -big), axis=1)
    ext = mx_a - mn_a                                  # (A, 3)
    num = ext / cfg.resolution + 1.0
    npts = jnp.sum(w)
    density = npts / (num[:, 0] * num[:, 1] * num[:, 2])
    best = jnp.argmax(density)
    dim = ext[best]
    # bbox center in rotated frame mapped back to world
    mid = (mn_a[best] + mx_a[best]) / 2.0
    a = angles[best]
    cx = jnp.cos(-a) * mid[0] - jnp.sin(-a) * mid[1] + centroid[0]
    cy = jnp.sin(-a) * mid[0] + jnp.cos(-a) * mid[1] + centroid[1]
    cz = mid[2] + centroid[2]
    return (jnp.stack([cx, cy, cz]), dim, -a,
            jnp.where(npts > 0, density[best], 0.0))


def cluster_obstacles(cfg: ClusteringConfig, points: jnp.ndarray,
                      valid: jnp.ndarray) -> StaticObstacles:
    """Full pipeline: DBSCAN seeds, density-driven 2-means tree refinement,
    rotated bboxes (obstacleClustering::run)."""
    P = points.shape[0]
    labels = dbscan(points, valid, cfg.eps, cfg.min_pts)

    # top max_clusters labels by size -> initial membership masks
    sizes = jnp.sum((labels[None, :] == jnp.arange(P)[:, None])
                    & (labels[None, :] >= 0), axis=-1)
    top = jnp.argsort(-sizes)[: cfg.max_clusters]
    member = (labels[None, :] == top[:, None]) & (sizes[top] > 0)[:, None]
    member = member.astype(points.dtype)               # (C0, P)
    slot_active = sizes[top] > 0

    C = cfg.max_clusters * (2 ** cfg.tree_level)
    W = jnp.zeros((C, P), points.dtype).at[: cfg.max_clusters].set(member)
    active = jnp.zeros(C, bool).at[: cfg.max_clusters].set(slot_active)
    complete = jnp.zeros(C, bool)
    n_slots = cfg.max_clusters

    for level in range(cfg.tree_level):
        dens = jax.vmap(
            lambda w: best_orientation(cfg, points, w)[3])(W)
        need_split = active & ~complete & (dens < cfg.density_thresh)
        splits = jax.vmap(
            lambda w: kmeans_split(points, w, cfg.kmeans_iters))(W)
        w_a, w_b = splits
        # children replace the parent slot + occupy a mirrored new slot
        W_new = jnp.where(need_split[:, None], w_a, W)
        child_slot = jnp.arange(C) + n_slots
        ok_child = need_split & (child_slot < C)
        dst = jnp.where(ok_child, child_slot, C - 1)
        W_new = W_new.at[dst].max(jnp.where(ok_child[:, None], w_b, 0.0))
        active = active.at[dst].set(active[dst] | ok_child)
        complete = jnp.where(need_split, False,
                             jnp.where(active & ~complete, True, complete))
        W = W_new
        n_slots = min(n_slots * 2, C)

    cen, dim, yaw, dens = jax.vmap(
        lambda w: best_orientation(cfg, points, w))(W)
    has_pts = jnp.sum(W, axis=-1) > 0
    return StaticObstacles(centroid=cen, size=dim, yaw=yaw,
                           active=active & has_pts)
