"""Octomap-equivalent: tri-state multi-resolution occupancy pyramid.

The reference's octomap-backed planners (global_planner/include/
global_planner/rrtOctomap.h, rrtStarOctomap.h) differ from the
occupancy-grid planners in two capabilities, not in the planning logic:

  * unknown-space semantics — octomap nodes that were never observed are
    absent from the tree; ``checkCollisionPoint(p, ignoreUnknown)``
    (rrtOctomap.h:337-350) treats an absent node as occupied unless
    ``ignoreUnknown_`` is set, so the planner can refuse to route through
    unexplored space. The binary OccupancyGrid cannot express this.
  * multi-resolution queries — ``OcTree::search(p, depth)`` answers
    occupancy at any tree depth; inner nodes hold the max over children,
    which lets box/segment queries prune whole subtrees.

TPU-native redesign: the octree becomes a **mip pyramid** of dense
arrays. Level 0 is the base tri-state grid (occupied / unknown as two
binary fields; free = neither); level l is the 2x2x2 max-pool of level
l-1. A coarse cell's occupied bit is exactly "any descendant occupied"
(octomap's inner-node max policy), so

  * coarse == 0 proves every base voxel below is not occupied (exact
    free early-out for long segments), and
  * ``search(p, depth)`` is a single gather into level (max_depth-depth)
    — identical semantics to octomap's depth-limited search.

Unknown state comes for free from the log-odds map: a voxel whose
log-odds is still exactly at the prior (0.0, never updated by any ray)
is octomap's "absent node".

The planners in models/global_planner.py accept an OctoMap anywhere an
OccupancyGrid is accepted (dispatch in ``occupied_at``), which is the
rrtOctomap/rrtStarOctomap capability the round-1 review recorded as a
delta.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models.mapping import LogOddsMap, MappingConfig
from intent_mpc_tpu.models.occupancy import OccupancyGrid


class OctoMap(NamedTuple):
    """Tri-state occupancy pyramid. levels_occ/levels_unk are tuples of
    (nx>>l, ny>>l, nz>>l) int8 arrays, level 0 finest. Dimensions are
    padded up to a multiple of 2**(levels-1); padding is free space for
    ``occ`` and unknown for ``unk`` (out-of-map == unobserved, matching
    octomap's NULL-node answer)."""
    levels_occ: Tuple[jnp.ndarray, ...]
    levels_unk: Tuple[jnp.ndarray, ...]
    origin: jnp.ndarray      # (3,) world position of voxel (0,0,0) corner
    resolution: jnp.ndarray  # base (level-0) voxel edge, meters
    ignore_unknown: bool = True

    @property
    def num_levels(self) -> int:
        return len(self.levels_occ)


def _pool2(a: jnp.ndarray) -> jnp.ndarray:
    """2x2x2 max-pool (octomap inner-node occupancy = max over children)."""
    return jax.lax.reduce_window(
        a, jnp.asarray(0, a.dtype), jax.lax.max,
        window_dimensions=(2, 2, 2), window_strides=(2, 2, 2),
        padding="VALID")


def _build_pyramid(base: jnp.ndarray, levels: int, pad_value: int
                   ) -> Tuple[jnp.ndarray, ...]:
    mult = 1 << (levels - 1)
    pads = [(0, (-d) % mult) for d in base.shape]
    base = jnp.pad(base, pads, constant_values=pad_value)
    out = [base]
    for _ in range(levels - 1):
        out.append(_pool2(out[-1]))
    return tuple(out)


def from_log_odds(m: LogOddsMap, cfg: MappingConfig, levels: int = 4,
                  ignore_unknown: bool = True) -> OctoMap:
    """Build the tri-state pyramid from a log-odds map. Occupied follows
    isOccupied (log-odds >= l_occ); unknown is "never updated" — log-odds
    still exactly at the 0.0 prior (octomap: node absent from the tree)."""
    occ = (m.log_odds >= cfg.l_occ).astype(jnp.int8)
    unk = (m.log_odds == 0.0).astype(jnp.int8)
    return OctoMap(
        levels_occ=_build_pyramid(occ, levels, 0),
        levels_unk=_build_pyramid(unk, levels, 1),
        origin=m.origin, resolution=m.resolution,
        ignore_unknown=ignore_unknown)


def from_occupancy_grid(g: OccupancyGrid, levels: int = 4) -> OctoMap:
    """Wrap a binary grid (everything observed: unknown is empty)."""
    occ = (g.grid > 0).astype(jnp.int8)
    return OctoMap(
        levels_occ=_build_pyramid(occ, levels, 0),
        levels_unk=_build_pyramid(jnp.zeros_like(occ), levels, 0),
        origin=g.origin, resolution=g.resolution, ignore_unknown=True)


def _level_lookup(level: jnp.ndarray, pad_answer: int, idx: jnp.ndarray
                  ) -> jnp.ndarray:
    """Gather with out-of-bounds -> pad_answer. idx (...,3) at that level's
    resolution."""
    shape = jnp.array(level.shape)
    in_map = jnp.all((idx >= 0) & (idx < shape), axis=-1)
    c = jnp.clip(idx, 0, shape - 1)
    vals = level[c[..., 0], c[..., 1], c[..., 2]]
    return jnp.where(in_map, vals, jnp.asarray(pad_answer, vals.dtype))


def search(o: OctoMap, p: jnp.ndarray, level: int = 0
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """OcTree::search at a pyramid level: p (...,3) world points ->
    (occupied (...), unknown (...)) int8 at that resolution. A coarse
    cell is occupied/unknown if ANY base voxel below it is."""
    idx = jnp.floor((p - o.origin) / o.resolution).astype(jnp.int32) >> level
    occ = _level_lookup(o.levels_occ[level], 0, idx)
    unk = _level_lookup(o.levels_unk[level], 1, idx)
    return occ, unk


def is_blocked(o: OctoMap, p: jnp.ndarray) -> jnp.ndarray:
    """checkCollisionPoint (rrtOctomap.h:337-350): occupied, or unknown
    when the map was built with ignore_unknown=False. Out-of-map points
    are unknown (octomap search returns NULL), hence blocked for a
    conservative (ignore_unknown=False) map — this deliberately differs
    from OccupancyGrid.is_occupied, whose out-of-map answer is free."""
    occ, unk = search(o, p, 0)
    blocked = occ > 0
    if not o.ignore_unknown:
        blocked = blocked | (unk > 0)
    return blocked


def box_blocked(o: OctoMap, p: jnp.ndarray, collision_box, samples_per_axis
                ) -> jnp.ndarray:
    """checkCollision with a robot collision box (rrtOctomap.h:313-335):
    sample the box on a static (s,s,s) lattice around p and OR the point
    checks. collision_box: (3,) full extents, static."""
    s = max(2, samples_per_axis)
    fr = jnp.arange(s) / (s - 1) - 0.5  # endpoints included (reference
    half = jnp.asarray(collision_box)   # loops xmin..xmax inclusive)
    offs = jnp.stack(jnp.meshgrid(fr * half[0], fr * half[1], fr * half[2],
                                  indexing="ij"), axis=-1).reshape(-1, 3)
    return jnp.any(is_blocked(o, p[None, :] + offs))


def segment_free(o: OctoMap, a: jnp.ndarray, b: jnp.ndarray,
                 checks: int = 8) -> jnp.ndarray:
    """checkCollisionLine (rrtOctomap.h:359+): no blocked sample on (a,b].

    Hierarchical variant of the grid edge check: a coarse pass at the top
    pyramid level (cells are 2^(L-1) voxels wide, so few samples cover the
    segment conservatively) proves most edges free; only when the coarse
    pass hits does the fine pass run. Under vmap both passes are computed
    (select semantics) — the value here is octomap's semantics, and the
    lax.cond early-out for unbatched host-side planning."""
    fine_fr = (jnp.arange(checks) + 1.0) / checks

    def fine(_):
        pts = a[None, :] + (b - a)[None, :] * fine_fr[:, None]
        return ~jnp.any(is_blocked(o, pts))

    top = o.num_levels - 1
    coarse_checks = max(2, checks // (1 << top) + 1)
    fr = (jnp.arange(coarse_checks) + 1.0) / coarse_checks
    pts = a[None, :] + (b - a)[None, :] * fr[:, None]
    occ, unk = search(o, pts, top)
    hit = occ > 0
    if not o.ignore_unknown:
        hit = hit | (unk > 0)
    # coarse all-clear is exact (inner max policy): every base voxel under
    # a zero coarse cell is free/observed
    return jax.lax.cond(jnp.any(hit), fine, lambda _: jnp.asarray(True),
                        operand=None)


def cast_ray(o: OctoMap, start, end, samples: int = 256):
    """First blocked sample between start and end (octomap computeRay +
    per-point search). Returns (hit (bool), hit_point (3,))."""
    fr = jnp.linspace(0.0, 1.0, samples)
    pts = start[None, :] + (end - start)[None, :] * fr[:, None]
    blocked = is_blocked(o, pts)
    any_hit = jnp.any(blocked)
    first = jnp.argmax(blocked)
    return any_hit, jnp.where(any_hit, pts[first], end)
