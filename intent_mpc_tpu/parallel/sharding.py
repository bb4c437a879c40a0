"""Multi-chip scaling: scenario-batch data parallelism over a device mesh.

The reference has no distributed execution at all (SURVEY §2.7): its scale
axis is "run run_mpc_benchmark.py trials sequentially". Here the scale axis
is the scenario batch: thousands of closed-loop environments run
simultaneously, sharded across chips with jax.sharding + shard_map, and
cross-chip metric aggregation rides ICI psums. Multi-host extends the same
mesh over DCN via jax.distributed (the mesh axis spans all devices of all
hosts; no code change).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from intent_mpc_tpu.engine import closed_loop as cl
from intent_mpc_tpu.models.world import Scenario, generate_scenario
from intent_mpc_tpu.utils.config import IntentMPCConfig


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host entry: initialize jax.distributed so the mesh spans every
    host's chips over DCN. Call once per process, before device queries.
    With no arguments relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS); single-process runs skip initialization
    entirely. Returns this process's index."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


def stack_scenarios_global(cfg: IntentMPCConfig, seeds,
                           mesh: Mesh) -> Scenario:
    """Multi-host scenario feed: each process generates only the seeds that
    land on its local devices, and the shards are assembled into one global
    sharded array (jax.make_array_from_process_local_data) — no host ever
    materializes the full fleet. Single-process this equals
    stack_scenarios + shard_scenarios."""
    sh = NamedSharding(mesh, P("batch"))
    n = len(seeds)
    pi, pn = jax.process_index(), jax.process_count()
    if n % pn:
        raise ValueError(f"trial count {n} must divide process count {pn}")
    per = n // pn
    if per == 0:
        raise ValueError("need at least one seed per process")
    local = [generate_scenario(int(s), cfg.world)
             for s in seeds[pi * per:(pi + 1) * per]]
    local_stack = jax.tree.map(lambda *a: np.stack(a), *local)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sh, np.asarray(a)), local_stack)


def stack_scenarios(cfg: IntentMPCConfig, seeds) -> Scenario:
    """Host-side: generate and stack a batch of seeded scenarios."""
    scs = [generate_scenario(int(s), cfg.world) for s in seeds]
    if not scs:
        raise ValueError("need at least one seed/trial")
    return jax.tree.map(lambda *a: jnp.stack(a), *scs)


def shard_scenarios(scenarios: Scenario, mesh: Mesh) -> Scenario:
    sh = NamedSharding(mesh, P("batch"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), scenarios)


def _make_run_shard(cfg, traj_len, solver_iters, num_cycles, record_paths,
                    occ=None, use_keys=False):
    """occ: replicated occupancy grid (goal-mode / real-detector program
    classes need the static map); use_keys: the shard function takes a
    per-scenario PRNG key batch (goal-mode RRT route builds)."""
    def run_shard(scen, ref, keys=None):
        def one(s, k):
            return cl.run_episode(cfg, s, ref, traj_len, occ=occ,
                                  solver_iters=solver_iters,
                                  num_cycles=num_cycles,
                                  record_path=record_paths, ref_key=k)
        if use_keys:
            out = jax.vmap(one)(scen, keys)
        else:
            out = jax.vmap(lambda s: one(s, None))(scen)
        carry, paths = out
        m = carry.metrics
        local = {
            "episodes": jnp.asarray(m.goal_reached.shape[0], jnp.float32),
            "goals": jnp.sum(m.goal_reached.astype(jnp.float32)),
            "collisions": jnp.sum(m.collision.astype(jnp.float32)),
            "path_length_sum": jnp.sum(m.path_length),
            "travel_time_sum": jnp.sum(m.travel_time),
            "min_dist_min": jnp.min(m.min_obstacle_dist),
            "solve_attempts": jnp.sum(m.solve_attempts.astype(jnp.float32)),
            "solve_successes": jnp.sum(m.solve_successes.astype(jnp.float32)),
        }
        return (m, paths) if record_paths else (m, None), local
    return run_shard


def _make_sharded(cfg, mesh, solver_iters, num_cycles, record_paths,
                  traj_len=None, occ=None, use_keys=False):
    """The shard_map-wrapped fleet program (one arg set per traj_len)."""
    run_shard = _make_run_shard(cfg, traj_len, solver_iters, num_cycles,
                                record_paths, occ=occ, use_keys=use_keys)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    in_specs = (P("batch"), P()) + ((P("batch"),) if use_keys else ())

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=(P("batch"), P()), check_vma=False)
    def sharded(scen, ref, *keys):
        (m, paths), local = run_shard(scen, ref,
                                      keys[0] if use_keys else None)
        # ICI/DCN collective reduction of fleet statistics
        red = {k: (jax.lax.pmin(v, "batch") if k == "min_dist_min"
                   else jax.lax.psum(v, "batch"))
               for k, v in local.items()}
        return (m, paths) if record_paths else (m, jnp.zeros(1)), red
    return sharded


def batch_rollout(cfg: IntentMPCConfig, scenarios: Scenario,
                  ref_traj: jnp.ndarray, traj_len, mesh: Optional[Mesh] = None,
                  solver_iters: Optional[int] = None,
                  num_cycles: Optional[int] = None,
                  record_paths: bool = False,
                  occ=None, ref_keys: Optional[jnp.ndarray] = None):
    """Run a batch of episodes (sharded over the mesh when given).

    occ: replicated static occupancy grid (goal-mode / real-detector
    program classes); ref_keys: (B, 2) per-scenario PRNG keys for the
    goal-mode RRT route builder, sharded with the batch.
    Returns (per-scenario Metrics batch, aggregate dict of psum-reduced
    fleet statistics[, paths (B, C, 3) when record_paths])."""
    use_keys = ref_keys is not None
    run_shard = _make_run_shard(cfg, traj_len, solver_iters, num_cycles,
                                record_paths, occ=occ, use_keys=use_keys)
    if mesh is None:
        args = (scenarios, ref_traj) + ((ref_keys,) if use_keys else ())
        (metrics, paths), local = jax.jit(run_shard)(*args)
        agg = {k: float(v) for k, v in local.items()}
        if record_paths:
            return metrics, agg, paths
        return metrics, agg

    sharded = jax.jit(_make_sharded(cfg, mesh, solver_iters, num_cycles,
                                    record_paths, traj_len, occ=occ,
                                    use_keys=use_keys))
    args = (shard_scenarios(scenarios, mesh), ref_traj)
    if use_keys:
        args = args + (jax.device_put(
            ref_keys, NamedSharding(mesh, P("batch"))),)
    (metrics, paths), agg = sharded(*args)
    agg = {k: float(v) for k, v in agg.items()}
    if record_paths:
        return metrics, agg, paths
    return metrics, agg


_COLLECTIVE_RE = None


def collective_report(cfg: IntentMPCConfig, scenarios: Scenario,
                      ref_traj: jnp.ndarray, traj_len,
                      mesh: Mesh, solver_iters: Optional[int] = None,
                      num_cycles: Optional[int] = None,
                      occ=None, ref_keys: Optional[jnp.ndarray] = None) -> dict:
    """Compile the sharded fleet program and inventory its cross-device
    communication from the optimized HLO.

    Makes the scaling claim compiler-verified instead of asserted: the
    program's ONLY collectives should be the per-fleet psum/pmin of the
    aggregate statistics (a few f32 scalars per device per episode
    batch); any all-gather / all-to-all / collective-permute, or an
    all-reduce of scenario-sized tensors, means a sharding leak that
    would turn multi-chip scaling into a bandwidth problem. Returns
    {"counts": {op: n}, "total_bytes": int, "ops": [(op, bytes), ...]}.
    """
    import re
    global _COLLECTIVE_RE
    if _COLLECTIVE_RE is None:
        _COLLECTIVE_RE = re.compile(
            r"(all-reduce|all-gather|all-to-all|collective-permute|"
            r"reduce-scatter)")
    shape_re = re.compile(r"(f32|f64|s32|u32|pred|bf16|f16)\[([0-9,]*)\]")
    dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "pred": 1,
                   "bf16": 2, "f16": 2}

    use_keys = ref_keys is not None
    fn = _make_sharded(cfg, mesh, solver_iters, num_cycles, False, traj_len,
                       occ=occ, use_keys=use_keys)
    sc_sharded = shard_scenarios(scenarios, mesh)
    args = (sc_sharded, ref_traj)
    if use_keys:
        args = args + (jax.device_put(
            ref_keys, NamedSharding(mesh, P("batch"))),)
    txt = jax.jit(fn).lower(*args).compile().as_text()

    # an op APPLICATION is "<shapes> op(" after "= "; operand mentions are
    # "%op" references and are excluded by the (?<!%) guard
    apply_re = re.compile(
        r"(?<!%)\b(all-reduce|all-gather|all-to-all|collective-permute|"
        r"reduce-scatter)(?:-start|-done)?\(")
    counts: dict = {}
    ops = []
    for line in txt.splitlines():
        line = line.strip()
        if "= " not in line:
            continue
        head = line.split("= ", 1)[1]
        m = apply_re.search(head)
        if not m:
            continue
        op = m.group(1)
        nbytes = 0
        # output shapes sit between "= " and the op application:
        # "x = (f32[], f32[8]) all-reduce(...)"
        for dt, dims in shape_re.findall(head[:m.start()]):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * dtype_bytes[dt]
        counts[op] = counts.get(op, 0) + 1
        ops.append((op, nbytes))
    return {"counts": counts,
            "total_bytes": sum(b for _, b in ops),
            "ops": ops}


def aggregate_summary(agg: dict) -> dict:
    n = max(agg["episodes"], 1.0)
    return {
        "num_episodes": int(n),
        "success_rate": agg["goals"] / n,
        "collision_rate": agg["collisions"] / n,
        "avg_path_length": agg["path_length_sum"] / n,
        "avg_travel_time": agg["travel_time_sum"] / max(agg["goals"], 1.0),
        "min_obstacle_distance": agg["min_dist_min"],
        "solver_success_rate": agg["solve_successes"] / max(agg["solve_attempts"], 1.0),
    }
