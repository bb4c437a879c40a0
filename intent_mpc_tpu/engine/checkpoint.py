"""Fleet checkpoint / resume for long batched runs.

The reference has no planner-state checkpointing (SURVEY §5: warm-start
state is in-memory only; its benchmark "resume" is merging per-trial CSVs
across reruns). Here a whole batched fleet — every scenario's EngineCarry
pytree plus the cycle counter — snapshots to one .npz and resumes
bit-exactly: the engine is a deterministic scan, so a resumed run
continues the same trajectories the uninterrupted run would have produced.
Practical motivation: hardware preemption mid-benchmark (observed once on
this project's TPU) no longer costs the completed cycles.

The carry structure is rebuilt from config (init_carry provides the
treedef), so a checkpoint stays loadable as long as the EngineCarry
fields match; a field mismatch raises instead of mis-zipping leaves.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.engine import closed_loop as cl
from intent_mpc_tpu.models.world import Scenario, generate_scenario
from intent_mpc_tpu.utils.config import IntentMPCConfig


def save_checkpoint(path: str, carry: cl.EngineCarry, cycle_idx: int,
                    seeds: Sequence[int]) -> None:
    """Snapshot a (possibly batched) EngineCarry + progress to .npz.

    The write is atomic (temp file + os.replace) so preemption mid-write —
    the very event checkpointing exists to survive — cannot truncate the
    previous good checkpoint."""
    leaves, treedef = jax.tree.flatten(carry)
    arrs = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrs["num_leaves"] = np.asarray(len(leaves))
    arrs["cycle_idx"] = np.asarray(int(cycle_idx))
    arrs["seeds"] = np.asarray(list(seeds), np.int64)
    if not path.endswith(".npz"):
        path = path + ".npz"
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def load_checkpoint(path: str, cfg: IntentMPCConfig
                    ) -> Tuple[cl.EngineCarry, int, np.ndarray, Scenario]:
    """Restore (carry, cycle_idx, seeds, regenerated scenarios).

    Scenarios are regenerated from the stored seeds (bit-exact MT19937
    world gen), so the checkpoint stays small."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        n = int(z["num_leaves"])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
        cycle_idx = int(z["cycle_idx"])
        seeds = z["seeds"]
    scenarios = [generate_scenario(int(s), cfg.world) for s in seeds]
    scen = jax.tree.map(lambda *a: jnp.stack(a), *scenarios)
    template = jax.vmap(lambda s: cl.init_carry(cfg, s))(scen)
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves but EngineCarry now has "
            f"{len(t_leaves)} — config/code mismatch")
    for i, (a, b) in enumerate(zip(leaves, t_leaves)):
        if a.shape != b.shape:
            raise ValueError(f"leaf {i} shape {a.shape} != expected "
                             f"{b.shape} — config mismatch")
    carry = jax.tree.unflatten(treedef, leaves)
    return carry, cycle_idx, seeds, scen
