"""Benchmark analysis utilities: combine runs, recheck collisions, LaTeX.

Equivalents of scripts/analyze_mpc_benchmark.py (aggregation lives in
harness.aggregate), scripts/combine_benchmark_runs.py and
scripts/postprocess_collisions.py. The reference's rosbag-replay collision
recheck becomes an exact closed-form recheck: the obstacle world is an
analytic function of time (models/world.obstacle_state), so a recorded
flight path can be re-validated against ground truth at any resolution
without any recorded bags.
"""

from __future__ import annotations

import csv
import glob
import json
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.models.world import Scenario, obstacle_state


def load_rows(path: str) -> List[dict]:
    with open(path) as f:
        rows = list(csv.DictReader(f))
    for r in rows:
        for k, v in r.items():
            try:
                r[k] = json.loads(v.lower()) if v.lower() in ("true", "false") \
                    else float(v) if "." in v or "e" in v else int(v)
            except (ValueError, AttributeError):
                pass
    return rows


def combine_runs(out_dirs: Sequence[str]) -> List[dict]:
    """Merge trial CSVs from multiple runs (combine_benchmark_runs.py),
    re-numbering trial ids."""
    rows: List[dict] = []
    for d in out_dirs:
        for path in sorted(glob.glob(os.path.join(d, "trials.csv"))):
            rows.extend(load_rows(path))
    for i, r in enumerate(rows):
        r["trial_id"] = i
    return rows


def recheck_collisions(scenario: Scenario, path: np.ndarray,
                       cycle_dt: float, upsample: int = 10):
    """Post-hoc collision recheck (postprocess_collisions.py): re-evaluate
    the analytic obstacle world along an upsampled recorded path.

    path (C, 3) per-cycle positions. Returns (collided, min_distance)."""
    C = path.shape[0]
    ts = jnp.arange(C * upsample) * (cycle_dt / upsample)
    fr = (jnp.arange(C * upsample) % upsample) / upsample
    i0 = jnp.minimum(jnp.arange(C * upsample) // upsample, C - 1)
    i1 = jnp.minimum(i0 + 1, C - 1)
    pts = jnp.asarray(path)[i0] * (1 - fr)[:, None] \
        + jnp.asarray(path)[i1] * fr[:, None]

    def check(t, p):
        obs, _ = obstacle_state(scenario, t)
        gap = jnp.maximum(jnp.abs(p[None, :] - obs) - scenario.bbox / 2.0,
                          0.0)
        d = jnp.linalg.norm(gap, axis=-1)
        return jnp.min(d)

    dmin = jax.vmap(check)(ts, pts)
    return bool(jnp.any(dmin <= 0.0)), float(jnp.min(dmin))


def latex_table(agg: dict) -> str:
    """Summary LaTeX row (analyze_mpc_benchmark.py table output)."""
    return (
        "Success & Collision & Travel [s] & Path eff. & "
        "$v$ viol. & $a$ viol. \\\\\n"
        f"{agg['success_rate']*100:.1f}\\% & "
        f"{agg['collision_rate']*100:.1f}\\% & "
        f"{agg.get('avg_travel_time', 0):.1f} & "
        f"{agg.get('avg_path_efficiency', 0):.3f} & "
        f"{agg.get('vel_violation_rate', 0)*100:.1f}\\% & "
        f"{agg.get('acc_violation_rate', 0)*100:.1f}\\% \\\\")
