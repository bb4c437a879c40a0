"""Goal-approach safety relaxation (EngineConfig.goal_relax, opt-in,
beyond-reference).

The benchmark's ONLY failure mode (5.1% of 256 seeds) is a
goal-occlusion standoff: dynamic obstacles dwelling at the goal keep
the fixed 1.5 m safety ellipsoids (planner_param.yaml
`dynamic_safety_distance`, applied at mpcPlanner.cpp updateObstacleParam
:1148-1197) over the 0.5 m goal criterion (run_mpc_benchmark.py:268-276)
and the drone parks ~1 m out forever. Round-5 external adjudication
showed the reference's own solver fails the identical 13 seeds 0/13
(RESULTS.md) — the standoff is formulation-inherent. goal_relax anneals
the DYNAMIC safety distance fed to the QP obstacle rows after a
sustained near-goal stall, floor-clamped; static safety, candidate
scoring, and the collision monitor are untouched, and the default
program (goal_relax=False) is bit-identical to before.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.engine.closed_loop import run_episode, summarize
from intent_mpc_tpu.models.world import Scenario
from intent_mpc_tpu.utils.config import small_config


def _goal_dweller_world(goal):
    """One DYNAMIC obstacle dwelling 0.7 m beside the goal (trefoil
    scale 0 freezes it — the limiting case of the dwell standoff): its
    1.5 m-inflated safety ellipsoid covers the 0.5 m goal region while
    the physical 0.8 m cube leaves it clear."""
    n = 1
    dwell = (goal[0], goal[1] + 0.7, goal[2])
    return Scenario(
        origin=jnp.asarray([dwell], jnp.float32),
        scale=jnp.zeros((n, 3), jnp.float32),
        offset=jnp.zeros(n, jnp.float32),
        slower=jnp.ones(n, jnp.float32),   # dynamic needs slower > 0
        bbox=jnp.full((n, 3), 0.8, jnp.float32),  # the DYNUS dynamic cube
        is_static=jnp.zeros(n, bool))


def _cfg(goal, relax: bool):
    cfg = small_config(num_obstacles=1, horizon=10, timeout=12.0,
                       max_obstacles=1, hist=12)
    cfg = cfg.replace(goal=goal)
    if relax:
        cfg = cfg.replace(engine=dataclasses.replace(
            cfg.engine, goal_relax=True, goal_relax_grace=5,
            goal_relax_rate=0.1, goal_relax_floor=0.2,
            goal_relax_speed=0.4, goal_relax_radius=4.0))
    return cfg


@pytest.mark.slow
def test_goal_relax_releases_the_standoff():
    goal = (6.0, 0.0, 2.0)
    sc = _goal_dweller_world(goal)
    ref = jnp.linspace(jnp.asarray((0.0, 0.0, 2.0), jnp.float32),
                       jnp.asarray(goal, jnp.float32), 40)
    L = jnp.asarray(ref.shape[0])

    # default engine: the 1.5 m inflated ellipsoid over the goal parks
    # the drone outside the 0.5 m criterion for the whole episode
    cfg0 = _cfg(goal, relax=False)
    carry0, _ = run_episode(cfg0, sc, ref, L, solver_iters=40)
    s0 = summarize(cfg0, carry0)
    assert not s0["goal_reached"]
    assert not s0["collision"]
    standoff = float(jnp.linalg.norm(carry0.pos - jnp.asarray(goal)))
    assert 0.5 < standoff < 3.0      # parked near, not on, the goal

    # identical world, relaxation on: the stall counter anneals the
    # dynamic safety and the drone closes the last metre — no collision
    cfg1 = _cfg(goal, relax=True)
    carry1, _ = run_episode(cfg1, sc, ref, L, solver_iters=40)
    s1 = summarize(cfg1, carry1)
    assert s1["goal_reached"]
    assert not s1["collision"]


def test_goal_relax_off_is_default_program():
    """goal_relax=False leaves the carry field None: the default engine
    program (and every recorded artifact) is unchanged."""
    from intent_mpc_tpu.engine.closed_loop import init_carry
    cfg = _cfg((6.0, 0.0, 2.0), relax=False)
    sc = _goal_dweller_world((6.0, 0.0, 2.0))
    assert init_carry(cfg, sc).stall_cycles is None
    cfg_on = _cfg((6.0, 0.0, 2.0), relax=True)
    c = init_carry(cfg_on, sc)
    assert int(c.stall_cycles) == 0
