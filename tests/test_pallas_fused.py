"""Fleet-fused ADMM kernel (ops/pallas_fused.py) vs the XLA shared path.

Runs in interpret mode on the CPU mesh; the hardware validation story
(including the two measured diverging precision variants and the
production DYNUS gate) is in RESULTS.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig
from intent_mpc_tpu.ops.admm import admm_factor, admm_solve
from intent_mpc_tpu.ops import pallas_fused as pf
import tests.test_qp as tq


def _fleet(cfg, S, K, act):
    qps_s = []
    for s in range(S):
        cands = [tq._build_both(cfg, K, act, seed=10 * s + c,
                                with_static=True)[0] for c in range(6)]
        qps_s.append(jax.tree.map(lambda *a: jnp.stack(a), *cands))
    return jax.tree.map(lambda *a: jnp.stack(a), *qps_s)


def _xla_ref(cfg, qps, warm):
    def one(qp6, w6):
        qp_mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), qp6)
        qp_mean = qp_mean._replace(
            obs_active=jnp.max(qp6.obs_active, axis=0))
        fac = admm_factor(cfg, qp_mean)
        return jax.vmap(lambda q, x: admm_solve(cfg, q, x,
                                                factor=fac))(qp6, w6)
    return jax.vmap(one)(qps, warm)


def test_fleet_kernel_matches_xla_shared_path():
    """Same iterates as the XLA shared-factor solve (f32 noise)."""
    # the kernel implements the STATIONARY refinement recurrence in-VMEM;
    # pin the XLA reference to the same recurrence (production default is
    # cg — see SolverConfig.shared_refine_mode)
    cfg = PlannerConfig(horizon=10, max_obstacles=4,
                        solver=SolverConfig(max_iter=60,
                                            shared_refine_mode="stationary",
                                            shared_refine_iters=3))
    qps = _fleet(cfg, 4, 4, 3)
    warm = jnp.zeros((4, 6, cfg.num_vars))
    ref = _xla_ref(cfg, qps, warm)
    out = pf.fleet_admm(cfg, qps, warm, interpret=True)
    assert float(jnp.max(jnp.abs(out.x - ref.x))) < 1e-3
    np.testing.assert_allclose(np.asarray(out.prim_res),
                               np.asarray(ref.prim_res), atol=1e-3)
    # duals agree relative to their (rho_eq-amplified) scale
    for a, b in zip(out.y, ref.y):
        scale = float(jnp.max(jnp.abs(b))) + 1.0
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-3


def test_fleet_kernel_in_engine_vmap():
    """custom_vmap routing: the engine's vmapped episode with
    fused_solve=True matches the default path."""
    import dataclasses
    from intent_mpc_tpu.utils.config import small_config
    from intent_mpc_tpu.models.world import (generate_scenario,
                                             straight_line_ref_traj)
    from intent_mpc_tpu.engine import closed_loop as cl
    from intent_mpc_tpu.models.occupancy import empty_grid
    from intent_mpc_tpu.parallel import sharding as sh

    cfg = small_config(num_obstacles=6, horizon=10, timeout=1.0,
                       max_obstacles=6, hist=12)
    cfg = cfg.replace(goal=(8.0, 0.0, 2.0))
    # compare both engines under the kernel's OWN recurrence: stationary
    # refinement, Minv-rhs x-update guess, per-cycle factoring (the
    # round-3 warm-start/factor-reuse defaults are XLA-path features the
    # VMEM kernel does not implement — it is kept as a round-2-semantics
    # hardware artifact, RESULTS.md post-mortem)
    cfg = cfg.replace(planner=dataclasses.replace(
        cfg.planner, solver=dataclasses.replace(
            cfg.planner.solver, shared_refine_mode="stationary",
            shared_refine_iters=3, shared_refine_x0="minv",
            factor_reuse_cycles=1)))
    cfg_f = cfg.replace(planner=dataclasses.replace(
        cfg.planner, solver=dataclasses.replace(cfg.planner.solver,
                                                fused_solve=True)))
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=0.5)
    scenarios = sh.stack_scenarios(cfg, range(4))
    occ = empty_grid()
    tl = jnp.asarray(ref.shape[0])

    def run(c):
        carry = jax.vmap(lambda s: cl.init_carry(c, s))(scenarios)

        def step(cc, i):
            c2, _ = jax.vmap(lambda x, s: cl.episode_step(
                c, s, ref, tl, occ, x, i, solver_iters=40))(cc, scenarios)
            return c2, None
        carry, _ = jax.lax.scan(step, carry, jnp.arange(6))
        return carry

    base = run(cfg)
    fused = run(cfg_f)
    assert float(jnp.max(jnp.abs(base.pos - fused.pos))) < 1e-4
