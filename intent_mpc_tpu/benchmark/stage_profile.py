"""On-chip stage profile of the replan cycle.

Times each pipeline stage as a 20x lax.scan inside ONE jit dispatch (this
machine's TPU tunnel costs ~24 ms per dispatch, poisoning naive per-stage
timings — see RESULTS.md). Every scanned body threads a data dependency
through the carry so XLA cannot hoist the work out of the loop.

Usage: python -m intent_mpc_tpu.benchmark.stage_profile [--batch 32]
       [--platform cpu] [--iters 100]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from intent_mpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from intent_mpc_tpu.utils.config import IntentMPCConfig
    from intent_mpc_tpu.models.world import straight_line_ref_traj
    from intent_mpc_tpu.models.occupancy import empty_grid
    from intent_mpc_tpu.models import detector as det
    from intent_mpc_tpu.models import predictor as predlib
    from intent_mpc_tpu.models import mpc as mpclib
    from intent_mpc_tpu.parallel import sharding as sh
    from intent_mpc_tpu.engine import closed_loop as cl
    from intent_mpc_tpu.ops import qp as qplib
    from intent_mpc_tpu.ops.admm import admm_factor, admm_solve

    cfg = IntentMPCConfig()
    pcfg = cfg.planner
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    occ = empty_grid()
    B = args.batch
    scenarios = sh.stack_scenarios(cfg, range(B))

    # ---- advance the fleet 5 cycles to a realistic mid-flight state ----
    @jax.jit
    def advance(carry):
        def step(c, i):
            c2, _ = jax.vmap(lambda cc, s: cl.episode_step(
                cfg, s, ref, traj_len, occ, cc, i))(c, scenarios)
            return c2, None
        c, _ = jax.lax.scan(step, carry, jnp.arange(5))
        return c

    carry = advance(jax.vmap(lambda s: cl.init_carry(cfg, s))(scenarios))
    jax.block_until_ready(carry)

    # ---- frozen per-stage inputs from that state ----
    t0 = jnp.asarray(5.0 * cfg.engine.control_dt * cfg.engine.ticks_per_cycle)

    @jax.jit
    def stage_inputs(carry):
        def one(c, s):
            from intent_mpc_tpu.models.world import obstacle_state
            obs_pos0, _ = obstacle_state(s, t0)
            d = det.fd_update(cfg.detector, c.detector, obs_pos0, t0)
            d = det.hist_push(d, obs_pos0)
            return det.query_history(cfg.detector, d, s.bbox, c.pos)
        return jax.vmap(one)(carry, scenarios)

    pos_h, vel_h, acc_h, size_h, hist_len, visible = stage_inputs(carry)
    jax.block_until_ready(pos_h)

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)      # compile
        out = f(*xs)
        jax.block_until_ready(out)      # steady-state warmup
        t = time.time()
        out = f(*xs)
        jax.block_until_ready(out)
        dt = (time.time() - t) / args.reps * 1000.0
        print(f"{name:32s} {dt:8.2f} ms/cycle")
        return dt

    def scan20(body):
        def run(*xs):
            def step(c, _):
                return body(c, *xs[1:]), None
            c, _ = jax.lax.scan(step, xs[0], None, length=args.reps)
            return c
        return run

    # 1. full episode step
    def ep_body(c, i0):
        c2, _ = jax.vmap(lambda cc, s: cl.episode_step(
            cfg, s, ref, traj_len, occ, cc, i0,
            solver_iters=args.iters))(c, scenarios)
        return c2
    timed("episode_step (full cycle)", scan20(ep_body), carry,
          jnp.asarray(5, jnp.int32))

    # 2. predictor
    def pred_body(c, ph, vh, ah, sh_, hl):
        pred = jax.vmap(lambda a, b, cc, dd, e: predlib.predict(
            cfg.predictor, a, b, cc, dd, e, occ))(ph + c * 1e-30, vh, ah,
                                                  sh_, hl)
        return c + pred.pos[0, 0, 0, 0, 0] * 0.0
    timed("predictor", scan20(pred_body), jnp.asarray(0.0), pos_h, vel_h,
          acc_h, size_h, hist_len)

    # precompute predictions + per-candidate QPs for the solver stages
    @jax.jit
    def build_all(carry):
        def one(c, ph, vh, ah, sh_, hl, vis):
            pred = predlib.predict(cfg.predictor, ph, vh, ah, sh_, hl, occ)
            xref, _ = mpclib.reference_window(
                pcfg, ref, traj_len, c.pos, c.planner.last_ref_start)
            nominal = pred.pos[:, predlib.FORWARD, 0]
            closest = mpclib.find_closest_obstacle(
                pcfg, c.planner, c.pos, nominal, vis)
            cand_pos, cand_size, cand_active = mpclib.build_candidates(
                pcfg, pred, vis, closest)
            W = pcfg.mpc_window
            qsize = cand_size[:, :W] / 2.0 + pcfg.dynamic_safety_dist
            qpos = cand_pos[:, :W]
            lin = c.planner.states_sol[:W, 0:3]
            x0 = jnp.concatenate([c.pos, c.vel])

            def build_one(op, os_, act):
                return qplib.build_qp(
                    pcfg, x0, xref, op, os_, jnp.zeros(op.shape[:-1]),
                    jnp.ones(op.shape[:-1]),
                    jnp.broadcast_to(act[None, :], op.shape[:-1]), lin)
            qps = jax.vmap(build_one)(qpos, qsize, cand_active)
            warm = qplib.merge_z(c.planner.states_sol, c.planner.controls_sol)
            return qps, jnp.broadcast_to(warm, (6,) + warm.shape)
        return jax.vmap(one)(carry, pos_h, vel_h, acc_h, size_h, hist_len,
                             visible)

    qps, warm6 = build_all(carry)
    jax.block_until_ready(warm6)

    # 3. QP assembly (6 candidates)
    def asm_body(c, *_):
        q2, w2 = build_all(carry)
        return c + w2[0, 0, 0] * 0.0 + q2.q[0, 0, 0] * 0.0
    timed("assembly (pred+QP build)", scan20(asm_body), jnp.asarray(0.0))

    # 4. shared factor only
    def fac_body(c):
        def one(qp6, w6):
            qp_mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), qp6)
            qp_mean = qp_mean._replace(
                obs_active=jnp.max(qp6.obs_active, axis=0))
            qp_mean = qp_mean._replace(q=qp_mean.q + c * 1e-30)
            return admm_factor(pcfg, qp_mean)
        facs = jax.vmap(one)(qps, warm6)
        return c + facs.Minv[0, 0, 0] * 0.0
    t_fac = timed("shared factor (structured)", scan20(fac_body),
                  jnp.asarray(0.0))

    # 5-7. iterations with the factor held fixed
    @jax.jit
    def factors():
        def one(qp6):
            qp_mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), qp6)
            return admm_factor(pcfg, qp_mean._replace(
                obs_active=jnp.max(qp6.obs_active, axis=0)))
        return jax.vmap(one)(qps)
    fac = factors()
    jax.block_until_ready(fac.Minv)

    iters = args.iters or pcfg.solver.max_iter

    def solve_body(refine):
        scfg = dataclasses.replace(pcfg.solver, shared_refine_iters=refine)

        def body(cwarm):
            res = jax.vmap(lambda q6, w6, f: jax.vmap(
                lambda q, w: admm_solve(pcfg, q, w, iters, scfg=scfg,
                                        factor=f))(q6, w6))(qps, cwarm, fac)
            return cwarm * 0.999 + res.x * 1e-3
        return body

    t3 = timed(f"solve {iters}it, 3 refine", scan20(solve_body(3)), warm6)
    t0_ = timed(f"solve {iters}it, 0 refine", scan20(solve_body(0)), warm6)
    t1 = timed(f"solve {iters}it, 1 refine", scan20(solve_body(1)), warm6)
    print(f"{'-> refinement cost (3 vs 0)':32s} {t3 - t0_:8.2f} ms/cycle")


if __name__ == "__main__":
    main()
