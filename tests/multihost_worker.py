"""Subprocess worker for the 2-process jax.distributed validation
(test_multihost.py). Each process owns 4 virtual CPU devices; the mesh
spans all 8 global devices and fleet statistics psum across processes
over the Gloo/grpc backend — the same program as real multi-host DCN.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
           [production]

The optional `production` mode runs the PRODUCTION program shape
(horizon 30, 200-obstacle world, 64 obstacle slots, default budget)
instead of small_config — the real-two-process twin of
dryrun_multichip's production inventory check (VERDICT r4 item 4).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
production = len(sys.argv) > 4 and sys.argv[4] == "production"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import jax.numpy as jnp

from intent_mpc_tpu.models.world import straight_line_ref_traj
from intent_mpc_tpu.parallel import sharding as sh
from intent_mpc_tpu.utils.config import small_config


def main():
    if production:
        # the production program class across REAL processes: full
        # horizon-30 / 200-obstacle / 64-slot engine, 8 episodes
        # (one per global device) x 10 cycles at the default budget
        from intent_mpc_tpu.utils.config import IntentMPCConfig
        cfg = IntentMPCConfig()
        episodes, cycles, iters = 8, 10, None
    else:
        # past-the-smoke scale (VERDICT r4 item 4): 16 episodes x 25 MPC
        # cycles (2.5 s of flight each) so the cross-process psum rides a
        # program whose scan actually iterates, not a 2-cycle shape check
        cfg = small_config(num_obstacles=8)
        episodes, cycles, iters = 16, 25, 20
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    tl = jnp.asarray(ref.shape[0])
    mesh = sh.make_mesh()                       # all global devices
    g = sh.stack_scenarios_global(cfg, list(range(episodes)), mesh)
    _, agg = sh.batch_rollout(cfg, g, ref, tl, mesh=mesh,
                              solver_iters=iters, num_cycles=cycles)
    if pid == 0:
        print("MH_RESULT " + json.dumps({
            "procs": jax.process_count(),
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
            "episodes": agg["episodes"],
            "goals": agg["goals"],
            "path_sum": round(agg["path_length_sum"], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
