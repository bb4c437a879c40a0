"""Subprocess worker for the 2-process jax.distributed validation
(test_multihost.py). Each process owns 4 virtual CPU devices; the mesh
spans all 8 global devices and fleet statistics psum across processes
over the Gloo/grpc backend — the same program as real multi-host DCN.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
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
    # past-the-smoke scale (VERDICT r4 item 4): 16 episodes x 25 MPC
    # cycles (2.5 s of flight each) so the cross-process psum rides a
    # program whose scan actually iterates, not a 2-cycle shape check
    cfg = small_config(num_obstacles=8)
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    tl = jnp.asarray(ref.shape[0])
    mesh = sh.make_mesh()                       # all global devices
    g = sh.stack_scenarios_global(cfg, list(range(16)), mesh)
    _, agg = sh.batch_rollout(cfg, g, ref, tl, mesh=mesh,
                              solver_iters=20, num_cycles=25)
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
