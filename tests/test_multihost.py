"""True multi-process validation of the distributed path: two OS processes
with disjoint device sets, one global mesh, cross-process psum (the exact
program that runs on N TPU hosts over DCN — here on CPU over Gloo/grpc).

Spawned as subprocesses because jax.distributed is once-per-process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fleet_matches_single_process():
    port = _free_port()
    worker = os.path.join(_ROOT, "tests", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=_ROOT) for i in range(2)]
    outs = [p.communicate(timeout=520)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    line = next(l for l in outs[0].splitlines() if l.startswith("MH_RESULT"))
    res = json.loads(line[len("MH_RESULT "):])
    assert res["procs"] == 2
    assert res["global_devices"] == 8
    assert res["local_devices"] == 4
    assert res["episodes"] == 16.0

    # single-process reference on an 8-device mesh must agree exactly
    ref_src = r"""
import os, sys, json
sys.path.insert(0, %r)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from intent_mpc_tpu.parallel import sharding as sh
from intent_mpc_tpu.models.world import straight_line_ref_traj
from intent_mpc_tpu.utils.config import small_config
cfg = small_config(num_obstacles=8)
ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
mesh = sh.make_mesh(8)
g = sh.stack_scenarios_global(cfg, list(range(16)), mesh)
_, agg = sh.batch_rollout(cfg, g, ref, jnp.asarray(ref.shape[0]),
                          mesh=mesh, solver_iters=20, num_cycles=25)
print("REF", round(agg["path_length_sum"], 4))
""" % _ROOT
    out = subprocess.run([sys.executable, "-c", ref_src], text=True,
                         capture_output=True, timeout=520, env=env,
                         cwd=_ROOT).stdout
    ref_sum = float(next(l for l in out.splitlines()
                         if l.startswith("REF")).split()[1])
    np.testing.assert_allclose(res["path_sum"], ref_sum, atol=1e-3)
