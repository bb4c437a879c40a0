"""Trajectory-library tests: pwl + min-snap polynomial."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import pwl_traj, poly_traj


def _waypoints():
    return jnp.asarray(np.array([
        [0.0, 0.0, 1.0],
        [2.0, 0.0, 1.0],
        [3.0, 2.0, 1.5],
        [5.0, 2.0, 1.0],
    ]))


def test_pwl_hits_waypoints_and_speed():
    wps = _waypoints()
    tr = pwl_traj.plan(wps, desired_vel=2.0, desired_angular_vel=1.0)
    # start and end
    p, _ = pwl_traj.sample(tr, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(p), np.asarray(wps[0]), atol=1e-5)
    p, _ = pwl_traj.sample(tr, tr.duration + 1.0)
    np.testing.assert_allclose(np.asarray(p), np.asarray(wps[-1]), atol=1e-5)
    # speed during the first forward segment ~ desired_vel
    p1, _ = pwl_traj.sample(tr, jnp.asarray(0.1))
    p2, _ = pwl_traj.sample(tr, jnp.asarray(0.4))
    v = np.linalg.norm(np.asarray(p2) - np.asarray(p1)) / 0.3
    assert abs(v - 2.0) < 1e-3
    # rotation segments hold position: sample right after first knot
    k = float(tr.knots[0])


def test_pwl_rotation_holds_position():
    wps = _waypoints()
    tr = pwl_traj.plan(wps, desired_vel=2.0, desired_angular_vel=1.0)
    # second rotation period spans knots[1]..knots[2]
    t_rot = (tr.knots[1] + tr.knots[2]) / 2.0
    p, yaw = pwl_traj.sample(tr, t_rot)
    np.testing.assert_allclose(np.asarray(p), np.asarray(wps[1]), atol=1e-5)


def test_polytraj_interpolates_waypoints():
    wps = _waypoints()
    tr = poly_traj.plan(wps, desired_vel=2.0)
    assert np.all(np.asarray(tr.prim_res) < 1e-2)
    for i, t in enumerate(np.asarray(tr.times)):
        p = poly_traj.sample(tr, jnp.asarray(t - 1e-6 if i else t))
        np.testing.assert_allclose(np.asarray(p), np.asarray(wps[i]), atol=5e-3)


def test_polytraj_boundary_derivatives_zero():
    wps = _waypoints()
    tr = poly_traj.plan(wps, desired_vel=2.0)
    v0 = poly_traj.sample(tr, jnp.asarray(0.0), order=1)
    a0 = poly_traj.sample(tr, jnp.asarray(0.0), order=2)
    assert np.linalg.norm(np.asarray(v0)) < 2e-2
    assert np.linalg.norm(np.asarray(a0)) < 0.5


def test_polytraj_continuity():
    wps = _waypoints()
    tr = poly_traj.plan(wps, desired_vel=2.0)
    for tk in np.asarray(tr.times)[1:-1]:
        pm = poly_traj.sample(tr, jnp.asarray(tk - 1e-4))
        pp = poly_traj.sample(tr, jnp.asarray(tk + 1e-4))
        np.testing.assert_allclose(np.asarray(pm), np.asarray(pp), atol=5e-3)
        vm = poly_traj.sample(tr, jnp.asarray(tk - 1e-4), order=1)
        vp = poly_traj.sample(tr, jnp.asarray(tk + 1e-4), order=1)
        np.testing.assert_allclose(np.asarray(vm), np.asarray(vp), atol=0.1)


def test_polytraj_corridor_relaxes_midpoints():
    """Corridor mode: midpoints become +-r boxes. The active-set tail of
    this QP converges slowly in f32 even for OSQP-class solvers (the f64
    oracle needs ~10k iterations for 1e-3); accept the documented f32
    budget: box satisfied up to the reported primal residual."""
    wps = _waypoints()
    r = jnp.asarray([0.5, 0.5, 0.5])
    tr = poly_traj.plan(wps, desired_vel=2.0,
                        cfg=poly_traj.PolyTrajConfig(max_iter=800),
                        corridor_r=r)
    prim = float(np.asarray(tr.prim_res).max())
    assert prim < 0.1
    for i in (1, 2):
        p = np.asarray(poly_traj.sample(tr, tr.times[i]))
        assert np.all(np.abs(p - np.asarray(wps[i])) < 0.5 + prim + 5e-2)
