"""QP assembly + ADMM parity tests against the independent f64 oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig
from intent_mpc_tpu.ops import qp as qplib
from intent_mpc_tpu.ops.admm import admm_solve, admm_factor
from intent_mpc_tpu.oracle import numpy_ref as oracle


def _random_problem(cfg, K, num_active, seed=0, with_static=False,
                    feasible=True):
    rng = np.random.RandomState(seed)
    H, W = cfg.horizon, cfg.mpc_window
    x0 = np.array([0.0, 0.0, 2.0, 1.0, 0.0, 0.0])
    # reference positions marching forward in x
    xref = np.stack([
        np.linspace(0, 2.5 * H, H), np.zeros(H), np.full(H, 2.0)], axis=-1)
    oxyz = np.zeros((W, K, 3))
    osize = np.ones((W, K, 3))
    yaw = np.zeros((W, K))
    is_dyn = np.ones((W, K), dtype=bool)
    active = np.zeros((W, K))
    for k in range(num_active):
        if feasible:  # obstacles clear of the start's reachable tube
            p0 = np.array([5.0 + 3 * k, (-1) ** k * 2.5, 2.0])
            v = np.array([0.2, -0.1 * (-1) ** k, 0.0])
        else:  # obstacles enveloping the start -> infeasible QP
            p0 = np.array([0.5, 0.0, 2.0])
            v = np.array([0.0, 0.0, 0.0])
        steps = np.arange(W)[:, None]
        oxyz[:, k, :] = p0[None, :] + steps * 0.1 * v[None, :]
        osize[:, k, :] = 0.4 + cfg.dynamic_safety_dist
        active[:, k] = 1.0
        if with_static and k % 2 == 1:
            is_dyn[:, k] = False
            yaw[:, k] = rng.uniform(-1, 1)
    lin = x0[None, 0:3] + np.arange(W)[:, None] * 0.1 * x0[None, 3:6]
    return x0, xref, oxyz, osize, yaw, is_dyn, active, lin


def _build_both(cfg, K, num_active, seed=0, with_static=False):
    x0, xref, oxyz, osize, yaw, is_dyn, active, lin = _random_problem(
        cfg, K, num_active, seed, with_static)
    qp = qplib.build_qp(
        cfg, jnp.asarray(x0), jnp.asarray(xref), jnp.asarray(oxyz),
        jnp.asarray(osize), jnp.asarray(yaw),
        jnp.asarray(is_dyn, jnp.float32), jnp.asarray(active),
        jnp.asarray(lin))
    # oracle only sees the active obstacle columns
    ka = num_active
    P, q, A, l, u = oracle.build_reference_qp(
        cfg, x0, xref, oxyz[:, :ka], osize[:, :ka], yaw[:, :ka],
        is_dyn[:, :ka], lin)
    return qp, (P, q, A, l, u), ka


@pytest.fixture(scope="module")
def cfg():
    return PlannerConfig(horizon=10, max_obstacles=4,
                         solver=SolverConfig(max_iter=400, refine_iters=1))


def _dense_from_structured(cfg, qp):
    """Materialize the structured A and bounds as dense, dropping padded
    obstacle columns ordering differences by keeping all K slots."""
    A = np.asarray(qplib.dense_a_matrix(cfg, qp), np.float64)
    l = np.asarray(qplib.con_to_flat(qp.l), np.float64)
    u = np.asarray(qplib.con_to_flat(qp.u), np.float64)
    return A, l, u


def test_structured_matches_reference_matrix(cfg):
    """Structured A/l/u rows must equal the oracle's literal construction."""
    K = cfg.max_obstacles
    qp, (P, q, A, l, u), ka = _build_both(cfg, K, 3, with_static=True)
    As, ls, us = _dense_from_structured(cfg, qp)

    H, W = cfg.horizon, cfg.mpc_window
    nb = 2 * 8 * H + 5 * W
    # non-obstacle block identical
    np.testing.assert_allclose(As[:nb], A[:nb], atol=1e-5)
    np.testing.assert_allclose(ls[:nb], l[:nb], atol=1e-5)
    np.testing.assert_allclose(us[:nb], u[:nb], atol=1e-5)
    # obstacle rows: structured layout is (W,K); oracle is (W,ka)
    As_obs = As[nb:].reshape(W, K, -1)[:, :ka]
    A_obs = A[nb:].reshape(W, ka, -1)
    np.testing.assert_allclose(As_obs, A_obs, atol=1e-4)
    ls_obs = ls[nb:].reshape(W, K)[:, :ka]
    np.testing.assert_allclose(ls_obs, l[nb:].reshape(W, ka), atol=1e-4)
    # gradient
    np.testing.assert_allclose(np.asarray(qp.q), q, atol=1e-3)


def test_normal_matrix_assembly(cfg):
    """Closed-form M assembly == dense P + sigma I + A^T rho A."""
    K = cfg.max_obstacles
    qp, _, _ = _build_both(cfg, K, 3, with_static=True)
    scfg = cfg.solver
    hdiag = qplib.hessian_diag(cfg)
    rho = qplib.rho_vec(cfg, qp, scfg.rho, scfg.rho_eq_scale)
    M = np.asarray(qplib.assemble_normal_matrix(cfg, qp, hdiag, scfg.sigma, rho),
                   np.float64)
    A, _, _ = _dense_from_structured(cfg, qp)
    rho_flat = np.asarray(qplib.con_to_flat(rho), np.float64)
    M_ref = (np.diag(np.asarray(hdiag, np.float64)) + scfg.sigma * np.eye(cfg.num_vars)
             + A.T @ (rho_flat[:, None] * A))
    np.testing.assert_allclose(M, M_ref, rtol=2e-4, atol=2e-3)


def test_matvec_adjoint(cfg):
    """<A z, w> == <z, A^T w> for random vectors."""
    K = cfg.max_obstacles
    qp, _, _ = _build_both(cfg, K, 2, with_static=True)
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(cfg.num_vars), jnp.float32)
    az = qplib.a_matvec(cfg, qp, z)
    w = jax.tree.map(lambda a: jnp.asarray(rng.randn(*a.shape), jnp.float32), az)
    lhs = sum(jnp.vdot(a, b) for a, b in zip(az, w))
    atw = qplib.at_matvec(cfg, qp, qplib.ConVec(*w))
    rhs = jnp.vdot(z, atw)
    assert abs(float(lhs) - float(rhs)) < 1e-2 * max(1.0, abs(float(lhs)))


@pytest.mark.parametrize("num_active,with_static", [(0, False), (3, True)])
def test_admm_matches_oracle_f32(cfg, num_active, with_static):
    """f32 ADMM (runtime mode) matches the f64 oracle to the f32 floor
    (~5e-3 positions / 5e-2 accelerations at these problem scales)."""
    K = cfg.max_obstacles
    qp, (P, q, A, l, u), _ = _build_both(cfg, K, num_active,
                                         with_static=with_static)
    x_ref, _ = oracle.solve_qp_dense(P, q, A, l, u, max_iter=20000, eps=1e-10)
    res = admm_solve(cfg, qp, max_iter=1000)
    x = np.asarray(res.x, np.float64)

    H, W = cfg.horizon, cfg.mpc_window
    acc = x[8 * H:].reshape(W, 5)[:, :3]
    acc_ref = x_ref[8 * H:].reshape(W, 5)[:, :3]
    pos = x[:8 * H].reshape(H, 8)[:, :3]
    pos_ref = x_ref[:8 * H].reshape(H, 8)[:, :3]
    assert float(res.prim_res) < 5e-2
    assert bool(res.solved)
    np.testing.assert_allclose(pos, pos_ref, atol=5e-3)
    np.testing.assert_allclose(acc, acc_ref, atol=5e-2)


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_admm_matches_oracle_f64(cfg, x64):
    """f64 ADMM (parity mode) meets the 1e-3 control-parity north-star
    with large margin (BASELINE.md: controls within 1e-3 of the CPU QP
    reference)."""
    K = cfg.max_obstacles
    qp, (P, q, A, l, u), _ = _build_both(cfg, K, 3, with_static=True)
    qp = jax.tree.map(
        lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, qp)
    x_ref, _ = oracle.solve_qp_dense(P, q, A, l, u, max_iter=20000, eps=1e-10)
    res = admm_solve(cfg, qp, max_iter=2000)
    x = np.asarray(res.x)
    H, W = cfg.horizon, cfg.mpc_window
    np.testing.assert_allclose(x[:8 * H].reshape(H, 8)[:, :3],
                               x_ref[:8 * H].reshape(H, 8)[:, :3], atol=1e-4)
    np.testing.assert_allclose(x[8 * H:].reshape(W, 5)[:, :3],
                               x_ref[8 * H:].reshape(W, 5)[:, :3], atol=1e-3)


def test_admm_detects_infeasible(cfg):
    """An obstacle enveloping the fixed initial state makes the QP
    infeasible; the solver must report solved=False (the reference treats
    this as an OSQP failure and reuses the previous trajectory,
    mpcNavigation.cpp:350-358)."""
    K = cfg.max_obstacles
    x0, xref, oxyz, osize, yaw, is_dyn, active, lin = _random_problem(
        cfg, K, 1, feasible=False)
    qp = qplib.build_qp(
        cfg, jnp.asarray(x0), jnp.asarray(xref), jnp.asarray(oxyz),
        jnp.asarray(osize), jnp.asarray(yaw),
        jnp.asarray(is_dyn, jnp.float32), jnp.asarray(active),
        jnp.asarray(lin))
    res = admm_solve(cfg, qp, max_iter=400)
    assert not bool(res.solved)


def test_shared_factor_matches_per_candidate_solve():
    """admm_solve(factor=...) with one mean-QP factorization + closed-form
    refinement must track the per-candidate factorization path (the
    shared-factor production mode; see RESULTS.md setup-dominated
    profile)."""
    cfg = PlannerConfig(horizon=30, max_obstacles=8)
    qs = [_build_both(cfg, 8, 4, seed=s, with_static=True)[0]
          for s in range(6)]
    qps = jax.tree.map(lambda *a: jnp.stack(a), *qs)
    qp_mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), qps)
    qp_mean = qp_mean._replace(obs_active=jnp.max(qps.obs_active, axis=0))
    fac = admm_factor(cfg, qp_mean)
    x0 = jnp.zeros((6, cfg.num_vars))
    r_base = jax.vmap(lambda q, x: admm_solve(cfg, q, x, 100))(qps, x0)
    r_shared = jax.vmap(lambda q, x: admm_solve(cfg, q, x, 100,
                                                factor=fac))(qps, x0)
    xb = np.asarray(r_base.x)
    xs = np.asarray(r_shared.x)
    H = cfg.horizon
    assert np.isfinite(xs).all()
    # positions within iterate noise of the unshared path
    assert np.abs((xb - xs)[:, :8 * H]).max() < 0.05
    assert np.asarray(r_shared.prim_res).max() < \
        np.asarray(r_base.prim_res).max() + 0.05


@pytest.mark.parametrize("H,K", [(7, 3), (13, 1), (30, 17)])
def test_odd_shapes_build_and_solve(H, K):
    """Shape robustness: non-round horizons and obstacle-slot counts must
    assemble and solve without shape errors (everything is closed-form
    structured, nothing assumes multiples of 8/128 outside pallas)."""
    cfg = PlannerConfig(horizon=H, max_obstacles=K,
                        solver=SolverConfig(max_iter=30))
    qp, _, _ = _build_both(cfg, K, min(K, 2))
    res = admm_solve(cfg, qp)
    x = np.asarray(res.x)
    assert x.shape == (cfg.num_vars,)
    assert np.isfinite(x).all()
    assert np.isfinite(float(res.prim_res))


def test_woodbury_candidates_match_exact_solve():
    """admm_solve(factor=..., diff_slots=...) — the exact Woodbury
    per-candidate x-update over a shared base factor — must track the
    per-candidate factorization path within iterate noise (same bound as
    the refinement test above), and the low-rank identity
    M_cand = M_base + U U^T must hold exactly."""
    import dataclasses
    cfg = PlannerConfig(horizon=30, max_obstacles=8, solver=dataclasses.replace(
        SolverConfig(), woodbury_candidates=True))
    qs = [_build_both(cfg, 8, 4, seed=s, with_static=True)[0]
          for s in range(6)]
    qps = jax.tree.map(lambda *a: jnp.stack(a), *qs)
    qp_mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), qps)
    qp_mean = qp_mean._replace(obs_active=jnp.max(qps.obs_active, axis=0))
    slots = jnp.asarray([2, 7], jnp.int32)
    K = qps.G.shape[2]
    mask = 1.0 - jnp.max(jax.nn.one_hot(slots, K,
                                        dtype=qp_mean.obs_active.dtype), axis=0)
    qp_base = qp_mean._replace(obs_active=qp_mean.obs_active * mask[None, :])
    fac = admm_factor(cfg, qp_base)

    # low-rank identity on candidate 0
    from intent_mpc_tpu.ops.admm import _slot_columns
    scfg = cfg.solver
    hdiag = qplib.hessian_diag(cfg)
    h_s = fac.c * fac.D * fac.D * hdiag
    rho_c = qplib.rho_vec(cfg, qs[0], scfg.rho, scfg.rho_eq_scale)
    rho_b = qplib.rho_vec(cfg, qp_base, scfg.rho, scfg.rho_eq_scale)
    Mc = qplib.assemble_normal_matrix(
        cfg, qs[0], h_s, scfg.sigma,
        rho_c.map(lambda r, e: r * e * e, fac.E), col_scale=fac.D)
    Mb = qplib.assemble_normal_matrix(
        cfg, qp_base, h_s, scfg.sigma,
        rho_b.map(lambda r, e: r * e * e, fac.E), col_scale=fac.D)
    U = _slot_columns(cfg, qs[0], rho_c.obs, fac.D, fac.E.obs, slots)
    lhs = np.asarray(Mc - Mb, np.float64)
    rhs = np.asarray(U, np.float64) @ np.asarray(U, np.float64).T
    scale = max(np.abs(lhs).max(), 1e-9)
    assert np.abs(lhs - rhs).max() / scale < 1e-3

    x0 = jnp.zeros((6, cfg.num_vars))
    r_base = jax.vmap(lambda q, x: admm_solve(cfg, q, x, 100))(qps, x0)
    r_wood = jax.vmap(lambda q, x: admm_solve(
        cfg, q, x, 100, factor=fac, diff_slots=slots))(qps, x0)
    xb = np.asarray(r_base.x)
    xw = np.asarray(r_wood.x)
    H = cfg.horizon
    assert np.isfinite(xw).all()
    assert np.abs((xb - xw)[:, :8 * H]).max() < 0.05


def test_adaptive_rho_recovers_bad_initialization():
    """OSQP's in-solve rho adaptation (oracle numpy_ref.py:208-221;
    native qp_solver.cpp:210-235): from a deliberately bad initial rho
    the adaptive solve must land much closer to the oracle optimum than
    the fixed-rho solve at the same iteration budget, and the adapted
    rho must move toward the well-tuned range."""
    import dataclasses
    from intent_mpc_tpu.oracle import numpy_ref
    cfg = PlannerConfig(horizon=30, max_obstacles=8,
                        solver=SolverConfig(max_iter=500, refine_iters=1))
    qp, (P, q, A, l, u), _ = _build_both(cfg, 8, 4, with_static=True)
    x_c, _ = numpy_ref.solve_qp_dense(P, q, A, l, u, max_iter=20000,
                                      eps=1e-9, polish=True)
    H = cfg.horizon

    def pos_err(res):
        x = np.asarray(res.x, np.float64)
        return np.abs(x[:8 * H].reshape(H, 8)[:, :3]
                      - x_c[:8 * H].reshape(H, 8)[:, :3]).max()

    for rho0 in (1e-3, 10.0):
        fixed = admm_solve(cfg, qp, rho_override=rho0)
        s2 = dataclasses.replace(cfg.solver, adaptive_rho=True)
        adap = admm_solve(cfg, qp, scfg=s2, rho_override=rho0)
        assert pos_err(adap) < pos_err(fixed) / 3.0, (rho0, pos_err(adap),
                                                      pos_err(fixed))
        assert 1e-3 < float(adap.rho_suggest) < 1.0


def test_folded_refine_operator_matches_closed_form():
    """make_folded_m_op is an algebraically-identical apply of the scaled
    normal matrix (each row r contributing (e_r^T v) e_r): it must match
    the production a_s/at_s round-trip operator to f32 rounding. (The
    folded form is a measured perf negative — see its docstring — but it
    independently pins the refinement operator's semantics.)"""
    from intent_mpc_tpu.ops.admm import make_folded_m_op, ruiz_equilibrate
    cfg = PlannerConfig(horizon=17, max_obstacles=6)
    qp, _, _ = _build_both(cfg, 6, 4, seed=5, with_static=True)
    hdiag = qplib.hessian_diag(cfg)
    sc = ruiz_equilibrate(cfg, qp, hdiag, 3)
    D, E, c = sc.D, sc.E, sc.c
    h_s = c * D * D * hdiag
    rho = qplib.rho_vec(cfg, qp, 0.1, 1e3)
    rho_inner = rho.map(lambda r, e: r * e * e, E)
    sigma = 1e-6

    def m_apply(v):
        a_s = qplib.a_matvec(cfg, qp, D * v).scale(E)
        w = a_s.map(lambda a, ri: a * ri, rho)
        return h_s * v + sigma * v + D * qplib.at_matvec(
            cfg, qp, w.scale(E))

    m_folded = make_folded_m_op(cfg, qp, h_s, sigma, rho_inner, D)
    for seed in range(3):
        v = jax.random.normal(jax.random.PRNGKey(seed), (cfg.num_vars,))
        a = np.asarray(m_apply(v))
        b = np.asarray(m_folded(v))
        assert np.abs(a - b).max() <= 1e-5 * (np.abs(a).max() + 1.0)


def test_flat_iteration_matches_grouped():
    """SolverConfig.flat_iter (ops/admm._solve_flat): the flat-constraint-
    space scan must reproduce the grouped ConVec path's iterates — primal
    to f32 roundoff, duals to small relative error (the z-clip boundary
    amplifies last-ulp differences discretely on rows that sit exactly at
    a bound, so duals are compared relatively per group)."""
    import dataclasses
    from intent_mpc_tpu.ops.admm import admm_factor, admm_solve
    from intent_mpc_tpu.utils.config import PlannerConfig

    cfg = PlannerConfig(horizon=12, max_obstacles=6)
    qp, _, _ = _build_both(cfg, 6, 3, with_static=True)
    fac = admm_factor(cfg, qp)
    warm = jnp.zeros(cfg.num_vars)
    for mode, x0m in (("cg", "prev"), ("cg", "minv"), ("stationary", "prev")):
        s_group = dataclasses.replace(cfg.solver, flat_iter=False,
                                      shared_refine_mode=mode,
                                      shared_refine_x0=x0m)
        s_flat = dataclasses.replace(s_group, flat_iter=True)
        rg = admm_solve(cfg, qp, warm, 60, scfg=s_group, factor=fac)
        rf = admm_solve(cfg, qp, warm, 60, scfg=s_flat, factor=fac)
        assert float(jnp.max(jnp.abs(rg.x - rf.x))) < 5e-4, (mode, x0m)
        for name, a, b in zip(("eq", "sb", "cb", "obs"), rg.y, rf.y):
            rel = float(jnp.max(jnp.abs(a - b))) \
                / max(float(jnp.max(jnp.abs(a))), 1e-9)
            assert rel < 2e-3, (mode, x0m, name, rel)
        np.testing.assert_allclose(float(rg.prim_res), float(rf.prim_res),
                                   rtol=1e-3)


def test_osqp_truncation_emulation(cfg):
    """truncation="osqp" (SolverConfig): the solver stops a problem at
    OSQP 0.6.2's unscaled eps_abs/eps_rel termination test, checked every
    term_check_interval iterations, capped at max_iter — the runtime
    protocol the reference flies (check_termination=25 + the 0.05 s time
    limit, mpcPlanner.cpp:442-444). The frozen iterate must itself
    satisfy the termination test whenever the criterion fired before the
    cap, and the batched (vmapped) path must agree with the single-QP
    path lane by lane."""
    import dataclasses
    from intent_mpc_tpu.ops import qp as qpops

    qp, _, _ = _build_both(cfg, cfg.max_obstacles, 2, seed=3)
    sc = dataclasses.replace(cfg.solver, truncation="osqp", max_iter=400)
    cfg_t = dataclasses.replace(cfg, solver=sc)
    r1 = admm_solve(cfg_t, qp)

    # the returned iterate satisfies the unscaled OSQP criterion (this
    # problem converges before the cap; the fixed-schedule solve at the
    # same budget keeps iterating past the termination point)
    hdiag = qpops.hessian_diag(cfg)
    ax = qpops.a_matvec(cfg, qp, r1.x)
    aty = qpops.at_matvec(cfg, qp, r1.y)
    z = ax.map(lambda a, l, u: jnp.clip(a, l, u), qp.l, qp.u)
    eps_p = sc.eps_abs + sc.eps_rel * max(float(ax.inf_norm()),
                                          float(z.inf_norm()))
    eps_d = sc.eps_abs + sc.eps_rel * max(
        float(jnp.max(jnp.abs(hdiag * r1.x))),
        float(jnp.max(jnp.abs(aty))), float(jnp.max(jnp.abs(qp.q))))
    assert float(r1.prim_res) < eps_p
    assert float(jnp.max(jnp.abs(hdiag * r1.x + qp.q + aty))) < eps_d

    # batched solve agrees with the single path (vmapped while_loop
    # compiles the block scan with different fusion -> f32 noise only)
    # and identical lanes stay bit-identical
    qps = jax.tree.map(lambda a: jnp.stack([a, a]), qp)
    rb = jax.jit(jax.vmap(lambda q: admm_solve(cfg_t, q)))(qps)
    np.testing.assert_allclose(np.asarray(rb.x[0]), np.asarray(r1.x),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(rb.x[1]), np.asarray(rb.x[0]),
                               atol=0)


def test_osqp_truncation_stops_exactly_at_max_iter(cfg):
    """The osqp-truncation cap is EXACT like OSQP's (ADVICE r4): with a
    tolerance no iterate can meet, truncation="osqp" at max_iter=60 /
    check_termination=25 must return the SAME iterate as the fixed
    schedule at 60 iterations — before the remainder-block clamp it ran
    ceil(60/25)*25 = 75 and diverged from the cap."""
    import dataclasses
    qp, _, _ = _build_both(cfg, cfg.max_obstacles, 2, seed=3)
    sc = dataclasses.replace(cfg.solver, truncation="osqp", max_iter=60,
                             eps_abs=1e-20, eps_rel=1e-20,
                             term_check_interval=25)
    cfg_t = dataclasses.replace(cfg, solver=sc)
    r_t = admm_solve(cfg_t, qp)
    sc_f = dataclasses.replace(cfg.solver, truncation="fixed", max_iter=60)
    r_f = admm_solve(dataclasses.replace(cfg, solver=sc_f), qp)
    np.testing.assert_allclose(np.asarray(r_t.x), np.asarray(r_f.x),
                               atol=1e-6)


def test_bf16_preconditioner_matches_f32(cfg):
    """SolverConfig.minv_dtype="bf16" is a PINNED MEASURED NEGATIVE:
    storing the shared preconditioner in bf16 is formally safe (CG's
    residuals/steps evaluate the exact f32 operator) but the ~0.4%
    preconditioner perturbation collapses CG-2's residual reduction on
    this ill-conditioned QP class — the same precision landmine that
    killed the fused kernel's bf16 dots (RESULTS.md post-mortem). This
    test pins the mechanics (dtype flows end to end, iterates stay in
    the same trajectory family, no divergence) and the NEGATIVE itself
    (primal residual an order of magnitude above the f32 solve at the
    same budget), so a future jax/XLA change that fixes the regime is
    noticed."""
    import dataclasses
    qp, _, _ = _build_both(cfg, cfg.max_obstacles, 2, seed=5)
    fac32 = admm_factor(cfg, qp)
    r32 = admm_solve(cfg, qp, factor=fac32)
    scb = dataclasses.replace(cfg.solver, minv_dtype="bf16")
    cfgb = dataclasses.replace(cfg, solver=scb)
    facb = admm_factor(cfgb, qp, scfg=scb)
    assert facb.Minv.dtype == jnp.bfloat16
    rb = admm_solve(cfgb, qp, factor=facb)
    assert rb.x.dtype == jnp.float32
    H = cfg.horizon
    p32 = np.asarray(r32.x[:8 * H]).reshape(H, 8)[:, :3]
    pb = np.asarray(rb.x[:8 * H]).reshape(H, 8)[:, :3]
    # same trajectory family (sub-meter), not bitwise parity
    np.testing.assert_allclose(pb, p32, atol=0.5)
    # the pinned negative: residual reduction collapses (f32 converges
    # to ~1e-2 at this budget; bf16 preconditioning strands it ~1e0).
    # If this ever starts PASSING tighter bounds, re-evaluate the mode.
    assert float(r32.prim_res) < 5e-2
    assert float(rb.prim_res) > 10 * float(r32.prim_res)
