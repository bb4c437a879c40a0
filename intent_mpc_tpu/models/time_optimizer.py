"""Time-optimal path parameterization (TOPP).

Rebuild of time_optimizer/ (timeOptimizer.cpp + trajectoryDivider.cpp),
which formulates minimum-time parameterization of a geometric trajectory
under velocity/acceleration limits as a MOSEK conic program. The
TPU-native replacement is the numerical-integration form of the same
convex problem (TOPP forward/backward reachability over b(s) = s_dot^2):

  * squared path speed b_k at arclength samples s_k
  * velocity limits:  b_k <= min_i (v_max / |q'_i(s_k)|)^2
  * acceleration limits: x_ddot = q'' b + q' b'/2 =>
        |q''_i b + q'_i a| <= a_max per axis, a = b'/2
  * backward pass caps b_k by what the strongest admissible deceleration
    can reach from b_{k+1}; forward pass integrates the strongest
    admissible acceleration from b_0.

Both passes are lax.scans (sequential in s, batched over trajectories via
vmap), with the b-dependent acceleration interval re-evaluated on the
fly — the fixed-point the conic solver finds in one shot. Time stamps
follow t_{k+1} = t_k + 2 ds / (sqrt(b_k) + sqrt(b_{k+1})).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TOPPResult(NamedTuple):
    b: jnp.ndarray        # (N,) squared path speed at samples
    times: jnp.ndarray    # (N,) time stamps
    total_time: jnp.ndarray


def _acc_interval(qp, qpp, b, a_max):
    """Admissible a = b'/2 interval from |q'' b + q' a| <= a_max (per axis),
    intersected over axes. Returns (lo, hi)."""
    lo = jnp.full((), -jnp.inf)
    hi = jnp.full((), jnp.inf)
    for i in range(3):
        qpi, qppi = qp[i], qpp[i]
        c = qppi * b
        safe = jnp.abs(qpi) > 1e-6
        a1 = (a_max - c) / jnp.where(safe, qpi, 1.0)
        a2 = (-a_max - c) / jnp.where(safe, qpi, 1.0)
        alo = jnp.minimum(a1, a2)
        ahi = jnp.maximum(a1, a2)
        lo = jnp.where(safe, jnp.maximum(lo, alo), lo)
        hi = jnp.where(safe, jnp.minimum(hi, ahi), hi)
    return lo, hi


def parameterize(path: jnp.ndarray, v_max: float, a_max: float,
                 b_start: float = 0.0, b_end: float = 0.0) -> TOPPResult:
    """Time-optimal parameterization of a sampled path (N,3).

    Arclength is the chord length between samples; q', q'' by central
    finite differences in s.
    """
    N = path.shape[0]
    seg = jnp.linalg.norm(path[1:] - path[:-1], axis=-1)
    ds = jnp.maximum(seg, 1e-6)
    s = jnp.concatenate([jnp.zeros(1), jnp.cumsum(ds)])

    def grad(f):
        # central differences with one-sided ends, w.r.t. arclength
        fwd = (f[1:] - f[:-1]) / ds[:, None]
        mid = (fwd[1:] + fwd[:-1]) / 2.0
        return jnp.concatenate([fwd[:1], mid, fwd[-1:]], axis=0)

    qp = grad(path)          # (N,3) ~ unit tangents
    qpp = grad(qp)

    # velocity cap; v_max may be a scalar or a per-sample (N,) array
    # (the braking-zone limits from models/traj_divider.py)
    v_cap = jnp.broadcast_to(jnp.asarray(v_max, path.dtype), (N,))
    b_vel = jnp.min((v_cap[:, None]
                     / jnp.maximum(jnp.abs(qp), 1e-6)) ** 2, axis=-1)

    # backward pass: b_k <= b_{k+1} - 2 ds * a_lo(b_{k+1})
    def back(b_next, k):
        i = N - 2 - k
        lo, _ = _acc_interval(qp[i + 1], qpp[i + 1], b_next, a_max)
        cap = b_next - 2.0 * ds[i] * lo
        b_i = jnp.minimum(b_vel[i], jnp.maximum(cap, 0.0))
        return b_i, b_i

    bN = jnp.minimum(jnp.asarray(b_end), b_vel[-1])
    _, b_back_rev = jax.lax.scan(back, bN, jnp.arange(N - 1))
    b_back = jnp.concatenate([jnp.flip(b_back_rev), bN[None]])

    # forward pass: b_{k+1} <= b_k + 2 ds * a_hi(b_k), capped by backward
    def fwd(b_prev, k):
        _, hi = _acc_interval(qp[k], qpp[k], b_prev, a_max)
        nxt = b_prev + 2.0 * ds[k] * jnp.maximum(hi, 0.0)
        b_k1 = jnp.minimum(nxt, b_back[k + 1])
        return b_k1, b_k1

    b0 = jnp.minimum(jnp.asarray(b_start), b_back[0])
    _, b_fwd = jax.lax.scan(fwd, b0, jnp.arange(N - 1))
    b = jnp.concatenate([b0[None], b_fwd])

    sb = jnp.sqrt(jnp.maximum(b, 1e-12))
    dt = 2.0 * ds / (sb[:-1] + sb[1:])
    times = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dt)])
    return TOPPResult(b=b, times=times, total_time=times[-1])


def sample_state(path: jnp.ndarray, res: TOPPResult, t):
    """Position + velocity at time t from the parameterized trajectory."""
    N = path.shape[0]
    i = jnp.clip(jnp.searchsorted(res.times, t, side="right") - 1, 0, N - 2)
    t0, t1 = res.times[i], res.times[i + 1]
    frac = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    pos = path[i] + (path[i + 1] - path[i]) * frac
    sb = jnp.sqrt(jnp.maximum(res.b[i] * (1 - frac) + res.b[i + 1] * frac,
                              0.0))
    seg = path[i + 1] - path[i]
    tang = seg / jnp.maximum(jnp.linalg.norm(seg), 1e-9)
    vel = tang * sb
    past = t >= res.total_time
    return jnp.where(past, path[-1], pos), jnp.where(past, 0.0, vel)
