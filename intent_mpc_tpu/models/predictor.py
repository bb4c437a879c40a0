"""Intent predictor: Markov-chain intent probabilities + multi-hypothesis
trajectory rollouts, fully vectorized over (obstacle, intent, sample).

Reference: dynamic_predictor/include/dynamic_predictor/dynamicPredictor.cpp.
The reference's data-dependent sample loops (`for(double i=min;i<max;i+=step)`
with occupancy-rejection `break`s, :365-397, :438-482) become fixed-shape
meshgrids with validity masks; per-step means/variances are masked
reductions. Intent order matches the reference enum
(dynamic_predictor/utils.h:15-20): FORWARD=0, LEFT=1, RIGHT=2, STOP=3.

Known reference quirk reproduced deliberately NOT: the intentProb history
loop reads posHist[-1] on its final iteration (dynamicPredictor.cpp:207-214
with j = numHist-1 -> index numHist-j-2 = -1), which is out-of-bounds UB in
C++. We iterate only the well-defined transitions.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models.occupancy import OccupancyGrid, is_occupied
from intent_mpc_tpu.utils.config import PredictorConfig

FORWARD, LEFT, RIGHT, STOP = 0, 1, 2, 3


class Prediction(NamedTuple):
    pos: jnp.ndarray          # (O, 4, P+1, 3) predicted mean positions
    size: jnp.ndarray         # (O, 4, P+1, 3) predicted sizes (var-inflated)
    intent_prob: jnp.ndarray  # (O, 4)


def _wrap_angle(t):
    return t - 2.0 * jnp.pi * jnp.floor((t + jnp.pi) / (2.0 * jnp.pi))


def transition_matrix(cfg: PredictorConfig, theta, r):
    """4x4 transition matrix; column i is genTransitionVector with intent i
    scaled by pscale (dynamicPredictor.cpp:229-281). theta/r scalars or
    batched (...)."""
    pf_b = jnp.exp(-0.5 * (theta / cfg.param_f) ** 2) + cfg.param_l
    pl_b = cfg.param_l * (1.0 + jnp.sin(theta))
    pr_b = cfg.param_r * (1.0 - jnp.sin(theta))

    def column(scale_idx):
        s = jnp.ones(4).at[scale_idx].set(cfg.pscale)
        pf = s[0] * pf_b
        pl = s[1] * pl_b
        pr = s[2] * pr_b
        ps = 1.0 - jnp.tanh(cfg.param_s / s[3] * r)
        tot = pf + pl + pr
        k = (1.0 - ps) / tot
        return jnp.stack([pf * k, pl * k, pr * k, ps], axis=-1)

    cols = [column(i) for i in range(4)]
    return jnp.stack(cols, axis=-1)   # (..., 4 rows, 4 cols)


def intent_probabilities(cfg: PredictorConfig, pos_hist, vel_hist, hist_len):
    """P = prod_k T(theta_k, r_k) * uniform, folded oldest-to-newest.

    Args:
      pos_hist: (O, Hh, 3) newest at index 0 (fakeDetector ring-buffer order)
      vel_hist: (O, Hh, 3)
      hist_len: (O,) number of valid entries per obstacle
    Returns (O, 4).

    Transition k (k = index of the newest point of the triplet) uses
    theta = wrap(angle(pos[k]-pos[k+1]) - angle(pos[k+1]-pos[k+2])) and
    r = |vel[k][:2]| (dynamicPredictor.cpp:207-222). The reference iterates
    k from numHist-4 down to 0; transitions with any index >= hist_len are
    masked to identity.
    """
    O, Hh, _ = pos_hist.shape
    seg = pos_hist[:, :-1] - pos_hist[:, 1:]          # (O, Hh-1, 3) newer-older
    ang = jnp.arctan2(seg[..., 1], seg[..., 0])       # (O, Hh-1)
    theta = _wrap_angle(ang[:, :-1] - ang[:, 1:])     # (O, Hh-2), index k
    r = jnp.linalg.norm(vel_hist[:, : Hh - 2, 0:2], axis=-1)

    ks = jnp.arange(Hh - 2)
    # reference loop covers k in [0, numHist-4]; k+2 must be a valid sample
    valid = (ks[None, :] + 2 < hist_len[:, None]) & (ks[None, :] <= hist_len[:, None] - 4)

    T = transition_matrix(cfg, theta, r)              # (O, Hh-2, 4, 4)
    T = jnp.where(valid[..., None, None], T, jnp.eye(4))

    P0 = jnp.full((O, 4), 0.25, T.dtype)

    def fold(P, Tk):
        return jnp.einsum("oij,oj->oi", Tk, P,
                          precision=jax.lax.Precision.HIGHEST), None

    # oldest transition first: scan k from high to low
    P, _ = jax.lax.scan(fold, P0, jnp.flip(jnp.swapaxes(T, 0, 1), axis=0))
    return P


# ---------------------------------------------------------------------------
# Rollout sample grids
# ---------------------------------------------------------------------------

def _masked_mean_var(points_xy, valid):
    """Masked per-step mean and variance over the leading sample axis.

    points_xy (S, P+1, 2); valid (S,). Mirrors genTraj
    (dynamicPredictor.cpp:503-538): mean over valid samples; variance
    divides by the valid count."""
    w = valid[:, None, None]
    cnt = jnp.maximum(jnp.sum(valid), 1.0)
    mean = jnp.sum(points_xy * w, axis=0) / cnt
    var = jnp.sum(((points_xy - mean[None]) ** 2) * w, axis=0) / cnt
    return mean, var


def _forward_samples(cfg: PredictorConfig, pos0, vel0, occ: OccupancyGrid):
    """modelForward (dynamicPredictor.cpp:351-402): const-velocity rollouts
    over an (angle, speed) grid. Returns (S, P+1, 3) positions + (S,) valid."""
    P = cfg.num_pred
    na, ns = cfg.num_forward_angle_samples, cfg.max_forward_speed_samples
    speed = jnp.linalg.norm(vel0[0:2])
    ang0 = jnp.arctan2(vel0[1], vel0[0])

    angles = ang0 - cfg.front_angle + cfg.forward_angle_step * jnp.arange(na)
    speeds = cfg.forward_speed_step * jnp.arange(ns)
    sp_valid = speeds < 2.0 * speed                    # loop bound j < 2v

    t = jnp.arange(P + 1, dtype=pos0.dtype)            # 0..P
    dirs = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)  # (na, 2)
    # (na, ns, P+1, 2)
    xy = (pos0[None, None, None, 0:2]
          + dirs[:, None, None, :] * speeds[None, :, None, None]
          * (t * cfg.dt)[None, None, :, None])
    z = jnp.broadcast_to(pos0[2], xy.shape[:-1])[..., None]
    pts = jnp.concatenate([xy, z], axis=-1)            # (na, ns, P+1, 3)

    free = ~is_occupied(occ, pts[..., 1:, :])          # (na, ns, P)
    clear = jnp.all(free, axis=-1)                     # (na, ns)
    # the reference `break`s out of the speed loop on first collision,
    # discarding all higher speeds for that angle (:389-395)
    clear = jnp.cumprod(clear.astype(jnp.int32), axis=1).astype(bool)
    valid = clear & sp_valid[None, :]
    return pts.reshape(na * ns, P + 1, 3), valid.reshape(na * ns)


def _turning_samples(cfg: PredictorConfig, intent, pos0, vel0,
                     occ: OccupancyGrid):
    """modelTurning (dynamicPredictor.cpp:404-486): rotate-velocity rollouts
    over (speed, ang-vel, end-angle). intent: LEFT or RIGHT (static int)."""
    P = cfg.num_pred
    ns = cfg.max_turning_speed_samples
    nw = cfg.num_turning_angvel_samples
    ne = cfg.num_turning_end_samples
    speed = jnp.linalg.norm(vel0[0:2])
    ang0 = jnp.arctan2(vel0[1], vel0[0])

    speeds = cfg.turning_speed_step * jnp.arange(ns)
    sp_valid = speeds < 2.0 * speed

    if intent == LEFT:
        end = cfg.front_angle + ang0 + cfg.turning_end_step * jnp.arange(ne)
        angvel = (jnp.pi / 2) / cfg.max_turning_time \
            + cfg.turning_angvel_step * jnp.arange(nw)
    else:
        end = -(jnp.pi - cfg.front_angle) + ang0 \
            + cfg.turning_end_step * jnp.arange(ne)
        angvel = (-jnp.pi / 2) / cfg.min_turning_time \
            + cfg.turning_angvel_step * jnp.arange(nw)

    t = jnp.arange(P, dtype=pos0.dtype)                # velocity step index
    # angle_t = clamp(ang0 + t*w*dt, end)  (LEFT: min, RIGHT: max)
    raw = ang0 + t[None, None, :] * angvel[:, None, None] * cfg.dt  # (nw,1,P)
    if intent == LEFT:
        ang_t = jnp.minimum(raw, end[None, :, None])   # (nw, ne, P)
    else:
        ang_t = jnp.maximum(raw, end[None, :, None])
    dirs = jnp.stack([jnp.cos(ang_t), jnp.sin(ang_t)], axis=-1)    # (nw,ne,P,2)
    disp = jnp.cumsum(dirs, axis=-2) * cfg.dt          # (nw, ne, P, 2)
    # (ns, nw, ne, P, 2)
    xy = pos0[None, None, None, None, 0:2] \
        + speeds[:, None, None, None, None] * disp[None]
    xy = jnp.concatenate(
        [jnp.broadcast_to(pos0[0:2], xy.shape[:-2] + (1, 2)), xy], axis=-2)
    z = jnp.broadcast_to(pos0[2], xy.shape[:-1])[..., None]
    pts = jnp.concatenate([xy, z], axis=-1)            # (ns,nw,ne,P+1,3)

    free = ~is_occupied(occ, pts[..., 1:, :])
    clear = jnp.all(free, axis=-1)                     # (ns,nw,ne)
    valid = clear & sp_valid[:, None, None]
    S = ns * nw * ne
    return pts.reshape(S, P + 1, 3), valid.reshape(S)


def _stop_prediction(cfg: PredictorConfig, pos0, vel0, size0):
    """modelStop (dynamicPredictor.cpp:488-501): constant position, size
    growing by 2*min(v, stopVel)*dt per step (also the empty-sample fallback
    :312-326)."""
    P = cfg.num_pred
    speed = jnp.linalg.norm(vel0[0:2])
    grow = 2.0 * jnp.minimum(speed, cfg.stop_vel) * cfg.dt
    t = jnp.arange(P + 1, dtype=pos0.dtype)
    pos = jnp.broadcast_to(pos0, (P + 1, 3))
    size = jnp.broadcast_to(size0, (P + 1, 3))
    size = size.at[:, 0:2].add((t * grow)[:, None])
    return pos, size


def _aggregate(cfg: PredictorConfig, pts, valid, size0, occ: OccupancyGrid):
    """genTraj + positionCorrection: masked mean/variance + z-score size
    inflation; if the mean path collides, substitute the nearest sample."""
    any_valid = jnp.any(valid)
    vmask = valid.astype(pts.dtype)
    mean_xy, var_xy = _masked_mean_var(pts[..., 0:2], vmask)
    P1 = pts.shape[1]
    mean = jnp.concatenate(
        [mean_xy, jnp.broadcast_to(pts[0, 0, 2], (P1,))[:, None]], axis=-1)
    size = jnp.broadcast_to(size0, (P1, 3))
    size = size.at[:, 0:2].add(2.0 * jnp.sqrt(var_xy) * cfg.z_score)

    # positionCorrection (dynamicPredictor.cpp:540-567)
    collide = jnp.any(is_occupied(occ, mean))
    d = jnp.linalg.norm(pts[..., 0:2] - mean[None, :, 0:2], axis=-1)  # (S,P+1)
    score = jnp.sum(d, axis=-1) + jnp.where(valid, 0.0, jnp.inf)
    nearest = pts[jnp.argmin(score)]
    mean = jnp.where(collide, nearest, mean)
    return mean, size, any_valid


def predict_single(cfg: PredictorConfig, pos0, vel0, acc0, size0,
                   occ: OccupancyGrid):
    """All 4 intent hypotheses for one obstacle.

    Returns (pos (4, P+1, 3), size (4, P+1, 3)). genPoints semantics
    (dynamicPredictor.cpp:331-349): speed <= stopVel -> every intent uses
    the stop model."""
    speed = jnp.linalg.norm(vel0[0:2])
    stopped = speed <= cfg.stop_vel

    stop_pos, stop_size = _stop_prediction(cfg, pos0, vel0, size0)

    f_pts, f_valid = _forward_samples(cfg, pos0, vel0, occ)
    f_pos, f_size, f_ok = _aggregate(cfg, f_pts, f_valid, size0, occ)

    l_pts, l_valid = _turning_samples(cfg, LEFT, pos0, vel0, occ)
    l_pos, l_size, l_ok = _aggregate(cfg, l_pts, l_valid, size0, occ)

    r_pts, r_valid = _turning_samples(cfg, RIGHT, pos0, vel0, occ)
    r_pos, r_size, r_ok = _aggregate(cfg, r_pts, r_valid, size0, occ)

    def pick(ok, pos, size):
        # no valid samples -> stop-model fallback (:312-326); stopped
        # obstacles always use the stop model (:335-336)
        use_stop = stopped | ~ok
        return (jnp.where(use_stop, stop_pos, pos),
                jnp.where(use_stop, stop_size, size))

    fw = pick(f_ok, f_pos, f_size)
    lf = pick(l_ok, l_pos, l_size)
    rt = pick(r_ok, r_pos, r_size)
    pos = jnp.stack([fw[0], lf[0], rt[0], stop_pos], axis=0)
    size = jnp.stack([fw[1], lf[1], rt[1], stop_size], axis=0)
    return pos, size


# ---------------------------------------------------------------------------
# Closed-form moment path (empty occupancy map — the DYNUS benchmark state)
#
# With no occupancy rejection every grid sample is valid, and sample
# positions factorize: forward p_t = p0 + t*dt * s*dir(a) and turning
# p_t = p0 + s * D_t(w, e) with D_t = dt * cumsum(dir(angle_tau)). The
# per-step mean/variance over the full grid therefore reduce to products
# of 1-D moments — no (samples x steps) arrays are ever materialized.
# Matches genTraj's statistics exactly (mean over samples; biased variance).
# ---------------------------------------------------------------------------

def _speed_moments(speeds, mask):
    cnt = jnp.maximum(jnp.sum(mask), 1.0)
    es = jnp.sum(speeds * mask) / cnt
    es2 = jnp.sum(speeds ** 2 * mask) / cnt
    return es, es2


def _forward_moments(cfg: PredictorConfig, pos0, vel0, size0):
    P = cfg.num_pred
    na, ns = cfg.num_forward_angle_samples, cfg.max_forward_speed_samples
    speed = jnp.linalg.norm(vel0[0:2])
    ang0 = jnp.arctan2(vel0[1], vel0[0])
    angles = ang0 - cfg.front_angle + cfg.forward_angle_step * jnp.arange(na)
    speeds = cfg.forward_speed_step * jnp.arange(ns)
    m = (speeds < 2.0 * speed).astype(pos0.dtype)
    es, es2 = _speed_moments(speeds, m)
    d = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)     # (na,2)
    ed = jnp.mean(d, axis=0)
    ed2 = jnp.mean(d ** 2, axis=0)
    t = (jnp.arange(P + 1, dtype=pos0.dtype) * cfg.dt)[:, None]
    mean_xy = pos0[None, 0:2] + t * es * ed[None]
    var_xy = t ** 2 * (es2 * ed2[None] - (es * ed[None]) ** 2)
    var_xy = jnp.maximum(var_xy, 0.0)
    mean = jnp.concatenate(
        [mean_xy, jnp.full((P + 1, 1), pos0[2])], axis=-1)
    size = jnp.broadcast_to(size0, (P + 1, 3))
    size = size.at[:, 0:2].add(2.0 * jnp.sqrt(var_xy) * cfg.z_score)
    return mean, size


def _turning_moments(cfg: PredictorConfig, intent, pos0, vel0, size0):
    P = cfg.num_pred
    ns = cfg.max_turning_speed_samples
    nw = cfg.num_turning_angvel_samples
    ne = cfg.num_turning_end_samples
    speed = jnp.linalg.norm(vel0[0:2])
    ang0 = jnp.arctan2(vel0[1], vel0[0])
    speeds = cfg.turning_speed_step * jnp.arange(ns)
    m = (speeds < 2.0 * speed).astype(pos0.dtype)
    es, es2 = _speed_moments(speeds, m)

    if intent == LEFT:
        end = cfg.front_angle + ang0 + cfg.turning_end_step * jnp.arange(ne)
        angvel = (jnp.pi / 2) / cfg.max_turning_time \
            + cfg.turning_angvel_step * jnp.arange(nw)
    else:
        end = -(jnp.pi - cfg.front_angle) + ang0 \
            + cfg.turning_end_step * jnp.arange(ne)
        angvel = (-jnp.pi / 2) / cfg.min_turning_time \
            + cfg.turning_angvel_step * jnp.arange(nw)

    t = jnp.arange(P, dtype=pos0.dtype)
    raw = ang0 + t[None, None, :] * angvel[:, None, None] * cfg.dt
    ang_t = jnp.minimum(raw, end[None, :, None]) if intent == LEFT \
        else jnp.maximum(raw, end[None, :, None])
    dirs = jnp.stack([jnp.cos(ang_t), jnp.sin(ang_t)], axis=-1)    # (nw,ne,P,2)
    D = jnp.cumsum(dirs, axis=-2) * cfg.dt                         # (nw,ne,P,2)
    D = jnp.concatenate([jnp.zeros_like(D[:, :, :1]), D], axis=-2)  # t=0
    ED = jnp.mean(D, axis=(0, 1))                                  # (P+1,2)
    ED2 = jnp.mean(D ** 2, axis=(0, 1))
    mean_xy = pos0[None, 0:2] + es * ED
    var_xy = jnp.maximum(es2 * ED2 - (es * ED) ** 2, 0.0)
    mean = jnp.concatenate(
        [mean_xy, jnp.full((P + 1, 1), pos0[2])], axis=-1)
    size = jnp.broadcast_to(size0, (P + 1, 3))
    size = size.at[:, 0:2].add(2.0 * jnp.sqrt(var_xy) * cfg.z_score)
    return mean, size


def predict_single_fast(cfg: PredictorConfig, pos0, vel0, acc0, size0):
    """Moment-based predict_single for the empty-map benchmark path."""
    speed = jnp.linalg.norm(vel0[0:2])
    stopped = speed <= cfg.stop_vel
    stop_pos, stop_size = _stop_prediction(cfg, pos0, vel0, size0)
    f_pos, f_size = _forward_moments(cfg, pos0, vel0, size0)
    l_pos, l_size = _turning_moments(cfg, LEFT, pos0, vel0, size0)
    r_pos, r_size = _turning_moments(cfg, RIGHT, pos0, vel0, size0)

    def pick(pos, size):
        return (jnp.where(stopped, stop_pos, pos),
                jnp.where(stopped, stop_size, size))

    fw, lf, rt = pick(f_pos, f_size), pick(l_pos, l_size), pick(r_pos, r_size)
    pos = jnp.stack([fw[0], lf[0], rt[0], stop_pos], axis=0)
    size = jnp.stack([fw[1], lf[1], rt[1], stop_size], axis=0)
    return pos, size


def predict(cfg: PredictorConfig, pos_hist, vel_hist, acc_hist, size_hist,
            hist_len, occ: Optional[OccupancyGrid] = None) -> Prediction:
    """Full predictor over all obstacles (vectorized predictor::predict).

    Histories are (O, Hh, 3), newest at index 0; hist_len (O,) valid counts.
    occ=None (or an empty grid) selects the closed-form moment path —
    mathematically identical when the map is empty, with no sample arrays.
    """
    probs = intent_probabilities(cfg, pos_hist, vel_hist, hist_len)
    use_fast = occ is None or occ.grid.size == 1
    if use_fast:
        pos, size = jax.vmap(
            lambda p, v, a, s: predict_single_fast(cfg, p, v, a, s)
        )(pos_hist[:, 0], vel_hist[:, 0], acc_hist[:, 0], size_hist[:, 0])
    else:
        pos, size = jax.vmap(
            lambda p, v, a, s: predict_single(cfg, p, v, a, s, occ)
        )(pos_hist[:, 0], vel_hist[:, 0], acc_hist[:, 0], size_hist[:, 0])
    return Prediction(pos=pos, size=size, intent_prob=probs)
