"""Device-resident factor-graph solve for the tightly-coupled DBA loop.

The host factor graph (:mod:`dbaf_tpu.fusion.graph`, numpy f64) mirrors the
reference's GTSAM usage, which forces two device->host Hessian pulls per
coupled iteration (/root/reference/dbaf/depth_video.py:524-558 --
``BACore.hessian`` -> CPU GTSAM LM -> ``BACore.retract``).  This module is
the SURVEY.md 5.8 end-state: the window graph packs into fixed-shape device
arrays (per-frame 15-dim tangent layout [pose w,v | vel | bias]) and the
whole LM iteration -- factor linearization, damped solve, manifold
retraction -- runs jitted on the TPU, fused with the visual reduced-camera
system, so a coupled update round is ONE dispatch with ZERO host syncs.

Factor coverage (the live set of depth_video.py:480-521):
  CombinedImuFactor, PriorPose, PriorVec(bias), GPSFactor (Cauchy robust,
  lever arm pre-applied), VelFactor, the marginal LinearContainerFactor,
  and the visual CustomHessianFactor (camera->body adjoint conversion
  on-device, BA2GTSAM / depth_video.py:20-29).

Numerics: f32 on TPU (the reference solves f64 via Eigen/GTSAM); the
window system is small (<= fg_cap*15 dims) and LM-damped, and parity is
enforced by tests against the host f64 path (tests/test_device_graph.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# f32-safe SO(3)/SE(3) (matrix form, [omega, v] tangents, right perturbation)
# ---------------------------------------------------------------------------


def _hat(w):
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zero, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zero, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zero], -1),
    ], -2)


def _so3_exp(w):
    th2 = jnp.sum(w * w, -1)
    th = jnp.sqrt(th2 + 1e-30)
    small = th < 1e-4
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    W = _hat(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def _so3_log(R):
    tr = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) / 2.0,
                  -1.0, 1.0)
    th = jnp.arccos(tr)
    skew = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)
    small = th < 1e-4
    # residual rotations in the coupled window stay far from pi
    scale = jnp.where(small, 0.5 + th * th / 12.0,
                      0.5 * th / jnp.sin(jnp.where(small, 1.0, th)))
    return scale[..., None] * skew


def _so3_V(w):
    """Left Jacobian of SO(3) (the V of SE(3) exp)."""
    th2 = jnp.sum(w * w, -1)
    th = jnp.sqrt(th2 + 1e-30)
    small = th < 1e-4
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (th - jnp.sin(th)) / (th2 * th))
    W = _hat(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + B[..., None, None] * W + C[..., None, None] * (W @ W)


def _so3_V_inv(w):
    th2 = jnp.sum(w * w, -1)
    th = jnp.sqrt(th2 + 1e-30)
    small = th < 1e-4
    cot = jnp.where(
        small, 1.0 / 12.0 + th2 / 720.0,
        (1.0 / jnp.where(small, 1.0, th2))
        - (1.0 + jnp.cos(th)) / (2.0 * th * jnp.sin(jnp.where(small, 1.0, th))),
    )
    W = _hat(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + cot[..., None, None] * (W @ W)


def _jr_inv(w):
    """Inverse right Jacobian of SO(3)."""
    th2 = jnp.sum(w * w, -1)
    th = jnp.sqrt(th2 + 1e-30)
    small = th < 1e-4
    cot = jnp.where(
        small, 1.0 / 12.0 + th2 / 720.0,
        (1.0 / jnp.where(small, 1.0, th2))
        - (1.0 + jnp.cos(th)) / (2.0 * th * jnp.sin(jnp.where(small, 1.0, th))),
    )
    W = _hat(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + 0.5 * W + cot[..., None, None] * (W @ W)


def _se3_retract(R, t, xi):
    """T * Exp(xi), xi = [omega, v] (se3np.Pose.retract)."""
    w, v = xi[..., :3], xi[..., 3:]
    dR = _so3_exp(w)
    dt = (_so3_V(w) @ v[..., None])[..., 0]
    return R @ dR, t + (R @ dt[..., None])[..., 0]


def _se3_local(Ra, ta, Rb, tb):
    """Log(Ta^-1 Tb) -> [omega, v]."""
    Rrel = jnp.swapaxes(Ra, -1, -2) @ Rb
    trel = (jnp.swapaxes(Ra, -1, -2) @ (tb - ta)[..., None])[..., 0]
    w = _so3_log(Rrel)
    v = (_so3_V_inv(w) @ trel[..., None])[..., 0]
    return jnp.concatenate([w, v], -1)


def _orthonormalize(R):
    """Project back to SO(3) (f32 drift control): Gram-Schmidt columns."""
    c0 = R[..., :, 0]
    c0 = c0 / jnp.linalg.norm(c0, axis=-1, keepdims=True)
    c1 = R[..., :, 1]
    c1 = c1 - jnp.sum(c0 * c1, -1, keepdims=True) * c0
    c1 = c1 / jnp.linalg.norm(c1, axis=-1, keepdims=True)
    c2 = jnp.cross(c0, c1)
    return jnp.stack([c0, c1, c2], -1)


# ---------------------------------------------------------------------------
# packed graph + state
# ---------------------------------------------------------------------------


class FgState(NamedTuple):
    """Window states, slot f = global frame t0+f."""
    R: jnp.ndarray      # (NW, 3, 3) body rotation wRb
    t: jnp.ndarray      # (NW, 3)
    vel: jnp.ndarray    # (NW, 3)
    bias: jnp.ndarray   # (NW, 6) [ba, bg]
    valid: jnp.ndarray  # (NW,) bool


class PackedGraph(NamedTuple):
    """Fixed-capacity device arrays for every non-visual factor."""
    # IMU factors: slot k connects frames (k, k+1)
    imu_mask: jnp.ndarray   # (NW-1,)
    imu_dR: jnp.ndarray     # (NW-1, 3, 3)
    imu_dv: jnp.ndarray     # (NW-1, 3)
    imu_dp: jnp.ndarray     # (NW-1, 3)
    imu_dt: jnp.ndarray     # (NW-1,)
    imu_dRg: jnp.ndarray    # (NW-1, 3, 3)
    imu_dvg: jnp.ndarray
    imu_dva: jnp.ndarray
    imu_dpg: jnp.ndarray
    imu_dpa: jnp.ndarray
    imu_bias0: jnp.ndarray  # (NW-1, 6) integration bias
    imu_info: jnp.ndarray   # (NW-1, 15, 15)
    g_vec: jnp.ndarray      # (3,)
    # pose priors
    pp_mask: jnp.ndarray    # (PP,)
    pp_frame: jnp.ndarray   # (PP,)
    pp_R: jnp.ndarray       # (PP, 3, 3)
    pp_t: jnp.ndarray       # (PP, 3)
    pp_info: jnp.ndarray    # (PP, 6, 6)
    # bias priors (PriorVec on B)
    pb_mask: jnp.ndarray    # (PB,)
    pb_frame: jnp.ndarray
    pb_prior: jnp.ndarray   # (PB, 6)
    pb_info: jnp.ndarray    # (PB, 6, 6)
    # GNSS per frame (positions lever-arm corrected on host, Cauchy robust)
    gnss_mask: jnp.ndarray  # (NW,)
    gnss_pos: jnp.ndarray   # (NW, 3)
    gnss_info: jnp.ndarray  # (3, 3)
    gnss_k2: jnp.ndarray    # () Cauchy k^2
    # wheel-odometry body-velocity per frame
    odo_mask: jnp.ndarray   # (NW,)
    odo_vel: jnp.ndarray    # (NW, 3)
    odo_info: jnp.ndarray   # (3, 3)


class MargDense(NamedTuple):
    """Marginal prior (LinearContainerFactor) in DENSE window form: the
    quadratic 0.5|dx|^2_H - v.dx over the FULL (NW*15) window tangent at
    fixed lin points (rows/cols of absent dims are zero).  Dense beats
    key-slot packing on TPU: the solve adds it with two matvecs and the
    device marginalization kernel emits it directly -- so it can stay
    DEVICE-RESIDENT across keyframes (not part of the upload blob)."""
    mask: jnp.ndarray   # (NW,) frame participates
    lin: jnp.ndarray    # (NW, 21) lin point rows [R(9)|t|vel|bias]
    H: jnp.ndarray      # (NW*15, NW*15)
    v: jnp.ndarray      # (NW*15,)


def marg_identity_np(NW: int) -> "MargDense":
    """The empty marginal (no prior information), host arrays."""
    lin = np.zeros((NW, 21), np.float32)
    lin[:, :9] = np.eye(3, dtype=np.float32).reshape(9)
    N = NW * 15
    return MargDense(np.zeros(NW, bool), lin,
                     np.zeros((N, N), np.float32), np.zeros(N, np.float32))


def _slot_rows(NW: int):
    """Static index helpers for the per-frame 15-dim layout."""
    pose = np.arange(NW)[:, None] * 15 + np.arange(6)[None, :]
    vel = np.arange(NW)[:, None] * 15 + 6 + np.arange(3)[None, :]
    bias = np.arange(NW)[:, None] * 15 + 9 + np.arange(6)[None, :]
    return pose, vel, bias


def _sel_pose(NW: int) -> np.ndarray:
    """Static (NW*15, NW*6) selector: global rows <- stacked pose rows."""
    S = np.zeros((NW * 15, NW * 6), np.float32)
    for f in range(NW):
        S[15 * f: 15 * f + 6, 6 * f: 6 * f + 6] = np.eye(6)
    return S


def _graph_spec(NW: int, PP: int, PB: int):
    """(name, shape, kind) per PackedGraph field, in field order.  The
    flat-buffer layout for single-upload graph transfer (kind: 'f' f32,
    'b' bool stored as 0/1, 'i' small int stored exactly in f32)."""
    NF = NW - 1
    by_name = dict(
        imu_mask=((NF,), "b"), imu_dR=((NF, 3, 3), "f"),
        imu_dv=((NF, 3), "f"), imu_dp=((NF, 3), "f"), imu_dt=((NF,), "f"),
        imu_dRg=((NF, 3, 3), "f"), imu_dvg=((NF, 3, 3), "f"),
        imu_dva=((NF, 3, 3), "f"), imu_dpg=((NF, 3, 3), "f"),
        imu_dpa=((NF, 3, 3), "f"), imu_bias0=((NF, 6), "f"),
        imu_info=((NF, 15, 15), "f"), g_vec=((3,), "f"),
        pp_mask=((PP,), "b"), pp_frame=((PP,), "i"),
        pp_R=((PP, 3, 3), "f"), pp_t=((PP, 3), "f"),
        pp_info=((PP, 6, 6), "f"),
        pb_mask=((PB,), "b"), pb_frame=((PB,), "i"),
        pb_prior=((PB, 6), "f"), pb_info=((PB, 6, 6), "f"),
        gnss_mask=((NW,), "b"), gnss_pos=((NW, 3), "f"),
        gnss_info=((3, 3), "f"), gnss_k2=((), "f"),
        odo_mask=((NW,), "b"), odo_vel=((NW, 3), "f"),
        odo_info=((3, 3), "f"),
    )
    return [(n, *by_name[n]) for n in PackedGraph._fields]


def flatten_graph_np(d: dict, NW: int, PP: int = 4, PB: int = 4) -> np.ndarray:
    """Host dict of numpy arrays -> ONE flat f32 buffer (single H2D)."""
    parts = []
    for name, shape, _ in _graph_spec(NW, PP, PB):
        a = np.asarray(d[name], np.float32).reshape(-1)
        assert a.size == int(np.prod(shape, dtype=int)), name
        parts.append(a)
    return np.concatenate(parts) if parts else np.zeros(0, np.float32)


def unflatten_graph(flat, NW: int, PP: int = 4, PB: int = 4) -> PackedGraph:
    """Flat device buffer -> PackedGraph, static slices (call inside jit)."""
    out = {}
    o = 0
    for name, shape, kind in _graph_spec(NW, PP, PB):
        sz = int(np.prod(shape, dtype=int))
        a = flat[o: o + sz].reshape(shape)
        if kind == "b":
            a = a > 0.5
        elif kind == "i":
            a = a.astype(jnp.int32)
        out[name] = a
        o += sz
    return PackedGraph(**out)


def graph_flat_size(NW: int, PP: int = 4, PB: int = 4) -> int:
    return sum(int(np.prod(s, dtype=int))
               for _, s, _ in _graph_spec(NW, PP, PB))


# per-frame 21-wide state row: [R.ravel(9) | t(3) | vel(3) | bias(6)]
def flatten_state_np(R, t, vel, bias) -> np.ndarray:
    NW = R.shape[0]
    return np.concatenate(
        [R.reshape(NW, 9), t, vel, bias], axis=1
    ).astype(np.float32).reshape(-1)


def flatten_state(fg: FgState):
    """In-jit FgState -> flat (NW*21,) f32 (single D2H on sync)."""
    NW = fg.R.shape[0]
    return jnp.concatenate(
        [fg.R.reshape(NW, 9), fg.t, fg.vel, fg.bias], axis=1
    ).reshape(-1)


def unflatten_state(flat, n, NW: int) -> FgState:
    """Flat buffer + live count -> FgState (valid = arange < n)."""
    rows = flat.reshape(NW, 21)
    return FgState(
        rows[:, :9].reshape(NW, 3, 3), rows[:, 9:12], rows[:, 12:15],
        rows[:, 15:21], jnp.arange(NW) < n,
    )


# ---------------------------------------------------------------------------
# linearization
# ---------------------------------------------------------------------------


def _imu_residual_jac(Ri, ti, vi, bi, Rj, tj, vj, bj, pg, k):
    """CombinedImuFactor residual (15) + stacked Jacobian (15, 30) over
    [Xi(6) Vi(3) Bi(6) Xj(6) Vj(3) Bj(6)] (fusion/factors.py:169-252)."""
    dt = pg.imu_dt[k]
    g = pg.g_vec
    db = bi - pg.imu_bias0[k]
    dR = pg.imu_dR[k] @ _so3_exp(pg.imu_dRg[k] @ db[3:])
    dv = pg.imu_dv[k] + pg.imu_dva[k] @ db[:3] + pg.imu_dvg[k] @ db[3:]
    dp = pg.imu_dp[k] + pg.imu_dpa[k] @ db[:3] + pg.imu_dpg[k] @ db[3:]

    RiT = Ri.T
    Erot = dR.T @ RiT @ Rj
    r_th = _so3_log(Erot)
    dvw = vj - vi - g * dt
    dpw = tj - ti - vi * dt - 0.5 * g * dt * dt
    r_v = RiT @ dvw - dv
    r_p = RiT @ dpw - dp
    r_b = bj - bi
    r = jnp.concatenate([r_th, r_v, r_p, r_b])

    Jri = _jr_inv(r_th)
    Z3 = jnp.zeros((3, 3), Ri.dtype)
    eye3 = jnp.eye(3, dtype=Ri.dtype)

    J = jnp.zeros((15, 30), Ri.dtype)
    # Xi
    J = J.at[0:3, 0:3].set(-Jri @ Rj.T @ Ri)
    J = J.at[3:6, 0:3].set(_hat(RiT @ dvw))
    J = J.at[6:9, 0:3].set(_hat(RiT @ dpw))
    J = J.at[6:9, 3:6].set(-eye3)
    # Vi
    J = J.at[3:6, 6:9].set(-RiT)
    J = J.at[6:9, 6:9].set(-RiT * dt)
    # Bi
    J = J.at[0:3, 12:15].set(-Jri @ Erot.T @ pg.imu_dRg[k])
    J = J.at[3:6, 9:12].set(-pg.imu_dva[k])
    J = J.at[3:6, 12:15].set(-pg.imu_dvg[k])
    J = J.at[6:9, 9:12].set(-pg.imu_dpa[k])
    J = J.at[6:9, 12:15].set(-pg.imu_dpg[k])
    J = J.at[9:15, 9:15].set(-jnp.eye(6, dtype=Ri.dtype))
    # Xj
    J = J.at[0:3, 15:18].set(Jri)
    J = J.at[6:9, 18:21].set(RiT @ Rj)
    # Vj
    J = J.at[3:6, 21:24].set(RiT)
    # Bj
    J = J.at[9:15, 24:30].set(jnp.eye(6, dtype=Ri.dtype))
    del Z3
    return r, J


def _prior_pose_jac(r):
    """d Log(M Exp(xi)) / d xi at xi=0 for SE(3): block inverse right
    Jacobian.  The (w,v) coupling block is second order in r; the host
    uses finite differences -- this analytic form matches to O(|r|^2)."""
    Jw = _jr_inv(r[:3])
    Jv = _so3_V_inv(r[:3])
    J = jnp.zeros((6, 6), r.dtype)
    J = J.at[:3, :3].set(Jw)
    J = J.at[3:, 3:].set(Jv)
    return J


def linearize(state: FgState, pg: PackedGraph, vis_H, vis_v, vis_linR,
              vis_lint, sel_pose, mgd: MargDense = None,
              hold_empty: bool = True):
    """Dense normal equations over the padded window.

    vis_H/vis_v: body-frame reduced camera system (NW*6 square/vec),
    anchored at vis_linR/vis_lint; sel_pose: static (N, NW*6) selector;
    mgd: dense marginal prior (or None).  Returns (H, b, err); with
    ``hold_empty`` unconstrained rows are held at identity (the solve
    needs an invertible system; the marginalization kernel must not).
    """
    NW = state.R.shape[0]
    N = NW * 15
    dtype = state.t.dtype
    H = jnp.zeros((N, N), dtype)
    b = jnp.zeros((N,), dtype)
    err = jnp.zeros((), dtype)

    # ---- IMU chain: contiguous 30x30 blocks at 15k, ONE scatter-add
    def one_imu(k):
        r, J = _imu_residual_jac(
            state.R[k], state.t[k], state.vel[k], state.bias[k],
            state.R[k + 1], state.t[k + 1], state.vel[k + 1],
            state.bias[k + 1], pg, k,
        )
        Lam = pg.imu_info[k]
        JtL = J.T @ Lam
        m = pg.imu_mask[k].astype(dtype)
        return m * (JtL @ J), m * (-JtL @ r), m * 0.5 * (r @ (Lam @ r))

    A, rhs, e = jax.vmap(one_imu)(jnp.arange(NW - 1))
    imu_rows = (15 * jnp.arange(NW - 1))[:, None] + jnp.arange(30)
    H = H.at[imu_rows[:, :, None], imu_rows[:, None, :]].add(A)
    b = b.at[imu_rows].add(rhs)
    err = err + jnp.sum(e)

    # ---- pose priors
    PP = pg.pp_mask.shape[0]

    def one_pp(p):
        f = pg.pp_frame[p]
        r = _se3_local(pg.pp_R[p], pg.pp_t[p], state.R[f], state.t[f])
        J = _prior_pose_jac(r)
        Lam = pg.pp_info[p]
        JtL = J.T @ Lam
        m = pg.pp_mask[p].astype(dtype)
        return m * (JtL @ J), m * (-JtL @ r), m * 0.5 * (r @ (Lam @ r))

    App, bpp, epp = jax.vmap(one_pp)(jnp.arange(PP))
    pp_rows = (15 * pg.pp_frame)[:, None] + jnp.arange(6)
    H = H.at[pp_rows[:, :, None], pp_rows[:, None, :]].add(App)
    b = b.at[pp_rows].add(bpp)
    err = err + jnp.sum(epp)

    # ---- bias priors
    PB = pg.pb_mask.shape[0]

    def one_pb(p):
        f = pg.pb_frame[p]
        r = state.bias[f] - pg.pb_prior[p]
        Lam = pg.pb_info[p]
        m = pg.pb_mask[p].astype(dtype)
        return m * Lam, m * (-(Lam @ r)), m * 0.5 * (r @ (Lam @ r))

    Apb, bpb, epb = jax.vmap(one_pb)(jnp.arange(PB))
    pb_rows = (15 * pg.pb_frame + 9)[:, None] + jnp.arange(6)
    H = H.at[pb_rows[:, :, None], pb_rows[:, None, :]].add(Apb)
    b = b.at[pb_rows].add(bpb)
    err = err + jnp.sum(epb)

    # ---- GNSS (Cauchy robust; J = [0 | R], factors.py:133-147)
    def one_gnss(f):
        r = state.t[f] - pg.gnss_pos[f]
        Jr3 = state.R[f]  # d t / d v
        e2 = r @ (pg.gnss_info @ r)
        w = pg.gnss_k2 / (pg.gnss_k2 + e2)
        rho = 0.5 * pg.gnss_k2 * jnp.log1p(e2 / pg.gnss_k2)
        Lam = w * pg.gnss_info
        JtL = Jr3.T @ Lam
        m = pg.gnss_mask[f].astype(dtype)
        return m * (JtL @ Jr3), m * (-(JtL @ r)), m * rho

    NWr = jnp.arange(NW)
    Ag, bg_, eg = jax.vmap(one_gnss)(NWr)
    g_rows = (15 * NWr + 3)[:, None] + jnp.arange(3)
    H = H.at[g_rows[:, :, None], g_rows[:, None, :]].add(Ag)
    b = b.at[g_rows].add(bg_)
    err = err + jnp.sum(eg)

    # ---- odometry body-velocity (factors.py:150-166)
    def one_odo(f):
        RT = state.R[f].T
        vb = RT @ state.vel[f]
        r = vb - pg.odo_vel[f]
        Jp = _hat(vb)          # d vb / d omega
        Jv = RT
        J = jnp.concatenate([Jp, Jv], axis=1)  # (3, 6) over [w, vel]
        Lam = pg.odo_info
        JtL = J.T @ Lam
        m = pg.odo_mask[f].astype(dtype)
        return m * (JtL @ J), m * (-(JtL @ r)), m * 0.5 * (r @ (Lam @ r))

    Ao, bo_, eo = jax.vmap(one_odo)(NWr)
    # rows [15f..15f+3) (pose w) ++ [15f+6..15f+9) (vel)
    o_rows = jnp.concatenate(
        [(15 * NWr)[:, None] + jnp.arange(3),
         (15 * NWr + 6)[:, None] + jnp.arange(3)], axis=1)
    H = H.at[o_rows[:, :, None], o_rows[:, None, :]].add(Ao)
    b = b.at[o_rows].add(bo_)
    err = err + jnp.sum(eo)

    # ---- marginal prior (LinearContainerFactor, factors.py:254-293) in
    # dense window form: 0.5 |dx|^2_H - v.dx with dx the local deviation
    # from the stored lin points.  Dims absent from the marginal have zero
    # H rows/cols and v entries, so their (arbitrary) deltas cancel.
    if mgd is not None:
        def frame_delta(f):
            lin = mgd.lin[f]
            d_pose = _se3_local(lin[:9].reshape(3, 3), lin[9:12],
                                state.R[f], state.t[f])
            d = jnp.concatenate([
                d_pose, state.vel[f] - lin[12:15],
                state.bias[f] - lin[15:21]
            ])
            return d * mgd.mask[f].astype(dtype)

        dvec = jax.vmap(frame_delta)(NWr).reshape(N)
        H = H + mgd.H
        b = b + mgd.v - mgd.H @ dvec
        err = err + 0.5 * dvec @ (mgd.H @ dvec) - mgd.v @ dvec

    # ---- visual hessian (camera system converted to body upstream)
    dpose = jax.vmap(_se3_local)(vis_linR, vis_lint, state.R, state.t)
    dpose = dpose * state.valid[:, None].astype(dtype)
    dp6 = dpose.reshape(NW * 6)
    H = H + sel_pose @ vis_H @ sel_pose.T
    b = b + sel_pose @ (vis_v - vis_H @ dp6)
    err = err + 0.5 * dp6 @ (vis_H @ dp6) - vis_v @ dp6

    if hold_empty:
        # hold unconstrained rows (invalid frames / untouched states)
        diag = jnp.diagonal(H)
        H = H + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0).astype(dtype))
    return H, b, err


# ---------------------------------------------------------------------------
# Levenberg-Marquardt (matches fusion.graph.LevenbergMarquardt semantics)
# ---------------------------------------------------------------------------


def _retract_state(state: FgState, d):
    NW = state.R.shape[0]
    d3 = d.reshape(NW, 15)
    R, t = _se3_retract(state.R, state.t, d3[:, :6])
    R = _orthonormalize(R)
    return FgState(R, t, state.vel + d3[:, 6:9], state.bias + d3[:, 9:15],
                   state.valid)


def lm_optimize(state: FgState, pg: PackedGraph, vis_H, vis_v,
                vis_linR, vis_lint, sel_pose, mgd: MargDense = None,
                lambda_initial=1e-5, lambda_factor=10.0,
                lambda_max=1e5, max_iterations=24,
                relative_tol=1e-5, absolute_tol=1e-5):
    """Damped GN on the packed window (graph.py:156-212 semantics: accept
    on improvement / lambda up on rejection, relinearize after accepts)."""
    dtype = state.t.dtype
    # solver-grade math: TPU default matmul precision is bf16-class,
    # which is NOT enough for normal-equation assembly + solve
    with jax.default_matmul_precision("highest"):
        return _lm_optimize_hp(state, pg, vis_H, vis_v, vis_linR, vis_lint,
                               sel_pose, mgd, lambda_initial, lambda_factor,
                               lambda_max, max_iterations, relative_tol,
                               absolute_tol, dtype)


def _lm_optimize_hp(state, pg, vis_H, vis_v, vis_linR, vis_lint, sel_pose,
                    mgd, lambda_initial, lambda_factor, lambda_max,
                    max_iterations, relative_tol, absolute_tol, dtype):
    H0, b0, err0 = linearize(state, pg, vis_H, vis_v, vis_linR, vis_lint,
                             sel_pose, mgd)

    def cond(carry):
        _, _, _, _, _, done, it = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        # ONE linearization per iteration: the candidate's (H, b, err)
        # doubles as both the acceptance test and (on accept) the next
        # iteration's normal equations
        st, H, b, lam, err, done, it = carry
        Hd = H + lam * jnp.diag(jnp.diagonal(H))
        c, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
        d = jax.scipy.linalg.cho_solve((c, low), b)
        ok = jnp.all(jnp.isfinite(d))
        cand = _retract_state(st, jnp.where(ok, d, 0.0))
        Hc, bc, errc = linearize(cand, pg, vis_H, vis_v, vis_linR,
                                 vis_lint, sel_pose, mgd)
        accept = ok & (errc < err)
        st2 = jax.tree.map(
            lambda a, cd: jnp.where(accept, cd, a) if a.dtype != jnp.bool_
            else a, st, cand)
        H2 = jnp.where(accept, Hc, H)
        b2 = jnp.where(accept, bc, b)
        rel = jnp.abs(err - errc) / jnp.maximum(jnp.abs(err), 1e-12)
        # plateau: in f32 a converged solve often rejects on errc == err
        # (strict <); climbing the whole lambda ladder costs ~10 full
        # iterations for the same fixed point -- treat it as converged
        converged = (rel < relative_tol) | (
            jnp.abs(err - errc) < absolute_tol)
        lam2 = jnp.where(accept,
                         jnp.maximum(lam / lambda_factor, 1e-10),
                         lam * lambda_factor)
        stalled = (~accept) & (lam2 > lambda_max)
        err2 = jnp.where(accept, errc, err)
        return st2, H2, b2, lam2, err2, converged | stalled, it + 1

    init = (state, H0, b0, jnp.asarray(lambda_initial, dtype), err0,
            jnp.asarray(False), jnp.asarray(0, jnp.int32))
    st, _, _, _, err, _, it = jax.lax.while_loop(cond, body, init)
    return st, (err, it)


# ---------------------------------------------------------------------------
# the fused coupled round: hessian -> LM -> retract, n_iters times, ONE jit
# ---------------------------------------------------------------------------


def coupled_rounds_body(
    poses_buf, disps_buf, damping_buf, intrinsics, target, weight,
    ii_d, jj_d, mask, t0, n, fg: FgState, pg: PackedGraph,
    mgd: MargDense, A, sel_pose,
    P: int, NW: int, n_iters: int = 2, eps_damping: float = 1e-7,
):
    """The whole multi-sensor DBA call of depth_video.py:524-558 in one
    dispatch: reduced camera system -> body conversion (BA2GTSAM) ->
    factor-graph LM -> GTSAM2BA dx -> depth back-substitution+retraction,
    alternated ``n_iters`` times with in-dispatch relinearization.

    Also returns (n_iters,) int32 realized-LM-iteration counts so the
    profiler can see the while_loop's actual trip counts."""
    from ..ops import dba

    S, v = dba.coupled_hessian_full(
        poses_buf, disps_buf, damping_buf, intrinsics, target, weight,
        ii_d, jj_d, mask, t0, n, P=P, eps_damping=eps_damping,
    )
    lm_its = []
    for it in range(n_iters):
        with jax.default_matmul_precision("highest"):
            H4 = S[: NW * 6, : NW * 6].reshape(NW, 6, NW, 6)
            Hb = jnp.einsum(
                "ca,icjd,db->iajb", A, H4, A).reshape(NW * 6, NW * 6)
            vb = jnp.einsum(
                "ca,ic->ia", A, v[: NW * 6].reshape(NW, 6)).reshape(-1)
        fg2, (_, lm_it) = lm_optimize(fg, pg, Hb, vb, fg.R, fg.t,
                                      sel_pose, mgd)
        lm_its.append(lm_it)
        dxb = jax.vmap(_se3_local)(fg.R, fg.t, fg2.R, fg2.t)
        dxb = dxb * fg.valid[:, None].astype(dxb.dtype)
        dxc = jnp.einsum("ab,ib->ia", A, dxb)
        dx_full = jnp.zeros((P, 6), poses_buf.dtype).at[:NW].set(dxc)
        poses_buf, disps_buf, S, v = dba.coupled_retract_full(
            poses_buf, disps_buf, damping_buf, intrinsics, target, weight,
            ii_d, jj_d, mask, t0, n, dx_full, P=P,
            eps_damping=eps_damping, with_hessian=(it + 1 < n_iters),
        )
        fg = fg2
    return poses_buf, disps_buf, fg, jnp.stack(lm_its)


@functools.partial(
    jax.jit, static_argnames=("P", "NW", "n_iters", "eps_damping"),
)
def coupled_rounds_device(
    poses_buf, disps_buf, damping_buf, intrinsics, target, weight,
    ii_d, jj_d, mask, t0, n, fg_flat, pg_flat, mgd, A,
    P: int, NW: int, n_iters: int = 2, eps_damping: float = 1e-7,
):
    """Flat-operand jit wrapper around :func:`coupled_rounds_body`: the
    graph and state arrive as single flat buffers (one H2D each on the
    remote transport; the dense marginal ``mgd`` stays device-resident)
    and the state returns flat (one D2H on sync)."""
    fg = unflatten_state(fg_flat, n, NW)
    pg = unflatten_graph(pg_flat, NW)
    sel_pose = jnp.asarray(_sel_pose(NW))
    poses, disps, fg2, lm_its = coupled_rounds_body(
        poses_buf, disps_buf, damping_buf, intrinsics, target, weight,
        ii_d, jj_d, mask, t0, n, fg, pg, mgd, A, sel_pose,
        P=P, NW=NW, n_iters=n_iters, eps_damping=eps_damping,
    )
    return poses, disps, flatten_state(fg2), lm_its




# ---------------------------------------------------------------------------
# device-resident sliding-window marginalization
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("P", "NW", "eps_damping"))
def marginalize_window_device(
    poses_buf, disps_buf, damping_buf, intrinsics,
    marg_target, marg_weight, ii_d, jj_d, mask_m,
    s0,                    # global slot origin (= last_t0)
    fg_flat, pg_flat,      # OLD window state/graph (origin s0, host-packed)
    mgd_old: MargDense, A,
    m, k_end, n_old,       # eliminate [0,m); keep [m,k_end); live count
    P: int, NW: int, eps_damping: float = 1e-7,
) -> MargDense:
    """Flat-operand jit wrapper around :func:`marginalize_window_body`
    (the host-driven device_marg path: one dispatch, zero pulls)."""
    fg = unflatten_state(fg_flat, n_old, NW)
    pg = unflatten_graph(pg_flat, NW)
    return marginalize_window_body(
        poses_buf, disps_buf, damping_buf, intrinsics,
        marg_target, marg_weight, ii_d, jj_d, mask_m, s0,
        fg, pg, mgd_old, A, m, k_end,
        P=P, NW=NW, eps_damping=eps_damping,
    )


def marginalize_window_body(
    poses_buf, disps_buf, damping_buf, intrinsics,
    marg_target, marg_weight, ii_d, jj_d, mask_m,
    s0,                    # global slot origin (= last_t0)
    fg: FgState, pg: PackedGraph,
    mgd_old: MargDense, A,
    m, k_end,              # eliminate [0,m); keep [m,k_end)
    P: int, NW: int, eps_damping: float = 1e-7,
) -> MargDense:
    """The numeric core of coupled._marginalize on device (ONE dispatch,
    zero pulls): visual hessian of the marginalized edges -> body
    conversion -> linearize {IMU/priors/GNSS/odometry on the eliminated
    frames} + old marginal at the current states -> Schur-eliminate the
    first ``m`` frame blocks -> re-base to the new window origin.  Matches
    fusion.graph.marginalize_out semantics (depth_video.py:350-459); the
    dims absent from the host factor graph carry zero rows here, which is
    the dense encoding of "key not present".  Traceable inside a larger
    jit (the async coupled step kernel composes it directly)."""
    N = NW * 15
    ar15 = jnp.arange(N)
    arW = jnp.arange(NW)

    # visual system of the marginalized edges (camera tangent, old origin)
    from ..ops import dba
    S, v = dba.coupled_hessian_full(
        poses_buf, disps_buf, damping_buf, intrinsics, marg_target,
        marg_weight, ii_d, jj_d, mask_m, s0, k_end,
        P=P, eps_damping=eps_damping,
    )
    any_edge = jnp.any(mask_m).astype(S.dtype)
    # first-pose diagonal stabilization, only when visual info exists
    # (coupled.py _marginalize: H[:6] diag += 0.00025)
    S = S + 0.00025 * any_edge * jnp.diag(
        (jnp.arange(S.shape[0]) < 6).astype(S.dtype))
    with jax.default_matmul_precision("highest"):
        H4 = S[: NW * 6, : NW * 6].reshape(NW, 6, NW, 6)
        Hb = jnp.einsum("ca,icjd,db->iajb", A, H4, A).reshape(NW * 6, NW * 6)
        vb = jnp.einsum("ca,ic->ia", A, v[: NW * 6].reshape(NW, 6)
                        ).reshape(-1)

        # restrict the packed factors to the eliminated frames (the host
        # marginalization graph includes exactly the factors anchored at
        # frames < t0: coupled.py:214-246)
        pgm = pg._replace(
            imu_mask=pg.imu_mask & (jnp.arange(NW - 1) < m),
            pp_mask=pg.pp_mask & (pg.pp_frame < m),
            pb_mask=pg.pb_mask & (pg.pb_frame < m),
            gnss_mask=pg.gnss_mask & (arW < m),
            odo_mask=pg.odo_mask & (arW < m),
        )
        sel_pose = jnp.asarray(_sel_pose(NW))
        H, b, _ = linearize(fg, pgm, Hb, vb, fg.R, fg.t, sel_pose,
                            mgd_old, hold_empty=False)

        # Schur-eliminate rows [0, 15m) (marginalize_out: regularized
        # inverse of the eliminated block).  IMU information spans ~10
        # orders of magnitude across dims, so the elimination runs on the
        # Jacobi-scaled system (unit diagonal) -- in f32 a raw Cholesky of
        # the mixed-scale block loses the small-pivot dims entirely, and
        # any absolute regularizer is wrong at one end of the scale.
        rm = ar15 < 15 * m
        keep = (~rm) & (ar15 < 15 * k_end)
        rmf = rm.astype(H.dtype)
        kf = keep.astype(H.dtype)
        # the whole complement runs in Jacobi-scaled (correlation) space:
        # information spans ~10 orders of magnitude across dims and f32
        # cancellation must happen at O(1), not at the raw scales
        dsc = jnp.sqrt(jnp.abs(jnp.diagonal(H)))
        live = dsc > 1e-20
        dinv = jnp.where(live, 1.0 / jnp.where(live, dsc, 1.0), 1.0)
        Hn = H * dinv[:, None] * dinv[None, :]
        bn = b * dinv
        Hrr = Hn * rmf[:, None] * rmf[None, :]
        # unit pivots on eliminated dims (zero-information dims included),
        # identity rows elsewhere; 1e-6 relative reg (the host adds 1e-10
        # absolute in f64)
        Hrr = Hrr + jnp.diag(
            jnp.where(rm, 1e-6 + jnp.where(live, 0.0, 1.0), 1.0)
            .astype(H.dtype))
        Hrk = Hn * rmf[:, None] * kf[None, :]
        c, low = jax.scipy.linalg.cho_factor(Hrr, lower=True)
        X = jax.scipy.linalg.cho_solve((c, low), Hrk)
        xb = jax.scipy.linalg.cho_solve((c, low), bn * rmf)
        Hmn = Hn * kf[:, None] * kf[None, :] - Hrk.T @ X
        bmn = bn * kf - Hrk.T @ xb
        Hm = Hmn * dsc[:, None] * dsc[None, :]
        bm = bmn * dsc

    # re-base kept slots to the new origin t0 = s0 + m
    sh = 15 * m
    Hm = jnp.roll(jnp.roll(Hm, -sh, axis=0), -sh, axis=1)
    bm = jnp.roll(bm, -sh)
    live = ar15 < 15 * (k_end - m)
    lf = live.astype(H.dtype)
    Hm = Hm * lf[:, None] * lf[None, :]
    bm = bm * lf
    lin = jnp.roll(flatten_state(fg).reshape(NW, 21), -m, axis=0)
    mask = arW < (k_end - m)
    lin = jnp.where(mask[:, None], lin, marg_identity_np(NW).lin)
    return MargDense(mask, lin, Hm, bm)

# ---------------------------------------------------------------------------
# host -> device packing
# ---------------------------------------------------------------------------


def make_sel_pose(NW: int) -> jnp.ndarray:
    return jnp.asarray(_sel_pose(NW))


def pack_graph(msba, t0: int, t1: int, NW: int, PP: int = 4, PB: int = 4):
    """Pack the MultiSensorBA window graph into fixed-capacity device
    arrays (one upload per field; tests/CPU).  None on capacity miss."""
    arrs = pack_graph_np(msba, t0, t1, NW, PP, PB)
    if arrs is None:
        return None
    return PackedGraph(**{k: jnp.asarray(v) for k, v in arrs.items()})


def pack_graph_flat(msba, t0: int, t1: int, NW: int, PP: int = 4,
                    PB: int = 4):
    """Pack the window graph into ONE flat f32 host buffer (single H2D;
    unflatten_graph inside the jit).  None on capacity miss."""
    arrs = pack_graph_np(msba, t0, t1, NW, PP, PB)
    if arrs is None:
        return None
    return flatten_graph_np(arrs, NW, PP, PB)


def pack_graph_np(msba, t0: int, t1: int, NW: int, PP: int = 4, PB: int = 4):
    """Pack the MultiSensorBA window graph (slam/coupled.py:284-307 `base`)
    into fixed-capacity numpy arrays.  Returns None if the layout exceeds
    a capacity (caller falls back to the host solver)."""
    from .factors import PriorPose, PriorVec, X
    n = t1 - t0
    if n > NW:
        return None
    f32 = np.float32
    NF = NW - 1

    z = np.zeros
    imu = dict(
        imu_mask=z(NF, bool), imu_dR=np.tile(np.eye(3, dtype=f32), (NF, 1, 1)),
        imu_dv=z((NF, 3), f32), imu_dp=z((NF, 3), f32), imu_dt=z(NF, f32),
        imu_dRg=z((NF, 3, 3), f32), imu_dvg=z((NF, 3, 3), f32),
        imu_dva=z((NF, 3, 3), f32), imu_dpg=z((NF, 3, 3), f32),
        imu_dpa=z((NF, 3, 3), f32), imu_bias0=z((NF, 6), f32),
        imu_info=z((NF, 15, 15), f32),
    )
    g_vec = np.array([0.0, 0.0, -9.807], f32)
    if not msba.ignore_imu:
        for i in range(t0 + 1, t1):
            k = i - 1 - t0
            pim = msba.state.preintegrations[i - 1]
            imu["imu_mask"][k] = True
            imu["imu_dR"][k] = pim.dR
            imu["imu_dv"][k] = pim.dv
            imu["imu_dp"][k] = pim.dp
            imu["imu_dt"][k] = pim.dt
            imu["imu_dRg"][k] = pim.dRg
            imu["imu_dvg"][k] = pim.dvg
            imu["imu_dva"][k] = pim.dva
            imu["imu_dpg"][k] = pim.dpg
            imu["imu_dpa"][k] = pim.dpa
            imu["imu_bias0"][k] = pim.bias
            imu["imu_info"][k] = pim.noise_information()
            g_vec = pim.params.g_vec.astype(f32)

    pp = dict(pp_mask=z(PP, bool), pp_frame=z(PP, np.int32),
              pp_R=np.tile(np.eye(3, dtype=f32), (PP, 1, 1)),
              pp_t=z((PP, 3), f32), pp_info=z((PP, 6, 6), f32))
    pb = dict(pb_mask=z(PB, bool), pb_frame=z(PB, np.int32),
              pb_prior=z((PB, 6), f32), pb_info=z((PB, 6, 6), f32))
    npp = npb = 0
    for i in sorted(msba.prior_factor_map.keys()):
        if not (t0 <= i < t1):
            continue
        for fct in msba.prior_factor_map[i]:
            if isinstance(fct, PriorPose):
                if npp >= PP:
                    return None
                pp["pp_mask"][npp] = True
                pp["pp_frame"][npp] = i - t0
                pp["pp_R"][npp] = fct.prior.R
                pp["pp_t"][npp] = fct.prior.t
                pp["pp_info"][npp] = fct.noise.information
                npp += 1
            elif isinstance(fct, PriorVec) and len(fct.prior) == 6:
                if npb >= PB:
                    return None
                pb["pb_mask"][npb] = True
                pb["pb_frame"][npb] = i - t0
                pb["pb_prior"][npb] = fct.prior
                pb["pb_info"][npb] = fct.noise.information
                npb += 1
            else:
                return None  # unsupported prior layout

    from ..utils import geodesy
    from .se3np import Pose  # noqa: F401
    gnss = dict(gnss_mask=z(NW, bool), gnss_pos=z((NW, 3), f32))
    from ..slam.coupled import GNSS_NOISE, ODO_NOISE
    if msba.gnss_init_t1 > 0:
        for i in range(t0, t1):
            if msba.state.gnss_valid[i]:
                p = geodesy.Cen(msba.ten0).T @ (
                    msba.state.gnss_position[i] - msba.ten0)
                p = p - msba.state.wTbs[i].R @ msba.tbg
                gnss["gnss_mask"][i - t0] = True
                gnss["gnss_pos"][i - t0] = p
    odo = dict(odo_mask=z(NW, bool), odo_vel=z((NW, 3), f32))
    for i in range(t0, t1):
        if msba.state.odo_valid[i]:
            odo["odo_mask"][i - t0] = True
            odo["odo_vel"][i - t0] = msba.state.odo_vel[i]

    return dict(**imu, g_vec=g_vec, **pp, **pb, **gnss,
                gnss_info=GNSS_NOISE.information.astype(f32),
                gnss_k2=np.asarray(GNSS_NOISE.cauchy_k**2, f32),
                **odo, odo_info=ODO_NOISE.information.astype(f32))


def marg_dense_to_factor(md, t0: int):
    """Pulled :class:`MargDense` (numpy) -> host LinearContainerFactor at
    global frame keys (origin ``t0``).  Dims the device marginal never
    touched keep zero rows -- the dense encoding of an absent key."""
    from .factors import B, V, X, LinearContainerFactor
    from .se3np import Pose

    mask = np.asarray(md.mask)
    frames = np.nonzero(mask)[0]
    if len(frames) == 0:
        return None
    keys, dims, lin, idx = [], [], {}, []
    for f in frames:
        i = t0 + int(f)
        row = np.asarray(md.lin[f], np.float64)
        keys += [X(i), V(i), B(i)]
        dims += [6, 3, 6]
        lin[X(i)] = Pose(row[:9].reshape(3, 3), row[9:12])
        lin[V(i)] = row[12:15]
        lin[B(i)] = row[15:21]
        idx += list(range(15 * int(f), 15 * int(f) + 15))
    ix = np.asarray(idx, int)
    H = np.asarray(md.H, np.float64)[np.ix_(ix, ix)]
    v = np.asarray(md.v, np.float64)[ix]
    return LinearContainerFactor(keys, dims, H, v, lin)


def marg_dense_np(mf, t0: int, t1: int, NW: int):
    """Host LinearContainerFactor -> dense window :class:`MargDense`
    (or None when a key falls outside [t0, t1))."""
    md = marg_identity_np(NW)
    if mf is None:
        return md
    offs = np.cumsum([0] + [d for d in mf.dims])
    rows = []
    mask = md.mask
    lin = md.lin
    for k, key in enumerate(mf.keys):
        typ = key[0]
        idx = int(key[1:])
        if not (t0 <= idx < t1):
            return None
        f = idx - t0
        mask[f] = True
        lp = mf.lin_point[key]
        if typ == "x":
            lin[f, :9] = lp.R.reshape(9)
            lin[f, 9:12] = lp.t
            base, dim = 15 * f, 6
        elif typ == "v":
            lin[f, 12:15] = lp
            base, dim = 15 * f + 6, 3
        else:
            lin[f, 15:21] = lp
            base, dim = 15 * f + 9, 6
        if dim != mf.dims[k]:
            return None
        rows.append((base, offs[k], dim))
    for (ra, sa, da) in rows:
        md.v[ra: ra + da] = mf.v[sa: sa + da]
        for (rb, sb, db) in rows:
            md.H[ra: ra + da, rb: rb + db] = mf.H[sa: sa + da, sb: sb + db]
    return md


def pack_state_np(msba, t0: int, t1: int, NW: int):
    f32 = np.float32
    R = np.tile(np.eye(3, dtype=f32), (NW, 1, 1))
    t = np.zeros((NW, 3), f32)
    vel = np.zeros((NW, 3), f32)
    bias = np.zeros((NW, 6), f32)
    valid = np.zeros(NW, bool)
    for i in range(t0, t1):
        f = i - t0
        R[f] = msba.state.wTbs[i].R
        t[f] = msba.state.wTbs[i].t
        vel[f] = msba.state.vs[i]
        bias[f] = msba.state.bs[i]
        valid[f] = True
    return R, t, vel, bias, valid


def pack_state(msba, t0: int, t1: int, NW: int) -> FgState:
    return FgState(*(jnp.asarray(a)
                     for a in pack_state_np(msba, t0, t1, NW)))


def pack_state_flat(msba, t0: int, t1: int, NW: int) -> np.ndarray:
    """ONE flat (NW*21,) f32 host buffer; unflatten_state inside the jit
    (valid is derived from the live count n = t1 - t0)."""
    R, t, vel, bias, _ = pack_state_np(msba, t0, t1, NW)
    return flatten_state_np(R, t, vel, bias)
