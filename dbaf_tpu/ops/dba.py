"""Dense bundle adjustment: per-edge linearization, Schur solve, retraction.

The TPU-native redesign of the reference's DBA stack -- the
``projective_transform_kernel`` per-edge Hessian accumulation
(/root/reference/src/droid_kernels.cu:220-468), the CPU-assembled sparse pose
system + Schur complement (``SparseBlock``/``schur_block``/``accum_cuda``,
:993-1391), the full iteration driver ``ba_cuda`` (:1394-1512), and the
multi-sensor coupling API ``BACore`` (:1786-1956) -- as pure jittable
functions:

* the per-edge 12x12 Hessian blocks are batched Gram matmuls on the MXU
  (``einsum`` with ``precision='highest'`` so f32 accumulation is exact);
* the sparse CPU triplet assembly becomes ``segment_sum`` onto a dense
  window-local pose system (windows are <= ~32 poses: dense is the right
  shape on TPU);
* the CPU Schur interaction lists become a dense scatter of per-edge depth
  couplings into ``E (P*6, K*HW)`` followed by one big matmul -- no
  host round trips anywhere; one ``jit`` region per BA call.

Window-local framing (all static shapes):
  The caller maps global keyframe indices onto a window of ``P`` slots,
  slot ``l`` = global frame ``s0 + l``.  Edges carry window-local endpoints
  ``ii, jj in [0, P)`` plus a validity mask.  Dynamic bounds enter as traced
  scalars (``nfixed``: slots < nfixed are fixed anchors, i.e. global t0 - s0;
  ``nactive``: slots >= nactive are empty padding, i.e. t1 - s0).  Depth
  blocks cover every window slot (the reference optimizes depths of all
  frames in ``unique(ts ∪ ii)``, droid_kernels.cu:1420-1424).

Quirk parity (intentional):
  * weights are scaled by 0.001 (:349-350);
  * stereo (ii==jj) edges contribute depth terms but zero pose terms
    (:364-367, 397-400);
  * damping ``diag += ep + lm*diag`` is applied to the *Schur complement*
    (:1253, 1483);
  * the depth back-substitution ignores dx of the first active pose slot
    (the ``ix <= 0`` guard in ``EvT6x1_kernel``, :1152-1153).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import lie
from . import projective as pj

HIGH = jax.lax.Precision.HIGHEST


class EdgeSystem(NamedTuple):
    """Per-edge linearized system (E = padded edge count, D = H*W pixels)."""

    H: jnp.ndarray    # (E, 12, 12) pose-pose block [ [Hii, Hij], [Hji, Hjj] ]
    v: jnp.ndarray    # (E, 12)     pose rhs [vi, vj]
    Ei: jnp.ndarray   # (E, 6, D)   pose_i x depth_i coupling
    Ej: jnp.ndarray   # (E, 6, D)   pose_j x depth_i coupling
    C: jnp.ndarray    # (E, D)      depth_i diagonal
    w: jnp.ndarray    # (E, D)      depth rhs
    coords: jnp.ndarray  # (E, H, W, 2) predicted coords (for residual debugging)


def build_edge_system(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    edge_mask: jnp.ndarray,
) -> EdgeSystem:
    """Linearize the weighted reprojection residual per edge.

    poses: (P, 7) window poses; disps: (P, H, W); intrinsics: (4,);
    targets/weights: (E, H, W, 2); ii/jj: (E,) window-local; edge_mask: (E,).

    Semantics mirror the reference hot kernel
    (/root/reference/src/droid_kernels.cu:325-419): depth terms (C, w) use
    the validity-masked weight *before* stereo zeroing; pose-coupled terms
    use the stereo-zeroed weight.
    """
    E = ii.shape[0]
    ht, wd = disps.shape[-2:]
    D = ht * wd

    J = pj.projection_jacobians(poses, disps, intrinsics, ii, jj)

    r = (targets - J.coords).reshape(E, D, 2)
    w_depth = (
        0.001
        * weights.reshape(E, D, 2)
        * J.valid.reshape(E, D, 1).astype(targets.dtype)
        * edge_mask[:, None, None].astype(targets.dtype)
    )
    stereo = (ii == jj)[:, None, None].astype(targets.dtype)
    w_pose = w_depth * (1.0 - stereo)

    Ji = J.Ji.reshape(E, D, 2, 6)
    Jj = J.Jj.reshape(E, D, 2, 6)
    Jz = J.Jz.reshape(E, D, 2)
    Jx = jnp.concatenate([Ji, Jj], axis=-1)  # (E, D, 2, 12)

    wJx = w_pose[..., None] * Jx
    H = jnp.einsum("edkc,edkf->ecf", wJx, Jx, precision=HIGH)
    v = jnp.einsum("edkc,edk->ec", wJx, r, precision=HIGH)

    wJz_pose = w_pose * Jz  # (E, D, 2)
    Ei = jnp.einsum("edk,edkc->ecd", wJz_pose, Ji, precision=HIGH)
    Ej = jnp.einsum("edk,edkc->ecd", wJz_pose, Jj, precision=HIGH)

    C = jnp.sum(w_depth * Jz * Jz, axis=-1)
    w_rhs = jnp.sum(w_depth * r * Jz, axis=-1)

    return EdgeSystem(H=H, v=v, Ei=Ei, Ej=Ej, C=C, w=w_rhs, coords=J.coords)


def _segment_matrix(
    blocks: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray, P: int
) -> jnp.ndarray:
    """Scatter-add (N, 6, 6) blocks into a (P, P, 6, 6) dense block matrix.

    Out-of-range (negative) indices are routed to a dump slot, replacing the
    reference's CPU triplet filter (droid_kernels.cu:1190-1200).
    """
    valid = (rows >= 0) & (cols >= 0) & (rows < P) & (cols < P)
    idx = jnp.where(valid, rows * P + cols, P * P)
    out = jax.ops.segment_sum(
        jnp.where(valid[:, None, None], blocks, 0.0), idx, num_segments=P * P + 1
    )
    return out[: P * P].reshape(P, P, 6, 6)


def _segment_vector(vecs: jnp.ndarray, rows: jnp.ndarray, P: int) -> jnp.ndarray:
    valid = (rows >= 0) & (rows < P)
    idx = jnp.where(valid, rows, P)
    out = jax.ops.segment_sum(
        jnp.where(valid[:, None], vecs, 0.0), idx, num_segments=P + 1
    )
    return out[:P]


def _edge_pose_indices(ii, jj, nfixed, nactive):
    """Window-local pose rows; -1 marks fixed/out-of-window endpoints."""
    def loc(x):
        return jnp.where((x >= nfixed) & (x < nactive), x, -1)

    return loc(ii), loc(jj)


def _accumulate_pose_system(sys_e: EdgeSystem, li, lj, P: int):
    """Scatter per-edge 12x12 blocks into the (P,P,6,6) pose system."""
    Hii = sys_e.H[:, :6, :6]
    Hij = sys_e.H[:, :6, 6:]
    Hji = sys_e.H[:, 6:, :6]
    Hjj = sys_e.H[:, 6:, 6:]
    A = (
        _segment_matrix(Hii, li, li, P)
        + _segment_matrix(Hij, li, lj, P)
        + _segment_matrix(Hji, lj, li, P)
        + _segment_matrix(Hjj, lj, lj, P)
    )
    b = _segment_vector(sys_e.v[:, :6], li, P) + _segment_vector(
        sys_e.v[:, 6:], lj, P
    )
    return A, b


def _accumulate_depth_diag(sys_e: EdgeSystem, ki, P: int):
    C = jax.ops.segment_sum(sys_e.C, ki, num_segments=P)
    w = jax.ops.segment_sum(sys_e.w, ki, num_segments=P)
    return C, w


def _finish_depth_diag(C, w, eta, depth_active, disps, disps_sens, alpha):
    """Depth damping + optional depth-sensor prior blend
    (ba_cuda :1474-1480), guarding empty blocks."""
    P, D = C.shape
    if disps_sens is not None and disps is not None:
        m = (disps_sens.reshape(P, D) > 0).astype(C.dtype)
        C = C + m * alpha + (1.0 - m) * eta.reshape(P, D)
        w = w - m * alpha * (disps.reshape(P, D) - disps_sens.reshape(P, D))
    else:
        C = C + eta.reshape(P, D)
    C = jnp.where(depth_active[:, None], C, 1.0)
    w = jnp.where(depth_active[:, None], w, 0.0)
    return C, w


class WindowSystem(NamedTuple):
    """Assembled window-local system before the pose solve.

    A:  (P*6, P*6) pose Hessian with fixed/padding slots zeroed
    b:  (P*6,)     pose rhs
    Ew: (P*6, K*D) pose-depth coupling (rows of inactive poses zeroed)
    C:  (K, D)     damped depth diagonal
    w:  (K, D)     depth rhs
    pose_active: (P,) bool
    """

    A: jnp.ndarray
    b: jnp.ndarray
    Ew: jnp.ndarray
    C: jnp.ndarray
    w: jnp.ndarray
    pose_active: jnp.ndarray


def assemble_window_system(
    sys_e: EdgeSystem,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    P: int,
    nfixed: jnp.ndarray,
    nactive: jnp.ndarray,
    eta: jnp.ndarray,
    disps: Optional[jnp.ndarray] = None,
    disps_sens: Optional[jnp.ndarray] = None,
    alpha: float = 0.05,
) -> WindowSystem:
    """Gather per-edge blocks into the dense window system.

    eta: (P, D) per-frame depth damping (the reference's ``eta`` rows aligned
    to depth blocks, droid_kernels.cu:1481).  ``disps_sens`` enables the
    depth-sensor prior blending (ba_cuda :1478-1480) with weight ``alpha``.
    """
    E = ii.shape[0]
    D = sys_e.C.shape[-1]

    li, lj = _edge_pose_indices(ii, jj, nfixed, nactive)
    A, b = _accumulate_pose_system(sys_e, li, lj, P)

    # depth blocks: every window slot < nactive owns one (frame = slot)
    slot = jnp.arange(P)
    depth_active = slot < nactive
    ki = jnp.clip(ii, 0, P - 1)
    C, w = _accumulate_depth_diag(sys_e, ki, P)
    C, w = _finish_depth_diag(C, w, eta, depth_active, disps, disps_sens, alpha)

    # dense E: (P poses, 6, P depth blocks, D) scattered from Ei at (li, ii)
    # and Ej at (lj, ii)

    def scatter_E(blocks, rows):
        valid = rows >= 0
        idx = jnp.where(valid, rows * P + ki, P * P)
        out = jax.ops.segment_sum(
            jnp.where(valid[:, None, None], blocks, 0.0), idx, num_segments=P * P + 1
        )
        return out[: P * P].reshape(P, P, 6, D)

    Ew = scatter_E(sys_e.Ei, li) + scatter_E(sys_e.Ej, lj)
    Ew = Ew.transpose(0, 2, 1, 3).reshape(P * 6, P * D)

    pose_active = (slot >= nfixed) & (slot < nactive)
    A = A.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)

    # zero rows/cols of inactive poses
    pa6 = jnp.repeat(pose_active, 6)
    A = jnp.where(pa6[:, None] & pa6[None, :], A, 0.0)
    b = jnp.where(pa6, b.reshape(P * 6), 0.0)
    Ew = jnp.where(pa6[:, None], Ew, 0.0)

    return WindowSystem(A=A, b=b, Ew=Ew, C=C, w=w, pose_active=pose_active)


def reduced_camera_system(
    ws: WindowSystem,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Schur-eliminate depths: the undamped reduced camera system (S, v_r).

    This is the coupling surface the reference exposes as ``BACore.hessian``
    (/root/reference/src/droid_kernels.cu:1839-1898): ``S = A - E Q E^T``,
    ``v_r = b - E Q w`` with Q = 1/C.
    """
    P6, KD = ws.Ew.shape
    Q = (1.0 / ws.C).reshape(KD)
    EQ = ws.Ew * Q[None, :]
    S = ws.A - jnp.matmul(EQ, ws.Ew.T, precision=HIGH)
    v_r = ws.b - EQ @ ws.w.reshape(KD)
    return S, v_r


def damped_solve(
    S: jnp.ndarray,
    v: jnp.ndarray,
    pose_active: jnp.ndarray,
    lm: float,
    ep: float,
    solve_dtype=jnp.float32,
) -> jnp.ndarray:
    """Damped Cholesky solve with identity rows for inactive poses.

    Damping ``diag += ep + lm*diag`` matches SparseBlock::solve
    (droid_kernels.cu:1248-1269).
    """
    P6 = S.shape[0]
    pa6 = jnp.repeat(pose_active, 6)
    diag = jnp.diagonal(S)
    S = S + jnp.diag(ep + lm * diag)
    # identity rows for inactive poses so the factorization is well posed
    S = jnp.where(pa6[:, None] & pa6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(pa6, 0.0, 1.0))
    v = jnp.where(pa6, v, 0.0)

    S = S.astype(solve_dtype)
    v = v.astype(solve_dtype)
    L = jax.lax.linalg.cholesky(S)
    dx = jax.lax.linalg.triangular_solve(
        L, v[:, None], left_side=True, lower=True, transpose_a=False
    )
    dx = jax.lax.linalg.triangular_solve(
        L, dx, left_side=True, lower=True, transpose_a=True
    )[:, 0]
    # a failed factorization yields NaNs; zero the step like CholeskySolver
    # (/root/reference/dbaf/geom/chol.py:8-18)
    dx = jnp.where(jnp.any(jnp.isnan(dx)), jnp.zeros_like(dx), dx)
    return dx.astype(jnp.float32)


def back_substitute_depth(
    ws: WindowSystem, dx: jnp.ndarray, nfixed: jnp.ndarray
) -> jnp.ndarray:
    """dz = Q (w - E^T dx), excluding the first active pose slot's dx.

    The exclusion replicates the ``ix <= 0`` guard in ``EvT6x1_kernel``
    (/root/reference/src/droid_kernels.cu:1152-1153): contributions of pose
    t0 are skipped in the depth update only.
    """
    P6, KD = ws.Ew.shape
    P = ws.C.shape[0]
    slot = jnp.arange(P)
    dx_masked = jnp.where(jnp.repeat(slot == nfixed, 6), 0.0, dx)
    Etdx = jnp.matmul(dx_masked[None, :], ws.Ew, precision=HIGH)[0]
    Q = (1.0 / ws.C).reshape(KD)
    dz = Q * (ws.w.reshape(KD) - Etdx)
    return dz.reshape(ws.C.shape)


def retract(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    dx: jnp.ndarray,
    dz: jnp.ndarray,
    pose_active: jnp.ndarray,
    depth_active: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply SE3 retraction to poses and additive update to disparities."""
    P = poses.shape[0]
    dx = dx.reshape(P, 6)
    new_poses = lie.se3_retr(poses, dx)
    poses = jnp.where(pose_active[:, None], new_poses, poses)
    if depth_active is None:
        depth_active = jnp.ones((P,), dtype=bool)
    disps = disps + jnp.where(
        depth_active[:, None], dz.reshape(P, -1), 0.0
    ).reshape(disps.shape)
    return poses, disps


class PairwiseSystem(NamedTuple):
    """Schur-reduced system built without materializing the dense pose-depth
    coupling matrix.

    The dense path forms ``Ew (P*6, K*D)`` (hundreds of MB at production
    windows) purely to compute ``S = A - E Q E^T``.  Algebraically S only
    couples poses of edge pairs sharing a source frame, so it equals one
    Gram matmul of the stacked per-edge couplings::

        Exy (E, 12, D);  T = (Exy * Q[ii]) @ Exy^T   -- (E*12, D)@(D, E*12)

    followed by a masked scatter of 6x6 quadrants onto pose pairs -- an
    MXU-shaped replacement for both the reference's CPU interaction lists
    (schur_block, /root/reference/src/droid_kernels.cu:1297-1391) and this
    module's dense fallback.
    """

    S: jnp.ndarray
    v: jnp.ndarray
    C: jnp.ndarray
    w: jnp.ndarray
    pose_active: jnp.ndarray
    A: jnp.ndarray
    b: jnp.ndarray


def _placement_matrix(li: jnp.ndarray, lj: jnp.ndarray, P: int) -> jnp.ndarray:
    """(P*6, E*12) one-hot placement: column e*12+k maps to pose row
    ``role_{k//6}(e)*6 + k%6`` (role 0 = li, role 1 = lj; -1 roles drop).

    Scatter-free assembly: every segment-sum of per-edge pose blocks becomes
    a dense matmul with this matrix -- the MXU-native replacement for both
    the reference's CPU triplet lists (droid_kernels.cu:1176-1201) and XLA
    scatter-adds (which serialize on TPU).
    """
    E = li.shape[0]
    k = jnp.arange(12)
    role = jnp.where(k[None, :] < 6, li[:, None], lj[:, None])  # (E, 12)
    role = role.reshape(E * 12)
    kk = jnp.tile(k % 6, E)
    row = jnp.arange(P * 6)
    M = (role[None, :] == (row[:, None] // 6)) & (kk[None, :] == (row[:, None] % 6))
    return M.astype(jnp.float32)


def assemble_pairwise(
    sys_e: EdgeSystem,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    P: int,
    nfixed: jnp.ndarray,
    nactive: jnp.ndarray,
    eta: jnp.ndarray,
    disps: Optional[jnp.ndarray] = None,
    disps_sens: Optional[jnp.ndarray] = None,
    alpha: float = 0.05,
) -> PairwiseSystem:
    """Assemble A, b, C, w and the Schur complement, scatter-free.

    The per-edge 12x12 blocks and the pairwise Schur couplings T are
    sandwiched onto the (P*6, P*6) pose system with ONE placement matrix:
    ``S = M (Hbd - T*pair) M^T`` -- two dense matmuls instead of thousands
    of serialized scatter updates.
    """
    E = ii.shape[0]
    D = sys_e.C.shape[-1]

    li, lj = _edge_pose_indices(ii, jj, nfixed, nactive)
    M = _placement_matrix(li, lj, P)  # (P6, E12)

    slot = jnp.arange(P)
    depth_active = slot < nactive
    ki = jnp.clip(ii, 0, P - 1)
    Ok = (slot[:, None] == ki[None, :]).astype(jnp.float32)  # (P, E)
    C = jnp.matmul(Ok, sys_e.C, precision=HIGH)
    w = jnp.matmul(Ok, sys_e.w, precision=HIGH)
    C, w = _finish_depth_diag(C, w, eta, depth_active, disps, disps_sens, alpha)
    Q = 1.0 / C

    # per-edge stacked coupling rows, masked by pose-role validity
    Ei = sys_e.Ei * (li >= 0)[:, None, None]
    Ej = sys_e.Ej * (lj >= 0)[:, None, None]
    Exy = jnp.concatenate([Ei, Ej], axis=1)  # (E, 12, D)
    Qe = Q[ki]  # (E, D)
    ExyQ = Exy * Qe[:, None, :]

    # one Gram matmul over depth pixels
    T = jnp.matmul(
        ExyQ.reshape(E * 12, D), Exy.reshape(E * 12, D).T, precision=HIGH
    ).reshape(E, 12, E, 12)
    pair = (ii[:, None] == ii[None, :]).astype(T.dtype)
    T = (T * pair[:, None, :, None]).reshape(E * 12, E * 12)

    # block-diagonal per-edge pose Hessian (E*12, E*12)
    Hbd = (
        sys_e.H[:, :, None, :] * jnp.eye(E, dtype=sys_e.H.dtype)[:, None, :, None]
    ).reshape(E * 12, E * 12)

    inner = Hbd - T
    S = jnp.matmul(
        jnp.matmul(M, inner, precision=HIGH), M.T, precision=HIGH
    )
    A = jnp.matmul(
        jnp.matmul(M, Hbd, precision=HIGH), M.T, precision=HIGH
    )

    b = jnp.matmul(M, sys_e.v.reshape(E * 12), precision=HIGH)
    Qw = Q * w
    Ev = jnp.einsum("ecd,ed->ec", Exy, Qw[ki], precision=HIGH)  # (E, 12)
    EQw = jnp.matmul(M, Ev.reshape(E * 12), precision=HIGH)

    pose_active = (slot >= nfixed) & (slot < nactive)
    pa6 = jnp.repeat(pose_active, 6)
    v_r = jnp.where(pa6, b - EQw, 0.0)
    b_flat = jnp.where(pa6, b, 0.0)

    return PairwiseSystem(
        S=S, v=v_r, C=C, w=w, pose_active=pose_active, A=A, b=b_flat
    )


def back_substitute_pairwise(
    ps: PairwiseSystem,
    sys_e: EdgeSystem,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    dx: jnp.ndarray,
    nfixed: jnp.ndarray,
    nactive: jnp.ndarray,
) -> jnp.ndarray:
    """dz = Q (w - E^T dx) computed edge-wise (no dense E), with the
    pose-t0 exclusion quirk (EvT ix<=0, droid_kernels.cu:1152-1153)."""
    P = ps.C.shape[0]
    dxm = dx.reshape(P, 6)
    dxm = jnp.where((jnp.arange(P) == nfixed)[:, None], 0.0, dxm)

    def loc(x):
        return jnp.where((x >= nfixed) & (x < nactive), x, -1)

    li, lj = loc(ii), loc(jj)
    dxi = jnp.where((li >= 0)[:, None], dxm[jnp.clip(li, 0, P - 1)], 0.0)
    dxj = jnp.where((lj >= 0)[:, None], dxm[jnp.clip(lj, 0, P - 1)], 0.0)
    dw = jnp.einsum("ecd,ec->ed", sys_e.Ei, dxi, precision=HIGH) + jnp.einsum(
        "ecd,ec->ed", sys_e.Ej, dxj, precision=HIGH
    )
    ki = jnp.clip(ii, 0, P - 1)
    Ok = (jnp.arange(P)[:, None] == ki[None, :]).astype(jnp.float32)
    acc = jnp.matmul(Ok, dw, precision=HIGH)
    return (1.0 / ps.C) * (ps.w - acc)


# ---------------------------------------------------------------------------
# multi-sensor coupling surface (the BACore capability,
# /root/reference/src/bacore.h:4-70, droid_kernels.cu:1786-1956)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("use_sens", "alpha"))
def coupled_hessian(
    poses_w, disps_w, intrinsics, targets, weights, eta, ii_w, jj_w, mask,
    nactive, disps_sens=None, use_sens: bool = False, alpha: float = 0.001,
):
    """Undamped reduced camera system over the window (BACore::hessian).

    All window slots [0, nactive) are free poses (the coupled graph anchors
    the gauge through priors/marginal); the caller converts (S, v) to the
    body frame and couples them into the factor graph.  alpha defaults to
    the BACore value 0.001 (droid_kernels.cu:1873).
    """
    P = poses_w.shape[0]
    es = build_edge_system(
        poses_w, disps_w, intrinsics, targets, weights, ii_w, jj_w, mask
    )
    ps = assemble_pairwise(
        es, ii_w, jj_w, P, jnp.asarray(0), nactive, eta,
        disps=disps_w if use_sens else None,
        disps_sens=disps_sens if use_sens else None,
        alpha=alpha,
    )
    return ps.S, ps.v


@jax.jit
def coupled_retract(
    poses_w, disps_w, intrinsics, targets, weights, eta, ii_w, jj_w, mask,
    nactive, dx,
):
    """Apply an externally-solved pose step and the induced depth update
    (BACore::retract, droid_kernels.cu:1918-1956).

    Recomputes the linearization at the (unchanged) current state instead of
    caching E/Q/w -- stateless and a few ms on the MXU.
    """
    P = poses_w.shape[0]
    es = build_edge_system(
        poses_w, disps_w, intrinsics, targets, weights, ii_w, jj_w, mask
    )
    ps = assemble_pairwise(es, ii_w, jj_w, P, jnp.asarray(0), nactive, eta)
    dz = back_substitute_pairwise(
        ps, es, ii_w, jj_w, dx, jnp.asarray(0), nactive
    )
    depth_active = jnp.arange(P) < nactive
    poses_w, disps_w = retract(
        poses_w, disps_w, dx, dz, ps.pose_active, depth_active
    )
    return poses_w, jnp.clip(disps_w, 0.001, None)


@functools.partial(jax.jit, static_argnames=("P", "use_sens", "alpha"))
def coupled_hessian_full(
    poses_buf, disps_buf, damping_buf, intrinsics, targets, weights,
    ii_w, jj_w, mask, s0, nactive, P: int, eps_damping: float = 1e-7,
    disps_sens_buf=None, use_sens: bool = False, alpha: float = 0.001,
):
    """BACore::hessian against the FULL buffers (window sliced in-kernel):
    one dispatch from the coupled driver."""
    poses_w = jax.lax.dynamic_slice(poses_buf, (s0, 0), (P, 7))
    disps_w = jax.lax.dynamic_slice(
        disps_buf, (s0, 0, 0), (P,) + disps_buf.shape[1:]
    )
    damp_w = jax.lax.dynamic_slice(
        damping_buf, (s0, 0, 0), (P,) + damping_buf.shape[1:]
    )
    eta = 0.2 * damp_w.reshape(P, -1) + eps_damping
    sens_w = None
    if use_sens and disps_sens_buf is not None:
        sens_w = jax.lax.dynamic_slice(
            disps_sens_buf, (s0, 0, 0), (P,) + disps_sens_buf.shape[1:]
        )
    return coupled_hessian(
        poses_w, disps_w, intrinsics, targets, weights, eta, ii_w, jj_w,
        mask, nactive, disps_sens=sens_w, use_sens=use_sens, alpha=alpha,
    )


@functools.partial(
    jax.jit, static_argnames=("P", "with_hessian", "use_sens", "alpha")
)
def coupled_retract_full(
    poses_buf, disps_buf, damping_buf, intrinsics, targets, weights,
    ii_w, jj_w, mask, s0, nactive, dx, P: int,
    eps_damping: float = 1e-7, with_hessian: bool = False,
    disps_sens_buf=None, use_sens: bool = False, alpha: float = 0.001,
):
    """BACore::retract on the full buffers; optionally relinearizes the
    retracted state and returns the next reduced camera system in the SAME
    dispatch (the coupled loop alternates retract/hessian)."""
    poses_w = jax.lax.dynamic_slice(poses_buf, (s0, 0), (P, 7))
    disps_w = jax.lax.dynamic_slice(
        disps_buf, (s0, 0, 0), (P,) + disps_buf.shape[1:]
    )
    damp_w = jax.lax.dynamic_slice(
        damping_buf, (s0, 0, 0), (P,) + damping_buf.shape[1:]
    )
    eta = 0.2 * damp_w.reshape(P, -1) + eps_damping

    poses_w, disps_w = coupled_retract(
        poses_w, disps_w, intrinsics, targets, weights, eta, ii_w, jj_w,
        mask, nactive, dx,
    )
    poses_buf = jax.lax.dynamic_update_slice(poses_buf, poses_w, (s0, 0))
    disps_buf = jax.lax.dynamic_update_slice(disps_buf, disps_w, (s0, 0, 0))
    if not with_hessian:
        return poses_buf, disps_buf, None, None
    sens_w = None
    if use_sens and disps_sens_buf is not None:
        sens_w = jax.lax.dynamic_slice(
            disps_sens_buf, (s0, 0, 0), (P,) + disps_sens_buf.shape[1:]
        )
    S, v = coupled_hessian(
        poses_w, disps_w, intrinsics, targets, weights, eta, ii_w, jj_w,
        mask, nactive, disps_sens=sens_w, use_sens=use_sens, alpha=alpha,
    )
    return poses_buf, disps_buf, S, v


class BAState(NamedTuple):
    poses: jnp.ndarray  # (P, 7)
    disps: jnp.ndarray  # (P, H, W)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "motion_only", "lm", "ep", "alpha", "use_sens", "schur"
    ),
)
def ba(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray,
    eta: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    edge_mask: jnp.ndarray,
    nfixed: jnp.ndarray,
    nactive: jnp.ndarray,
    disps_sens: Optional[jnp.ndarray] = None,
    iterations: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    alpha: float = 0.05,
    motion_only: bool = False,
    use_sens: bool = False,
    schur: str = "pairwise",
) -> BAState:
    """Full DBA iterations on a window (the ``droid_backends.ba`` surface).

    All shapes static; ``nfixed``/``nactive`` are traced scalars.  Runs
    ``iterations`` Gauss-Newton steps entirely on device, replacing the
    reference's per-iteration GPU->CPU->GPU round trip
    (/root/reference/src/droid_kernels.cu:1394-1512).
    """
    P = poses.shape[0]
    ht, wd = disps.shape[-2:]

    def body(_, state: BAState) -> BAState:
        p, d = state.poses, state.disps
        es = build_edge_system(p, d, intrinsics, targets, weights, ii, jj, edge_mask)
        if schur == "pairwise" and not motion_only:
            ps = assemble_pairwise(
                es, ii, jj, P, nfixed, nactive, eta,
                disps=d if use_sens else None,
                disps_sens=disps_sens if use_sens else None,
                alpha=alpha,
            )
            dx = damped_solve(ps.S, ps.v, ps.pose_active, lm, ep)
            dz = back_substitute_pairwise(ps, es, ii, jj, dx, nfixed, nactive)
            pose_active = ps.pose_active
        else:
            ws = assemble_window_system(
                es, ii, jj, P, nfixed, nactive, eta,
                disps=d if use_sens else None,
                disps_sens=disps_sens if use_sens else None,
                alpha=alpha,
            )
            pose_active = ws.pose_active
            if motion_only:
                dx = damped_solve(ws.A, ws.b, ws.pose_active, lm, ep)
                dz = jnp.zeros_like(ws.C)
            else:
                S, v_r = reduced_camera_system(ws)
                dx = damped_solve(S, v_r, ws.pose_active, lm, ep)
                dz = back_substitute_depth(ws, dx, nfixed)
        depth_active = jnp.arange(P) < nactive
        p, d = retract(p, d, dx, dz, pose_active, depth_active)
        return BAState(p, d)

    state = jax.lax.fori_loop(0, iterations, body, BAState(poses, disps))
    # clamp like depth_video.py:560
    return BAState(state.poses, jnp.clip(state.disps, 0.001, None))
