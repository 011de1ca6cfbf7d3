"""SE(3)/SO(3) Lie-group operations on quaternion-parameterized poses.

Pose layout is a 7-vector ``[tx, ty, tz, qx, qy, qz, qw]`` (translation then
quaternion, scalar last), the same state convention the reference stores in
its keyframe buffer (/root/reference/dbaf/depth_video.py:54,69) so that
published DROID weights and trajectory formats interoperate.  Twists are
6-vectors ``[tau, phi]`` (translation part first), matching the Jacobian
ordering of the reference's device math (/root/reference/src/droid_kernels.cu:61-178).

Everything here is shape-polymorphic over leading batch dimensions, uses only
``jnp`` primitives (no data-dependent control flow), and is safe under
``jit``/``vmap``/``grad``.  All trig near-zero branches use Taylor guards via
``jnp.where`` with operand sanitization so gradients stay finite.
"""

from __future__ import annotations

import jax.numpy as jnp

# Matches MIN_DEPTH use sites; kept here for shared numeric guards.
_EPS = 1e-12


# ---------------------------------------------------------------------------
# quaternion primitives (xyzw, scalar last)
# ---------------------------------------------------------------------------

def quat_mul(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q ⊗ p for xyzw quaternions."""
    qx, qy, qz, qw = jnp.moveaxis(q, -1, 0)
    px, py, pz, pw = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py + qy * pw + qz * px - qx * pz,
            qw * pz + qz * pw + qx * py - qy * px,
            qw * pw - qx * px - qy * py - qz * pz,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) v by unit quaternion(s) q.

    Uses the two-cross-product form (same algebra as the reference's device
    ``actSO3``, /root/reference/src/droid_kernels.cu:61-72), which costs two
    cross products instead of building the rotation matrix.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix (batched)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> xyzw quaternion (batched, branch-free).

    Computes all four Shepperd candidates and selects the best-conditioned via
    ``argmax`` masking, so it is jit/vmap safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*component^2 values.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    cand = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    best = jnp.argmax(cand, axis=-1)

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # branch w: qw = s/2, s = sqrt(1+tr)*2
    sw = _safe_sqrt(qw2) * 2.0
    q_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, 0.25 * sw], axis=-1)
    sx = _safe_sqrt(qx2) * 2.0
    q_x = jnp.stack([0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], axis=-1)
    sy = _safe_sqrt(qy2) * 2.0
    q_y = jnp.stack([(m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy, (m02 - m20) / sy], axis=-1)
    sz = _safe_sqrt(qz2) * 2.0
    q_z = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz, (m10 - m01) / sz], axis=-1)

    stacked = jnp.stack([q_x, q_y, q_z, q_w], axis=-2)  # (...,4 cand,4)
    q = jnp.take_along_axis(stacked, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # canonical sign: qw >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# SE3 on 7-vectors
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    ident = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(ident, tuple(shape) + (7,))


def se3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose a ∘ b (apply b first)."""
    q = quat_mul(a[..., 3:], b[..., 3:])
    t = a[..., :3] + quat_act(a[..., 3:], b[..., :3])
    return jnp.concatenate([t, q], axis=-1)


def se3_inv(g: jnp.ndarray) -> jnp.ndarray:
    qinv = quat_conj(g[..., 3:])
    t = -quat_act(qinv, g[..., :3])
    return jnp.concatenate([t, qinv], axis=-1)


def se3_rel(gi: jnp.ndarray, gj: jnp.ndarray) -> jnp.ndarray:
    """Relative transform G_ij = G_j ∘ G_i^{-1}.

    Same composition as the reference's ``relSE3``
    (/root/reference/src/droid_kernels.cu:101-113): maps points expressed in
    frame i to frame j when poses are world->camera.
    """
    qij = quat_mul(gj[..., 3:], quat_conj(gi[..., 3:]))
    tij = gj[..., :3] - quat_act(qij, gi[..., :3])
    return jnp.concatenate([tij, qij], axis=-1)


def se3_act(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 to 3-points: R x + t."""
    return quat_act(g[..., 3:], x) + g[..., :3]


def se3_act4(g: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 to homogeneous-depth points ``(x, y, z, d)``.

    ``Y[:3] = R X[:3] + d * t``, ``Y[3] = d`` -- the projective-coordinates
    action used throughout the dense-BA math (reference ``actSE3``,
    /root/reference/src/droid_kernels.cu:75-83).
    """
    d = X[..., 3:4]
    y = quat_act(g[..., 3:], X[..., :3]) + d * g[..., :3]
    return jnp.concatenate([y, d], axis=-1)


def se3_adjT(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Transpose (dual) adjoint: ``Ad_g^T a`` for twists ``a = [v, w]``.

    Matches reference ``adjSE3`` (/root/reference/src/droid_kernels.cu:86-99):
    result ``[R^T v, R^T (w - t x v)]``.
    """
    qinv = quat_conj(g[..., 3:])
    v = a[..., :3]
    w = a[..., 3:]
    t = g[..., :3]
    top = quat_act(qinv, v)
    bot = quat_act(qinv, w - jnp.cross(t, v))
    return jnp.concatenate([top, bot], axis=-1)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential map: rotation vector -> xyzw quaternion.

    Taylor-guard thresholds follow the reference device math
    (/root/reference/src/droid_kernels.cu:116-137) so small-angle behavior is
    bit-comparable.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta_p4 = theta_sq * theta_sq
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    small = theta_sq < 1e-8
    imag_taylor = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_taylor = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    imag_exact = jnp.sin(0.5 * theta) / theta
    real_exact = jnp.cos(0.5 * theta)
    imag = jnp.where(small, imag_taylor, imag_exact)
    real = jnp.where(small, real_taylor, real_exact)
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map: xyzw quaternion -> rotation vector."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # make scalar part positive (shortest path)
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign
    qw = qw * sign
    norm_v = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(norm_v, qw)
    small = norm_v < 1e-8
    scale = jnp.where(small, 2.0 / jnp.clip(qw, 1e-8, None), theta / jnp.maximum(norm_v, _EPS))
    return scale * qv


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map: twist [tau, phi] -> 7-vector pose.

    Translation uses the closed-form left-Jacobian ``V(phi) tau`` with the
    same small-angle cutoff (theta > 1e-4 for the exact branch) as the
    reference ``expSE3`` (/root/reference/src/droid_kernels.cu:155-184).
    """
    tau = xi[..., :3]
    phi = xi[..., 3:]
    q = so3_exp(phi)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    use_exact = theta > 1e-4

    a = jnp.where(use_exact, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS), 0.0)
    b = jnp.where(
        use_exact,
        (theta - jnp.sin(theta)) / jnp.maximum(theta * theta_sq, _EPS),
        0.0,
    )
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = tau + a * c1 + b * c2
    return jnp.concatenate([t, q], axis=-1)


def se3_log(g: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log map: pose -> twist [tau, phi] (inverse of :func:`se3_exp`)."""
    q = g[..., 3:]
    t = g[..., :3]
    phi = so3_log(q)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    # V^{-1} = I - 0.5 phi^ + coef * (phi^)^2,
    # coef = (1 - theta cot(theta/2) / 2) / theta^2
    half = 0.5 * theta
    cot = jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)
    coef_exact = (1.0 - half * cot) / jnp.maximum(theta_sq, _EPS)
    coef_taylor = 1.0 / 12.0 + theta_sq / 720.0
    coef = jnp.where(theta > 1e-4, coef_exact, coef_taylor)
    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    tau = t - 0.5 * c1 + coef * c2
    return jnp.concatenate([tau, phi], axis=-1)


def se3_retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Manifold retraction ``exp(xi) ∘ g`` (left-multiplied update).

    Same convention as the reference's ``retrSE3`` used by the BA pose update
    (/root/reference/src/droid_kernels.cu:922-940).
    """
    return se3_mul(se3_exp(xi), g)


def se3_normalize(g: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the quaternion part (guards drift over long GN runs)."""
    q = g[..., 3:]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([g[..., :3], q], axis=-1)


def se3_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """7-vector -> 4x4 homogeneous matrix."""
    R = quat_to_matrix(g[..., 3:])
    t = g[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), g.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrix -> 7-vector."""
    q = matrix_to_quat(T[..., :3, :3])
    return jnp.concatenate([T[..., :3, 3], q], axis=-1)
