"""Projective camera operations: inverse projection, reprojection, flow.

Re-designs the reference's projective pipeline
(/root/reference/dbaf/geom/projective_ops.py:18-125 and the fused CUDA path
/root/reference/src/droid_kernels.cu:220-468) as vectorized JAX functions.
Poses are world->camera 7-vectors, disparities are inverse depths at 1/8
resolution, and intrinsics are ``[fx, fy, cx, cy]`` already divided by 8.

All functions are shape-static and jit/vmap-safe.  Edge-indexed variants take
integer index arrays ``ii, jj`` (source/target keyframe per edge) and gather
from the keyframe axis, the TPU-native replacement for the reference's
one-CUDA-block-per-edge layout.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import lie, sim3

# Minimum z-depth for a reprojection to count as valid.  The reference uses
# 0.2 in the autograd python path (projective_ops.py:6) but 0.25 in the CUDA
# BA kernels (droid_kernels.cu:29); we follow the kernel value for the BA
# path and expose it as a parameter elsewhere.
MIN_DEPTH_PY = 0.2
MIN_DEPTH_KERNEL = 0.25

# Fixed virtual stereo baseline used for ii==jj (stereo) edges
# (projective_ops.py:105, droid_kernels.cu:263-273).
STEREO_POSE = jnp.asarray([-0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinate grid, shape (ht, wd, 2) ordered (x, y)."""
    y = jnp.arange(ht, dtype=dtype)
    x = jnp.arange(wd, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx, yy], axis=-1)


def iproj(disps: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pinhole inverse projection to homogeneous-depth points.

    disps: (..., H, W), intrinsics: (..., 4) -> points (..., H, W, 4) as
    ``((u-cx)/fx, (v-cy)/fy, 1, disp)``.
    """
    ht, wd = disps.shape[-2], disps.shape[-1]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    X = (grid[..., 0] - cx) / fx
    Y = (grid[..., 1] - cy) / fy
    ones = jnp.ones_like(disps)
    return jnp.stack([X, Y, ones, disps], axis=-1)


def proj(
    Xs: jnp.ndarray,
    intrinsics: jnp.ndarray,
    min_depth: float = MIN_DEPTH_PY,
    return_depth: bool = False,
) -> jnp.ndarray:
    """Pinhole projection of homogeneous-depth points (..., H, W, 4)."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    X, Y, Z, D = jnp.moveaxis(Xs, -1, 0)
    Z = jnp.where(Z < 0.5 * min_depth, jnp.ones_like(Z), Z)
    d = 1.0 / Z
    x = fx * X * d + cx
    y = fy * Y * d + cy
    if return_depth:
        return jnp.stack([x, y, D * d], axis=-1)
    return jnp.stack([x, y], axis=-1)


def _edge_rel_poses(poses: jnp.ndarray, ii: jnp.ndarray, jj: jnp.ndarray) -> jnp.ndarray:
    """Per-edge relative transforms G_ij with the stereo-edge override.

    Accepts SE3 7-vectors or Sim3 8-vectors (the training-time Sim3 branch,
    projective_ops.py:84-94); the stereo baseline lifts to unit scale.
    """
    gi = poses[ii]
    gj = poses[jj]
    if poses.shape[-1] == 8:
        gij = sim3.rel(gi, gj)
        override = sim3.from_se3(STEREO_POSE)
    else:
        gij = lie.se3_rel(gi, gj)
        override = STEREO_POSE
    stereo = (ii == jj)[..., None]
    return jnp.where(stereo, override.astype(gij.dtype), gij)


def _act4(g: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous-depth action, SE3 (7) or Sim3 (8) by pose width."""
    if g.shape[-1] == 8:
        return sim3.act4(g, X)
    return lie.se3_act4(g, X)


def projective_transform(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    min_depth: float = MIN_DEPTH_PY,
    return_depth: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reproject every pixel of frame ii into frame jj.

    poses: (N, 7) world->camera SE3, or (N, 8) Sim3 ``(t, q, s)`` for the
    training-time 7-dof branch (projective_ops.py:84-94); disps: (N, H, W);
    intrinsics: (N, 4) or (4,).  Returns coords (E, H, W, 2[+1]) and
    validity mask (E, H, W, 1).

    Mirrors /root/reference/dbaf/geom/projective_ops.py:96-125.
    """
    if intrinsics.ndim == 1:
        intr_i = intr_j = jnp.broadcast_to(intrinsics, ii.shape + (4,))
    else:
        intr_i, intr_j = intrinsics[ii], intrinsics[jj]

    X0 = iproj(disps[ii], intr_i)  # (E, H, W, 4)
    gij = _edge_rel_poses(poses, ii, jj)  # (E, 7|8)
    X1 = _act4(gij[:, None, None, :], X0)
    coords = proj(X1, intr_j, min_depth=min_depth, return_depth=return_depth)
    valid = (X1[..., 2] > min_depth) & (X0[..., 2] > min_depth)
    return coords, valid[..., None].astype(coords.dtype)


def projective_transform_comp(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    xyz_comp: jnp.ndarray,
    min_depth: float = MIN_DEPTH_PY,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reprojection with additive object-motion compensation
    (/root/reference/dbaf/geom/projective_ops.py:127-158).

    xyz_comp: (E, H, W, 4) homogeneous offset added to the transformed
    points before projection (dynamic-object handling).
    """
    if intrinsics.ndim == 1:
        intr_i = intr_j = jnp.broadcast_to(intrinsics, ii.shape + (4,))
    else:
        intr_i, intr_j = intrinsics[ii], intrinsics[jj]
    X0 = iproj(disps[ii], intr_i)
    gij = _edge_rel_poses(poses, ii, jj)
    X1 = _act4(gij[:, None, None, :], X0) + xyz_comp
    coords = proj(X1, intr_j, min_depth=min_depth)
    valid = (X1[..., 2] > min_depth) & (X0[..., 2] > min_depth)
    return coords, valid[..., None].astype(coords.dtype)


def induced_flow(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optical flow induced by camera motion (projective_ops.py:160-171)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid


class EdgeJacobians(NamedTuple):
    """Per-edge, per-pixel linearization of the reprojection residual.

    Shapes (E = edges, H, W):
      coords: (E, H, W, 2)   predicted target coords
      valid:  (E, H, W)      z-depth validity (kernel MIN_DEPTH)
      Ji:     (E, H, W, 2, 6) d(coords)/d(xi_i)  (negated dual adjoint of Jj)
      Jj:     (E, H, W, 2, 6) d(coords)/d(xi_j)
      Jz:     (E, H, W, 2)   d(coords)/d(disp_i)
    """

    coords: jnp.ndarray
    valid: jnp.ndarray
    Ji: jnp.ndarray
    Jj: jnp.ndarray
    Jz: jnp.ndarray


def projection_jacobians(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    min_depth: float = MIN_DEPTH_KERNEL,
) -> EdgeJacobians:
    """Analytic Jacobians of the reprojection, fused per edge.

    Exactly the linearization computed inside the reference's DBA hot kernel
    (/root/reference/src/droid_kernels.cu:325-419):

      Jj = [[fx*h*d, 0,      -fx*x*h*d^2, -fx*x*y*d^2,   fx*(1+x^2 d^2), -fx*y*d],
            [0,      fy*h*d, -fy*y*h*d^2, -fy*(1+y^2d^2), fy*x*y*d^2,     fy*x*d]]
      Jz = [fx*(tx*d - tz*x*d^2), fy*(ty*d - tz*y*d^2)]
      Ji = -Ad_{Gij}^T-applied Jj (per row)

    where (x, y, ., h) is the transformed homogeneous point, d = 1/z, and t
    the relative translation.  ``d`` is zeroed for invalid depths so invalid
    pixels contribute exact zeros.
    """
    if intrinsics.ndim == 1:
        intr_i = intr_j = jnp.broadcast_to(intrinsics, ii.shape + (4,))
    else:
        intr_i, intr_j = intrinsics[ii], intrinsics[jj]

    X0 = iproj(disps[ii], intr_i)
    gij = _edge_rel_poses(poses, ii, jj)  # (E, 7)
    gije = gij[:, None, None, :]
    X1 = lie.se3_act4(gije, X0)

    x, y, z, h = jnp.moveaxis(X1, -1, 0)
    valid = z > min_depth
    d = jnp.where(valid, 1.0 / jnp.where(valid, z, 1.0), 0.0)
    d2 = d * d

    fx, fy, cx, cy = jnp.moveaxis(intr_j[:, None, None, :], -1, 0)
    u = fx * d * x + cx
    v = fy * d * y + cy
    coords = jnp.stack([u, v], axis=-1)

    o = jnp.zeros_like(d)
    # rows of Jj stacked -> (E, H, W, 2, 6)
    Jj = jnp.stack(
        [
            fx * (h * d), o, fx * (-x * h * d2),
            fx * (-x * y * d2), fx * (1.0 + x * x * d2), fx * (-y * d),
            o, fy * (h * d), fy * (-y * h * d2),
            fy * (-1.0 - y * y * d2), fy * (x * y * d2), fy * (x * d),
        ],
        axis=-1,
    ).reshape(x.shape + (2, 6))

    tx, ty, tz = gij[:, 0], gij[:, 1], gij[:, 2]
    tx = tx[:, None, None]
    ty = ty[:, None, None]
    tz = tz[:, None, None]
    Jz = jnp.stack(
        [fx * (tx * d - tz * (x * d2)), fy * (ty * d - tz * (y * d2))],
        axis=-1,
    )

    # Ji row-wise: Ji_row = -(Ad_{Gij}^T J_row)
    Ji = -lie.se3_adjT(gije[..., None, :], Jj)

    return EdgeJacobians(coords=coords, valid=valid, Ji=Ji, Jj=Jj, Jz=Jz)


def projection_jacobians_sim3(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    min_depth: float = MIN_DEPTH_PY,
) -> EdgeJacobians:
    """7-dof reprojection Jacobians for Sim3 poses ``(N, 8)``.

    The Sim3 branch of the reference's training-time linearization
    (projective_ops.py:36-94): point-action Jacobian Ja (4x7, extra scale
    column [X, Y, Z, 0]) composed with the pinhole projection Jacobian
    Jp (2x4); Ji applies the negated Sim3 dual adjoint row-wise.  Ji/Jj
    are (E, H, W, 2, 7); Jz is d(coords)/d(disp_i) via the chain through
    iproj (dX0/dd = e4, so Jz = Jp · Gij·e4 = Jp · [t, 1]).
    """
    if intrinsics.ndim == 1:
        intr_i = intr_j = jnp.broadcast_to(intrinsics, ii.shape + (4,))
    else:
        intr_i, intr_j = intrinsics[ii], intrinsics[jj]

    X0 = iproj(disps[ii], intr_i)
    gij = _edge_rel_poses(poses, ii, jj)  # (E, 8)
    gije = gij[:, None, None, :]
    X1 = sim3.act4(gije, X0)

    x, y, z, h = jnp.moveaxis(X1, -1, 0)
    valid = z > min_depth
    d = jnp.where(valid, 1.0 / jnp.where(valid, z, 1.0), 0.0)
    d2 = d * d

    fx, fy, cx, cy = jnp.moveaxis(intr_j[:, None, None, :], -1, 0)
    coords = jnp.stack([fx * d * x + cx, fy * d * y + cy], axis=-1)

    o = jnp.zeros_like(d)
    # Jp @ Ja with Ja rows (projective_ops.py:84-90):
    #   [d, 0, 0,  0,  z, -y, x]
    #   [0, d, 0, -z,  0,  x, y]
    #   [0, 0, d,  y, -x,  0, z]   (4th row zero)
    # and Jp = [[fx*d, 0, -fx*x*d^2, 0], [0, fy*d, -fy*y*d^2, 0]].
    Jj = jnp.stack(
        [
            fx * (h * d), o, fx * (-x * h * d2),
            fx * (-x * y * d2), fx * (1.0 + x * x * d2), fx * (-y * d),
            o,
            o, fy * (h * d), fy * (-y * h * d2),
            fy * (-1.0 - y * y * d2), fy * (x * y * d2), fy * (x * d),
            o,
        ],
        axis=-1,
    ).reshape(x.shape + (2, 7))
    # The scale column is Jp @ [X, Y, Z, 0] = fx*(X*d - X*d^2*Z) = 0
    # EXACTLY (left-perturbing the relative Sim3 by a pure scale scales
    # the whole transformed point; the projection is invariant).  The o
    # entries above already encode it; per-frame scale sensitivity enters
    # through the -t·v row of the dual adjoint below -- identical to the
    # reference's Jp @ Ja composition (projective_ops.py:84-94).

    tx, ty, tz = (gij[:, k][:, None, None] for k in range(3))
    Jz = jnp.stack(
        [fx * (tx * d - tz * (x * d2)), fy * (ty * d - tz * (y * d2))],
        axis=-1,
    )

    Ji = -sim3.adjT(gije[..., None, :], Jj)
    return EdgeJacobians(coords=coords, valid=valid, Ji=Ji, Jj=Jj, Jz=Jz)


def frame_distance(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    beta: float = 0.3,
    min_depth: float = MIN_DEPTH_KERNEL,
) -> jnp.ndarray:
    """Mean reprojection-flow distance between frame pairs.

    Blends full-SE3 flow with translation-only flow by ``beta`` and returns
    1000.0 when fewer than 75% of pixels land at valid depth, matching
    /root/reference/src/droid_kernels.cu:562-702.  intrinsics: (4,).
    """
    ht, wd = disps.shape[-2:]
    grid = coords_grid(ht, wd, dtype=disps.dtype)

    X0 = iproj(disps[ii], jnp.broadcast_to(intrinsics, ii.shape + (4,)))
    gij = lie.se3_rel(poses[ii], poses[jj])  # no stereo override here

    # full SE3 flow
    X1 = lie.se3_act4(gij[:, None, None, :], X0)
    fx, fy, cx, cy = intrinsics
    du = fx * (X1[..., 0] / X1[..., 2]) + cx - grid[..., 0]
    dv = fy * (X1[..., 1] / X1[..., 2]) + cy - grid[..., 1]
    d_full = jnp.sqrt(du * du + dv * dv)
    valid_full = X1[..., 2] > min_depth

    # translation-only flow
    t = gij[:, None, None, :3]
    Xt = X0[..., :3] + X0[..., 3:4] * t
    du = fx * (Xt[..., 0] / Xt[..., 2]) + cx - grid[..., 0]
    dv = fy * (Xt[..., 1] / Xt[..., 2]) + cy - grid[..., 1]
    d_trans = jnp.sqrt(du * du + dv * dv)
    valid_trans = Xt[..., 2] > min_depth

    hw = float(ht * wd)
    accum = beta * jnp.sum(jnp.where(valid_full, d_full, 0.0), axis=(-2, -1)) + (
        1.0 - beta
    ) * jnp.sum(jnp.where(valid_trans, d_trans, 0.0), axis=(-2, -1))
    valid = beta * jnp.sum(valid_full, axis=(-2, -1)) + (1.0 - beta) * jnp.sum(
        valid_trans, axis=(-2, -1)
    )
    total = hw  # beta*hw + (1-beta)*hw
    frac = valid / (total + 1e-8)
    dist = accum / jnp.maximum(valid, 1e-8)
    return jnp.where(frac < 0.75, 1000.0, dist)


def frame_distance_bidirectional(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    beta: float = 0.3,
) -> jnp.ndarray:
    """0.5 * (d(ii->jj) + d(jj->ii)), the default used by edge selection
    (/root/reference/dbaf/depth_video.py:251-261)."""
    d1 = frame_distance(poses, disps, intrinsics, ii, jj, beta)
    d2 = frame_distance(poses, disps, intrinsics, jj, ii, beta)
    return 0.5 * (d1 + d2)


def iproj_points(
    poses: jnp.ndarray, disps: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """Back-project all keyframe pixels to 3D points for export.

    ``poses`` here are camera->world (the caller inverts), matching the use
    of the reference's ``iproj_kernel`` (/root/reference/src/droid_kernels.cu:824-895).
    Returns (N, H, W, 3).
    """
    X0 = iproj(disps, jnp.broadcast_to(intrinsics, disps.shape[:-2] + (4,)))
    X1 = lie.se3_act4(poses[:, None, None, :], X0)
    return X1[..., :3] / jnp.maximum(X1[..., 3:4], 1e-8)


def depth_consistency_count(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ix: jnp.ndarray,
    thresh: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-view depth-consistency counter used to mask exported points.

    For each queried keyframe ``ix[k]``, reproject all pixels into the six
    neighbor frames ``ix + {-1,-2,-3,+3,+4,+5}`` and count neighbors where
    *any* of the 4 bilinear taps agrees in depth space
    (``|1/d_proj - 1/d_tap| < thresh``), requiring the full 2x2 tap window to
    be in-bounds -- the exact vote of the reference ``depth_filter_kernel``
    (/root/reference/src/droid_kernels.cu:706-820, incl. its jx = ix+neigh_id
    offset pattern at :740).

    Returns counts (K, H, W) as float.
    """
    offs = jnp.asarray([-1, -2, -3, 3, 4, 5])
    neighbors = ix[:, None] + offs[None, :]
    num = disps.shape[0]
    nvalid = (neighbors >= 0) & (neighbors < num)
    neighbors_c = jnp.clip(neighbors, 0, num - 1)

    K, J = neighbors.shape
    ht, wd = disps.shape[-2:]

    ii = jnp.repeat(ix, J)
    jj = neighbors_c.reshape(-1)
    coords, _ = projective_transform(
        poses, disps, intrinsics, ii, jj, return_depth=True
    )  # (K*J, H, W, 3); channel 2 = projected inverse depth d_j
    coords = coords.reshape(K, J, ht, wd, 3)

    x, y, dj = coords[..., 0], coords[..., 1], coords[..., 2]
    u0 = jnp.floor(x)
    v0 = jnp.floor(y)
    inb = (u0 >= 0) & (v0 >= 0) & (u0 < wd - 1) & (v0 < ht - 1)
    u0i = jnp.clip(u0, 0, wd - 2).astype(jnp.int32)
    v0i = jnp.clip(v0, 0, ht - 2).astype(jnp.int32)

    nb = neighbors_c[:, :, None, None]
    inv_dj = 1.0 / jnp.maximum(dj, 1e-8)
    agree = jnp.zeros(dj.shape, dtype=bool)
    for dv in (0, 1):
        for du in (0, 1):
            d_tap = disps[nb, v0i + dv, u0i + du]
            agree = agree | (
                jnp.abs(inv_dj - 1.0 / jnp.maximum(d_tap, 1e-8))
                < thresh[:, None, None, None]
            )
    vote = inb & agree & nvalid[:, :, None, None]
    return jnp.sum(vote, axis=1).astype(disps.dtype)
