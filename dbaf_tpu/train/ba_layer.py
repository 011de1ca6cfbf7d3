"""Differentiable bundle-adjustment layer for training.

The training-time BA of the reference (pure-torch autograd GN,
/root/reference/dbaf/geom/ba.py:29-155 with chol.py damping) expressed
through the native solver pieces -- fully differentiable under jax.grad
(gradients flow through the Cholesky solve), with the reference's
training-specific clamps (disps > 10 -> 0, min 0).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops import dba


def ba_step(
    target: jnp.ndarray,
    weight: jnp.ndarray,
    eta: jnp.ndarray,
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    fixedp: int = 2,
    ep: float = 0.1,
    lm: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full-BA Gauss-Newton step (geom/ba.py:29-104 semantics).

    target/weight: (E, H, W, 2); eta: (P, H*W) depth damping from GraphAgg.
    Poses before ``fixedp`` stay fixed (gauge).
    """
    P = poses.shape[0]
    mask = jnp.ones(ii.shape, dtype=bool)
    es = dba.build_edge_system(
        poses, disps, intrinsics, target, weight, ii, jj, mask
    )
    ps = dba.assemble_pairwise(
        es, ii, jj, P, jnp.asarray(fixedp), jnp.asarray(P), eta + 1e-7
    )
    dx = dba.damped_solve(ps.S, ps.v, ps.pose_active, lm, ep)
    dz = dba.back_substitute_pairwise(
        ps, es, ii, jj, dx, jnp.asarray(fixedp), jnp.asarray(P)
    )
    depth_active = jnp.ones((P,), dtype=bool)
    poses, disps = dba.retract(
        poses, disps, dx, dz, ps.pose_active, depth_active
    )
    # training clamps (geom/ba.py:101-102)
    disps = jnp.where(disps > 10.0, 0.0, disps)
    disps = jnp.clip(disps, 0.0, None)
    return poses, disps


def motion_only_ba_step(
    target, weight, eta, poses, disps, intrinsics, ii, jj,
    fixedp: int = 1, ep: float = 0.1, lm: float = 1e-4,
):
    """Motion-only variant (geom/ba.py:107-155)."""
    P = poses.shape[0]
    mask = jnp.ones(ii.shape, dtype=bool)
    es = dba.build_edge_system(
        poses, disps, intrinsics, target, weight, ii, jj, mask
    )
    ws = dba.assemble_window_system(
        es, ii, jj, P, jnp.asarray(fixedp), jnp.asarray(P), eta + 1e-7
    )
    dx = dba.damped_solve(ws.A, ws.b, ws.pose_active, lm, ep)
    poses, _ = dba.retract(
        poses, disps, dx, jnp.zeros_like(ws.C), ws.pose_active
    )
    return poses
