"""Training losses: geodesic pose, residual, and flow supervision.

JAX port of the reference's training objectives
(/root/reference/dbaf/geom/losses.py:9-118): exponentially-weighted
(gamma^(n-i-1)) sums over the unrolled update iterations.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from ..ops import lie, projective as pj, sim3


def fit_scale(Ps: jnp.ndarray, Gs: jnp.ndarray) -> jnp.ndarray:
    """Least-squares translation scale between pose sets (losses.py:22-28)."""
    t1 = Ps[..., :3].reshape(-1)
    t2 = Gs[..., :3].reshape(-1)
    return jnp.sum(t1 * t2) / (jnp.sum(t2 * t2) + 1e-8)


def pose_metrics(dE: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Translation/rotation(/scale) error metrics (losses.py:9-18).

    Accepts SE3 7-vectors or Sim3 8-vectors; the Sim3 form adds the
    reference's ``s_err = |s - 1|`` scale metric.
    """
    ang = jnp.linalg.norm(lie.so3_log(dE[..., 3:7]), axis=-1)
    r_err = jnp.rad2deg(ang)
    t_err = jnp.linalg.norm(dE[..., :3], axis=-1)
    out = {
        "rot_error": jnp.mean(r_err),
        "tr_error": jnp.mean(t_err),
        "bad_rot": jnp.mean((r_err < 0.1).astype(jnp.float32)),
        "bad_tr": jnp.mean((t_err < 0.01).astype(jnp.float32)),
    }
    if dE.shape[-1] == 8:
        out["scale_error"] = jnp.mean(jnp.abs(dE[..., 7] - 1.0))
    return out


def geodesic_loss(
    Ps: jnp.ndarray,
    Gs_list: Sequence[jnp.ndarray],
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    gamma: float = 0.9,
    do_scale: bool = True,
) -> Tuple[jnp.ndarray, Dict]:
    """Relative-pose geodesic loss over unrolled estimates
    (losses.py:30-74).  Ps: (N, 7) ground truth; Gs_list: iterates,
    each (N, 7) SE3 or (N, 8) Sim3 (the monocular 7-dof training mode;
    Sim3 adds the reference's ``0.05 * |sigma|`` scale-drift term).
    Metrics are always computed on the Sim3 lift (losses.py:64)."""
    is_sim3 = Gs_list[0].shape[-1] == 8
    if is_sim3:
        dP = sim3.rel(sim3.from_se3(Ps[ii]), sim3.from_se3(Ps[jj]))
    else:
        dP = lie.se3_rel(Ps[ii], Ps[jj])
    n = len(Gs_list)
    total = 0.0
    metrics = {}
    for i, Gs in enumerate(Gs_list):
        w = gamma ** (n - i - 1)
        if is_sim3:
            dG = sim3.rel(Gs[ii], Gs[jj])
            if do_scale:
                dG = sim3.scale(dG, fit_scale(dP, dG))
            dE = sim3.mul(dG, sim3.inv(dP))
            d = sim3.log(dE)
            tau, phi, sig = d[..., :3], d[..., 3:6], d[..., 6:]
            total = total + w * (
                jnp.mean(jnp.linalg.norm(tau, axis=-1))
                + jnp.mean(jnp.linalg.norm(phi, axis=-1))
                + 0.05 * jnp.mean(jnp.linalg.norm(sig, axis=-1))
            )
        else:
            dG = lie.se3_rel(Gs[ii], Gs[jj])
            if do_scale:
                s = fit_scale(dP, dG)
                dG = jnp.concatenate([dG[..., :3] * s, dG[..., 3:]], axis=-1)
            dE = lie.se3_mul(dG, lie.se3_inv(dP))
            d = lie.se3_log(dE)
            tau, phi = d[..., :3], d[..., 3:]
            total = total + w * (
                jnp.mean(jnp.linalg.norm(tau, axis=-1))
                + jnp.mean(jnp.linalg.norm(phi, axis=-1))
            )
            dE = sim3.from_se3(dE)
        metrics = pose_metrics(dE)
    return total, metrics


def residual_loss(residuals: Sequence[jnp.ndarray], gamma: float = 0.9):
    """Weighted mean-abs system residuals (losses.py:77-86)."""
    n = len(residuals)
    total = 0.0
    for i, r in enumerate(residuals):
        total = total + gamma ** (n - i - 1) * jnp.mean(jnp.abs(r))
    return total, {"residual": total}


def flow_loss(
    Ps: jnp.ndarray,
    disps: jnp.ndarray,
    poses_est: Sequence[jnp.ndarray],
    disps_est: Sequence[jnp.ndarray],
    intrinsics: jnp.ndarray,
    gamma: float = 0.9,
):
    """End-point-error against ground-truth induced flow on the +-1
    neighbor graph (losses.py:89-118)."""
    N = Ps.shape[0]
    ii = jnp.concatenate([jnp.arange(N - 1), jnp.arange(1, N)])
    jj = jnp.concatenate([jnp.arange(1, N), jnp.arange(N - 1)])

    coords0, val0 = pj.projective_transform(Ps, disps, intrinsics, ii, jj)
    val0 = val0 * (disps[ii] > 0).astype(val0.dtype)[..., None]

    n = len(poses_est)
    total = 0.0
    epe = None
    v = None
    for i in range(n):
        w = gamma ** (n - i - 1)
        coords1, val1 = pj.projective_transform(
            poses_est[i], disps_est[i], intrinsics, ii, jj
        )
        v = (val0 * val1)[..., 0]
        epe = v * jnp.linalg.norm(coords1 - coords0, axis=-1)
        total = total + w * jnp.mean(epe)

    mask = v > 0.5
    valid_epe = jnp.where(mask, epe, 0.0)
    cnt = jnp.maximum(jnp.sum(mask), 1)
    metrics = {
        "f_error": jnp.sum(valid_epe) / cnt,
        "1px": jnp.sum(jnp.where(mask & (epe < 1.0), 1.0, 0.0)) / cnt,
    }
    return total, metrics
