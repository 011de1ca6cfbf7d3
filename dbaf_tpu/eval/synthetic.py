"""Synthetic-scene simulator: the dataset-free e2e test/demo backend.

Generates a multi-view-consistent world (a plane observed from a smooth
trajectory), an oracle update operator ('perfect network': returns true
correspondences), and simulated IMU -- the 'fake backend' SURVEY.md
section 4 prescribes for exercising the full SLAM machinery without
datasets or checkpoints.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..fusion.se3np import so3_exp
from ..ops import lie_np, projective as pj

GRAVITY_W = np.array([0.0, 0.0, -9.807])


def plane_disparity(pose_wc: np.ndarray, intr: np.ndarray, h8: int, w8: int,
                    z0: float = 3.0) -> np.ndarray:
    """Ground-truth disparity of the world plane z=z0 for a world->cam
    7-vec pose."""
    fx, fy, cx, cy = intr
    R = lie_np.quat_to_matrix(np.asarray(pose_wc[3:], np.float64))
    t = pose_wc[:3]
    u, v = np.meshgrid(np.arange(w8), np.arange(h8), indexing="xy")
    dirs = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, dtype=float)], -1
    )
    dir_w = dirs @ R  # R^T dir
    tz = (R.T @ t)[2]
    z = (z0 + tz) / dir_w[..., 2]
    return (1.0 / z).astype(np.float32)


def body_state(t: float):
    """Analytic trajectory with strong excitation (for VI observability).

    The oscillation is deliberately HIGH-FREQUENCY at moderate velocity:
    the VINS linear-alignment scale/gravity signal per keyframe interval
    is 0.5*|a|*dt^2 (~60 mm at 10 fps here), and it must clear the
    visual-BA position noise floor at init time (~5-15 mm on this scene)
    or the initial scale estimate is garbage -- measured: 1 mm of visual
    noise at |a|~2.5 m/s^2 collapsed the scale estimate from 3.64 to
    1.76 and the whole coupled system slow-diverged after ~25 keyframes.
    Velocity stays ~1.5 m/s so inter-frame flow (~5 px at the bench
    focal/depth) remains in the regime the update rounds track to
    mm accuracy.  Real datasets sit in this regime too: handheld/vehicle
    accelerations of several m/s^2 against sub-pixel network matches."""
    p = np.array([0.15 * np.sin(10.0 * t), 0.13 * np.cos(9.0 * t), 0.25 * t])
    v = np.array([1.5 * np.cos(10.0 * t), -1.17 * np.sin(9.0 * t), 0.25])
    a = np.array([-15.0 * np.sin(10.0 * t), -10.53 * np.cos(9.0 * t), 0.0])
    w = np.array([0.25 * np.sin(0.9 * t), 0.2 * np.cos(0.7 * t), 0.15])
    return p, v, a, w


def simulate_imu_and_poses(duration: float, fps: float = 10.0,
                           imu_hz: float = 200.0):
    """Returns IMU rows [t, gyro_deg(3), acc(3)] and {frame_id: (R, p)}."""
    dt = 1.0 / imu_hz
    ts = np.arange(0.0, duration + dt / 2, dt)
    R = np.eye(3)
    rows = []
    poses_at: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    for t in ts:
        p, v, a, w = body_state(t)
        fid = t * fps
        if abs(fid - round(fid)) < 1e-6:
            poses_at[int(round(fid))] = (R.copy(), p)
        acc_body = R.T @ (a - GRAVITY_W)
        rows.append(np.concatenate([[t], np.rad2deg(w), acc_body]))
        R = R @ so3_exp(w * dt)
    return np.asarray(rows), poses_at


def scene_from_poses(poses_at, n_frames: int, intr: np.ndarray, h8: int,
                     w8: int, z0: float = 4.0):
    """Ground-truth camera Tcw 7-vecs + plane disparities per frame."""
    gt_cw, gt_disps = [], []
    for k in range(n_frames + 1):
        R, p = poses_at[k]
        Twc = np.eye(4)
        Twc[:3, :3] = R
        Twc[:3, 3] = p
        pose7 = lie_np.se3_from_matrix(np.linalg.inv(Twc))
        gt_cw.append(pose7)
        gt_disps.append(plane_disparity(pose7, intr, h8, w8, z0))
    return (
        np.stack(gt_cw).astype(np.float32),
        np.stack(gt_disps).astype(np.float32),
    )


def make_oracle(gt_poses_cw, gt_disps, intr, noise_px: float = 0.0):
    """'Perfect network' update operator: true correspondences, weight 1.

    Frame identity travels via ``aux['id_map']`` (video slot -> ground-truth
    frame id) so culling/rollup stay correct.

    ``noise_px`` adds zero-mean per-pixel pseudo-noise (std ~ noise_px) to
    the targets, deterministically derived from the evolving reprojection
    state -- successive update rounds see fresh draws, which makes round
    count matter for accuracy (the imperfect-network regime the
    round-count ablation needs); 0.0 keeps the exact oracle.
    """
    gtp = jnp.asarray(gt_poses_cw)
    gtd = jnp.asarray(gt_disps)
    intr8 = jnp.asarray(intr, dtype=jnp.float32)

    def update_fn(net, inp, corr, motn, ii, jj, aux):
        id_map = aux["id_map"]
        gi = id_map[ii]
        gj = id_map[jj]
        target, valid = pj.projective_transform(gtp, gtd, intr8, gi, gj)
        if noise_px:
            c1 = aux["coords1"]
            phase = (
                c1 * jnp.asarray([12.9898, 78.233])
                + c1[..., ::-1] * jnp.asarray([39.3467, 11.135])
                + ii[:, None, None, None].astype(jnp.float32) * 0.7311
                + jj[:, None, None, None].astype(jnp.float32) * 1.2371
            )
            h = jnp.sin(jnp.sum(phase, axis=-1, keepdims=True) * 43758.5453)
            h2 = jnp.concatenate([h, jnp.sin(h * 24634.6345 + 1.0)], axis=-1)
            # sin of a fast phase ~ zero-mean, std 1/sqrt(2), bounded
            target = target + (noise_px * 1.414) * jnp.sin(h2 * 971.487)
        delta = target - aux["coords1"]
        weight = jnp.broadcast_to(valid, delta.shape)
        return net, delta.astype(jnp.float32), weight.astype(jnp.float32)

    return update_fn
