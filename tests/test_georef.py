"""Georeferencing → flagship re-activation handoff — VERDICT r4 weak #4.

Drives the claimed production flow end-to-end: a GNSS-configured run
starts in the synchronous coupled flow (the zero-pull pipeline refuses
to activate while ``gnss_init_time <= 0``), accumulates a > 10 m GNSS
baseline, ``init_gnss`` rewrites every pose into the local-ENU frame
(heading + scale fit, slam/initialization.py:272-313, reference
dbaf_frontend.py:517-604), and the coupled-async pipeline must then
re-activate across that pose-rewrite boundary — exactly where
index/mirror skew bugs bit before (the r3 ``can_activate`` bug) — with
the trajectory staying metrically bounded in the ABSOLUTE ENU frame.

The scene: the analytic excitation trajectory plus a 12 m/s forward
drift, so ten keyframes of GNSS fixes span > 10 m.  GNSS rows are the
ECEF image of the TRUE trajectory expressed in a yawed/offset ENU frame
(the estimated world cannot know either), so ``init_gnss`` has a real
heading/offset to solve — unlike the async GNSS parity test, which
pre-sets the georeference (tests/test_coupled_async.py:246-249).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dbaf_tpu.eval.ate import ate_rmse
from dbaf_tpu.fusion.se3np import so3_exp
from dbaf_tpu.ops import lie
from dbaf_tpu.utils import geodesy
from tests.test_slam_multisensor import (
    FPS, G, IMU_HZ, MsHarness, W8, H8, make_cfg,
)

SPEED = 12.0   # m/s forward drift: 10 keyframes ~ 13 m GNSS baseline
PSI = np.deg2rad(35.0)          # true-ENU yaw vs the GT/world frame
T_OFF = np.array([100.0, -50.0, 3.0])   # true-ENU origin offset
N_FRAMES = 52


def _body_state_fast(t):
    """test_slam_multisensor.body_state plus a 12 m/s forward drift."""
    p = np.array([SPEED * t + 1.2 * np.sin(1.3 * t),
                  0.9 * np.cos(1.7 * t), 0.25 * t])
    v = np.array([SPEED + 1.56 * np.cos(1.3 * t),
                  -1.53 * np.sin(1.7 * t), 0.25])
    a = np.array([-2.03 * np.sin(1.3 * t), -2.60 * np.cos(1.7 * t), 0.0])
    w = np.array([0.25 * np.sin(0.9 * t), 0.2 * np.cos(0.7 * t), 0.15])
    return p, v, a, w


def _simulate_fast(duration):
    dt = 1.0 / IMU_HZ
    ts = np.arange(0.0, duration + dt / 2, dt)
    R = np.eye(3)
    rows = []
    poses_at = {}
    for t in ts:
        p, v, a, w = _body_state_fast(t)
        if abs(t * FPS - round(t * FPS)) < 1e-6:
            poses_at[round(t * FPS)] = (R.copy(), p)
        acc_body = R.T @ (a - G)
        rows.append(np.concatenate([[t], np.rad2deg(w), acc_body]))
        R = R @ so3_exp(w * dt)
    return np.asarray(rows), poses_at


def _enu_of_gt(p_gt):
    """True-ENU coordinates of a GT/world position (yaw + offset; gravity
    stays aligned, as both frames share the up axis)."""
    Rz = np.array([[np.cos(PSI), -np.sin(PSI), 0.0],
                   [np.sin(PSI), np.cos(PSI), 0.0],
                   [0.0, 0.0, 1.0]])
    return Rz @ np.asarray(p_gt, float) + T_OFF


@pytest.mark.slow
def test_georeferencing_handoff_reactivates_flagship():
    from tests.test_slam_multisensor import plane_disparity

    n = N_FRAMES
    imu_rows, poses_at = _simulate_fast(n / FPS + 0.5)
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_cw, gt_disps = [], []
    for k in range(n + 1):
        R, p = poses_at[k]
        Twc = np.eye(4)
        Twc[:3, :3] = R
        Twc[:3, 3] = p
        pose7 = np.asarray(
            lie.se3_from_matrix(jnp.asarray(np.linalg.inv(Twc), jnp.float32))
        )
        gt_cw.append(pose7)
        gt_disps.append(plane_disparity(pose7, intr, z0=4.0))
    gt_cw = np.stack(gt_cw).astype(np.float32)
    gt_disps = np.stack(gt_disps).astype(np.float32)

    # GNSS rows: ECEF image of the true trajectory in the yawed ENU frame
    ten0_base = np.array([-2694045.0, -4293642.0, 3857878.0])
    Cen = geodesy.Cen(ten0_base)
    gnss_rows = np.asarray([
        np.concatenate([[k / FPS],
                        ten0_base + Cen @ _enu_of_gt(poses_at[k][1])])
        for k in range(n)
    ])

    cfg = make_cfg(vi_warmup=12, keyframe_thresh=-1.0, rollup_start=1000,
                   rollup_shift=8)
    cfg.buffer = 64  # 52 admissions, no culls on this scene
    cfg.frontend.translation_threshold = -1.0
    cfg.sensors.device_solver = True
    cfg.sensors.coupled_mega = True
    cfg.sensors.coupled_async = True
    h = MsHarness(cfg, jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr,
                  imu_rows)
    # the app seeds ten0 from the first GNSS fix (apps/demo_whu.py:75);
    # init_gnss itself must solve heading/offset/scale from the baseline
    h.frontend.set_multisensor(imu_rows, all_gnss=gnss_rows,
                               visual_only=False)
    coupled = h.graph.coupled
    coupled.ten0 = gnss_rows[0, 1:4].copy()

    init_frame = None
    active_steps_at_init = None
    for k in range(n):
        h.feed(k)
        ca = h.frontend._casync
        if init_frame is None and coupled.gnss_init_t1 > 0:
            init_frame = k
            active_steps_at_init = ca.total_steps if ca is not None else 0
            # the pipeline must NOT have been active pre-georeferencing
            # (GNSS configs wait for init_gnss, coupled_async.py:747-749)
            assert active_steps_at_init == 0, active_steps_at_init

    assert h.video.imu_enabled, "VI init did not trigger"
    assert init_frame is not None, "init_gnss never fired (baseline?)"
    assert coupled.gnss_init_time > 0.0

    ca = h.frontend._casync
    assert ca is not None and ca.active, "flagship did not re-activate"
    assert ca.total_steps >= 5, ca.total_steps

    h.frontend.drain_async()
    t1 = h.frontend.t1
    lo = coupled.last_t0
    est = np.asarray([coupled.state.wTbs[i].t for i in range(lo, t1)])
    gt_ids = np.round(h.video.tstamp[lo:t1] * FPS).astype(int)
    # the system's georeferenced frame: local coordinates anchored at
    # ten0 (init_gnss fits heading/scale against
    # Cen(ten0)^T (gnss_ecef - ten0), initialization.py:278-283)
    Cen0 = geodesy.Cen(coupled.ten0)
    ref_local = np.stack([
        Cen0.T @ (ten0_base + Cen @ _enu_of_gt(poses_at[g][1])
                  - coupled.ten0)
        for g in gt_ids
    ])
    span = np.linalg.norm(ref_local.max(0) - ref_local.min(0))

    # ABSOLUTE accuracy in the georeferenced frame: the alignment must
    # hold across the re-activation boundary without any alignment fit.
    # The GPS factor carries sigma [1,1,5] m (GNSS_NOISE, reference
    # depth_video.py:288-290), so sub-metre absolute agreement is the
    # correct expectation — the pre-fix failure mode was ~250 m
    # (free-fall from the old-world marginal, initialization.py note)
    err = np.linalg.norm(est - ref_local, axis=1)
    assert err.max() < 0.08 * span, (err.max(), span)
    assert np.median(err) < 0.05 * span, (np.median(err), span)

    # relative accuracy unchanged by the handoff
    ref_gt = np.stack([poses_at[g][1] for g in gt_ids])
    rmse = ate_rmse(est, ref_gt, align="se3")
    assert rmse < 0.05 * span, (rmse, span)
