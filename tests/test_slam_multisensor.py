"""End-to-end multi-sensor SLAM on a synthetic scene with simulated IMU.

Extends the visual-only harness with a gravity-aware analytic trajectory:
the system must pass visual warmup, solve gyro bias + scale + gravity in the
VI alignment, switch to the tightly-coupled path, and track metrically.
Also cross-checks the camera<->body Hessian conversion by solving a pure
visual window through the factor graph and comparing against the native BA.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbaf_tpu.eval.ate import ate_rmse
from dbaf_tpu.fusion.coupling import convert_dx, convert_hessian, hessian_factor
from dbaf_tpu.fusion.factors import X, Noise, PriorPose
from dbaf_tpu.fusion.graph import FactorGraph, LevenbergMarquardt, Values
from dbaf_tpu.fusion.preintegration import ImuParams
from dbaf_tpu.fusion.se3np import Pose, so3_exp
from dbaf_tpu.ops import dba, lie, projective as pj
from dbaf_tpu.slam.coupled import MultiSensorBA
from dbaf_tpu.slam.frontend import Frontend
from dbaf_tpu.slam.graph import CovisibleGraph
from dbaf_tpu.slam.video import DepthVideo
from tests.test_slam_e2e import H8, W8, make_cfg, make_oracle, plane_disparity

FPS = 10.0
IMU_HZ = 200.0
G = np.array([0.0, 0.0, -9.807])


def body_state(t):
    """Analytic body (=camera; Tbc=I) trajectory with strong excitation."""
    p = np.array([1.2 * np.sin(1.3 * t), 0.9 * np.cos(1.7 * t), 0.25 * t])
    v = np.array([1.56 * np.cos(1.3 * t), -1.53 * np.sin(1.7 * t), 0.25])
    a = np.array([-2.03 * np.sin(1.3 * t), -2.60 * np.cos(1.7 * t), 0.0])
    w = np.array([0.25 * np.sin(0.9 * t), 0.2 * np.cos(0.7 * t), 0.15])
    return p, v, a, w


def simulate(duration):
    """Integrate attitude; sample IMU rows [t, gyro_deg, acc] and camera
    poses (world->cam) at frame times."""
    dt = 1.0 / IMU_HZ
    ts = np.arange(0.0, duration + dt / 2, dt)
    R = np.eye(3)
    rows = []
    poses_at = {}
    for k, t in enumerate(ts):
        p, v, a, w = body_state(t)
        if abs(t * FPS - round(t * FPS)) < 1e-6:
            poses_at[round(t * FPS)] = (R.copy(), p)
        acc_body = R.T @ (a - G)
        rows.append(np.concatenate([[t], np.rad2deg(w), acc_body]))
        R = R @ so3_exp(w * dt)
    return np.asarray(rows), poses_at


class MsHarness:
    def __init__(self, cfg, gt_poses_cw, gt_disps, intr, imu_rows):
        self.cfg = cfg
        self.video = DepthVideo(cfg)
        self.id_map = np.zeros(cfg.buffer, dtype=np.int32)
        oracle = make_oracle(gt_poses_cw, gt_disps, intr, self)
        self.graph = CovisibleGraph(self.video, oracle, cfg)
        coupled = MultiSensorBA(self.video, cfg)
        coupled.Tbc = Pose()  # identity body<-camera
        coupled.state.set_imu_params([0.05, 0.005, 1e-4, 1e-6])
        self.graph.coupled = coupled
        self.frontend = Frontend(self.video, self.graph, cfg)
        self.frontend.set_multisensor(imu_rows, visual_only=False)
        self.intr8 = jnp.asarray(intr, dtype=jnp.float32)
        h8, w8 = self.video.h8, self.video.w8
        self.zeros_feat = jnp.zeros((h8, w8, 128), dtype=jnp.bfloat16)

    def feed(self, frame_id: int):
        t = frame_id / FPS
        idx = self.video.counter
        self.video.append(
            t, None, None, None, None, self.intr8,
            self.zeros_feat, self.zeros_feat, self.zeros_feat,
        )
        self.id_map[idx] = frame_id
        self.graph.aux = {"id_map": jnp.asarray(self.id_map)}
        self.frontend()
        self.id_map[: self.video.counter] = np.round(
            self.video.tstamp[: self.video.counter] * FPS
        ).astype(np.int32)
        self.graph.aux = {"id_map": jnp.asarray(self.id_map)}


@pytest.mark.slow
@pytest.mark.parametrize("device_solver", [False, True])
def test_multisensor_e2e_coupled_tracking(device_solver):
    n_frames = 26
    imu_rows, poses_at = simulate(n_frames / FPS + 0.5)
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)

    # ground-truth camera poses (world->cam) and plane disparities
    gt_cw, gt_disps = [], []
    for k in range(n_frames + 1):
        R, p = poses_at[k]
        Twc = np.eye(4)
        Twc[:3, :3] = R
        Twc[:3, 3] = p
        Tcw = np.linalg.inv(Twc)
        pose7 = np.asarray(
            lie.se3_from_matrix(jnp.asarray(Tcw, jnp.float32))
        )
        gt_cw.append(pose7)
        gt_disps.append(plane_disparity(pose7, intr, z0=4.0))
    gt_cw = np.stack(gt_cw).astype(np.float32)
    gt_disps = np.stack(gt_disps).astype(np.float32)

    cfg = make_cfg(vi_warmup=12, keyframe_thresh=-1.0, rollup_start=1000)
    cfg.sensors.device_solver = device_solver
    h = MsHarness(cfg, jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr, imu_rows)
    for k in range(n_frames):
        h.feed(k)

    assert h.frontend.is_initialized
    assert h.video.imu_enabled, "VI initialization did not trigger"
    t1 = h.frontend.t1

    # metric-scale SE3-aligned ATE on body positions (no scale alignment:
    # the VI init must have recovered the metric scale)
    est = np.asarray([h.graph.coupled.state.wTbs[k].t for k in range(t1)])
    gt_ids = np.round(h.video.tstamp[:t1] * FPS).astype(int)
    ref = np.stack([poses_at[g][1] for g in gt_ids])
    rmse = ate_rmse(est, ref, align="se3")
    span = np.linalg.norm(ref.max(0) - ref.min(0))
    assert rmse < 0.08 * span, (rmse, span)

    # gravity alignment: world z must be up (estimated biases small)
    bs = np.asarray([h.graph.coupled.state.bs[k] for k in range(t1)])
    assert np.all(np.abs(bs) < 0.2), bs.max()

    # scale: disparity of the plane should match metric truth closely
    gt0 = np.asarray(gt_disps[gt_ids[t1 - 2]])
    est0 = np.asarray(h.video.disps[t1 - 2])
    ratio = np.median(est0 / gt0)
    assert 0.8 < ratio < 1.25, ratio


def test_coupled_hessian_matches_native_ba(rng):
    """Solving the reduced camera system through the factor graph (with the
    camera<->body conversion, Tbc=I) must reproduce the native BA step."""
    from tests.test_dba import make_problem

    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(rng, P=4)
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]
    xi = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, dtype=jnp.float32)
    poses = lie.se3_retr(poses_gt, xi)
    disps = disps_gt
    eta = jnp.full((P, ht * wd), 1e-4, dtype=jnp.float32)
    mask = jnp.ones(ii.shape, dtype=bool)

    S, v = dba.coupled_hessian(
        poses, disps, intr, targets, weights, eta, ii, jj, mask, jnp.asarray(P)
    )
    H = np.asarray(S, dtype=np.float64)
    vv = np.asarray(v, dtype=np.float64)

    # native damped solve in camera coords
    lm_damp, ep = 1e-4, 0.1
    Hd = H + np.diag(ep + lm_damp * np.diag(H))
    dx_cam_ref = np.linalg.solve(Hd, vv)

    # factor-graph path: convert to body frame, solve the quadratic with the
    # same damping, convert back
    Tbc = Pose()  # identity
    Hg, vg = convert_hessian(H, vv, Tbc)
    Hgd = Hg + np.diag(ep + lm_damp * np.diag(Hg))
    dx_body = np.linalg.solve(Hgd, vg)
    dx_cam = convert_dx(dx_body, Tbc)
    np.testing.assert_allclose(dx_cam, dx_cam_ref, atol=1e-8)

    # retraction consistency: coupled_retract with dx matches dba.ba's own
    # step when the EvT quirk row coincides (nfixed=0)
    out = dba.coupled_retract(
        poses, disps, intr, targets, weights, eta, ii, jj, mask,
        jnp.asarray(P), jnp.asarray(dx_cam_ref.reshape(P, 6), jnp.float32),
    )
    assert np.all(np.isfinite(np.asarray(out[0])))
    assert np.all(np.isfinite(np.asarray(out[1])))


@pytest.mark.slow
@pytest.mark.parametrize("rollup", [False, True])
def test_coupled_cull_hysteresis_parity(rollup):
    """Three implementations of the coupled keyframe step must agree
    exactly -- same cull decisions, same keyframes, same trajectory:

    * ``mega``: ONE dispatch/keyframe with the in-kernel cull decision
      (graph.update_coupled_mega / coupled_fused.py gated rounds);
    * ``pack``: two-call flow, host decision from the in-kernel hysteresis
      norms riding the host_pack pull;
    * ``pull``: two-call flow, host decision from a fresh pose pull
      (the ``hyst_norms is None`` fallback, dbaf_frontend.py:319-336).

    With ``rollup=True`` the window shifts mid-run (low rollup_start), so
    the coupled rollup bookkeeping (video/graph/fg-state shifts, moved
    ahead of the update in frontend._update) is validated across all
    three paths too, including the trajectory rows written on rollup
    keyframes.
    """
    n_frames = 26
    imu_rows, poses_at = simulate(n_frames / FPS + 0.5)
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_cw, gt_disps = [], []
    for k in range(n_frames + 1):
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

    def run(variant):
        # rollup variant honors the reference invariant rollup_start -
        # rollup_shift >= active_window (the reference config is 65/30/12;
        # violating it leaves post-roll edges with negative indices)
        cfg = make_cfg(vi_warmup=12, keyframe_thresh=0.05,
                       rollup_start=14 if rollup else 1000,
                       rollup_shift=5,
                       active_window=8 if rollup else 12)
        cfg.sensors.device_solver = True
        cfg.sensors.coupled_mega = variant == "mega"
        # three SYNCHRONOUS implementations must agree exactly; the async
        # pipeline (own parity suite: tests/test_coupled_async.py) would
        # otherwise activate on the mega variant and skew the host mirrors
        cfg.sensors.coupled_async = False
        cfg.frontend.translation_threshold = 0.35  # triggers on this scene
        h = MsHarness(cfg, jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr,
                      imu_rows)
        if variant == "pull":
            class _NoHyst(type(h.graph)):
                hyst_norms = property(lambda s: None,
                                      lambda s, v: None)
            h.graph.__class__ = _NoHyst
        kept = []
        for k in range(n_frames):
            h.feed(k)
            kept.append(h.frontend.t1)
        megas = h.graph.mega_count
        rolls = getattr(h.frontend, "rollup_count", 0)
        t1 = h.frontend.t1
        est = np.asarray([h.graph.coupled.state.wTbs[k].t
                          for k in range(t1)])
        stamps = np.asarray(h.video.tstamp[:t1])
        traj = [(t, np.asarray(row)) for t, row in h.frontend.trajectory]
        return kept, stamps, est, megas, traj, rolls

    kept_m, st_m, est_m, megas, traj_m, rolls = run("mega")
    kept_f, st_f, est_f, _, traj_f, _ = run("pack")
    kept_h, st_h, est_h, _, traj_h, _ = run("pull")
    assert megas > 5, megas                      # the mega path actually ran
    if rollup:
        assert rolls > 0, "scenario never rolled up"
    assert kept_m == kept_f == kept_h            # identical cull decisions
    np.testing.assert_array_equal(st_m, st_f)    # identical keyframes
    np.testing.assert_array_equal(st_f, st_h)
    np.testing.assert_allclose(est_m, est_f, atol=1e-5)
    np.testing.assert_allclose(est_f, est_h, atol=1e-5)
    # trajectory rows must match too: the mega kernel snapshots the
    # post-iters1 body pose at decision time (coupled_fused.py decide),
    # the two-call flows write it from the synced host state
    assert len(traj_m) == len(traj_f) == len(traj_h)
    for (tm, rm), (tf, rf), (th, rh) in zip(traj_m, traj_f, traj_h):
        assert tm == tf == th
        np.testing.assert_allclose(rm, rf, atol=1e-5)
        np.testing.assert_allclose(rf, rh, atol=1e-5)
    # the scenario must actually exercise culling for this to mean anything
    assert kept_f[-1] < n_frames - 2, kept_f


@pytest.mark.slow
def test_device_marginalization_matches_host():
    """marginalize_window_device (one dispatch, device-resident marginal)
    must track ground truth as well as the host f64 marginalize_out chain.

    Exact trajectory parity is unattainable: the translation-hysteresis
    cull decisions sit near thresholds, so even a 1e-5 relative marginal
    perturbation flips keyframe counts (measured).  The acceptance is
    accuracy equivalence: both runs' SE3-aligned ATE against ground truth
    must match closely (the dense-form algebra itself is verified exactly
    in tests/test_device_graph.py)."""
    n_frames = 26
    imu_rows, poses_at = simulate(n_frames / FPS + 0.5)
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_cw, gt_disps = [], []
    for k in range(n_frames + 1):
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

    def run(device_marg):
        cfg = make_cfg(vi_warmup=12, keyframe_thresh=-1.0, rollup_start=1000)
        cfg.sensors.device_solver = True
        cfg.sensors.device_marg = device_marg
        h = MsHarness(cfg, jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr,
                      imu_rows)
        dev_margs = 0
        for k in range(n_frames):
            h.feed(k)
            dev_margs += h.graph.coupled._marg_dev is not None
        t1 = h.frontend.t1
        est = np.asarray([h.graph.coupled.state.wTbs[k].t
                          for k in range(t1)])
        gt_ids = np.round(h.video.tstamp[:t1] * FPS).astype(int)
        ref = np.stack([poses_at[g][1] for g in gt_ids])
        bs = np.asarray([h.graph.coupled.state.bs[k] for k in range(t1)])
        return ate_rmse(est, ref, align="se3"), bs, dev_margs, t1

    ate_d, bs_d, n_dev, t1_d = run(True)
    ate_h, bs_h, n_host, t1_h = run(False)
    assert n_dev > 5, n_dev      # the device path actually ran
    assert n_host == 0, n_host
    assert abs(t1_d - t1_h) <= 2, (t1_d, t1_h)
    span = 2.2  # scene extent (see traj above)
    assert ate_d < max(1.3 * ate_h, ate_h + 0.005 * span), (ate_d, ate_h)
    assert np.all(np.abs(bs_d) < 0.2), bs_d.max()


def test_traj_rows_gain_ecef_after_gnss_init():
    """Once georeferenced, every trajectory row gets an ECEF position
    (dbaf_frontend.py:270-272: ``p = ten0 + Cen(ten0) @ p_local``)."""
    import types

    from dbaf_tpu.utils import geodesy

    cfg = make_cfg()
    video = DepthVideo(cfg)
    coupled = MultiSensorBA(video, cfg)
    graph = types.SimpleNamespace(coupled=coupled)
    fe = Frontend(video, graph, cfg)

    T = Pose(so3_exp(np.array([0.1, -0.2, 0.3])), np.array([1.0, 2.0, 3.0]))
    fe._write_traj_row(0.5, T)
    assert fe.trajectory_ecef == {}  # not georeferenced yet

    ten0 = geodesy.geodetic_to_ecef(
        np.array([np.deg2rad(30.5), np.deg2rad(114.3), 40.0])
    )
    coupled.ten0 = np.asarray(ten0, float)
    coupled.gnss_init_t1 = 5
    fe._write_traj_row(0.6, T)
    assert set(fe.trajectory_ecef) == {1}
    expect = coupled.ten0 + geodesy.Cen(coupled.ten0) @ T.t
    np.testing.assert_allclose(fe.trajectory_ecef[1], expect, rtol=1e-12)
    # round-trips back to the local frame
    back = geodesy.Cen(coupled.ten0).T @ (fe.trajectory_ecef[1] - coupled.ten0)
    np.testing.assert_allclose(back, T.t, atol=1e-8)

    # the TUM writer accepts the reference's 11-field georeferenced rows
    from dbaf_tpu.eval.traj_io import read_tum, write_tum

    row8 = np.concatenate([[0.5], np.r_[T.t, 0, 0, 0, 1]])
    row11 = np.concatenate([[0.6], np.r_[T.t, 0, 0, 0, 1], expect])
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "traj.txt")
        write_tum(p, [row8, row11])
        lines = open(p).read().strip().splitlines()
    assert len(lines[0].split()) == 8 and len(lines[1].split()) == 11
