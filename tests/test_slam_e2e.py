"""End-to-end streaming SLAM test on a synthetic consistent scene.

A planar world viewed from a smooth trajectory gives multi-view-consistent
ground-truth disparities; an oracle update operator (a 'perfect network'
returning true correspondences) drives the full machinery: keyframe store,
covisibility graph, fused update kernel, dense BA, culling, rollup.  This is
the 'fake backend' e2e strategy SURVEY.md section 4 calls for.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbaf_tpu.eval.ate import ate_rmse
from dbaf_tpu.ops import lie, projective as pj
from dbaf_tpu.slam.frontend import Frontend
from dbaf_tpu.slam.graph import CovisibleGraph
from dbaf_tpu.slam.video import DepthVideo
from dbaf_tpu.utils.config import (
    BAConfig,
    DBAFusionConfig,
    FrontendConfig,
    GraphConfig,
)

H8, W8 = 8, 16


def plane_disparity(pose_wc, intr, z0=3.0):
    """Ground-truth disparity of the plane world z=z0 for a world->cam pose."""
    fx, fy, cx, cy = intr
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(pose_wc[3:])))
    t = pose_wc[:3]
    u, v = np.meshgrid(np.arange(W8), np.arange(H8), indexing="xy")
    dirs = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u, dtype=float)], -1)
    dir_w = dirs @ R  # R^T dir
    tz = (R.T @ t)[2]
    z = (z0 + tz) / dir_w[..., 2]
    return (1.0 / z).astype(np.float32)


def make_scene(n_frames, intr, times=None):
    """Smooth forward+lateral trajectory looking at the plane.

    ``times`` (optional) gives each frame's virtual time; compressing the
    spacing slows the camera down over those frames without changing the
    shape of the path (used to provoke deterministic keyframe culls).
    """
    poses = []
    ts = np.arange(n_frames, dtype=float) if times is None else times
    for k in ts:
        a = 0.04 * k
        xi = np.array([
            0.08 * k, 0.05 * np.sin(a * 3), 0.02 * k,   # translation
            0.02 * np.sin(a * 2), 0.03 * np.cos(a), 0.01 * a,  # rotation
        ])
        Twc = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
        poses.append(np.asarray(lie.se3_inv(jnp.asarray(Twc))))  # world->cam
    poses = np.stack(poses).astype(np.float32)
    disps = np.stack([plane_disparity(p, intr) for p in poses])
    return poses, disps


def make_cfg(**fe_overrides):
    fe = dict(
        warmup=8, keyframe_thresh=-1.0, filter_thresh=0.0,
        iters1=2, iters2=1, init_iters=4, rollup_start=1000, rollup_shift=8,
        active_window=12,
    )
    fe.update(fe_overrides)
    return DBAFusionConfig(
        image_size=(8 * H8, 8 * W8),
        buffer=48,
        graph=GraphConfig(
            max_factors=40, edge_capacity=72, inactive_capacity=72,
            frontend_window=5, frontend_radius=2, frontend_nms=1,
            frontend_thresh=20.0, max_age=25, inac_range=3,
            far_threshold=-1.0, mask_threshold=-1.0,
        ),
        frontend=FrontendConfig(**fe),
        ba=BAConfig(window=32, iters=2),
    )


def make_oracle(gt_poses, gt_disps, intr, id_map_ref):
    """'Perfect network': returns true correspondence deltas and weight 1.

    id_map_ref is a mutable holder mapping video slot -> gt frame id; since
    jit bakes closures, the map is passed via aux instead when it changes.
    """
    gtp = jnp.asarray(gt_poses)
    gtd = jnp.asarray(gt_disps)
    intr8 = jnp.asarray(intr, dtype=jnp.float32)

    def update_fn(net, inp, corr, motn, ii, jj, aux):
        id_map = aux["id_map"]
        gi = id_map[ii]
        gj = id_map[jj]
        target, valid = pj.projective_transform(gtp, gtd, intr8, gi, gj)
        delta = target - aux["coords1"]
        weight = jnp.broadcast_to(valid, delta.shape)
        return net, delta.astype(jnp.float32), weight.astype(jnp.float32)

    return update_fn


class Harness:
    """Feeds synthetic keyframes directly (bypassing the motion filter)."""

    def __init__(self, cfg, gt_poses, gt_disps, intr):
        self.cfg = cfg
        self.video = DepthVideo(cfg)
        self.id_map = np.zeros(cfg.buffer, dtype=np.int32)
        oracle = make_oracle(gt_poses, gt_disps, intr, self)
        self.graph = CovisibleGraph(self.video, oracle, cfg)
        self.frontend = Frontend(self.video, self.graph, cfg)
        self.intr8 = jnp.asarray(intr, dtype=jnp.float32)
        h8, w8 = self.video.h8, self.video.w8
        self.zeros_feat = jnp.zeros((h8, w8, 128), dtype=jnp.bfloat16)

    def feed(self, gt_id: float):
        idx = self.video.counter
        self.video.append(
            float(gt_id), None, None, None, None, self.intr8,
            self.zeros_feat, self.zeros_feat, self.zeros_feat,
        )
        self.id_map[idx] = gt_id
        self.graph.aux = {"id_map": jnp.asarray(self.id_map)}
        self.frontend()
        # track cull/rollup bookkeeping: keep id_map aligned with tstamps
        self.id_map[: self.video.counter] = np.round(
            self.video.tstamp[: self.video.counter]
        ).astype(np.int32)
        self.graph.aux = {"id_map": jnp.asarray(self.id_map)}


def run_system(n_frames, cfg):
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_poses, gt_disps = make_scene(n_frames, intr)
    h = Harness(cfg, gt_poses, gt_disps, intr)
    for k in range(n_frames):
        h.feed(k)
    return h, gt_poses


@pytest.mark.slow
def test_e2e_visual_only_converges():
    n = 14
    h, gt_poses = run_system(n, make_cfg())
    assert h.frontend.is_initialized
    t1 = h.frontend.t1
    assert t1 >= 10

    est = np.asarray(
        [np.asarray(lie.se3_inv(h.video.poses[k])[:3]) for k in range(t1)]
    )
    gt_ids = np.round(h.video.tstamp[:t1]).astype(int)
    ref = np.stack(
        [np.asarray(lie.se3_inv(jnp.asarray(gt_poses[g]))[:3]) for g in gt_ids]
    )
    rmse = ate_rmse(est, ref, align="sim3")
    span = np.linalg.norm(ref.max(0) - ref.min(0))
    assert rmse < 0.05 * span, (rmse, span)


@pytest.mark.slow
def test_stereo_mode_runs_with_self_edges():
    """Stereo rig wiring: right-feature buffer + (i,i) self-edges flow
    through the kernel (the depth terms of stereo edges anchor scale)."""
    cfg = make_cfg()
    cfg = dataclasses.replace(cfg, stereo=True)
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_poses, gt_disps = make_scene(12, intr)
    h = Harness(cfg, jnp.asarray(gt_poses), jnp.asarray(gt_disps), intr)
    for k in range(12):
        idx = h.video.counter
        h.video.append(
            float(k), None, None, None, None, h.intr8,
            h.zeros_feat, h.zeros_feat, h.zeros_feat,
            fmap_right=h.zeros_feat,
        )
        h.id_map[idx] = k
        h.graph.aux = {"id_map": jnp.asarray(h.id_map)}
        h.frontend()
        h.id_map[: h.video.counter] = np.round(
            h.video.tstamp[: h.video.counter]
        ).astype(np.int32)
        h.graph.aux = {"id_map": jnp.asarray(h.id_map)}
    assert h.frontend.is_initialized
    assert np.any(h.graph.ii == h.graph.jj), "no stereo self-edges"
    assert np.all(np.isfinite(np.asarray(h.video.poses[: h.frontend.t1])))


@pytest.mark.slow
def test_rgbd_depth_anchors_metric_scale():
    """With sensor depth attached, the DBA depth prior must hold the
    reconstruction at metric scale (no sim3 gauge freedom)."""
    cfg = make_cfg()
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    n = 14
    gt_poses, gt_disps = make_scene(n, intr)
    h = Harness(cfg, jnp.asarray(gt_poses), jnp.asarray(gt_disps), intr)
    for k in range(n):
        idx = h.video.counter
        depth_full = np.zeros((8 * H8, 8 * W8), dtype=np.float32)
        depth_full[3::8, 3::8] = 1.0 / gt_disps[k]
        h.video.append(
            float(k), None, None, None, jnp.asarray(depth_full), h.intr8,
            h.zeros_feat, h.zeros_feat, h.zeros_feat,
        )
        h.id_map[idx] = k
        h.graph.aux = {"id_map": jnp.asarray(h.id_map)}
        h.frontend()
        h.id_map[: h.video.counter] = np.round(
            h.video.tstamp[: h.video.counter]
        ).astype(np.int32)
        h.graph.aux = {"id_map": jnp.asarray(h.id_map)}

    assert h.video.has_depth
    t1 = h.frontend.t1
    est = np.asarray(h.video.disps[1 : t1 - 1])
    ref = gt_disps[1 : t1 - 1]
    ratio = np.median(est / ref)
    assert 0.9 < ratio < 1.1, ratio


def test_save_load_state_roundtrip(tmp_path):
    """Checkpoint/resume: a saved system continues tracking identically."""
    import pickle

    cfg = make_cfg()
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_poses, gt_disps = make_scene(16, intr)
    h = Harness(cfg, jnp.asarray(gt_poses), jnp.asarray(gt_disps), intr)
    for k in range(12):
        h.feed(k)

    # snapshot via the system API surface (harness mirrors DBAFusion attrs)
    from dbaf_tpu.slam.system import DBAFusion

    sys_like = DBAFusion.__new__(DBAFusion)
    sys_like.video, sys_like.graph, sys_like.frontend = (
        h.video, h.graph, h.frontend
    )
    path = str(tmp_path / "state.pkl")
    sys_like.save_state(path)

    poses_before = np.asarray(h.video.poses[: h.frontend.t1])
    for k in range(12, 16):
        h.feed(k)
    poses_after_a = np.asarray(h.video.poses[: h.frontend.t1])

    # restore into a fresh harness and continue
    h2 = Harness(cfg, jnp.asarray(gt_poses), jnp.asarray(gt_disps), intr)
    sys_like2 = DBAFusion.__new__(DBAFusion)
    sys_like2.video, sys_like2.graph, sys_like2.frontend = (
        h2.video, h2.graph, h2.frontend
    )
    sys_like2.load_state(path)
    np.testing.assert_allclose(
        np.asarray(h2.video.poses[: h2.frontend.t1]), poses_before, atol=1e-6
    )
    h2.id_map[: h2.video.counter] = np.round(
        h2.video.tstamp[: h2.video.counter]
    ).astype(np.int32)
    for k in range(12, 16):
        h2.feed(k)
    poses_after_b = np.asarray(h2.video.poses[: h2.frontend.t1])
    np.testing.assert_allclose(poses_after_b, poses_after_a, atol=1e-4)


def test_run_upsample_updates_damping_and_disps_up():
    cfg = dataclasses.replace(make_cfg(), upsample=True)
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_poses, gt_disps = make_scene(10, intr)
    h = Harness(cfg, jnp.asarray(gt_poses), jnp.asarray(gt_disps), intr)
    for k in range(9):
        h.feed(k)
    assert h.graph.n > 0

    def dummy_agg(net, ii, num_frames):
        eta = 0.5 * jnp.ones((num_frames, H8, W8), jnp.float32)
        upmask = jnp.zeros((num_frames, H8, W8, 576), jnp.float32)
        # uniform mask -> upsampled value = 3x3 local average
        return eta, upmask

    h.graph.run_upsample(dummy_agg)
    frames = np.unique(h.graph.ii)
    damp = np.asarray(h.video.damping)
    assert np.allclose(damp[frames], 0.5, atol=1e-5)
    up = np.asarray(h.video.disps_up)
    assert up.shape == (cfg.buffer, 8 * H8, 8 * W8)
    assert np.any(up[frames] > 0)


@pytest.mark.slow
def test_e2e_with_culling_and_rollup():
    # trigger culls (large keyframe_thresh culls slow-motion frames) and a
    # rollup (low rollup_start)
    cfg = make_cfg(keyframe_thresh=0.4, rollup_start=12, rollup_shift=4)
    n = 20
    # virtual-time schedule: full-speed frames move ~1 unit apart (flow well
    # above the 0.4 px cull threshold); frames 10-13 advance at 10% speed
    # (flow ~0.04 px, far below it) -> those culls are DETERMINISTIC, no
    # marginal threshold decisions that a reduction-order flip could change.
    speeds = np.where((np.arange(n) >= 10) & (np.arange(n) < 14), 0.1, 1.0)
    times = np.concatenate([[0.0], np.cumsum(speeds[1:])])
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_poses, gt_disps = make_scene(n, intr, times=times)
    h = Harness(cfg, gt_poses, gt_disps, intr)
    for k in range(n):
        h.feed(k)
    assert h.frontend.is_initialized
    t1 = h.frontend.t1
    gt_ids = np.round(h.video.tstamp[:t1]).astype(int)
    # the scenario must exercise BOTH mechanisms.  Rollup removes a prefix
    # of keyframes; culls leave *gaps* in the surviving gt-id sequence.
    assert h.frontend.rollup_count >= 1
    assert np.any(np.diff(gt_ids) > 1), gt_ids
    # accuracy is evaluated against GT at the SURVIVING keyframes, so which
    # marginal frames get culled cannot loosen the bound: the live window
    # must track GT to the same standard as the multisensor long-run test.
    est = np.asarray(
        [np.asarray(lie.se3_inv(h.video.poses[k])[:3]) for k in range(t1)]
    )
    ref = np.stack(
        [np.asarray(lie.se3_inv(jnp.asarray(gt_poses[g]))[:3]) for g in gt_ids]
    )
    rmse = ate_rmse(est, ref, align="sim3")
    span = np.linalg.norm(ref.max(0) - ref.min(0))
    assert rmse < 0.08 * span, (rmse, span)
    assert np.all(np.isfinite(np.asarray(h.video.disps[:t1])))


@pytest.mark.slow
@pytest.mark.parametrize("lm_iters", [2, 1])
def test_long_run_multisensor_stays_bounded(lm_iters):
    """Long-run accuracy regression for the coupled stack on the
    eval-infrastructure scene (dbaf_tpu/eval/synthetic.py).

    Guards two failure modes found in round 3: (a) a VI init whose scale
    signal (0.5*a*dt^2 per interval) sits below the visual noise floor
    produces a ~40% scale error that the marginal prior then bakes in
    until the solver blows up ~25 keyframes later (ATE was 72% of span at
    34 frames with the old low-frequency excitation); (b) any future
    marginalization/cull regression that only manifests beyond the ~26
    frames the older e2e tests cover.

    Parametrized over the coupled LM-pass count: 2 is the reference
    structure and the config default; 1 is the TUM-VI preset's
    throughput point (docs/ABLATION_LM.md) and must stay bounded too.
    The lm_iters=1 leg runs the device solver (the flagship/bench
    configuration the preset targets)."""
    from dbaf_tpu.apps.demo_synthetic import main as demo_main

    args = ["--frames", "34", "--multisensor", "--lm-iters", str(lm_iters)]
    if lm_iters == 1:
        args.append("--device-solver")
    res = demo_main(args)
    assert res["imu_enabled"]
    assert res["keyframes"] >= 14
    assert res["ate_pct_of_span"] < 8.0, res
