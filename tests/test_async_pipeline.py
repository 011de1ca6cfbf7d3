"""Async device-resident pipeline == synchronous pipeline.

Runs the full system twice on the same synthetic scene with an oracle
update operator -- once through the per-keyframe synchronous path, once
through the one-dispatch-per-frame async path -- and asserts the
trajectories match.  The async path must be a pure latency optimization:
identical admission, edge lifecycle, update rounds, and seeding.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dbaf_tpu.ops import lie, projective as pj
from dbaf_tpu.slam.system import DBAFusion
from dbaf_tpu.utils.config import (
    BAConfig, DBAFusionConfig, FrontendConfig, GraphConfig,
)

H8, W8 = 8, 16


def plane_disparity(pose_cw, intr, z0=3.0):
    fx, fy, cx, cy = np.asarray(intr)
    ys, xs = np.meshgrid(np.arange(H8), np.arange(W8), indexing="ij")
    dirs = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, float)], -1
    )
    T = np.asarray(lie.se3_matrix(lie.se3_inv(jnp.asarray(pose_cw))))
    R, t = T[:3, :3], T[:3, 3]
    dir_w = dirs @ R.T
    tz = t[2]
    z = (z0 - tz) / np.maximum(dir_w[..., 2], 1e-3)
    return (1.0 / np.clip(z, 0.5, 50.0)).astype(np.float32)


def make_scene(n, intr, slow=()):
    """Camera path with unit-speed frames; frames in ``slow`` advance by
    2% of a step (near-duplicates -> keyframe-cull candidates)."""
    poses, disps = [], []
    s = 0.0
    for k in range(n):
        if k:
            s += 0.02 if k in slow else 1.0
        a = 0.04 * s
        xi = np.array([
            0.08 * s, 0.05 * np.sin(3 * a), 0.02 * s,
            0.02 * np.sin(2 * a), 0.03 * np.cos(a), 0.01 * a,
        ])
        Twc = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
        pose_cw = np.asarray(lie.se3_inv(jnp.asarray(Twc)))
        poses.append(pose_cw)
        disps.append(plane_disparity(pose_cw, intr))
    return np.stack(poses).astype(np.float32), np.stack(disps)


def make_fns(gt_poses, gt_disps, intr, buffer):
    gtp = jnp.asarray(gt_poses)
    gtd = jnp.asarray(gt_disps)
    intr8 = jnp.asarray(intr, jnp.float32)
    id_map = jnp.arange(buffer, dtype=jnp.int32)  # no cull/rollup: slot==id

    def update_fn(net, inp, corr, motn, ii, jj, aux):
        zeros = jnp.zeros(net.shape[:-1] + (2,), jnp.float32)
        if "coords1" not in aux:
            return net, zeros, zeros  # motion-gate probe (admission forced)
        gi = id_map[jnp.clip(ii, 0, gtp.shape[0] - 1)]
        gj = id_map[jnp.clip(jj, 0, gtp.shape[0] - 1)]
        target, valid = pj.projective_transform(gtp, gtd, intr8, gi, gj)
        delta = target - aux["coords1"]
        weight = jnp.broadcast_to(valid, delta.shape)
        return net, delta.astype(jnp.float32), weight.astype(jnp.float32)

    def feat_fn(img):
        x = img[:, ::8, ::8, :].astype(jnp.float32) / 255.0
        return jnp.tile(x[..., :1], (1, 1, 1, 128)).astype(jnp.bfloat16)

    def ctx_fn(img):
        f = feat_fn(img)
        return f, f

    return feat_fn, ctx_fn, update_fn


def make_cfg(async_on, keyframe_thresh=-1.0):
    return DBAFusionConfig(
        image_size=(8 * H8, 8 * W8),
        buffer=24,
        graph=GraphConfig(
            max_factors=20, edge_capacity=24, inactive_capacity=24,
            frontend_window=5, frontend_radius=2, frontend_nms=1,
            frontend_thresh=20.0, max_age=10, inac_range=3,
            far_threshold=-1.0, mask_threshold=-1.0,
        ),
        frontend=FrontendConfig(
            warmup=8, keyframe_thresh=keyframe_thresh, filter_thresh=-1.0,
            iters1=2, iters2=1, init_iters=4,
            rollup_start=1000, rollup_shift=8, active_window=12,
            async_pipeline=async_on,
        ),
        ba=BAConfig(window=24, iters=2),
    )


def run(async_on, n_frames=16, keyframe_thresh=-1.0, slow=(),
        rollup=None):
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], np.float32)
    gt_poses, gt_disps = make_scene(n_frames, intr, slow=slow)
    cfg = make_cfg(async_on, keyframe_thresh)
    if rollup is not None:
        cfg.frontend.rollup_start, cfg.frontend.rollup_shift = rollup
    feat_fn, ctx_fn, update_fn = make_fns(gt_poses, gt_disps, intr, cfg.buffer)
    sysm = DBAFusion(
        cfg, feat_fn=feat_fn, ctx_fn=ctx_fn, update_fn=update_fn
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 255, size=(n_frames, 8 * H8, 8 * W8, 3)
    ).astype(np.uint8)
    intr_full = np.asarray([16.0 * 8, 16.0 * 8, W8 * 4, H8 * 4], np.float32)
    for k in range(n_frames):
        sysm.track(float(k), frames[k], intrinsics=intr_full)
    if async_on:
        assert sysm._async is not None and (
            sysm._async.active or sysm._async.t1_mirror > 0
        ), "async pipeline never engaged"
        sysm._async.sync()
    sysm.frontend._resolve_pending()
    t1 = sysm.frontend.t1
    poses = np.asarray(sysm.video.poses[:t1])
    g = sysm.graph
    return (
        poses, np.asarray(g.ii), np.asarray(g.jj), np.asarray(g.age),
        t1, np.asarray(sysm.video.tstamp[:t1]),
    )


def test_async_matches_sync():
    p_sync, ii_s, jj_s, age_s, t1_s, ts_s = run(False)
    p_async, ii_a, jj_a, age_a, t1_a, ts_a = run(True)
    assert p_sync.shape == p_async.shape
    np.testing.assert_array_equal(ii_a, ii_s)
    np.testing.assert_array_equal(jj_a, jj_s)
    np.testing.assert_array_equal(age_a, age_s)
    np.testing.assert_allclose(p_async, p_sync, atol=1e-4)


@pytest.mark.slow
def test_async_matches_sync_with_culls():
    """Keyframe culls (keyframe_thresh >= 0) run in-kernel on the async
    path (deferred prev_cull); the result must bit-match the synchronous
    rm_keyframe flow -- t1, keyframe timestamps, edge stores, poses."""
    kw = dict(n_frames=18, keyframe_thresh=0.12, slow=(10, 11, 14))
    p_s, ii_s, jj_s, age_s, t1_s, ts_s = run(False, **kw)
    p_a, ii_a, jj_a, age_a, t1_a, ts_a = run(True, **kw)
    assert t1_s < 18, "scene produced no culls; test is vacuous"
    assert t1_a == t1_s
    np.testing.assert_array_equal(ts_a, ts_s)
    np.testing.assert_array_equal(ii_a, ii_s)
    np.testing.assert_array_equal(jj_a, jj_s)
    np.testing.assert_array_equal(age_a, age_s)
    np.testing.assert_allclose(p_a, p_s, atol=1e-4)


@pytest.mark.slow
def test_async_matches_sync_with_rollups():
    """Rollup runs in-kernel on the async path (VERDICT r3 item 2): the
    pipeline must NOT drain, and the result must bit-match the
    synchronous host-rollup flow across >= 2 rollups."""
    kw = dict(n_frames=26, rollup=(14, 4))
    p_s, ii_s, jj_s, age_s, t1_s, ts_s = run(False, **kw)
    p_a, ii_a, jj_a, age_a, t1_a, ts_a = run(True, **kw)
    assert t1_a == t1_s
    np.testing.assert_array_equal(ts_a, ts_s)
    np.testing.assert_array_equal(ii_a, ii_s)
    np.testing.assert_array_equal(jj_a, jj_s)
    np.testing.assert_array_equal(age_a, age_s)
    np.testing.assert_allclose(p_a, p_s, atol=1e-4)


def test_async_matches_sync_with_culls_and_rollups():
    """Culls and rollups interleaved, both resolved in-kernel."""
    kw = dict(n_frames=28, keyframe_thresh=0.12, slow=(10, 11, 16, 21),
              rollup=(14, 4))
    p_s, ii_s, jj_s, age_s, t1_s, ts_s = run(False, **kw)
    p_a, ii_a, jj_a, age_a, t1_a, ts_a = run(True, **kw)
    assert t1_s < 28, "scene produced no culls; test is vacuous"
    assert t1_a == t1_s
    np.testing.assert_array_equal(ts_a, ts_s)
    np.testing.assert_array_equal(ii_a, ii_s)
    np.testing.assert_array_equal(jj_a, jj_s)
    np.testing.assert_array_equal(age_a, age_s)
    np.testing.assert_allclose(p_a, p_s, atol=1e-4)


def test_async_rollup_stays_in_pipeline():
    """Crossing rollup_start rolls in-kernel: the pipeline must stay
    active across the rollup (no drain/re-enter)."""
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], np.float32)
    n_frames = 22
    gt_poses, gt_disps = make_scene(n_frames, intr)
    cfg = make_cfg(True)
    cfg.frontend.rollup_start = 14
    cfg.frontend.rollup_shift = 4
    feat_fn, ctx_fn, update_fn = make_fns(gt_poses, gt_disps, intr, cfg.buffer)
    sysm = DBAFusion(cfg, feat_fn=feat_fn, ctx_fn=ctx_fn, update_fn=update_fn)
    rng = np.random.default_rng(1)
    frames = rng.integers(
        0, 255, size=(n_frames, 8 * H8, 8 * W8, 3)
    ).astype(np.uint8)
    intr_full = np.asarray([128.0, 128.0, W8 * 4, H8 * 4], np.float32)
    for k in range(n_frames):
        sysm.track(float(k), frames[k], intrinsics=intr_full)
    a = sysm._async
    assert a is not None and a.active
    a.sync()
    assert sysm.frontend.rollup_count >= 1, "no in-kernel rollup fired"
    t1 = sysm.frontend.t1
    # rollup happened: t1 stayed below the trigger + in-flight slack
    assert t1 <= cfg.frontend.rollup_start + a.lag + 1
    g = sysm.graph
    assert len(g.ii) > 0 and np.all(g.ii < t1) and np.all(g.jj < t1)
    assert np.all(np.isfinite(np.asarray(sysm.video.poses[:t1])))
