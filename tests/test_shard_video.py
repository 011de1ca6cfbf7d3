"""Keyframe-sharded DepthVideo buffers (cfg.shard_video, SURVEY.md 2.9):
the full fused update kernel and the coupled keyframe must produce the
same trajectories with the feature buffers distributed over the 8-device
mesh as on a single device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbaf_tpu.slam.frontend import Frontend
from dbaf_tpu.slam.graph import CovisibleGraph
from dbaf_tpu.slam.video import DepthVideo

from test_slam_e2e import H8, W8, make_cfg, make_oracle, make_scene


def corr_sensitive(base_fn):
    """Wrap the oracle so the update depends on the correlation values:
    the fmaps gathers + corr lookup on the sharded buffers then actually
    influence the trajectory (zero features would make the corr path
    dead code for the equivalence check)."""

    def fn(net, inp, corr, motn, ii, jj, aux):
        net2, delta, weight = base_fn(net, inp, corr, motn, ii, jj, aux)
        bump = 0.05 * jnp.tanh(
            jnp.mean(corr.astype(jnp.float32), axis=-1, keepdims=True)
        )
        return net2, delta + bump, weight

    return fn


class FeatHarness:
    """test_slam_e2e.Harness with per-frame pseudorandom features."""

    def __init__(self, cfg, gt_poses, gt_disps, intr):
        self.cfg = cfg
        self.video = DepthVideo(cfg)
        self.id_map = np.zeros(cfg.buffer, dtype=np.int32)
        oracle = corr_sensitive(make_oracle(gt_poses, gt_disps, intr, self))
        self.graph = CovisibleGraph(self.video, oracle, cfg)
        self.frontend = Frontend(self.video, self.graph, cfg)
        self.intr8 = jnp.asarray(intr, dtype=jnp.float32)
        h8, w8 = self.video.h8, self.video.w8
        rng = np.random.default_rng(7)
        self.feats = jnp.asarray(
            rng.standard_normal((40, h8, w8, 128)), jnp.bfloat16
        )

    def feed(self, gt_id: int):
        idx = self.video.counter
        f = self.feats[gt_id % self.feats.shape[0]]
        self.video.append(
            float(gt_id), None, None, None, None, self.intr8, f, f, f
        )
        self.id_map[idx] = gt_id
        self.graph.aux = {"id_map": jnp.asarray(self.id_map)}
        self.frontend()
        self.id_map[: self.video.counter] = np.round(
            self.video.tstamp[: self.video.counter]
        ).astype(np.int32)
        self.graph.aux = {"id_map": jnp.asarray(self.id_map)}


def _run_visual(shard: bool, n=14):
    intr = np.asarray([16.0, 16.0, W8 / 2, H8 / 2], dtype=np.float32)
    gt_poses, gt_disps = make_scene(n, intr)
    cfg = make_cfg()
    cfg.shard_video = shard
    h = FeatHarness(cfg, gt_poses, gt_disps, intr)
    for k in range(n):
        h.feed(k)
    t1 = h.frontend.t1
    return np.asarray(h.video.poses[:t1]), np.asarray(h.video.disps[:t1])


@pytest.mark.slow
def test_shard_video_visual_equivalence():
    """Full fused update kernel with kf-sharded fmaps/nets/inps over the
    8-device mesh == single-device, through a corr-sensitive update."""
    assert jax.device_count() >= 8, jax.devices()
    p0, d0 = _run_visual(False)
    p1, d1 = _run_visual(True)
    np.testing.assert_allclose(p1, p0, atol=1e-5)
    np.testing.assert_allclose(d1, d0, atol=1e-4)


@pytest.mark.slow
def test_shard_video_coupled_equivalence():
    """Coupled multi-sensor keyframes (device solver + fused mega kernel)
    with kf-sharded buffers == single-device trajectories."""
    from test_slam_multisensor import (
        FPS, MsHarness, make_cfg as ms_make_cfg, plane_disparity, simulate,
    )
    from dbaf_tpu.ops import lie

    assert jax.device_count() >= 8

    n_frames = 20
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
    gt_cw = jnp.asarray(np.stack(gt_cw).astype(np.float32))
    gt_disps = jnp.asarray(np.stack(gt_disps).astype(np.float32))

    def run(shard: bool):
        cfg = ms_make_cfg(vi_warmup=12, keyframe_thresh=-1.0,
                          rollup_start=1000)
        cfg.sensors.device_solver = True
        cfg.sensors.coupled_mega = True
        cfg.shard_video = shard
        h = MsHarness(cfg, gt_cw, gt_disps, intr, imu_rows.copy())
        for k in range(n_frames):
            h.feed(k)
        assert h.video.imu_enabled
        assert h.graph.mega_count > 0, "fused coupled keyframes did not run"
        t1 = h.frontend.t1
        est = np.asarray(
            [h.graph.coupled.state.wTbs[k].t for k in range(t1)]
        )
        return est, np.asarray(h.video.disps[:t1])

    e0, d0 = run(False)
    e1, d1 = run(True)
    np.testing.assert_allclose(e1, e0, atol=1e-5)
    np.testing.assert_allclose(d1, d0, atol=1e-4)
