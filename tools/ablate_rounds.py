"""Round-count/quality ablation for the visual keyframe step (VERDICT r3
item 5; reference operating point iters1=4/iters2=2,
/root/reference/dbaf/dbaf_frontend.py:57-64 + demo flags).

Two measurements per (iters1, iters2) configuration:

  accuracy  : ATE (% of span) of the full visual system on the synthetic
              scene, with the exact oracle AND a noisy oracle
              (noise_px=0.75 -- the imperfect-network regime where round
              count matters: each extra round re-solves the BA against a
              fresh noise draw, so fewer rounds track the last draw more).
              Runs on CPU (accuracy is platform-independent).
  ms/kf     : steady-state wall per keyframe of the async visual pipeline
              at the bench operating point on the REAL TPU.  Round counts
              are traced, so one warmed system serves every config.

Usage:
  python tools/ablate_rounds.py accuracy   # CPU part
  python tools/ablate_rounds.py speed      # TPU part
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [(4, 2), (3, 2), (3, 1), (2, 2), (2, 1)]


def accuracy():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dbaf_tpu.eval.ate import ate_rmse
    from dbaf_tpu.eval.synthetic import (
        make_oracle, scene_from_poses, simulate_imu_and_poses,
    )
    from dbaf_tpu.ops import lie_np
    from dbaf_tpu.slam.frontend import Frontend
    from dbaf_tpu.slam.graph import CovisibleGraph
    from dbaf_tpu.slam.video import DepthVideo
    from dbaf_tpu.utils.config import (
        BAConfig, DBAFusionConfig, FrontendConfig, GraphConfig,
    )

    h8, w8 = 8, 16
    fps = 10.0
    n = 34
    intr = np.asarray([2.0 * w8, 2.0 * w8, w8 / 2, h8 / 2], np.float32)
    imu_rows, poses_at = simulate_imu_and_poses(n / fps + 0.5, fps=fps)
    gt_cw, gt_disps = scene_from_poses(poses_at, n, intr, h8, w8)

    def run(i1, i2, noise_px):
        cfg = DBAFusionConfig(
            image_size=(8 * h8, 8 * w8),
            buffer=48,
            graph=GraphConfig(max_factors=40, edge_capacity=72,
                              inactive_capacity=72, frontend_thresh=20.0),
            frontend=FrontendConfig(
                warmup=8, keyframe_thresh=-1.0, iters1=i1, iters2=i2,
                init_iters=8, rollup_start=24, rollup_shift=8,
                active_window=12,
            ),
            ba=BAConfig(window=32),
        )
        video = DepthVideo(cfg)
        oracle = make_oracle(jnp.asarray(gt_cw), jnp.asarray(gt_disps),
                             intr, noise_px=noise_px)
        graph = CovisibleGraph(video, oracle, cfg)
        frontend = Frontend(video, graph, cfg)
        id_map = np.zeros(cfg.buffer, dtype=np.int32)
        zeros = jnp.zeros((h8, w8, 128), jnp.bfloat16)
        intr8 = jnp.asarray(intr, jnp.float32)
        for k in range(n):
            idx = video.counter
            video.append(k / fps, None, None, None, None, intr8,
                         zeros, zeros, zeros)
            id_map[idx] = k
            graph.aux = {"id_map": jnp.asarray(id_map)}
            frontend()
            id_map[: video.counter] = np.round(
                video.tstamp[: video.counter] * fps
            ).astype(np.int32)
            graph.aux = {"id_map": jnp.asarray(id_map)}
        frontend.drain_async()
        t1 = frontend.t1
        est_cw = np.asarray(video.poses[:t1], np.float64)
        est_wc = lie_np.se3_inv(est_cw)[:, :3]
        gt_ids = np.round(video.tstamp[:t1] * fps).astype(int)
        ref = np.stack([poses_at[g][1] for g in gt_ids])
        span = float(np.linalg.norm(ref.max(0) - ref.min(0)))
        # sim3: monocular visual-only is scale-free
        return ate_rmse(est_wc, ref, align="sim3") / span * 100.0

    print(f"{'cfg':>8s} {'clean %':>9s} {'noisy %':>9s}", flush=True)
    rows = []
    for i1, i2 in CONFIGS:
        clean = run(i1, i2, 0.0)
        noisy = run(i1, i2, 0.75)
        rows.append(dict(iters1=i1, iters2=i2, ate_clean_pct=round(clean, 3),
                         ate_noisy_pct=round(noisy, 3)))
        print(f"  ({i1},{i2}) {clean:9.3f} {noisy:9.3f}", flush=True)
    print(json.dumps(rows), flush=True)


def speed():
    from dbaf_tpu.utils.jax_setup import setup

    setup()
    import jax
    import jax.numpy as jnp

    import bench
    from dbaf_tpu.models import DroidNet
    from dbaf_tpu.slam.system import DBAFusion
    from dbaf_tpu.utils.config import tumvi_config

    HT, WD = bench.HT, bench.WD

    cfg = tumvi_config()
    cfg.frontend.rollup_start = 40
    cfg.frontend.rollup_shift = 15
    cfg.frontend.async_pipeline = True
    cfg.frontend.filter_thresh = -1.0
    cfg.frontend.keyframe_thresh = -1.0
    cfg.ba.window = 48

    model = DroidNet()
    params = bench._make_params(model, jax, jnp)
    rng = np.random.default_rng(0)
    intr = np.asarray([460.0, 460.0, WD / 2, HT / 2], dtype=np.float32)
    base = rng.integers(0, 255, size=(HT + 64, WD + 64, 3)).astype(np.float32)
    frame = lambda k: base[(2 * k) % 64:(2 * k) % 64 + HT,
                           (3 * k) % 64:(3 * k) % 64 + WD]

    system = DBAFusion(cfg, params=params)
    k = 0
    while k < 130 and not (
        system._async is not None and system._async.active
        and system.frontend.rollup_count >= 1
    ):
        system.track(float(k), frame(k), intrinsics=intr)
        k += 1

    def window(n_meas):
        nonlocal k
        jax.block_until_ready(system._async.state["poses"])
        t0 = time.time()
        for _ in range(n_meas):
            system.track(float(k), frame(k), intrinsics=intr)
            k += 1
        jax.block_until_ready(system._async.state["poses"])
        system._async._drain(len(system._async.queue))
        return (time.time() - t0) / n_meas * 1e3

    rows = []
    for i1, i2 in CONFIGS:
        cfg.frontend.iters1, cfg.frontend.iters2 = i1, i2
        window(4)  # settle at the new round count
        ms = window(20)
        rows.append(dict(iters1=i1, iters2=i2, ms_per_kf=round(ms, 2),
                         kf_per_sec=round(1e3 / ms, 2)))
        print(f"  ({i1},{i2}) {ms:8.2f} ms/kf  {1e3 / ms:6.2f} kf/s",
              flush=True)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "accuracy"
    if mode == "accuracy":
        accuracy()
    else:
        speed()
