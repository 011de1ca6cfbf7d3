"""Verify drive: full coupled multisensor SLAM on the REAL TPU.

Runs the synthetic multisensor scenario end-to-end (VI initialization ->
tightly-coupled tracking through the fused mega keyframe step, with real
in-kernel cull decisions) and checks metric ATE.  Usage:

    python tools/verify_coupled.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                + "/tests")

from dbaf_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_slam_e2e import H8, W8, make_cfg, plane_disparity  # noqa: E402
from tests.test_slam_multisensor import FPS, MsHarness, simulate  # noqa: E402
from dbaf_tpu.ops import lie  # noqa: E402
from dbaf_tpu.eval.ate import ate_rmse  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
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

    # culling config so the in-kernel cull decision actually fires
    cfg = make_cfg(vi_warmup=12, keyframe_thresh=0.05, rollup_start=1000)
    cfg.sensors.device_solver = True
    cfg.frontend.translation_threshold = 0.35
    h = MsHarness(cfg, jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr,
                  imu_rows)
    t0 = time.time()
    for k in range(n_frames):
        h.feed(k)
    print(f"fed {n_frames} frames in {time.time() - t0:.1f}s", flush=True)
    t1 = h.frontend.t1
    assert h.video.imu_enabled, "VI init did not trigger"
    assert h.graph.mega_count > 3, \
        f"mega path did not run ({h.graph.mega_count})"
    est = np.asarray([h.graph.coupled.state.wTbs[k].t for k in range(t1)])
    gt_ids = np.round(np.asarray(h.video.tstamp[:t1]) * FPS).astype(int)
    ref = np.stack([poses_at[g][1] for g in gt_ids])
    rmse = ate_rmse(est, ref, align="se3")
    span = np.linalg.norm(ref.max(0) - ref.min(0))
    culled = n_frames - 1 - t1
    print(f"t1={t1} culled={culled} mega_steps={h.graph.mega_count} "
          f"ATE={rmse:.4f} span={span:.2f} (ratio {rmse / span:.3f})",
          flush=True)
    assert culled > 0, "cull decision never fired"
    assert rmse < 0.08 * span, (rmse, span)
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
