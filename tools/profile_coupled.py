"""TPU wall-clock of the tightly-coupled keyframe step: host vs device solver.

Runs the synthetic multi-sensor scenario (oracle update operator, so the
visual stages are cheap and the measurement isolates the coupled-solve
round trips) and reports per-keyframe wall time in the coupled regime.

Usage: python tools/profile_coupled.py [host device]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbaf_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                + "/tests")

from tests.test_slam_e2e import H8, W8, make_cfg  # noqa: E402
from tests.test_slam_multisensor import (  # noqa: E402
    FPS, MsHarness, simulate,
)
from dbaf_tpu.ops import lie  # noqa: E402
from tests.test_slam_e2e import plane_disparity  # noqa: E402


STAGES = {}


def _wrap(obj, name, label):
    fn = getattr(obj, name)

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        STAGES.setdefault(label, []).append(time.perf_counter() - t0)
        return out

    setattr(obj, name, wrapped)


LM_STATS = []


def instrument():
    """Per-stage wall timers on the coupled device-solver path."""
    from dbaf_tpu.slam.coupled import MultiSensorBA
    from dbaf_tpu.slam.graph import CovisibleGraph

    _wrap(MultiSensorBA, "prepare_device", "prepare")
    _wrap(MultiSensorBA, "_marginalize", "marginalize")
    _wrap(MultiSensorBA, "sync_host", "sync_host")
    _wrap(CovisibleGraph, "_update_coupled_fused", "fused_total")

    fn = CovisibleGraph._update_coupled_fused

    def wrapped(self, *a, **k):
        out = fn(self, *a, **k)
        if out and self._lm_stats_dev is not None:
            LM_STATS.append(np.asarray(self._lm_stats_dev))
        return out

    CovisibleGraph._update_coupled_fused = wrapped


def report_stages():
    for k, v in sorted(STAGES.items()):
        v = np.asarray(v)
        print(f"  {k:12s} n={len(v):3d} total={v.sum()*1e3:8.1f} ms "
              f"mean={v.mean()*1e3:7.2f} max={v.max()*1e3:7.2f}", flush=True)
    if LM_STATS:
        s = np.concatenate([a.reshape(-1) for a in LM_STATS])
        tot = np.asarray([a.sum() for a in LM_STATS])
        print(f"  lm_iters     per-LM mean={s.mean():5.2f} "
              f"max={s.max()} total/kf mean={tot.mean():6.1f} "
              f"max={tot.max()}", flush=True)
        print(f"  lm_iters     first call: {LM_STATS[0].tolist()} "
              f"last: {LM_STATS[-1].tolist()}", flush=True)


def run(device_solver: bool, n_frames: int = 26,
        device_marg: bool = False) -> float:
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

    cfg = make_cfg(vi_warmup=12, keyframe_thresh=-1.0, rollup_start=1000)
    cfg.sensors.device_solver = device_solver
    cfg.sensors.device_marg = device_marg
    h = MsHarness(cfg, jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr,
                  imu_rows)

    times = []
    for k in range(n_frames):
        t0 = time.perf_counter()
        h.feed(k)
        times.append(time.perf_counter() - t0)
        if h.video.imu_enabled and len(times) > 0:
            pass
    # coupled regime = frames after VI init (imu_enabled); report the tail
    tail = times[-8:]
    name = ("device+marg" if device_marg else "device") \
        if device_solver else "host"
    print(f"coupled[{name}]  {1e3 * np.mean(tail):8.1f} ms/keyframe "
          f"(tail of {len(times)}; min {1e3 * np.min(tail):.1f})",
          flush=True)
    return float(np.mean(tail))


def run_async(n_frames: int = 30) -> float:
    """Steady-state zero-pull pipeline (slam/coupled_async.py): total wall
    over the measured keyframes with a scalar-pull settle at both ends
    (per-feed timing is meaningless -- feeds only enqueue)."""
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

    cfg = make_cfg(vi_warmup=12, keyframe_thresh=-1.0, rollup_start=1000)
    cfg.frontend.translation_threshold = -1.0
    cfg.sensors.device_solver = True
    cfg.sensors.coupled_mega = True
    cfg.sensors.coupled_async = True
    h = MsHarness(cfg, jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr,
                  imu_rows)

    def settle():
        ca = h.frontend._casync
        poses = (ca.state["poses"] if ca is not None and ca.active
                 else h.video.poses)
        return float(jnp.sum(poses.astype(jnp.float32)))

    n_meas = 8
    for k in range(n_frames - n_meas):
        h.feed(k)
    settle()
    ca = h.frontend._casync
    assert ca is not None and ca.active, "async pipeline did not activate"
    t0 = time.perf_counter()
    for k in range(n_frames - n_meas, n_frames):
        h.feed(k)
    settle()
    dt = time.perf_counter() - t0
    print(f"coupled[async]  {1e3 * dt / n_meas:8.1f} ms/keyframe "
          f"({n_meas} keyframes, {ca.steps} async steps)", flush=True)
    return dt / n_meas


def main():
    want = set(sys.argv[1:]) or {"host", "device"}
    print("backend:", jax.default_backend(), flush=True)
    if "stages" in want:
        instrument()
    if "host" in want:
        run(False)
        report_stages()
        STAGES.clear()
    if "async" in want:
        run_async()
    if "device" in want:
        run(True)
        report_stages()
        STAGES.clear()
    if "marg" in want:
        run(True, device_marg=True)
        report_stages()


if __name__ == "__main__":
    main()
