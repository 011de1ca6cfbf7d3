"""Per-stage wall breakdown of the coupled-async keyframe step on TPU.

Replicates bench.py::bench_coupled (real network rounds guided by the
synthetic oracle, device solver, coupled mega + async pipeline) and
reports, over the measured window:

  host_pack  : pack_graph_flat numpy time per keyframe
  dispatch   : kernel-call wall (enqueue; includes H2D of the ~KB pack)
  feed_other : frontend ingestion + bookkeeping around the dispatch
  pipelined  : steady-state wall per keyframe (bench number)
  settled    : wall per keyframe with a blocking scalar pull after each
               step (device compute + RTT; device cost ~= settled - RTT)

Usage: python tools/profile_casync.py [n_meas]
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

HT, WD = 384, 512
H8, W8 = HT // 8, WD // 8


def build(n, gnss=False):
    import bench

    from dbaf_tpu.eval.synthetic import (
        make_oracle, scene_from_poses, simulate_imu_and_poses,
    )
    from dbaf_tpu.fusion.se3np import Pose
    from dbaf_tpu.models import DroidNet
    from dbaf_tpu.slam.coupled import MultiSensorBA
    from dbaf_tpu.slam.frontend import Frontend
    from dbaf_tpu.slam.graph import CovisibleGraph
    from dbaf_tpu.slam.video import DepthVideo
    from dbaf_tpu.utils.config import tumvi_config

    fps = 10.0
    intr = np.asarray([2.0 * W8, 2.0 * W8, W8 / 2, H8 / 2], np.float32)
    imu_rows, poses_at = simulate_imu_and_poses(n / fps + 0.5, fps=fps)
    gt_cw, gt_disps = scene_from_poses(poses_at, n, intr, H8, W8)

    cfg = tumvi_config()
    cfg.buffer = n + 8
    cfg.ba.window = n + 4
    cfg.frontend.vi_warmup = 12
    cfg.frontend.keyframe_thresh = -1.0
    cfg.frontend.translation_threshold = -1.0
    cfg.frontend.rollup_start = 1000
    cfg.graph.edge_capacity = 48
    cfg.sensors.device_solver = True
    cfg.sensors.coupled_mega = True

    model = DroidNet()
    params = bench._make_params(model, jax, jnp)
    oracle = make_oracle(jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr)

    def update_fn(net, inp, corr, motn, ii, jj, aux):
        net2, delta, weight, _, _ = model.apply(
            {"params": params}, None, net, inp, corr, motn
        )
        _, d_o, w_o = oracle(net, inp, corr, motn, ii, jj, aux)
        return net2, d_o + delta * 1e-30, w_o + weight * 1e-30

    video = DepthVideo(cfg)
    graph = CovisibleGraph(video, update_fn, cfg)
    coupled = MultiSensorBA(video, cfg)
    coupled.Tbc = Pose()
    coupled.state.set_imu_params([0.05, 0.005, 1e-4, 1e-6])
    graph.coupled = coupled
    frontend = Frontend(video, graph, cfg)
    if gnss:
        # post-georeferencing operating point (the WHU production mode):
        # GNSS rows at every frame ride the per-keyframe factor pack.
        # The georeference is pre-set (est world == GT world on the
        # oracle scene, gravity-aligned; residuals sit well inside the
        # [1,1,5] m GPS sigma) -- this measures the flagship pipeline's
        # throughput WITH GPS factors active, i.e. the speed the system
        # runs at after init_gnss on a real GNSS dataset.
        from dbaf_tpu.utils import geodesy

        ten0 = np.array([-2694045.0, -4293642.0, 3857878.0])
        Cen = geodesy.Cen(ten0)
        gnss_rows = np.asarray([
            np.concatenate([[k / fps], ten0 + Cen @ poses_at[k][1]])
            for k in range(n)
        ])
        frontend.set_multisensor(imu_rows, all_gnss=gnss_rows,
                                 visual_only=False)
        graph.coupled.gnss_init_t1 = 1
        graph.coupled.gnss_init_time = 1e-6
        graph.coupled.ten0 = ten0
    else:
        frontend.set_multisensor(imu_rows, visual_only=False)
    return cfg, video, graph, frontend, fps


def main():
    argv = [a for a in sys.argv[1:] if a != "--gnss"]
    gnss = "--gnss" in sys.argv
    n_meas = int(argv[0]) if argv else 15
    n_warm = 18
    n = n_warm + n_meas

    cfg, video, graph, frontend, fps = build(n, gnss=gnss)
    if gnss:
        print("mode: post-georeferencing (GPS factors in every pack)")
    if len(argv) > 2:
        # rounds override (traced ints: no recompile): isolates the
        # per-round cost from the fixed per-keyframe overhead
        frontend.iters1 = int(argv[1])
        frontend.iters2 = int(argv[2])
        print(f"rounds override: {frontend.iters1}+{frontend.iters2}")
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((3, H8, W8, 128)), jnp.bfloat16)
    id_map = np.zeros(cfg.buffer, dtype=np.int32)
    intr8 = jnp.asarray(
        np.asarray([2.0 * W8, 2.0 * W8, W8 / 2, H8 / 2], np.float32)
    )

    import dbaf_tpu.fusion.device_graph as dg

    pack_t = []
    orig_pack = dg.pack_graph_flat

    def timed_pack(*a, **k):
        t0 = time.perf_counter()
        out = orig_pack(*a, **k)
        pack_t.append(time.perf_counter() - t0)
        return out

    dg.pack_graph_flat = timed_pack
    import dbaf_tpu.slam.coupled_async as ca
    ca.dg.pack_graph_flat = timed_pack

    disp_t = []

    def feed(k):
        idx = video.counter
        video.append(k / fps, None, None, None, None, intr8,
                     feats[0], feats[1], feats[2])
        id_map[idx] = k
        graph.aux = {"id_map": jnp.asarray(id_map)}
        t0 = time.perf_counter()
        frontend()
        disp_t.append(time.perf_counter() - t0)
        id_map[: video.counter] = np.round(
            video.tstamp[: video.counter] * fps
        ).astype(np.int32)
        graph.aux = {"id_map": jnp.asarray(id_map)}

    def settle():
        cao = frontend._casync
        poses = (cao.state["poses"] if cao is not None and cao.active
                 else video.poses)
        return float(jnp.sum(poses.astype(jnp.float32)))

    for k in range(n_warm):
        feed(k)
    settle()
    assert video.imu_enabled, "VI init did not trigger"
    # round-count knobs for marginal-cost measurement, applied after the
    # warmup so VI init ran at full rounds (the steady-state async kernel
    # takes traced counts, so this recompiles nothing)
    frontend.iters1 = int(os.environ.get("ITERS1", frontend.iters1))
    frontend.iters2 = int(os.environ.get("ITERS2", frontend.iters2))
    print(f"warm done; casync active: "
          f"{frontend._casync is not None and frontend._casync.active}",
          flush=True)

    pack_t.clear()
    disp_t.clear()
    t0 = time.time()
    for k in range(n_warm, n):
        feed(k)
    settle()
    dt = (time.time() - t0) / n_meas
    fe_wall = float(np.mean(disp_t)) if disp_t else 0.0
    pk = float(np.mean(pack_t)) * 1e3 if pack_t else 0.0
    print(f"pipelined  {dt * 1e3:8.2f} ms/kf", flush=True)
    print(f"frontend() {fe_wall * 1e3:8.2f} ms/kf  (host pack {pk:.2f} ms)",
          flush=True)

    # settled mode: blocking pull after every step isolates device+RTT
    pack_t.clear()
    ts = []
    for k in range(n, n + 8):
        t0 = time.time()
        feed(k)
        settle()
        ts.append(time.time() - t0)
    print(f"settled    {float(np.mean(ts)) * 1e3:8.2f} ms/kf "
          f"(+RTT; min {min(ts) * 1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
