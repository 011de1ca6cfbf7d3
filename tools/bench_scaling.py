"""Scaling benchmark: edge-sharded DBA iteration throughput vs mesh size.

SURVEY.md 7 stage 9 / BASELINE.md north star: keyframes/sec at 1 chip and
scaling efficiency at N devices.  Shards the covisibility edges of one
GN iteration across an ``edge`` mesh (parallel/shard_ba.py: sharded
linearization, psum assembly, all_gather couplings, replicated solve) and
measures steady-state iteration throughput per mesh size.

On real multi-chip hardware this measures true ICI scaling.  Under the
CPU emulation (--cpu N: ``xla_force_host_platform_device_count``) the
virtual devices share physical cores, so the numbers validate that the
sharded program compiles and runs at every mesh size -- not speedup.

Usage:
    python tools/bench_scaling.py            # real backend, all devices
    python tools/bench_scaling.py --cpu 8    # 8 virtual CPU devices
Prints one JSON line per mesh size.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="emulate N virtual CPU devices")
    ap.add_argument("--pipeline", choices=["visual", "coupled"], default=None,
                    help="measure the FULL keyframe pipeline (fused update "
                    "step / coupled solve) with keyframe-sharded video "
                    "buffers, one subprocess per mesh size")
    ap.add_argument("--pipeline-worker", choices=["visual", "coupled"],
                    default=None, help=argparse.SUPPRESS)
    ap.add_argument("--devices", type=int, default=1, help=argparse.SUPPRESS)
    ap.add_argument("--frames", type=int, default=46)
    ap.add_argument("--edges", type=int, default=384,
                    help="total covisibility edges (weak point: 48/window)")
    ap.add_argument("--window", type=int, default=24)
    ap.add_argument("--iters", type=int, default=8,
                    help="timed GN iterations per measurement")
    ap.add_argument("--multihost", type=int, default=0,
                    help="spawn N jax.distributed processes (one per "
                    "emulated host) and report per-host-count scaling; on "
                    "real multi-host hardware run dist_worker directly, "
                    "one process per host")
    ap.add_argument("--devices-per-host", type=int, default=2)
    args = ap.parse_args()

    if args.pipeline_worker:
        return main_pipeline_worker(args)
    if args.pipeline:
        return main_pipeline(args)
    if args.multihost:
        return main_multihost(args)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        )
    else:
        from dbaf_tpu.utils.jax_setup import setup
        setup()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from dbaf_tpu.ops import lie
    from dbaf_tpu.parallel.shard_ba import make_sharded_ba_iteration

    devs = jax.devices()
    print(f"# backend={jax.default_backend()} devices={len(devs)}",
          flush=True)

    H8, W8 = 48, 64  # TUM-VI operating point (384x512 / 8)
    P = args.window
    E = args.edges
    rng = np.random.default_rng(0)

    # synthetic window: noisy poses over a textured plane
    xi = rng.normal(size=(P, 6)).astype(np.float32) * 0.02
    poses = lie.se3_retr(
        jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32), (P, 1)),
        jnp.asarray(xi),
    )
    disps = jnp.asarray(
        0.5 + 0.1 * rng.random((P, H8, W8)), jnp.float32
    )
    intr = jnp.asarray([160.0, 160.0, W8 / 2, H8 / 2], jnp.float32)
    ii = np.repeat(np.arange(P), E // P + 1)[:E].astype(np.int32)
    jj = np.clip(ii + rng.integers(1, 4, size=E), 0, P - 1).astype(np.int32)
    targets = jnp.asarray(
        rng.random((E, H8, W8, 2)) * [W8, H8], jnp.float32
    )
    weights = jnp.asarray(
        0.5 * np.ones((E, H8, W8, 2)), jnp.float32
    )
    eta = jnp.full((P, H8 * W8), 1e-4, jnp.float32)
    mask = jnp.ones((E,), bool)

    results = []
    n = 1
    sizes = []
    while n <= len(devs):
        sizes.append(n)
        n *= 2
    base = None
    for n in sizes:
        if E % n:
            continue
        mesh = Mesh(np.asarray(devs[:n]), ("edge",))
        step = make_sharded_ba_iteration(mesh, P)
        # all operands on device BEFORE the timed loop (axon benchmarking
        # rules: never allocate host arrays in a timed region, and measure
        # the 1-vs-N chained-iteration slope ending in a scalar pull --
        # block_until_ready can lie on the remote transport)
        ii_d, jj_d = jnp.asarray(ii), jnp.asarray(jj)
        one_d, P_d = jnp.asarray(1), jnp.asarray(P)

        def chain(k):
            p, d = poses, disps
            for _ in range(k):
                # chain outputs into inputs (transport memoization guard)
                p, d = step(p, d, intr, targets, weights, eta,
                            ii_d, jj_d, mask, one_d, P_d)
            return float(jnp.sum(d[0, 0, :1]))  # scalar pull ends the chain

        chain(1)  # warmup/compile
        t0 = time.perf_counter()
        chain(1)
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain(1 + args.iters)
        t_many = time.perf_counter() - t0
        dt = max(t_many - t_one, 1e-9) / args.iters
        ips = 1.0 / dt
        if base is None:
            base = ips
        eff = ips / (base * n)
        row = {
            "metric": "sharded_ba_iterations_per_sec",
            "devices": n,
            "edges": E,
            "window": P,
            "value": round(ips, 3),
            "unit": "iter/s",
            "scaling_efficiency": round(eff, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


def main_multihost(args):
    """Launch 1..N-process jax.distributed runs of the edge-sharded BA
    (parallel/dist_worker.py) and report scaling efficiency per host
    count (BASELINE.md: >=0.7 at 2 hosts).  Under CPU emulation the
    "hosts" share physical cores, so the numbers validate the path, not
    the speedup; on a real pod run dist_worker per host instead."""
    import re
    import socket
    import subprocess
    import tempfile

    def free_port():
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    env = dict(os.environ)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", "")).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = None
    results = []
    n = 1
    while n <= args.multihost:
        port = free_port()
        with tempfile.TemporaryDirectory() as td:
            procs = []
            for pid in range(n):
                cmd = [
                    sys.executable, "-m", "dbaf_tpu.parallel.dist_worker",
                    "--process-id", str(pid), "--num-processes", str(n),
                    "--coordinator", f"localhost:{port}",
                    "--cpu-devices", str(args.devices_per_host),
                    "--edges", str(args.edges),
                    "--window", str(args.window),
                    "--time", str(args.iters),
                    "--out", os.path.join(td, f"p{pid}.npz"),
                ]
                procs.append(subprocess.Popen(cmd, cwd=repo, env=env,
                                              stdout=subprocess.DEVNULL,
                                              stderr=subprocess.DEVNULL))
            rcs = [p.wait(timeout=600) for p in procs]
            assert all(r == 0 for r in rcs), rcs
            import numpy as np
            dat = np.load(os.path.join(td, "p0.npz"))
            ips = 1e3 / float(dat["iter_ms"])
        if base is None:
            base = ips
        row = {
            "metric": "multihost_sharded_ba_iterations_per_sec",
            "hosts": n, "devices_per_host": args.devices_per_host,
            "edges": args.edges, "window": args.window,
            "value": round(ips, 3), "unit": "iter/s",
            "scaling_efficiency": round(ips / (base * n), 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        n *= 2
    return results


def main_pipeline(args):
    """Full-pipeline scaling: one subprocess per mesh size (the device
    count must be fixed before backend init), each running the synthetic-
    oracle SLAM system with keyframe-sharded video buffers
    (cfg.shard_video; tests/test_shard_video.py proves trajectory
    equivalence) and reporting steady-state keyframes/sec.  Under CPU
    emulation (``emulated: true``) the virtual devices share cores, so
    the efficiency column validates collective overhead, not speedup; on
    real multi-chip hardware the same rows measure true ICI scaling."""
    import subprocess

    n_max = args.cpu or 8
    sizes = []
    n = 1
    while n <= n_max:
        sizes.append(n)
        n *= 2
    base = None
    results = []
    for n in sizes:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--pipeline-worker", args.pipeline, "--devices", str(n),
             "--frames", str(args.frames)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1] if "{" in out.stdout else None
        if line is None:
            print(f"# worker n={n} failed:\n{out.stderr[-2000:]}",
                  flush=True)
            continue
        r = json.loads(line)
        if base is None:
            base = r["value"]
        row = {
            "metric": f"pipeline_{args.pipeline}_keyframes_per_sec",
            "devices": n,
            "value": r["value"],
            "unit": "keyframes/s",
            "scaling_efficiency": round(r["value"] / (base * n), 3),
            "emulated": bool(args.cpu),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


def main_pipeline_worker(args):
    """One mesh size of the pipeline scaling bench (subprocess entry)."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from dbaf_tpu.eval import synthetic as syn
    from dbaf_tpu.slam.frontend import Frontend
    from dbaf_tpu.slam.graph import CovisibleGraph
    from dbaf_tpu.slam.video import DepthVideo
    from dbaf_tpu.utils.config import (
        BAConfig, DBAFusionConfig, FrontendConfig, GraphConfig,
    )

    assert len(jax.devices()) >= args.devices, (
        len(jax.devices()), args.devices)
    h8, w8 = 8, 16
    coupled = args.pipeline_worker == "coupled"
    cfg = DBAFusionConfig(
        image_size=(8 * h8, 8 * w8), buffer=48,
        graph=GraphConfig(
            max_factors=40, edge_capacity=72, inactive_capacity=72,
            frontend_window=5, frontend_radius=2, frontend_nms=1,
            frontend_thresh=20.0, max_age=25, inac_range=3,
            far_threshold=-1.0, mask_threshold=-1.0,
        ),
        frontend=FrontendConfig(
            warmup=8, keyframe_thresh=-1.0, filter_thresh=0.0,
            iters1=2, iters2=1, init_iters=4, rollup_start=1000,
            rollup_shift=8, active_window=12,
            vi_warmup=12 if coupled else 1000,
        ),
        ba=BAConfig(window=32, iters=2),
    )
    cfg = dataclasses.replace(cfg, shard_video=args.devices > 1)
    if coupled:
        cfg.sensors.device_solver = True
        cfg.sensors.coupled_mega = True
        cfg.sensors.coupled_async = True

    n = args.frames
    intr = np.asarray([16.0, 16.0, w8 / 2, h8 / 2], np.float32)
    imu_rows, poses_at = syn.simulate_imu_and_poses(n / 10.0 + 0.5)
    gt_cw, gt_disps = syn.scene_from_poses(poses_at, n, intr, h8, w8)

    video = DepthVideo(cfg)
    id_map = np.zeros(cfg.buffer, np.int32)
    oracle = syn.make_oracle(gt_cw, gt_disps, intr)
    graph = CovisibleGraph(video, oracle, cfg)
    if coupled:
        from dbaf_tpu.fusion.se3np import Pose
        from dbaf_tpu.slam.coupled import MultiSensorBA

        ms = MultiSensorBA(video, cfg)
        ms.Tbc = Pose()
        ms.state.set_imu_params([0.05, 0.005, 1e-4, 1e-6])
        graph.coupled = ms
    frontend = Frontend(video, graph, cfg)
    if coupled:
        frontend.set_multisensor(imu_rows, visual_only=False)
    intr8 = jnp.asarray(intr, jnp.float32)
    feats = jnp.asarray(
        np.random.default_rng(7).standard_normal((40, h8, w8, 128)),
        jnp.bfloat16,
    )

    def feed(k):
        idx = video.counter
        f = feats[k % 40]
        video.append(k / 10.0 if coupled else float(k), None, None, None,
                     None, intr8, f, f, f)
        id_map[idx] = k
        graph.aux = {"id_map": jnp.asarray(id_map)}
        frontend()
        id_map[: video.counter] = np.round(
            video.tstamp[: video.counter] * (10.0 if coupled else 1.0)
        ).astype(np.int32)
        graph.aux = {"id_map": jnp.asarray(id_map)}

    n_meas = max(10, n - 30)
    for k in range(n - n_meas):
        feed(k)
    jax.block_until_ready(video.poses)
    t0 = time.perf_counter()
    for k in range(n - n_meas, n):
        feed(k)
    frontend.drain_async()
    jax.block_until_ready(video.poses)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "pipeline_worker", "devices": args.devices,
        "value": round(n_meas / dt, 3), "unit": "keyframes/s",
    }), flush=True)


if __name__ == "__main__":
    main()
