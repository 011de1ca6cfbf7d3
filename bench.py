"""System benchmark: keyframe throughput of the full VIO hot path.

Five phases, each on the real TPU at the reference's TUM-VI operating
point (384x512 images, 48x64 feature grid, max_factors=48 --
batch_tumvi.py:28-41).  Every JSON line records the preset and the
update-round configuration it was measured at (iters1/iters2):

1. ``visual``   -- every frame admitted, no culling: pure keyframe
   throughput, directly comparable to BENCH_r01.json.
2. ``culled``   -- visual pipeline with keyframe culling enabled (the
   in-kernel cull threshold set at the probe stream's median flow
   distance, so roughly half the keyframes cull) plus the pure
   admission-gate frame cost (gate threshold +inf: every frame runs
   fnet + gate and is rejected).  The untrained network's gate statistic
   is nearly constant (10.1 +- 0.1 px on this stream), so a "realistic"
   admit/reject mix cannot be synthesized without the TartanAir
   checkpoint; the two measurements bracket it instead.
3. ``coupled``  -- tightly-coupled multi-sensor keyframes (IMU factor
   graph + dense BA, device solver, fused mega kernel, zero-pull async
   pipeline) at the preset's REAL thresholds (3.5 px / 0.2 m): keyframe
   culling runs in-pipeline.  This is the reference's flagship mode
   (README.md:13-15) and the PRIMARY metric (printed LAST).  Update
   rounds run the REAL network at full cost; the produced targets are
   replaced by a synthetic-scene oracle (mixed in at 1e-30 so XLA cannot
   dead-code the network) so the VI initialization and the coupled solve
   stay on realistic, numerically healthy trajectories without
   datasets/weights (e2e accuracy on this scene:
   tests/test_slam_e2e.py::test_long_run_multisensor_stays_bounded).

Baselines: the reference publishes no fps (BASELINE.md).  Estimates used:
visual ~10 kf/s (multiple GPU update/BA rounds + ~60 ms CPU edge
management per keyframe, dbaf_frontend.py:222,232); coupled ~6 kf/s (the
visual work plus, per keyframe, 2x [GPU Hessian -> CPU GTSAM LM -> GPU
retraction] round trips and a CPU marginalization, depth_video.py:465-558).
Both are tracking ratios, not measured reference numbers.

Prints one JSON line per phase; the LAST line is the primary metric
{"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_KEYFRAMES_PER_SEC = 10.0
REFERENCE_COUPLED_KF_PER_SEC = 6.0

HT, WD = 384, 512
H8, W8 = HT // 8, WD // 8


def _make_params(model, jax, jnp):
    probe = jnp.zeros((1, HT, WD, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), probe, method=model.extract_features
    )["params"]
    uparams = model.init(
        jax.random.PRNGKey(1), None,
        jnp.zeros((1, H8, W8, 128), jnp.bfloat16),
        jnp.zeros((1, H8, W8, 128), jnp.bfloat16),
        jnp.zeros((1, H8, W8, 196), jnp.bfloat16),
        jnp.zeros((1, H8, W8, 4), jnp.bfloat16),
    )["params"]
    return {**params, **uparams}


def bench_visual(mode: str, rounds=None):
    """Visual pipeline throughput via the async one-dispatch-per-frame
    path.  mode: "visual" = admit every frame, no culls (r01 operating
    point); "cull" = admit every frame, cull-enabled; "gateonly" =
    admission gate rejects every frame (pure per-frame gate cost).
    rounds: optional (iters1, iters2) override -- None keeps the preset
    (TUM-VI 3+1, docs/ABLATION_ROUNDS.md); (4, 2) is the reference's
    operating point (demo:90-91)."""
    import jax
    import jax.numpy as jnp

    from dbaf_tpu.models import DroidNet
    from dbaf_tpu.slam.system import DBAFusion
    from dbaf_tpu.utils.config import tumvi_config

    cfg = tumvi_config()
    cfg.frontend.rollup_start = 40
    cfg.frontend.rollup_shift = 15
    cfg.frontend.async_pipeline = True
    cfg.ba.window = 48
    if rounds is not None:
        cfg.frontend.iters1, cfg.frontend.iters2 = rounds

    model = DroidNet()
    params = _make_params(model, jax, jnp)
    rng = np.random.default_rng(0)
    intr = np.asarray([460.0, 460.0, WD / 2, HT / 2], dtype=np.float32)
    base = rng.integers(0, 255, size=(HT + 64, WD + 64, 3)).astype(np.float32)

    def frame(k):
        ox, oy = (3 * k) % 64, (2 * k) % 64
        return base[oy : oy + HT, ox : ox + WD]

    if mode == "cull":
        cfg.frontend.filter_thresh = -1.0
        cfg.frontend.keyframe_thresh = 1e9  # cull EVERY keyframe: the
        # deterministic worst case of the in-kernel cull machinery
        # (deferred prev_cull transition fires every step).  Together
        # with the no-cull "visual" phase this brackets any real
        # admit/cull mix; a distribution-tuned threshold is not
        # reproducible with the untrained network on this stream.
    elif mode == "gateonly":
        # warm in admit-all mode so initialization + pipeline activation
        # happen; the threshold is flipped to reject-everything AFTER
        # activation (below), so the metric measures the PRODUCTION
        # async path's per-frame rejection cost (one dispatch, zero
        # pulls outside the stacked drain).  Rounds r1-r4 measured the
        # sync-fallback filter instead (one blocking gate pull per
        # frame, RTT-bound ~21 fps): with the threshold baked at 1e9
        # from frame 0 the system never initializes and the async
        # pipeline never activates.
        cfg.frontend.filter_thresh = -1.0
        cfg.frontend.keyframe_thresh = -1.0
    else:
        cfg.frontend.filter_thresh = -1.0
        cfg.frontend.keyframe_thresh = -1.0

    system = DBAFusion(cfg, params=params)

    # Warm until (a) the device-resident pipeline is active, and (b) one
    # rollup has happened (admitting modes), so EVERY kernel of the
    # steady-state loop -- step, stacked drain, rollup drain/re-entry --
    # has run before the timer starts: the remote transport's
    # compile/deserialize stalls are tens of seconds and must stay out of
    # the timed window.  Rollups recur every rollup_shift keyframes, so
    # they are genuine steady-state work and the measured window keeps
    # them.  gateonly admits every frame until initialization completes
    # (the gate threshold only bites once the async kernel is live), so
    # activation always happens; its t1 then freezes (no rollup -- the
    # warmup cap exits the loop).
    # gateonly frames are ~2-3 ms with a ~100-400 ms drain/backlog spike
    # every drain_batch frames; a longer window amortizes the spikes so
    # the metric reads steady-state throughput, not spike alignment
    n_meas = 60 if mode == "gateonly" else 30
    k = 0
    while k < 60 and not (system._async is not None and
                          system._async.active and k >= 12):
        system.track(float(k), frame(k), intrinsics=intr)
        k += 1
    while k < 130 and not (
        system.frontend.rollup_count >= 1
        and system._async is not None and system._async.active
    ):
        system.track(float(k), frame(k), intrinsics=intr)
        k += 1
        if mode in ("gateonly", "cull") and k >= 80:
            break  # t1 cannot grow in these modes: no rollup will come
    settle_frames = 4
    if system._async is not None and system._async.active:
        settle_frames = 2 * max(system._async.drain_batch, 2)
    for _ in range(settle_frames):
        system.track(float(k), frame(k), intrinsics=intr)
        k += 1
    n_warm = k
    if system._async is not None and system._async.active:
        jax.block_until_ready(system._async.state["poses"])
        # drain warmup packs so the admission count starts clean
        system._async._drain(len(system._async.queue))
    if mode == "gateonly" and system._async is not None \
            and system._async.active:
        # flip the gate to reject-everything and rebuild the step kernel
        # (the threshold is baked into the jit): the measured loop then
        # runs the production async rejection path
        a = system._async
        a.sync()
        cfg.frontend.filter_thresh = 1e9
        a.kernel = None
        a.activate()
        for _ in range(6):  # compile + settle the rejected-frame path
            system.track(float(k), frame(k), intrinsics=intr)
            k += 1
        jax.block_until_ready(a.state["poses"])
        a._drain(len(a.queue))
        n_warm = k
    t1_before = (
        int(system._async.t1_mirror)
        if system._async is not None and system._async.active
        else system.frontend.t1
    )
    rolls_before = system.frontend.rollup_count

    t0 = time.time()
    for k in range(n_warm, n_warm + n_meas):
        system.track(float(k), frame(k), intrinsics=intr)
    if system._async is not None and system._async.active:
        jax.block_until_ready(system._async.state["poses"])
        # drain remaining packs so admissions are counted (ONE stacked
        # pull -- per-pack pulls would charge ~RTT x queue depth to dt)
        system._async._drain(len(system._async.queue))
        t1_after = int(system._async.t1_mirror)
    else:
        jax.block_until_ready(system.video.poses)
        t1_after = system.frontend.t1
    dt = time.time() - t0

    # in-window rollups shift t1 down by rollup_shift each; add them back
    # so `kept` counts admissions net of culls only
    rolls = system.frontend.rollup_count - rolls_before
    kept = max(
        t1_after - t1_before + rolls * cfg.frontend.rollup_shift, 0
    )
    return dict(kf_per_sec=n_meas / dt, frames_per_sec=n_meas / dt,
                kept=kept, frames=n_meas,
                rounds={"iters1": cfg.frontend.iters1,
                        "iters2": cfg.frontend.iters2})


def bench_coupled():
    """Tightly-coupled multi-sensor keyframe throughput (device factor
    graph solver, fused mega kernel), full-cost network rounds guided by
    the synthetic-scene oracle."""
    import jax
    import jax.numpy as jnp

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
    n_warm_cap, n_meas = 56, 15
    n = n_warm_cap + n_meas
    intr = np.asarray([2.0 * W8, 2.0 * W8, W8 / 2, H8 / 2], np.float32)
    imu_rows, poses_at = simulate_imu_and_poses(n / fps + 0.5, fps=fps)
    gt_cw, gt_disps = scene_from_poses(poses_at, n, intr, H8, W8)

    cfg = tumvi_config()
    # bounded steady-state window: rollup runs IN-PIPELINE (in-kernel
    # shift, zero drains) so the buffers stay production-sized -- the
    # reference's long-run memory model (rollup 65/30,
    # dbaf_frontend.py:253-257) scaled to this stream's length
    cfg.buffer = 48
    cfg.ba.window = 44
    cfg.frontend.rollup_start = 36
    cfg.frontend.rollup_shift = 15
    cfg.frontend.vi_warmup = 12
    # keyframe_thresh/translation_threshold stay at the TUM-VI preset
    # (3.5 px / 0.2 m, batch_tumvi.py:28-41): the flagship metric runs
    # the reference's real operating point INCLUDING in-pipeline culling
    cfg.graph.edge_capacity = 48
    cfg.sensors.device_solver = True
    cfg.sensors.coupled_mega = True

    model = DroidNet()
    params = _make_params(model, jax, jnp)
    oracle = make_oracle(jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr)

    def update_fn(net, inp, corr, motn, ii, jj, aux):
        # full-cost real network; outputs folded in at 1e-30 (numerically
        # null at f32, but XLA cannot eliminate the computation)
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
    frontend.set_multisensor(imu_rows, visual_only=False)

    rng = np.random.default_rng(1)
    feats = jnp.asarray(
        rng.standard_normal((3, H8, W8, 128)), jnp.bfloat16
    )
    id_map = np.zeros(cfg.buffer, dtype=np.int32)
    intr8 = jnp.asarray(intr, dtype=jnp.float32)

    def feed(k):
        idx = video.counter
        video.append(k / fps, None, None, None, None, intr8,
                     feats[0], feats[1], feats[2])
        id_map[idx] = k
        graph.aux = {"id_map": jnp.asarray(id_map)}
        frontend()
        id_map[: video.counter] = np.round(
            video.tstamp[: video.counter] * fps
        ).astype(np.int32)
        graph.aux = {"id_map": jnp.asarray(id_map)}

    def settle():
        """Force real completion of all enqueued async keyframe steps
        (the zero-pull pipeline only enqueues; a scalar pull is the only
        trustworthy barrier on the remote transport)."""
        ca = frontend._casync
        poses = (ca.state["poses"] if ca is not None and ca.active
                 else video.poses)
        return float(jnp.sum(poses.astype(jnp.float32)))

    # warm until VI init AND the zero-pull pipeline are live AND one
    # in-pipeline rollup has happened (its host-mirror jits compile on
    # first use), plus a few settled async keyframes (incl. at least one
    # in-pipeline cull on this stream), so activation/compile stalls stay
    # out of the window; rollups recur every rollup_shift keyframes, so
    # the measured window keeps them as genuine steady-state work
    k = 0
    while k < n_warm_cap - 4 and not (
        video.imu_enabled
        and frontend._casync is not None and frontend._casync.active
        and frontend._casync.total_steps >= 2
        and frontend.rollup_count >= 1
    ):
        feed(k)
        k += 1
    for _ in range(4):
        feed(k)
        k += 1
    n_warm = k
    settle()
    assert video.imu_enabled, "VI init did not trigger in the warmup"
    megas0 = graph.mega_count
    t1_before = frontend.t1
    rolls_before = frontend.rollup_count

    t0 = time.time()
    for k in range(n_warm, n_warm + n_meas):
        feed(k)
    settle()
    dt = time.time() - t0
    megas = graph.mega_count - megas0
    ca = frontend._casync
    async_steps = ca.total_steps if ca is not None else 0
    rolls = frontend.rollup_count - rolls_before
    return dict(kf_per_sec=n_meas / dt, keyframes=n_meas,
                kept=frontend.t1 - t1_before
                + rolls * cfg.frontend.rollup_shift,
                culls=ca.culls if ca is not None else 0,
                mega_steps=megas, async_steps=async_steps,
                rounds={"iters1": frontend.iters1,
                        "iters2": frontend.iters2},
                lm_iters=cfg.ba.lm_iters)


def main():
    from dbaf_tpu.utils.jax_setup import setup as jax_setup

    jax_setup()  # persistent compile cache: warm second runs

    rv = bench_visual(mode="visual")
    print(json.dumps({
        "metric": "keyframes_per_sec",
        "value": round(rv["kf_per_sec"], 3),
        "unit": "keyframes/s",
        "vs_baseline": round(rv["kf_per_sec"] / REFERENCE_KEYFRAMES_PER_SEC, 3),
        "estimated_baseline": True,
        "preset": "tumvi",
        "rounds": rv["rounds"],
    }), flush=True)

    # same pipeline at the REFERENCE's round configuration (4+2,
    # demo:90-91) so rounds across BENCH_r0*.json stay comparable without
    # git archaeology (the preset moved to 3+1 in round 4,
    # docs/ABLATION_ROUNDS.md)
    rvr = bench_visual(mode="visual", rounds=(4, 2))
    print(json.dumps({
        "metric": "keyframes_per_sec_ref_rounds",
        "value": round(rvr["kf_per_sec"], 3),
        "unit": "keyframes/s",
        "vs_baseline": round(rvr["kf_per_sec"] / REFERENCE_KEYFRAMES_PER_SEC, 3),
        "estimated_baseline": True,
        "preset": "tumvi",
        "rounds": rvr["rounds"],
    }), flush=True)

    rg = bench_visual(mode="cull")
    print(json.dumps({
        # cull EVERY keyframe: the deterministic worst case of the
        # in-kernel cull machinery (with the no-cull phase above it
        # brackets any real admit/cull mix)
        "metric": "all_cull_worst_case_kf_per_sec",
        "value": round(rg["kf_per_sec"], 3),
        "unit": "keyframes/s",
        "vs_baseline": round(rg["kf_per_sec"] / REFERENCE_KEYFRAMES_PER_SEC, 3),
        "estimated_baseline": True,
        "kept_keyframes": rg["kept"],
        "frames": rg["frames"],
        "preset": "tumvi",
        "rounds": rg["rounds"],
    }), flush=True)

    ro = bench_visual(mode="gateonly")
    print(json.dumps({
        "metric": "gate_rejected_frames_per_sec",
        "value": round(ro["frames_per_sec"], 3),
        "unit": "frames/s",
        "vs_baseline": None,
        "preset": "tumvi",
    }), flush=True)

    rc = bench_coupled()
    print(json.dumps({
        "metric": "coupled_keyframes_per_sec",
        "value": round(rc["kf_per_sec"], 3),
        "unit": "keyframes/s",
        "vs_baseline": round(rc["kf_per_sec"] / REFERENCE_COUPLED_KF_PER_SEC, 3),
        "estimated_baseline": True,
        "kept_keyframes": rc["kept"],
        "async_culls": rc["culls"],
        "mega_steps": rc["mega_steps"],
        "async_steps": rc["async_steps"],
        "preset": "tumvi",
        "rounds": rc["rounds"],
        "lm_iters": rc["lm_iters"],
    }), flush=True)


if __name__ == "__main__":
    main()
