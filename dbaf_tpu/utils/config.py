"""Typed configuration tree with per-dataset presets.

Replaces the reference's per-demo argparse duplication (~30 flags copied
into each demo, /root/reference/demo_vio_tumvi.py:82-122) and the tuned
values scattered through the batch drivers (batch_tumvi.py:28-41,
batch_kitti360.py:13-25, batch_whu.py:5-85, batch_subt.py:8-29).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclass
class GraphConfig:
    """Covisibility-graph shape & edge-selection knobs."""

    max_factors: int = 48            # active-edge budget (demo_vio_tumvi.py:87)
    edge_capacity: int = 48          # static padded edge-array size; the
    # reference's steady state never exceeds max_factors (age eviction,
    # covisible_graph.py:117-122), so padding beyond it only inflates every
    # per-edge kernel.  Init-time proximity adds (remove=False) truncate.
    inactive_capacity: int = 64      # static padded inactive-edge store
    corr_group: int = 16             # blockdiag pixel packing of the fused
    # Pallas correlation kernel (x-first variant; 16 fastest measured)
    corr_int8: bool = False          # run the dominant P2 stage of the fused
    # corr kernel on the int8 MXU.  MEASURED NEGATIVE (2026-08-17): the pure
    # dot gains 77 -> 106 TFLOP/s (docs/ABLATION_CORR.md mm_p2_i8) but the
    # in-kernel quantization (per-tile max reduce + round + f32->int8
    # conversions over ~1.3M elements) costs more than the dot saves:
    # v5g16 15.99 ms bf16 vs 19.55 ms int8 (tools/profile_corr).  Kept as a
    # tested ablation path; error when enabled <= ~1.2% of per-tile max.
    frontend_window: int = 5         # proximity window (demo:98)
    frontend_radius: int = 2         # forced radius edges (demo:99)
    frontend_nms: int = 1            # NMS suppression radius (demo:100)
    frontend_thresh: float = 16.0    # distance threshold for edges (demo:97)
    beta: float = 0.3                # flow blend in frame distance (demo:88)
    max_age: int = 25                # edge retirement age (dbaf_frontend.py:58)
    inac_range: int = 3              # inactive edges kept in BA (demo:113)
    skip_edge: Sequence[int] = ()    # opportunistic long-range edges (demo:118)
    far_threshold: float = 0.02      # far-disparity down-weight (demo:110)
    mask_threshold: float = -1.0     # short-baseline down-weight (demo:112)
    upsample: bool = False


@dataclass
class FrontendConfig:
    keyframe_thresh: float = 3.5     # cull distance (demo:96)
    filter_thresh: float = 2.4       # motion-filter flow gate (demo:92)
    translation_threshold: float = 0.2  # cull translation hysteresis (demo:111)
    warmup: int = 8                  # keyframes before init (demo:93)
    vi_warmup: int = 12              # keyframes before VI init (dbaf_frontend.py:31)
    iters1: int = 4                  # update rounds per keyframe (demo:90)
    iters2: int = 2                  # post-cull update rounds (demo:91)
    init_iters: int = 8              # per round at initialization (dbaf_frontend.py:826-837)
    rollup_start: int = 65           # window shift trigger (dbaf_frontend.py:254)
    rollup_shift: int = 30           # shift amount (dbaf_frontend.py:255)
    active_window: int = 12          # multi-sensor active window (demo:109)
    async_pipeline: bool = False     # device-resident per-frame step (one
    # dispatch/frame, host packs drained with a 2-frame lag); visual-only
    # configs, culling supported (in-kernel shifts; async == sync tested
    # in tests/test_async_pipeline.py) (slam/async_pipeline.py)
    async_drain_batch: int = 8       # per-frame packs pulled per host D2H
    # round trip (stacked into one transfer).  Each pull costs a full
    # transport RTT (~25-30 ms on axon) even when the pack is ready, so
    # per-frame drains floor cheap (gate-rejected) frames at the RTT;
    # batching B packs amortizes it (measured rejected-frame loop at
    # B=8: 20.4 ms/frame = 49 fps, drain 13.5 of it; B=16 measured
    # WORSE -- the stacked pull does not amortize past ~8 on this
    # transport; tools/profile_gateloop.py).  Clamped at activation so
    # the lagged rollup trigger keeps buffer headroom.
    monitor_dir: str = ""            # when set, dump the reference's live
    # monitor panels + debug views as PNGs there (dbaf_frontend.py:76-83,
    # 278-314; covisible_graph.py:252-307) (eval/monitor.py)
    monitor_debug: bool = True       # include the edge-state debug views
    # (disparity/flow-weight/covisibility).  They need per-keyframe host
    # edge state, so monitor_debug=True forces the synchronous paths;
    # with False the trajectory/attitude/bias panels are fed from the
    # coupled pipeline's lagged drain pack at ZERO extra pulls and the
    # flagship async mode stays active.


@dataclass
class BAConfig:
    window: int = 80                 # static pose-window capacity for DBA
    iters: int = 2                   # GN iterations per ba() call
    # coupled mode: visual-relinearize -> factor-graph LM -> retract
    # passes per update round (the reference runs 2, depth_video.py:524
    # "for iter in range(2)"); 1 halves the coupled solve cost per round
    # at a measured oracle-ATE cost recorded in docs/ABLATION_LM.md
    lm_iters: int = 2
    lm: float = 1e-4
    ep: float = 0.1
    alpha: float = 0.05              # depth-sensor prior weight (droid_kernels.cu:1477)
    eps_damping: float = 1e-7        # EP in graph.update (covisible_graph.py:330)


@dataclass
class SensorConfig:
    """IMU / GNSS / odometry fusion knobs (demo_vio_whu.py:95-119,190-211)."""

    use_imu: bool = True
    use_gnss: bool = False
    use_odo: bool = False
    use_zupt: bool = False
    # ZUPT admission gate: max |v| of the second-newest keyframe for a
    # zero-velocity update (the reference hardcodes 0.025 m/s,
    # dbaf_frontend.py:208); exposed for scenes/platforms whose
    # stationary-velocity estimate floor differs
    zupt_vel_thresh: float = 0.025
    imu_rate: float = 200.0
    acc_noise: float = 0.1
    gyro_noise: float = 0.01
    acc_walk: float = 1e-3
    gyro_walk: float = 1e-5
    gravity: float = 9.807           # multi_sensor.py:5
    # camera-IMU extrinsics: 4x4 T_body_camera
    Tbc: Optional[np.ndarray] = None
    # GNSS lever arm in body frame
    tbg: Optional[np.ndarray] = None
    # device-resident coupled solve: run the factor-graph LM on the TPU
    # fused with the visual hessian/retraction (zero host round trips per
    # coupled iteration, SURVEY.md 5.8); falls back to the host f64 path
    # when the window exceeds fg_cap or on unsupported factor layouts
    device_solver: bool = False
    # device-resident sliding-window marginalization (the numeric core of
    # coupled._marginalize as one dispatch, device_graph.py
    # marginalize_window_device); host f64 fallback on reinit/capacity
    # miss.  Measured on TPU (tools/profile_coupled.py): 159 vs 208
    # ms/keyframe -- the saved blocking pull beats the ~0.5 extra LM
    # iterations/keyframe the f32 marginal costs.  Only active together
    # with device_solver.
    device_marg: bool = True
    # fused coupled keyframe step (slam/coupled_fused.py via
    # graph.update_coupled_mega): iters1 rounds + in-kernel cull decision
    # + conditional iters2 rounds in ONE dispatch with a single host pull
    # per keyframe; off = the two-call flow (one dispatch+pull per update
    # call).  Only active together with device_solver.
    coupled_mega: bool = True
    # fully device-resident coupled pipeline (slam/coupled_async.py):
    # in-kernel edge lifecycle + state continuation/pose seed + window
    # marginalization + keyframe culling (in-kernel decision, deferred
    # prev_cull transition, lagged one-pull-per-keyframe host mirror that
    # overlaps device compute).  Activates post-VI-init (GNSS configs:
    # post-georeferencing); GNSS/odo/ZUPT factors ride the per-keyframe
    # pack, with culled-frame measurements re-linked into the device
    # marginal in-kernel.  save_pkl archival rides the kernel's roll_out
    # output; IMU-rate high-freq output propagates from the lagged host
    # mirrors (one-keyframe staleness).  init/reinit events drain back
    # to the synchronous flow.  Preintegrations are linearized
    # at the previous keyframe's bias (one solve older than the sync
    # flow); the factor's first-order bias correction absorbs the
    # difference -- trajectory parity incl. culls is covered by
    # tests/test_coupled_async.py.
    coupled_async: bool = True
    fg_cap: int = 20                 # static factor-graph window capacity


@dataclass
class DBAFusionConfig:
    image_size: Tuple[int, int] = (384, 512)
    buffer: int = 256                # keyframe ring-buffer slots
    stereo: bool = False
    graph: GraphConfig = field(default_factory=GraphConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    ba: BAConfig = field(default_factory=BAConfig)
    sensors: SensorConfig = field(default_factory=SensorConfig)
    save_pkl: bool = False
    upsample: bool = False
    weights_path: Optional[str] = None
    shard_video: bool = False        # shard the large keyframe buffers
    # (fmaps/nets/inps, the big axes of the reference's DepthVideo,
    # depth_video.py:64-66) over the device mesh by keyframe slot
    # (SURVEY.md 2.9); needs buffer % device_count == 0

    @property
    def feat_size(self) -> Tuple[int, int]:
        return self.image_size[0] // 8, self.image_size[1] // 8


def tumvi_config(**overrides) -> DBAFusionConfig:
    """TUM-VI rooms preset (batch_tumvi.py:28-41)."""
    cfg = DBAFusionConfig(
        image_size=(384, 512),
        graph=GraphConfig(
            max_factors=48,
            frontend_window=5,
            frontend_radius=2,
            frontend_nms=1,
            far_threshold=0.02,
            mask_threshold=-1.0,
            skip_edge=(-4, -5, -6),
        ),
        frontend=FrontendConfig(
            keyframe_thresh=3.5,
            translation_threshold=0.2,
            active_window=12,
            # 3+1 visual update rounds instead of the reference demo's 4+2
            # (docs/ABLATION_ROUNDS.md): 1.67x keyframe throughput for
            # +0.08%-of-span oracle ATE, matching the reference's own
            # multisensor round budget (dbaf_frontend.py:59).  Pass
            # iters1=4, iters2=2 to restore the reference operating point.
            iters1=3,
            iters2=1,
        ),
        # ONE visual-relinearize/LM pass per coupled round instead of the
        # reference's two (docs/ABLATION_LM.md): -12.3 ms/keyframe on the
        # flagship pipeline for +1.8 mm oracle ATE (0.2% of span).  Pass
        # ba=BAConfig(lm_iters=2) to restore the reference structure.
        ba=BAConfig(lm_iters=1),
    )
    return dataclasses.replace(cfg, **overrides)


def kitti360_config(**overrides) -> DBAFusionConfig:
    """KITTI-360 preset (batch_kitti360.py:13-25)."""
    cfg = DBAFusionConfig(
        image_size=(320, 896),
        graph=GraphConfig(
            max_factors=48,
            far_threshold=-1.0,
            mask_threshold=1.0,
            skip_edge=(-4, -5, -6),
        ),
        frontend=FrontendConfig(translation_threshold=0.5),
    )
    return dataclasses.replace(cfg, **overrides)


def whu_config(**overrides) -> DBAFusionConfig:
    """WHU multi-sensor preset (batch_whu.py:5-85)."""
    cfg = DBAFusionConfig(
        image_size=(320, 640),
        graph=GraphConfig(max_factors=48, mask_threshold=0.0),
        sensors=SensorConfig(use_gnss=True, use_odo=True, use_zupt=True),
        # the coupled throughput preset (docs/ABLATION_LM.md; same basis
        # as tumvi_config) -- this is the flagship GNSS production mode
        ba=BAConfig(lm_iters=1),
    )
    return dataclasses.replace(cfg, **overrides)


def subt_config(**overrides) -> DBAFusionConfig:
    """SubT handheld preset (batch_subt.py:8-29)."""
    cfg = DBAFusionConfig(
        image_size=(384, 512),
        graph=GraphConfig(max_factors=48, far_threshold=0.02),
    )
    return dataclasses.replace(cfg, **overrides)
