"""Frontend driver: initialization, per-keyframe update, culling, rollup.

Redesign of /root/reference/dbaf/dbaf_frontend.py:16-863 covering both the
visual-only path and the tightly-coupled multi-sensor path (IMU ingestion,
IMU-predicted pose seeding, VI/GNSS initialization triggers, preintegration
merging on keyframe culls, bias reinitialization, high-rate IMU trajectory
output).
"""

from __future__ import annotations

import bisect
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fusion.se3np import Pose
from ..ops import lie, lie_np
from ..utils.config import DBAFusionConfig
from .graph import CovisibleGraph
from .initialization import init_imu_states, init_gnss, visual_imu_alignment
from .video import DepthVideo


@jax.jit
def _traj_row(poses, idx):
    """Camera-to-world 7-vec for the trajectory stream (one async dispatch;
    no host sync)."""
    return lie.se3_inv(poses[idx])


class Frontend:
    def __init__(
        self,
        video: DepthVideo,
        graph: CovisibleGraph,
        cfg: DBAFusionConfig,
    ):
        self.video = video
        self.graph = graph
        self.cfg = cfg

        fc = cfg.frontend
        gc = cfg.graph
        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0
        self.warmup = fc.warmup
        self.vi_warmup = fc.vi_warmup
        self.max_age = gc.max_age
        self.active_window = fc.active_window
        self.keyframe_thresh = fc.keyframe_thresh
        self.translation_threshold = fc.translation_threshold
        self.beta = gc.beta

        # sensor streams (set by the app for multi-sensor runs);
        # rows: imu [t, gx, gy, gz (deg/s), ax, ay, az]; gnss/odo [t, x, y, z]
        self.all_imu: Optional[np.ndarray] = None
        self.all_gnss: np.ndarray = np.zeros((0, 4))
        self.all_odo: np.ndarray = np.zeros((0, 4))
        self.all_stamp: Optional[np.ndarray] = None  # full-rate image stamps
        self.cur_imu_ii = 0
        self.cur_stamp_ii = 0
        self.visual_only = True
        self.visual_only_init = False
        self.use_zupt = cfg.sensors.use_zupt
        self.high_freq_output = True

        # flag-gated file-dump monitor (the reference's live show_plot
        # window + cv2 debug views, dbaf_frontend.py:76-83, 278-314;
        # covisible_graph.py:252-307); forces the synchronous paths
        self.monitor = None
        if getattr(fc, "monitor_dir", ""):
            from ..eval.monitor import Monitor

            self.monitor = Monitor(
                fc.monitor_dir,
                debug_views=getattr(fc, "monitor_debug", True),
            )

        if self.visual_only:
            self.iters1, self.iters2 = fc.iters1, fc.iters2
        else:
            self.iters1, self.iters2 = 2, 1

        # trajectory log: (tstamp, Twb or Twc 7-vec [x y z qx qy qz qw])
        self.trajectory: List[Tuple[float, np.ndarray]] = []
        # ECEF positions for rows written after GNSS init, keyed by the
        # trajectory index (dbaf_frontend.py:180-183, 270-272 append
        # ``x y z`` ECEF columns to every row once georeferenced)
        self.trajectory_ecef: dict = {}
        self.did_rollup = False
        self.rollup_count = 0
        # deferred mega step: t1 at dispatch time, or None.  The packed
        # scalars ride the next frame's motion-gate pull (one RTT/keyframe).
        self._pending_t1: Optional[int] = None
        # fully device-resident coupled pipeline (slam/coupled_async.py)
        self._casync = None

    # ------------------------------------------------------------------
    def set_multisensor(self, all_imu, all_gnss=None, all_odo=None,
                        all_stamp=None, visual_only=False):
        self.all_imu = np.asarray(all_imu) if all_imu is not None else None
        self.all_gnss = np.asarray(all_gnss) if all_gnss is not None else np.zeros((0, 4))
        self.all_odo = np.asarray(all_odo) if all_odo is not None else np.zeros((0, 4))
        self.all_stamp = all_stamp
        self.visual_only = visual_only
        if not visual_only:
            self.iters1, self.iters2 = 2, 1

    @property
    def coupled(self):
        return self.graph.coupled

    # ------------------------------------------------------------------
    def __call__(self):
        if not self.is_initialized and self.video.counter == self.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._resolve_pending()  # no-op when the filter already did it
            self._update()

    # ------------------------------------------------------------------
    @property
    def pending_pack(self):
        """Device array of deferred mega scalars (or None)."""
        if self._pending_t1 is None:
            return None
        return self.graph._host_pack_dev

    def resolve_pending(self, pack: np.ndarray):
        """Finish a deferred visual mega step: cull bookkeeping that the
        device already anticipated (gated rounds + in-kernel seeding)."""
        if self._pending_t1 is None:
            return
        t1 = self._pending_t1
        self._pending_t1 = None
        pre_counter = self.video.counter
        culled, _ = self.graph.finish_mega(pack)
        if culled:
            self.graph.rm_keyframe(t1 - 2)
            # rm_keyframe's single-row shift assumes the culled slot is
            # penultimate (true when the motion filter resolves BEFORE the
            # next append).  External feeders resolve via __call__ AFTER
            # appending the next frame -- shift those extra rows down too
            # or the new frame is orphaned above the window.
            for s in range(t1, pre_counter):
                self.video.copy_row(s - 1, s)
            self.t1 = t1 - 1
            self.video.seed_next(self.t1)

    def _resolve_pending(self):
        if self._pending_t1 is not None:
            self.resolve_pending(self.graph.host_pack)

    def drain_async(self):
        """Flush every deferred device-side step back into the host
        mirrors (terminate/save_state/eval entry points)."""
        self._resolve_pending()
        if self._casync is not None and self._casync.active:
            self._casync.sync()

    # ------------------------------------------------------------------
    def _initialize(self):
        """dbaf_frontend.py:816-851."""
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        if self.all_imu is not None and self.coupled is not None:
            init_imu_states(self, self.all_imu, self.all_gnss, self.all_odo)

        self.video.imu_enabled = False
        self.graph.update(1, use_inactive=True, rounds=self.cfg.frontend.init_iters)

        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=self.cfg.graph.frontend_thresh,
            beta=self.beta, remove=False,
        )
        self.graph.update(
            1, use_inactive=True, rounds=2 * self.cfg.frontend.init_iters
        )

        # seed next slot (dbaf_frontend.py:843-845)
        self.video.set_pose(self.t1, self.video.poses[self.t1 - 1])
        mean_disp = jnp.mean(self.video.disps[self.t1 - 4 : self.t1])
        self.video.set_disp(
            self.t1,
            jnp.full((self.video.h8, self.video.w8), mean_disp, jnp.float32),
        )
        self.is_initialized = True
        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)

    # ------------------------------------------------------------------
    def _ingest_sensors(self, cur_t: float):
        """IMU drain + GNSS/ZUPT/odo attachment (dbaf_frontend.py:162-220)."""
        state = self.coupled.state
        n_imu = len(self.all_imu)
        if self.cur_imu_ii >= n_imu - 1:
            # IMU stream exhausted (video outlasts the IMU file): keep the
            # state timeline consistent and let tracking continue visually
            state.append_imu(cur_t, self.all_imu[-1][4:7],
                             np.deg2rad(self.all_imu[-1][1:4]))
            state.append_img(cur_t)
            return
        while (self.cur_imu_ii < n_imu - 1
               and self.all_imu[self.cur_imu_ii][0] < cur_t):
            imu = self.all_imu[self.cur_imu_ii]
            # high-frequency IMU-rate output between keyframes
            if self.high_freq_output and self.video.imu_enabled and \
                    self.all_stamp is not None:
                while (self.cur_stamp_ii < len(self.all_stamp)
                       and imu[0] > float(self.all_stamp[self.cur_stamp_ii][0])):
                    st = float(self.all_stamp[self.cur_stamp_ii][0])
                    state.append_imu_temp(st, imu[4:7], np.deg2rad(imu[1:4]), True)
                    if (st > state.timestamps[-1]
                            and abs(cur_t - st) > 1e-3 and state.pose_temp):
                        T = state.pose_temp.pose
                        self._write_traj_row(st, T)
                    self.cur_stamp_ii += 1
                state.append_imu_temp(imu[0], imu[4:7], np.deg2rad(imu[1:4]))
            state.append_imu(imu[0], imu[4:7], np.deg2rad(imu[1:4]))
            self.cur_imu_ii += 1

        imu = self.all_imu[self.cur_imu_ii]
        state.append_imu(cur_t, imu[4:7], np.deg2rad(imu[1:4]))
        state.append_img(cur_t)

        if len(self.all_gnss) > 0:
            g = bisect.bisect(list(self.all_gnss[:, 0]), cur_t - 1e-6)
            if 0 < g < len(self.all_gnss) and self.all_gnss[g, 0] - cur_t < 0.01:
                state.append_gnss(cur_t, self.all_gnss[g, 1:4])

        self._zupt_gate(cur_t)

        if len(self.all_odo) > 0:
            o = bisect.bisect(list(self.all_odo[:, 0]), cur_t - 1e-6)
            if 0 < o < len(self.all_odo) and self.all_odo[o, 0] - cur_t < 0.01:
                state.append_odo(cur_t, self.all_odo[o, 1:4])

        imu = self.all_imu[self.cur_imu_ii]
        state.append_imu(imu[0], imu[4:7], np.deg2rad(imu[1:4]))
        self.cur_imu_ii += 1

    def _zupt_gate(self, cur_t: float) -> bool:
        """Zero-velocity-update admission gate (dbaf_frontend.py:206-209,
        WHU batch mode 1): when the merged preintegration interval below
        the window top spans > 3 s and the second-newest keyframe's
        estimated velocity is < 0.025 m/s, append a zero-velocity
        odometry factor.  Returns whether it fired (unit-tested exactly,
        tests/test_zupt.py)."""
        state = self.coupled.state
        if self.use_zupt and len(state.preintegrations) > 2 and \
                state.preintegrations[self.t1 - 3].dt > 3.0:
            thresh = self.cfg.sensors.zupt_vel_thresh
            if np.linalg.norm(state.vs[self.t1 - 2]) < thresh:
                state.append_odo(cur_t, np.zeros(3))
                return True
        return False

    def _write_traj_row(self, t: float, T: Pose):
        from scipy.spatial.transform import Rotation

        q = Rotation.from_matrix(T.R).as_quat()
        coupled = self.coupled
        if coupled is not None and coupled.gnss_init_t1 > 0 \
                and coupled.ten0 is not None:
            # ECEF columns once georeferenced (dbaf_frontend.py:270-272):
            # p = ten0 + Cen(ten0) @ p_local.  Kept f64 (ECEF magnitudes
            # ~6.4e6 m; f32 would quantize to ~0.5 m).
            from ..utils import geodesy

            self.trajectory_ecef[len(self.trajectory)] = (
                coupled.ten0 + geodesy.Cen(coupled.ten0)
                @ np.asarray(T.t, np.float64)
            )
        self.trajectory.append(
            (t, np.concatenate([T.t, q]).astype(np.float32))
        )

    # ------------------------------------------------------------------
    def _monitor_keyframe(self, cur_t: float):
        """Record one keyframe into the file-dump monitor and refresh the
        panel/debug-view PNGs on rollup (the reference refreshes its live
        window there, dbaf_frontend.py:296-314)."""
        mon = self.monitor
        if mon is None:
            return
        from scipy.spatial.transform import Rotation

        multisensor = self.all_imu is not None and self.coupled is not None
        T = np.eye(4)
        bg = None
        if multisensor and self.video.imu_enabled:
            P = self.coupled.state.wTbs[self.t1 - 1]
            T[:3, :3], T[:3, 3] = P.R, P.t
            bg = np.asarray(self.coupled.state.bs[self.t1 - 1][3:6])
        else:
            row = np.asarray(_traj_row(self.video.poses, self.t1 - 1))
            T[:3, :3] = Rotation.from_quat(row[3:7]).as_matrix()
            T[:3, 3] = row[:3]
        mon.record_keyframe(cur_t, T, gyro_bias=bg)
        if not self.did_rollup:
            return
        mon.dump_summary()
        if not mon.debug_views:
            return
        g = self.graph
        if len(g.ii) == 0:
            return
        # oldest keyframe's disparity (covisible_graph.py:253-263)
        mon.dump_disparity(np.asarray(self.video.disps[int(g.ii[0])]))
        # newest edge's flow/weight overlay (covisible_graph.py:266-283):
        # prefer the (max ii, max ii - 5) edge like the reference, else the
        # newest active edge
        sel = np.nonzero((g.ii == g.ii.max()) & (g.jj == g.ii.max() - 5))[0]
        e = int(sel[0]) if len(sel) else int(np.argmax(g.ii))
        import dbaf_tpu.ops.projective as _pj

        target = np.asarray(g.edges.target[e])
        weight = np.asarray(g.edges.weight[e])
        coords0 = np.asarray(
            _pj.coords_grid(target.shape[0], target.shape[1])
        )
        img = self.video.images_small[int(g.ii[e])]
        mon.dump_flow_weight(img, target, coords0, weight)
        # covisibility graph over camera centers (covisible_graph.py:287-307)
        n = self.t1
        cw = np.asarray(self.video.poses[:n], np.float64)
        centers = lie_np.se3_inv(cw)[:, :3]
        mon.dump_covisible(centers, g.ii, g.jj, g.ii_inac, g.jj_inac)

    # ------------------------------------------------------------------
    def _update(self):
        """dbaf_frontend.py:153-375."""
        self.count += 1
        self.t1 += 1
        fc = self.cfg.frontend
        multisensor = self.all_imu is not None and self.coupled is not None

        cur_t = float(self.video.tstamp[self.t1 - 1])

        if multisensor:
            # bias reinit 5 s after VI init (dbaf_frontend.py:158-160)
            if self.video.imu_enabled and \
                    cur_t - self.coupled.vi_init_time > 5.0:
                self.coupled.reinit = True
                self.coupled.vi_init_time = 1e9
            self._ingest_sensors(cur_t)

            # zero-pull device-resident keyframe step (coupled_async.py);
            # rollup runs in-kernel (the step kernel decides and applies
            # it; the host replays the shift after its lagged drain), so
            # only reinit events drain back to the synchronous flow below
            ca = self._casync
            if ca is not None and ca.active:
                if self.coupled.reinit:
                    ca.sync()
                else:
                    ca.step(cur_t)
                    return

            # IMU-predicted pose seed (dbaf_frontend.py:222-228)
            if self.video.imu_enabled:
                Twc = self.coupled.state.wTbs[-1].compose(self.coupled.Tbc)
                Tcw = np.linalg.inv(Twc.matrix())
                self.video.set_pose(
                    self.t1 - 1,
                    jnp.asarray(lie_np.se3_from_matrix(Tcw), jnp.float32),
                )

        # edge lifecycle (dbaf_frontend.py:233-242)
        if self.graph.n > 0:
            if self.visual_only:
                stale = (self.graph.age > self.max_age) & (
                    (self.graph.ii < self.t1 - self.active_window)
                    | (self.graph.jj < self.t1 - self.active_window)
                )
            else:
                stale = (self.graph.age > self.max_age) | (
                    (self.graph.ii < self.t1 - self.active_window)
                    | (self.graph.jj < self.t1 - self.active_window)
                )
            self.graph.rm_factors(stale, store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5,
            max(self.t1 - self.cfg.graph.frontend_window, 0),
            rad=self.cfg.graph.frontend_radius,
            nms=self.cfg.graph.frontend_nms,
            thresh=self.cfg.graph.frontend_thresh,
            beta=self.beta,
            remove=True,
        )

        # RGB-D: seed the new frame's disparity from the depth sensor
        # (dbaf_frontend.py:247-248)
        if self.video.has_depth:
            self.video.seed_depth(self.t1 - 1)

        if not multisensor and self.monitor is None:
            self._update_visual_fused(cur_t, fc)
            return

        # rollup (dbaf_frontend.py:253-257).  The reference interleaves it
        # mid-keyframe (after iters1); it is pure index bookkeeping, so --
        # exactly like the visual fused path -- it moves ahead of the
        # update, which lets the whole keyframe run as ONE device dispatch.
        self.did_rollup = False
        if self.t1 > fc.rollup_start:
            roll = fc.rollup_shift
            self.video.rollup(roll)
            self.graph.shift_indices(roll)
            if self.coupled is not None and len(self.coupled.state) > 0:
                self.coupled.rollup(roll)
            self._roll_aux(roll)
            self.t1 -= roll
            self.count -= roll
            self.did_rollup = True
            self.rollup_count += 1

        # fused coupled keyframe: iters1 rounds + in-kernel cull decision +
        # conditional iters2 rounds in one dispatch with a single pull
        mega = self.graph.update_coupled_mega(self.iters1, self.iters2)
        if mega is not None:
            culled, _d = mega
            # trajectory row from the POST-iters1 state (reference writes
            # it before the keyframe-removal/iters2 section,
            # dbaf_frontend.py:261-274): the fused kernel snapshots the
            # body pose at decision time and ships it in the host pack
            dec = self.graph.dec_pose
            if dec is not None:
                self._write_traj_row(
                    cur_t, Pose(dec[:9].reshape(3, 3).astype(np.float64),
                                dec[9:12].astype(np.float64)))
            else:
                self._write_traj_row(
                    cur_t, self.coupled.state.wTbs[self.t1 - 1])
            self._monitor_keyframe(cur_t)
            if culled:
                self.graph.rm_keyframe(self.t1 - 2)
                self.coupled.rm_new_gnss(self.t1 - 2)
                self.coupled.state.merge_keyframe(self.t1 - 2)
                self.t1 -= 1
            if self.video.imu_enabled and \
                    self.coupled.gnss_init_time <= 0.0 \
                    and len(self.all_gnss) > 0 \
                    and self.coupled.ten0 is not None:
                init_gnss(self.video, self.coupled, self.t1,
                          self.coupled.ten0)
            if self.cfg.upsample and getattr(self.graph, "agg_fn", None):
                self.graph.run_upsample(self.graph.agg_fn)
            self.video.seed_next(self.t1)
            self._maybe_activate_casync()
            return

        self.graph.update(None, None, use_inactive=True, rounds=self.iters1)

        # trajectory output: keep the row on device (pulled in a batch at
        # terminate) -- eager ops / per-keyframe pulls are expensive on
        # remote transports
        if multisensor and self.video.imu_enabled:
            self._write_traj_row(cur_t, self.coupled.state.wTbs[self.t1 - 1])
        else:
            self.trajectory.append(
                (cur_t, _traj_row(self.video.poses, self.t1 - 1))
            )
        self._monitor_keyframe(cur_t)

        # keyframe cull decision (dbaf_frontend.py:317-353); the distance was
        # computed inside the update kernel to save a round trip
        pack = self.graph.host_pack
        if pack is not None and not self.did_rollup:
            # the cull distance sits just ahead of the proximity entries
            # (index 0 on the per-round pack, 1 on the fused-kernel pack)
            d = float(pack[self.graph._prox_offset - 1])
        else:
            d = float(
                self.video.distance([self.t1 - 3], [self.t1 - 2], beta=self.beta)[0]
            )
        cull = d < self.keyframe_thresh
        if multisensor and self.video.imu_enabled and not cull:
            # translation hysteresis (dbaf_frontend.py:319-325): candidates
            # are t1-10..t1-4 (the immediate neighbor t1-3 is excluded)
            lo = self.t1 - 10 if self.t1 > 10 else self.t1 - 6
            hyst = self.graph.hyst_norms
            if hyst is not None and not self.did_rollup:
                # norms rode the fused keyframe pull (slots t1-10+k, k<7)
                k0 = max(lo, 0) - (self.t1 - 10)
                cam_t = hyst[k0:7]
            else:
                # ONE pull covering the candidates and the reference row
                win = np.asarray(
                    self.video.poses[max(lo, 0): self.t1 - 1],
                    dtype=np.float64)
                poses, ref = win[:-2], win[-1]  # excludes neighbor t1-3
                rel = lie_np.se3_mul(poses, lie_np.se3_inv(ref)[None])
                cam_t = np.linalg.norm(rel[:, :3], axis=1)
            cull = bool(np.any(cam_t < self.translation_threshold))

        seeded = False
        if cull:
            self.graph.rm_keyframe(self.t1 - 2)
            if multisensor:
                self.coupled.rm_new_gnss(self.t1 - 2)
                self.coupled.state.merge_keyframe(self.t1 - 2)
            self.t1 -= 1
        else:
            self.graph.update(
                None, None, use_inactive=True, rounds=self.iters2,
                seed_next=not multisensor,
            )
            seeded = not multisensor

        # VI / GNSS initialization triggers (dbaf_frontend.py:359-369)
        if multisensor and self.t1 > self.vi_warmup and \
                self.coupled.vi_init_t1 < 0:
            self._try_init_vi(cur_t)
        if multisensor and self.video.imu_enabled and \
                self.coupled.gnss_init_time <= 0.0 and len(self.all_gnss) > 0 \
                and self.coupled.ten0 is not None:
            init_gnss(self.video, self.coupled, self.t1, self.coupled.ten0)

        # upsample path (covisible_graph.py:339-340)
        if self.cfg.upsample and getattr(self.graph, "agg_fn", None):
            self.graph.run_upsample(self.graph.agg_fn)

        # seed next slot (dbaf_frontend.py:371-373); the in-kernel path
        # already seeded on the non-cull visual update
        if not seeded:
            self.video.seed_next(self.t1)

    def _roll_aux(self, roll: int):
        """Roll buffer-indexed aux leaves alongside a rollup: aux entries
        keyed by video slot (e.g. a test oracle's id_map) were uploaded
        pre-shift.  Mirrors the async kernels' in-kernel aux roll so sync
        and async flows see identical aux state mid-keyframe."""
        if not self.graph.aux:
            return
        B = self.cfg.buffer
        self.graph.aux = jax.tree_util.tree_map(
            lambda a: jnp.roll(a, -roll, axis=0)
            if getattr(a, "ndim", 0) >= 1 and a.shape[0] == B else a,
            self.graph.aux,
        )

    def _maybe_activate_casync(self):
        """Enter the zero-pull coupled pipeline when the state qualifies
        (slam/coupled_async.py scope gates)."""
        if not getattr(self.cfg.sensors, "coupled_async", False):
            return
        # the monitor is compatible with the pipeline: keyframe rows are
        # fed from the lagged drain pack (CoupledAsync._monitor_from_pack,
        # zero extra pulls); only the edge-state debug views stay a
        # synchronous-flow feature
        if self.monitor is not None and self.monitor.debug_views:
            return
        if self._casync is None:
            from .coupled_async import CoupledAsync

            self._casync = CoupledAsync(self)
        if not self._casync.active and self._casync.can_activate():
            self._casync.activate()

    # ------------------------------------------------------------------
    def _update_visual_fused(self, cur_t: float, fc):
        """Pure-visual keyframe step with the fused kernel: the rollup is
        pure index bookkeeping so it moves ahead of the update (reference
        interleaves it mid-keyframe, dbaf_frontend.py:253-257); everything
        else -- iters1 rounds, cull decision, iters2 rounds, seeding --
        happens in one device dispatch with a single host pull."""
        self.did_rollup = False
        if self.t1 > fc.rollup_start:
            roll = fc.rollup_shift
            self.video.rollup(roll)
            self.graph.shift_indices(roll)
            if self.coupled is not None and len(self.coupled.state) > 0:
                self.coupled.rollup(roll)
            self._roll_aux(roll)
            self.t1 -= roll
            self.count -= roll
            self.did_rollup = True
            self.rollup_count += 1

        traj_row = self.graph.update_mega(
            self.iters1, self.iters2, defer=True
        )
        self.trajectory.append((cur_t, traj_row))
        # cull bookkeeping resolves with the next frame's motion-gate pull
        # (resolve_pending); the device state already anticipated both
        # outcomes inside the kernel
        self._pending_t1 = self.t1

        if self.cfg.upsample and getattr(self.graph, "agg_fn", None):
            # the upsample head needs resolved edge state
            self._resolve_pending()
            self.graph.run_upsample(self.graph.agg_fn)

    # ------------------------------------------------------------------
    def _try_init_vi(self, cur_t: float):
        """Gyro-excitation-gated VI initialization (dbaf_frontend.py:434-515)."""
        state = self.coupled.state
        vels = []
        for i in range(self.t1 - 8, self.t1 - 1):
            pim = state.preintegrations[i]
            if pim.dt <= 0:
                return
            vels.append(pim.dv / pim.dt)
        vels = np.asarray(vels)
        var_g = float(np.sqrt(np.mean(np.linalg.norm(vels - vels.mean(0), axis=1) ** 2)))
        if var_g < 0.25:
            return  # IMU excitation not enough

        t0a, t1a = self.t1 - 8, self.t1
        visual_imu_alignment(self.video, self.coupled, t0a, t1a, ignore_lever=True)
        self.graph.update(None, None, use_inactive=True)
        visual_imu_alignment(self.video, self.coupled, t0a, t1a, ignore_lever=False)
        self.graph.update(None, None, use_inactive=True)
        visual_imu_alignment(self.video, self.coupled, t0a, t1a, ignore_lever=False)
        if not self.visual_only:
            self.video.imu_enabled = True
        else:
            self.visual_only_init = True

        self.coupled.set_prior(self.coupled.last_t0, self.t1)
        # skip full-rate stamps up to now (dbaf_frontend.py:361-366)
        if self.all_stamp is not None:
            for i in range(len(self.all_stamp)):
                if float(self.all_stamp[i][0]) >= cur_t + 1e-6:
                    self.cur_stamp_ii = i
                    break
        self.graph.update(None, None, use_inactive=True)
