"""Tightly-coupled multi-sensor DBA: dense-BA Hessians inside the factor graph.

Port of the reference's multi-sensor BA path
(/root/reference/dbaf/depth_video.py:347-559) onto the native stack: the
reduced camera system comes from the device (``dba.coupled_hessian``, a few
hundred KB), the IMU/GNSS/odometry/prior/marginal factor graph is solved on
host in f64, and the pose step is pushed back for the device-side depth
back-substitution and retraction (``dba.coupled_retract``).

Sliding-window marginalization converts out-of-window visual+inertial+GNSS
information into a linear-container prior (depth_video.py:350-459),
including the bias-covariance reinflation path (:446-459).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fusion.coupling import convert_dx, convert_hessian, hessian_factor
from ..fusion.factors import (
    B, V, X,
    BetweenVec, CombinedImuFactor, GPSFactor, Noise, PriorPose, PriorVec,
    VelFactor,
)
from ..fusion.graph import FactorGraph, LevenbergMarquardt, Values, marginalize_out
from ..fusion.se3np import Pose
from ..ops import dba
from ..utils import geodesy
from ..utils.config import DBAFusionConfig
from .multisensor import MultiSensorState
from .video import DepthVideo

GNSS_NOISE = Noise.sigmas([1.0, 1.0, 5.0], cauchy_k=0.08)  # depth_video.py:288-290
ODO_NOISE = Noise.sigmas([2.0, 2.0, 2.0])  # depth_video.py:300


@jax.jit
def _stack_Sv(S, v):
    """[S | v] in one buffer so the host pulls the pair in ONE D2H."""
    return jnp.concatenate([S, v[:, None]], axis=1)


@jax.jit
def _gather_rows(arr, idx):
    """Fixed-shape row gather (idx padded to arr length) -- keeps the
    coupled path free of shape-dependent recompilation."""
    return arr[idx]


class MultiSensorBA:
    """Owns the factor-graph state and drives the coupled iterations."""

    def __init__(self, video: DepthVideo, cfg: DBAFusionConfig):
        self.video = video
        self.cfg = cfg
        self.state = MultiSensorState()
        self.last_t0 = 0
        self.last_t1 = 0
        self.marg_factor = None
        self.prior_factor_map: Dict[int, list] = {}
        self.cur_result: Optional[Values] = None
        self.cur_ii = np.zeros(0, dtype=np.int64)
        self.cur_jj = np.zeros(0, dtype=np.int64)
        self.cur_target = None  # device (Ecur, H, W, 2)
        self.cur_weight = None
        self.ignore_imu = False

        # extrinsics / georeferencing (set by the app)
        self.Tbc = Pose()          # body <- camera
        self.tbg = np.zeros(3)     # GNSS lever arm in body
        self.ten0 = None           # ECEF reference
        self.gnss_init_t1 = -1
        self.gnss_init_time = 0.0
        self.vi_init_t1 = -1
        self.vi_init_time = 0.0
        self.reinit = False
        self.init_pose_sigma = np.array([0.1, 0.1, 0.0001, 0.0001, 0.0001, 0.0001])
        self.init_bias_sigma = np.array([1.0, 1.0, 1.0, 0.1, 0.1, 0.1])

        # device-resident solve cache (fusion/device_graph.py): the packed
        # graph + window state stay on the TPU across the rounds of one
        # keyframe step; sync_host() pulls them back once per update call
        self._fg_state = None
        self._fg_pg = None
        self._fg_key = None
        self._fg_synced = True
        self._A_dev = None
        self._lm_stats = None  # (n_iters,) realized LM iterations
        self._fg_rows_np = None  # host state copy riding the host_pack pull
        self._mgd_cache = None   # (key, device MargDense) upload cache
        self._marg_dev = None    # device-computed MargDense (or None)
        self._marg_dev_origin = -1

    # ------------------------------------------------------------------
    def set_prior(self, t0: int, t1: int):
        """Anchor priors on the first two window states (depth_video.py:307-321).

        ``init_pose_sigma`` may be a (2, 6) array giving per-state sigmas
        (the WHU no-GNSS mode, demo_vio_whu.py:203-205)."""
        for i in range(t0, t0 + 2):
            sig = self.init_pose_sigma
            if np.ndim(sig) > 1:
                sig = sig[i - t0]
            fs = [PriorPose(X(i), self.state.wTbs[i], Noise.sigmas(sig))]
            if not self.ignore_imu:
                fs.append(PriorVec(B(i), self.state.bs[i], Noise.sigmas(self.init_bias_sigma)))
            self.prior_factor_map[i] = fs
        self.last_t0 = t0
        self.last_t1 = t1

    def _gnss_factor(self, i: int) -> GPSFactor:
        """GPS factor with ECEF->local conversion + lever arm
        (depth_video.py:504-514)."""
        p = geodesy.Cen(self.ten0).T @ (self.state.gnss_position[i] - self.ten0)
        p = p - self.state.wTbs[i].R @ self.tbg
        return GPSFactor(X(i), p, GNSS_NOISE)

    def rm_new_gnss(self, t1: int):
        """Re-link GNSS/odometry measurements of a culled keyframe onto its
        predecessor inside the marginal (depth_video.py:272-304)."""
        has_gnss = self.gnss_init_t1 > 0 and self.state.gnss_valid[t1]
        has_odo = self.state.odo_valid[t1]
        if not (has_gnss or has_odo) or self._marg_host() is None:
            return
        graph = FactorGraph([self.marg_factor])
        values = Values(self.marg_factor.lin_point)

        def res(key, mirror):
            """cur_result entry, falling back to the host state mirror:
            the async pipeline's drain path reaches here with cur_result
            still at activation-time keys (the reference always has a
            fresh solve in cur_result, depth_video.py:297-299; the
            mirrors hold the same solved state one keyframe laggier)."""
            if self.cur_result is not None and key in self.cur_result:
                return self.cur_result[key]
            return mirror

        if has_gnss:
            T1, T0 = self.state.wTbs[t1], self.state.wTbs[t1 - 1]
            p = geodesy.Cen(self.ten0).T @ (self.state.gnss_position[t1] - self.ten0)
            p = p - self.state.wTbs[t1].R @ self.tbg
            p = p - T1.t + T0.t
            if X(t1 - 1) not in values:
                values[X(t1 - 1)] = res(X(t1 - 1), self.state.wTbs[t1 - 1])
            graph.add(GPSFactor(X(t1 - 1), p, GNSS_NOISE))
        if has_odo:
            v1 = self.state.wTbs[t1].R.T @ self.state.vs[t1]
            v0 = self.state.wTbs[t1 - 1].R.T @ self.state.vs[t1 - 1]
            v = self.state.odo_vel[t1] - v1 + v0
            if X(t1 - 1) not in values:
                values[X(t1 - 1)] = res(X(t1 - 1), self.state.wTbs[t1 - 1])
            if V(t1 - 1) not in values:
                values[V(t1 - 1)] = res(V(t1 - 1), self.state.vs[t1 - 1])
            graph.add(VelFactor(X(t1 - 1), V(t1 - 1), v, ODO_NOISE))
        self.marg_factor = graph.linearize_to_hessian(values)

    # ------------------------------------------------------------------
    def _edge_args(self, ii, jj, e_cap: int, s0: int):
        P = self.cfg.ba.window
        n = len(ii)
        ii_pad = np.zeros(e_cap, dtype=np.int32)
        jj_pad = np.zeros(e_cap, dtype=np.int32)
        ii_pad[:n] = np.clip(np.asarray(ii) - s0, 0, P - 1)
        jj_pad[:n] = np.clip(np.asarray(jj) - s0, 0, P - 1)
        mask = np.zeros(e_cap, dtype=bool)
        mask[:n] = True
        return jnp.asarray(ii_pad), jnp.asarray(jj_pad), jnp.asarray(mask)

    def _vis_hessian(self, ii, jj, target, weight, s0: int, t0: int, t1: int):
        """Device reduced camera system over window [t0, t1) at slot origin
        s0=t0; returns host f64 (H, v) of size (t1-t0)*6."""
        P = self.cfg.ba.window
        ii_d, jj_d, mask = self._edge_args(ii, jj, target.shape[0], s0)
        S, v = dba.coupled_hessian_full(
            self.video.poses, self.video.disps, self.video.damping,
            self.video.intrinsics, target, weight, ii_d, jj_d, mask,
            jnp.asarray(s0, jnp.int32), jnp.asarray(t1 - s0, jnp.int32),
            P=P, eps_damping=self.cfg.ba.eps_damping,
        )
        m = (t1 - t0) * 6
        # ONE blocking pull (each D2H costs a full transport round trip)
        Sv = np.asarray(_stack_Sv(S, v), dtype=np.float64)
        return Sv[:m, :m], Sv[:m, -1]

    def _values_for(self, frames) -> Values:
        vals = Values()
        for i in frames:
            vals[X(i)] = self.state.wTbs[i]
            vals[V(i)] = self.state.vs[i]
            vals[B(i)] = self.state.bs[i]
        return vals

    # ------------------------------------------------------------------
    def _marg_host(self):
        """Host LinearContainerFactor view of the marginal.  When the
        marginal lives on device (device_marg path) this pulls it once
        and converts; the host copy then becomes the source of truth."""
        if self._marg_dev is not None:
            from ..fusion import device_graph as dg
            md = jax.tree.map(np.asarray, jax.device_get(self._marg_dev))
            self.marg_factor = dg.marg_dense_to_factor(
                md, self._marg_dev_origin)
            self._marg_dev = None
            self._mgd_cache = None
        return self.marg_factor

    def _marg_idx(self, t0: int):
        """Edges whose visual information is folded into the marginal on
        a window advance (depth_video.py:354-360)."""
        return (
            (self.cur_ii >= self.last_t0)
            & (self.cur_ii < t0)
            & (self.cur_ii < self.last_t1 - 2)
            & (self.cur_jj < self.last_t1 - 2)
        )

    def _marginalize_device(self, t0: int, t1: int) -> bool:
        """Window-advance marginalization as ONE device dispatch with zero
        pulls (device_graph.marginalize_window_device); the marginal stays
        device-resident until a host consumer materializes it.  Numeric
        core of :meth:`_marginalize`; returns False to fall back to the
        host f64 path (reinit inflation, capacity miss)."""
        from ..fusion import device_graph as dg

        NW = self.cfg.sensors.fg_cap
        P = self.cfg.ba.window
        m = t0 - self.last_t0
        n_old = self.last_t1 - self.last_t0
        if self.reinit or m <= 0 or n_old > NW or NW > P:
            return False

        marg_idx = self._marg_idx(t0)
        marg_ii = self.cur_ii[marg_idx]
        marg_jj = self.cur_jj[marg_idx]
        marg_t1 = int(marg_jj.max()) + 1 if len(marg_ii) else t0 + 1
        if marg_t1 - self.last_t0 > NW:
            return False
        if len(marg_ii) > 0 and self.cur_target is None:
            return False
        pgf = dg.pack_graph_flat(self, self.last_t0, self.last_t1, NW)
        if pgf is None:
            return False
        mgd_old = self._mgd_device(self.last_t0, self.last_t1, NW)
        if mgd_old is None:
            return False
        fgf = dg.pack_state_flat(self, self.last_t0, self.last_t1, NW)

        # bookkeeping identical to the host path
        if len(marg_ii) > 0:
            for i in range(self.last_t0, t0):
                self.video.archive(i)
        for i in sorted(list(self.prior_factor_map.keys())):
            del self.prior_factor_map[i]

        if self.cur_target is not None:
            e_cap = self.cur_target.shape[0]
            sel = np.nonzero(marg_idx)[0]
            sel_pad = np.zeros(e_cap, dtype=np.int32)
            sel_pad[: len(sel)] = sel
            tgt = _gather_rows(self.cur_target, jnp.asarray(sel_pad))
            wgt = _gather_rows(self.cur_weight, jnp.asarray(sel_pad))
        else:  # window advance before any coupled call: no visual info
            h8, w8 = self.video.disps.shape[1:]
            tgt = jnp.zeros((1, h8, w8, 2), jnp.float32)
            wgt = jnp.zeros((1, h8, w8, 2), jnp.float32)
            e_cap = 1
        ii_d, jj_d, mask = self._edge_args(marg_ii, marg_jj, e_cap,
                                           self.last_t0)
        self._marg_dev = dg.marginalize_window_device(
            self.video.poses, self.video.disps, self.video.damping,
            self.video.intrinsics, tgt, wgt, ii_d, jj_d, mask,
            jnp.asarray(self.last_t0, jnp.int32),
            jnp.asarray(fgf), jnp.asarray(pgf), mgd_old, self._A_block(),
            jnp.asarray(m, jnp.int32),
            jnp.asarray(marg_t1 - self.last_t0, jnp.int32),
            jnp.asarray(n_old, jnp.int32),
            P=P, NW=NW, eps_damping=self.cfg.ba.eps_damping,
        )
        self._marg_dev_origin = t0
        self.marg_factor = None
        self._mgd_cache = None
        return True

    # ------------------------------------------------------------------
    def _marginalize(self, t0: int, t1: int, itrs: int):
        """Window-advance marginalization (depth_video.py:350-462)."""
        self._marg_host()  # device marginal -> host before f64 algebra
        marg_idx = self._marg_idx(t0)
        marg_ii = self.cur_ii[marg_idx]
        marg_jj = self.cur_jj[marg_idx]
        marg_paras: List[str] = []
        graph = FactorGraph()
        marg_t1 = t0 + 1

        if len(marg_ii) > 0:
            marg_t1 = int(marg_jj.max()) + 1
            for i in range(self.last_t0, t0):
                marg_paras.append(X(i))
                self.video.archive(i)
            # visual information of the marginalized edges
            sel = np.nonzero(marg_idx)[0]
            e_cap = self.cur_target.shape[0]
            sel_pad = np.zeros(e_cap, dtype=np.int32)
            sel_pad[: len(sel)] = sel
            tgt = _gather_rows(self.cur_target, jnp.asarray(sel_pad))
            wgt = _gather_rows(self.cur_weight, jnp.asarray(sel_pad))
            H, v = self._vis_hessian(
                marg_ii, marg_jj, tgt, wgt, self.last_t0, self.last_t0, marg_t1
            )
            H[np.arange(6), np.arange(6)] += 0.00025  # stability (:399)
            Hg, vg = convert_hessian(H, v, self.Tbc)
            frames = list(range(self.last_t0, marg_t1))
            vis = hessian_factor(frames, self._values_for(frames), Hg, vg)
            graph.add(vis)

        for i in range(self.last_t0, marg_t1):
            if i < t0:
                if X(i) not in marg_paras:
                    marg_paras.append(X(i))
                if not self.ignore_imu:
                    marg_paras += [V(i), B(i)]
                    graph.add(
                        CombinedImuFactor(
                            X(i), V(i), X(i + 1), V(i + 1), B(i), B(i + 1),
                            self.state.preintegrations[i],
                        )
                    )
                if self.gnss_init_t1 > 0 and self.state.gnss_valid[i]:
                    graph.add(self._gnss_factor(i))
                if self.state.odo_valid[i]:
                    graph.add(
                        VelFactor(X(i), V(i), self.state.odo_vel[i], ODO_NOISE)
                    )

        for i in sorted(list(self.prior_factor_map.keys())):
            if i < t0:
                for f in self.prior_factor_map[i]:
                    graph.add(f)
            del self.prior_factor_map[i]
        if self.marg_factor is not None:
            graph.add(self.marg_factor)

        values = self._values_for(range(self.last_t0, max(marg_t1, t1)))
        if self.cur_result is not None:
            for k, val in self.cur_result.items():
                values[k] = val
        self.marg_factor = marginalize_out(graph, values, marg_paras)

        # bias-covariance inflation on reinit (depth_video.py:446-459)
        if self.reinit:
            mapping = {B(t0): B(0)}
            rekeyed = self.marg_factor.rekey(mapping)
            g2 = FactorGraph([rekeyed])
            g2.add(
                BetweenVec(B(0), B(t0), np.zeros(6), Noise.sigmas(self.init_bias_sigma))
            )
            vals2 = Values(rekeyed.lin_point)
            vals2[B(t0)] = vals2[B(0)]
            self.marg_factor = marginalize_out(g2, vals2, [B(0)])
            self.reinit = False

    # ------------------------------------------------------------------
    def ba(self, ii_full, jj_full, valid, target, weight, t1: int,
           itrs: int = 2, reuse_state: bool = False):
        """One coupled multi-sensor DBA call (depth_video.py:347-559).

        ii_full/jj_full/valid: host padded edge endpoints + validity (rows
        aligned with the device target/weight arrays; already combined
        active+inactive and heuristically weighted).
        """
        ii_full = np.asarray(ii_full)
        jj_full = np.asarray(jj_full)
        valid = np.asarray(valid, bool)
        ii = ii_full[valid]
        jj = jj_full[valid]
        t0 = int(min(ii.min(), jj.min()))

        if self.last_t1 != t1 or self.last_t0 != t0:
            self.sync_host()  # marginalization reads host-side state
            if self.last_t0 >= t0:
                t0 = self.last_t0
            elif not (self.cfg.sensors.device_solver
                      and self.cfg.sensors.device_marg
                      and self._marginalize_device(t0, t1)):
                self._marginalize(t0, t1, itrs)
            self.last_t0 = t0
            self.last_t1 = t1

        # active subset (positions in the padded device arrays)
        act = valid & (ii_full >= t0) & (jj_full >= t0)
        sel = np.nonzero(act)[0]
        self.cur_ii = ii_full[sel]
        self.cur_jj = jj_full[sel]
        e_cap = target.shape[0]
        sel_pad = np.zeros(e_cap, dtype=np.int32)
        sel_pad[: len(sel)] = sel
        self.cur_target = _gather_rows(target, jnp.asarray(sel_pad))
        self.cur_weight = _gather_rows(weight, jnp.asarray(sel_pad))

        # device-resident path (SURVEY.md 5.8): the whole coupled call is
        # one dispatch, zero host syncs; falls back to the host f64 graph
        # on capacity/layout misses
        if self.cfg.sensors.device_solver:
            if self._ba_device(t0, t1, e_cap, reuse_state):
                return

        # build the non-visual graph once
        self.sync_host()  # host fallback needs current states
        base = FactorGraph()
        if not self.ignore_imu:
            for i in range(t0 + 1, t1):
                base.add(
                    CombinedImuFactor(
                        X(i - 1), V(i - 1), X(i), V(i), B(i - 1), B(i),
                        self.state.preintegrations[i - 1],
                    )
                )
        for i in sorted(self.prior_factor_map.keys()):
            if t0 <= i < t1:
                for f in self.prior_factor_map[i]:
                    base.add(f)
        if self._marg_host() is not None:
            base.add(self.marg_factor)
        if self.gnss_init_t1 > 0:
            for i in range(t0, t1):
                if self.state.gnss_valid[i]:
                    base.add(self._gnss_factor(i))
        for i in range(t0, t1):
            if self.state.odo_valid[i]:
                base.add(VelFactor(X(i), V(i), self.state.odo_vel[i], ODO_NOISE))

        P = self.cfg.ba.window
        n_iters = 2  # coupled iterations (depth_video.py:524-558)
        ii_d, jj_d, mask = self._edge_args(
            self.cur_ii, self.cur_jj, e_cap, t0
        )
        m = (t1 - t0) * 6
        S, v = dba.coupled_hessian_full(
            self.video.poses, self.video.disps, self.video.damping,
            self.video.intrinsics, self.cur_target, self.cur_weight,
            ii_d, jj_d, mask,
            jnp.asarray(t0, jnp.int32), jnp.asarray(t1 - t0, jnp.int32),
            P=P, eps_damping=self.cfg.ba.eps_damping,
        )
        for it in range(n_iters):
            H = np.asarray(S, dtype=np.float64)[:m, :m]
            vv = np.asarray(v, dtype=np.float64)[:m]
            Hg, vg = convert_hessian(H, vv, self.Tbc)
            frames = list(range(t0, t1))
            initial = self._values_for(frames)
            graph = FactorGraph(base.factors + [
                hessian_factor(frames, initial, Hg, vg)
            ])
            if self.ignore_imu:
                for i in frames:
                    initial.pop(V(i), None)
                    initial.pop(B(i), None)
            result = LevenbergMarquardt(graph, initial).optimize()
            self.cur_result = result

            dx_body = np.zeros((t1 - t0) * 6)
            for i in frames:
                xi = self.state.wTbs[i].local(result[X(i)])
                dx_body[(i - t0) * 6 : (i - t0) * 6 + 6] = xi
                self.state.wTbs[i] = result[X(i)]
                if not self.ignore_imu:
                    self.state.vs[i] = result[V(i)]
                    self.state.bs[i] = result[B(i)]
            dx_cam = convert_dx(dx_body, self.Tbc)

            # device retraction, fused with the next iteration's hessian
            dx_full = np.zeros((P, 6), dtype=np.float32)
            dx_full[: t1 - t0] = dx_cam.reshape(-1, 6)
            self.video.poses, self.video.disps, S, v = (
                dba.coupled_retract_full(
                    self.video.poses, self.video.disps, self.video.damping,
                    self.video.intrinsics, self.cur_target, self.cur_weight,
                    ii_d, jj_d, mask,
                    jnp.asarray(t0, jnp.int32),
                    jnp.asarray(t1 - t0, jnp.int32),
                    jnp.asarray(dx_full), P=P,
                    eps_damping=self.cfg.ba.eps_damping,
                    with_hessian=(it + 1 < n_iters),
                )
            )

    # ------------------------------------------------------------------
    def prepare_device(self, ii_full, jj_full, valid, t1: int, itrs: int):
        """Host prologue for the fused coupled keyframe step
        (slam/coupled_fused.py): window advance + marginalization + factor
        packing.  Returns the device operand dict, or None to fall back to
        the per-round host/device paths."""
        from ..fusion import device_graph as dg

        ii_full = np.asarray(ii_full)
        jj_full = np.asarray(jj_full)
        valid = np.asarray(valid, bool)
        e_all = len(valid)
        ii = ii_full[valid]
        jj = jj_full[valid]
        t0 = int(min(ii.min(), jj.min()))

        if self.last_t1 != t1 or self.last_t0 != t0:
            self.sync_host()
            if self.last_t0 >= t0:
                t0 = self.last_t0
            elif not (self.cfg.sensors.device_solver
                      and self.cfg.sensors.device_marg
                      and self._marginalize_device(t0, t1)):
                self._marginalize(t0, t1, itrs)
            self.last_t0 = t0
            self.last_t1 = t1

        NW = self.cfg.sensors.fg_cap
        P = self.cfg.ba.window
        n = t1 - t0
        if n > NW or NW > P:
            return None

        act = valid & (ii_full >= t0) & (jj_full >= t0)
        sel = np.nonzero(act)[0]
        self.cur_ii = ii_full[sel]
        self.cur_jj = jj_full[sel]
        sel_pad = np.zeros(e_all, dtype=np.int32)
        sel_pad[: len(sel)] = sel

        self.sync_host()
        pgf = dg.pack_graph_flat(self, t0, t1, NW)
        if pgf is None:
            return None
        # ONE H2D for everything the fused kernel needs this keyframe:
        # [graph | state | sel_pad | ii_d | jj_d | mask | t0 | n] as f32
        # (indices are small ints, exact in f32); each separate jnp.asarray
        # on the remote transport costs ~2-5 ms of upload latency
        fgf = dg.pack_state_flat(self, t0, t1, NW)
        nn = len(self.cur_ii)
        ii_pad = np.zeros(e_all, np.float32)
        jj_pad = np.zeros(e_all, np.float32)
        ii_pad[:nn] = np.clip(self.cur_ii - t0, 0, P - 1)
        jj_pad[:nn] = np.clip(self.cur_jj - t0, 0, P - 1)
        mask = np.zeros(e_all, np.float32)
        mask[:nn] = 1.0
        blob = np.concatenate([
            pgf, fgf, sel_pad.astype(np.float32), ii_pad, jj_pad, mask,
            np.asarray([t0, n], np.float32),
        ])
        mgd = self._mgd_device(t0, t1, NW)
        if mgd is None:
            return None
        self._fg_key = (t0, t1)
        return dict(blob=jnp.asarray(blob), mgd=mgd, A=self._A_block())

    def _mgd_device(self, t0: int, t1: int, NW: int):
        """Dense marginal prior as device arrays (fusion/device_graph.py
        MargDense).  Cached per marginal: the marg factor only changes at
        window-advance/reinit events, so between them the upload (the
        (NW*15)^2 H) happens once.  None when a key falls outside the
        window (host fallback)."""
        from ..fusion import device_graph as dg

        if self._marg_dev is not None and self._marg_dev_origin == t0:
            return self._marg_dev
        self._marg_host()  # origin mismatch: self-heal through the host
        key = (t0, id(self.marg_factor))
        if self._mgd_cache is not None and self._mgd_cache[0] == key:
            return self._mgd_cache[1]
        md = dg.marg_dense_np(self.marg_factor, t0, t1, NW)
        if md is None:
            return None
        dev = dg.MargDense(*(jnp.asarray(a) for a in md))
        self._mgd_cache = (key, dev)
        return dev

    # ------------------------------------------------------------------
    def _ba_device(self, t0: int, t1: int, e_cap: int,
                   reuse_state: bool) -> bool:
        """Run the whole coupled call on-device (fusion/device_graph.py):
        hessian -> LM -> retract x2 in ONE dispatch, zero host syncs.
        Returns False (host fallback) on capacity/layout misses.

        Known delta vs the host path: within one keyframe step's rounds
        the GNSS lever-arm correction stays at the round-0 attitude
        (sub-mm for cm-scale lever arms); the host rebuilds it per round.
        """
        from ..fusion import device_graph as dg

        NW = self.cfg.sensors.fg_cap
        P = self.cfg.ba.window
        n = t1 - t0
        if n > NW or NW > P:
            return False
        key = (t0, t1)
        if not reuse_state or self._fg_key != key or self._fg_state is None:
            self.sync_host()
            pgf = dg.pack_graph_flat(self, t0, t1, NW)
            if pgf is None:
                return False
            self._fg_pg = jnp.asarray(pgf)
            self._fg_state = jnp.asarray(dg.pack_state_flat(self, t0, t1, NW))
            self._fg_key = key
        mgd = self._mgd_device(t0, t1, NW)
        if mgd is None:
            return False

        ii_d, jj_d, mask = self._edge_args(self.cur_ii, self.cur_jj,
                                           e_cap, t0)
        self.video.poses, self.video.disps, self._fg_state, self._lm_stats = (
            dg.coupled_rounds_device(
                self.video.poses, self.video.disps, self.video.damping,
                self.video.intrinsics, self.cur_target, self.cur_weight,
                ii_d, jj_d, mask,
                jnp.asarray(t0, jnp.int32), jnp.asarray(n, jnp.int32),
                self._fg_state, self._fg_pg, mgd, self._A_block(),
                P=P, NW=NW, n_iters=self.cfg.ba.lm_iters,
                eps_damping=self.cfg.ba.eps_damping,
            )
        )
        self._fg_synced = False
        self._fg_rows_np = None  # stash (if any) no longer matches state
        return True

    def _A_block(self):
        """Cached device copy of the camera->body tangent adjoint
        (fusion/coupling.py ba2fg_block); Tbc is fixed after init."""
        if self._A_dev is None:
            from ..fusion.coupling import ba2fg_block
            self._A_dev = jnp.asarray(ba2fg_block(self.Tbc), jnp.float32)
        return self._A_dev

    def _Tbc12_dev(self):
        """Cached device copy of the body<-camera extrinsic as 12 floats
        [R(9)|t(3)] (for the in-kernel pose seed, slam/coupled_async.py);
        Tbc is fixed after init."""
        if getattr(self, "_Tbc12", None) is None:
            self._Tbc12 = jnp.asarray(
                np.concatenate([self.Tbc.R.reshape(9), self.Tbc.t]),
                jnp.float32,
            )
        return self._Tbc12

    def stash_state_rows(self, rows_flat_np):
        """Host copy of the flat window state that rode the host_pack pull
        (graph.host_pack); sync_host consumes it with zero extra D2H."""
        self._fg_rows_np = np.asarray(rows_flat_np, np.float64)

    def sync_host(self):
        """Pull the device window states back into the host factor-graph
        bookkeeping (once per keyframe step, not per iteration): ONE flat
        (NW*21,) D2H transfer (device_graph.flatten_state layout), or zero
        transfers when the state rode the host_pack pull."""
        if self._fg_synced or self._fg_state is None or self._fg_key is None:
            return
        t0, t1 = self._fg_key
        NW = self.cfg.sensors.fg_cap
        if self._fg_rows_np is not None:
            rows = self._fg_rows_np.reshape(NW, 21)
        else:
            rows = np.asarray(
                jax.device_get(self._fg_state), np.float64).reshape(NW, 21)
        result = Values()
        for i in range(t0, t1):
            f = i - t0
            self.state.wTbs[i] = Pose(rows[f, :9].reshape(3, 3),
                                      rows[f, 9:12])
            self.state.vs[i] = rows[f, 12:15]
            self.state.bs[i] = rows[f, 15:21]
            result[X(i)] = self.state.wTbs[i]
            result[V(i)] = self.state.vs[i]
            result[B(i)] = self.state.bs[i]
        self.cur_result = result
        self._fg_synced = True
        self._fg_rows_np = None  # one-shot: valid only for this state

    # ------------------------------------------------------------------
    def __getstate__(self):
        """Picklable snapshot: device arrays -> numpy, video unlinked
        (re-attached by DBAFusion.load_state)."""
        self.sync_host()
        self._marg_host()
        d = dict(self.__dict__)
        d["video"] = None
        d["_marg_dev"] = None
        d["_fg_state"] = None
        d["_fg_pg"] = None
        d["_fg_key"] = None
        d["_A_dev"] = None
        d["_fg_synced"] = True
        d["_lm_stats"] = None
        d["_fg_rows_np"] = None
        d["_mgd_cache"] = None
        for k in ("cur_target", "cur_weight"):
            if d.get(k) is not None:
                d[k] = np.asarray(d[k])
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        if self.cur_target is not None:
            self.cur_target = jnp.asarray(self.cur_target)
            self.cur_weight = jnp.asarray(self.cur_weight)

    # ------------------------------------------------------------------
    def rollup(self, roll: int):
        """Rekey all graph state after a window shift
        (dbaf_frontend.py:106-151)."""
        self.last_t0 -= roll
        self.last_t1 -= roll
        self.cur_ii = self.cur_ii - roll
        self.cur_jj = self.cur_jj - roll
        mapping = {}
        for i in range(roll, roll + 200):
            mapping[X(i)] = X(i - roll)
            mapping[V(i)] = V(i - roll)
            mapping[B(i)] = B(i - roll)
        if self._marg_host() is not None:
            self.marg_factor = self.marg_factor.rekey(mapping)
        for fs in self.prior_factor_map.values():
            for f in fs:
                f.keys = tuple(mapping.get(k, k) for k in f.keys)
        self.prior_factor_map = {
            i - roll: fs for i, fs in self.prior_factor_map.items()
        }
        if self.cur_result is not None:
            new_res = Values()
            for k, val in self.cur_result.items():
                idx = int(k[1:])
                new_res[k[0] + str(idx - roll)] = val
            self.cur_result = new_res
        self.state.rollup(roll)
        # vi_init_t1 / gnss_init_t1 are "has initialized" flags compared
        # against 0 (frontend.py gates, ba() GNSS gate) -- the reference
        # never shifts them on rollup (dbaf_frontend.py:89-151)
