"""Fully device-resident per-frame step: the async visual pipeline.

The synchronous flow costs one host round trip per frame (~25 ms on the
remote transport): the motion-gate scalar must reach the host before it
can do edge bookkeeping and dispatch the update kernel.  This module
fuses the WHOLE per-frame step -- feature extraction, motion gate,
admission writes, edge-state transition (slam/edge_select.py), update
rounds, and the next frame's proximity distances -- into ONE dispatch
whose control decisions are all taken on device.  The host streams
frames back-to-back and drains the small per-frame packs with a two
-frame lag, so the transport latency overlaps device compute.

Scope: visual-only configs.  Keyframe culls are handled in-kernel: the
cull decided by one step's rounds resolves at the start of the NEXT
step (a deferred `prev_cull` flag mirroring frontend._pending_t1), via
a lax.cond branch that shifts the buffer rows, re-seeds, re-indexes
both edge stores (edge_select.cull_transition), and recomputes the
proximity distances on the shifted state.  Rollup ALSO runs in-kernel
(it is pure index bookkeeping, dbaf_frontend.py:253-257): when the
admitted count crosses ``rollup_start`` the step rolls every carried
buffer by ``rollup_shift`` rows and re-indexes both edge stores, in
the same position the synchronous flow does it (after edge selection,
before the update rounds); the host mirrors the shift from the lagged
pack flag.  The pipeline never drains for a rollup -- only for
terminate/save_state (and under save_pkl, where rollup must archive
marginalized rows host-side).  The reference semantics of every step
are unchanged -- the same admission, selection, dedup, eviction, cull,
rollup, rounds, and seeding run, just on device
(covisible_graph.py:180-211, 357-441, dbaf_frontend.py:153-375).
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import corr as corr_ops
from ..ops import projective as pj
from ..utils.config import DBAFusionConfig
from .edge_select import cull_transition, edge_transition, roll_transition
from .graph import EdgeArrays, _rebuild_edges, _rebuild_inactive, \
    make_update_kernel


def make_step_kernel(
    cfg: DBAFusionConfig,
    update_fn: Callable,
    feat_fn: Callable,
    ctx_fn: Callable,
    e_cap: int,
    i_cap: int,
    ring: int = 16,
):
    """One-dispatch per-frame step (gate + admit + transition + rounds).

    ``ring`` sizes the carried per-frame pack RING: the host drain pulls
    the ONE ring array instead of a stack of per-step pack outputs.
    Must cover the maximum queue depth (lag + drain batch).  Measured
    (tools/profile_gateloop.py): the drain wall time is unchanged vs the
    stacked pull (~15 ms/frame at B=8) — it is dominated by waiting out
    the BACKLOG of enqueued steps (~12 ms/step of transport-side
    per-dispatch overhead even when device compute is ~1 ms), not by the
    transfer — but the ring is one transfer instead of a B-input stack
    dispatch and keeps the queue free of device references."""
    mega_raw = make_update_kernel(cfg, update_fn, e_cap, i_cap).raw
    gcfg = cfg.graph
    wf = gcfg.frontend_window
    src = 5
    # skip edges only ever fire at frontend_window == 5: the reference
    # gates them on max(ii)-min(ii) == frontend_window-1
    # (covisible_graph.py:371-373) and the frontend always passes a fixed
    # 5-row candidate block (dbaf_frontend.py t1-5), so for any other
    # window they are dead in the reference too.  CovisibleGraph warns
    # when skip_edge is configured with wf != 5.
    skip = tuple(gcfg.skip_edge) if wf == 5 else ()
    n_skip = len(skip)
    P = cfg.ba.window

    def step(
        image,                       # (1, H, W, 3) uint8 host frame
        poses, disps, disps_sens, damping, intrinsics,
        fmaps_buf, nets_buf, inps_buf,
        e_net, e_target, e_weight,
        ii, jj, age, e_valid,
        t_inac, w_inac, ii_i, jj_i, i_valid,
        bad_ii, bad_jj, bad_valid,
        kf_fmap, kf_net, kf_inp,
        t1, prox_d, prev_cull,
        pack_ring, ring_pos,
        rounds_a, rounds_b, roll_start, roll_shift,
    ):
        # ---- deferred cull bookkeeping from the previous step
        # (frontend.resolve_pending: rm_keyframe + seed + fresh distances).
        # A cond, not a where: the identity branch must not pay the edge
        # -store gathers (~tens of MB of net/target/weight) every frame.
        B = poses.shape[0]

        def _apply_cull(op):
            (poses, disps, disps_sens, damping,
             fmaps_buf, nets_buf, inps_buf,
             e_net, e_target, e_weight, ii, jj, age, e_valid,
             t_inac, w_inac, ii_i, jj_i, i_valid, t1, prox_d) = op
            ixc = jnp.clip(t1 - 2, 0, B - 1)

            def shift_row(buf):
                row = jax.lax.dynamic_index_in_dim(
                    buf, jnp.clip(ixc + 1, 0, B - 1), 0, keepdims=False
                )
                return jax.lax.dynamic_update_index_in_dim(buf, row, ixc, 0)

            poses = shift_row(poses)
            disps = shift_row(disps)
            disps_sens = shift_row(disps_sens)
            damping = shift_row(damping)
            fmaps_buf = shift_row(fmaps_buf)
            nets_buf = shift_row(nets_buf)
            inps_buf = shift_row(inps_buf)
            t1 = t1 - 1

            # re-seed the now-free slot (video.seed_next)
            slot = jnp.clip(t1, 0, B - 1)
            poses = poses.at[slot].set(poses[slot - 1])
            disps = disps.at[slot].set(jnp.mean(disps[slot - 1]))

            ct = cull_transition(
                ii, jj, age, e_valid, ii_i, jj_i, i_valid, ixc
            )
            edges0 = _rebuild_edges(
                e_net, e_target, e_weight, ct["perm"],
                jnp.zeros((ii.shape[0],), bool), ct["ii"], ct["jj"],
                poses, disps, intrinsics, nets_buf.astype(jnp.bfloat16),
            )
            t_inac, w_inac = _rebuild_inactive(
                t_inac, w_inac, ct["inact_perm_old"],
                jnp.zeros((ii_i.shape[0],), bool),
                jnp.zeros((ii_i.shape[0],), jnp.int32), e_target, e_weight,
            )

            # fresh proximity distances on the culled state (the carried
            # pack was computed pre-shift; graph._candidate_distances
            # falls back to video.distance the same way host-side)
            t_next = t1 + 1
            pi = jnp.repeat(
                t_next - src + jnp.arange(src, dtype=jnp.int32), wf
            )
            pj_ = jnp.tile(
                t_next - wf + jnp.arange(wf, dtype=jnp.int32), src
            )
            if n_skip:
                sk = jnp.asarray(list(skip), jnp.int32)
                pi = jnp.concatenate([pi, jnp.full((n_skip,), t_next - 1)])
                pj_ = jnp.concatenate([pj_, t_next - src + sk])
            prox_d = pj.frame_distance_bidirectional(
                poses, disps, intrinsics,
                jnp.clip(pi, 0, B - 1), jnp.clip(pj_, 0, B - 1),
                beta=gcfg.beta,
            )
            return (
                poses, disps, disps_sens, damping,
                fmaps_buf, nets_buf, inps_buf,
                edges0.net, edges0.target, edges0.weight,
                ct["ii"], ct["jj"], ct["age"], ct["valid"],
                t_inac, w_inac, ct["ii_i"], ct["jj_i"], ct["i_valid"],
                t1, prox_d,
            )

        (poses, disps, disps_sens, damping,
         fmaps_buf, nets_buf, inps_buf,
         e_net, e_target, e_weight, ii, jj, age, e_valid,
         t_inac, w_inac, ii_i, jj_i, i_valid, t1, prox_d) = jax.lax.cond(
            prev_cull, _apply_cull, lambda op: op,
            (poses, disps, disps_sens, damping,
             fmaps_buf, nets_buf, inps_buf,
             e_net, e_target, e_weight, ii, jj, age, e_valid,
             t_inac, w_inac, ii_i, jj_i, i_valid, t1, prox_d),
        )

        # ---- motion gate (motion_filter.py make_feat_gate body)
        fmap_cur = feat_fn(image)[0]
        H, W = kf_fmap.shape[0], kf_fmap.shape[1]
        vol = corr_ops.build_volume_nhwc(
            kf_fmap[None].astype(jnp.bfloat16),
            fmap_cur[None].astype(jnp.bfloat16),
        )
        coords0 = pj.coords_grid(H, W)[None]
        gate_corr = corr_ops.lookup_auto(vol, coords0).transpose(0, 2, 3, 1)
        zero_motn = jnp.zeros((1, H, W, 4), dtype=kf_net.dtype)
        z = jnp.zeros((1,), dtype=jnp.int32)
        _, delta, _ = update_fn(
            kf_net[None], kf_inp[None], gate_corr.astype(kf_net.dtype),
            zero_motn, z, z, {},
        )
        delta_mag = jnp.mean(jnp.linalg.norm(delta[0], axis=-1))
        thresh = cfg.frontend.filter_thresh
        admitted = (delta_mag > thresh) if thresh >= 0 else jnp.asarray(True)
        adm_f = admitted.astype(jnp.float32)

        # ---- admission writes (motion_filter.py admit)
        net0, inp0 = ctx_fn(image)
        idx = jnp.clip(t1, 0, fmaps_buf.shape[0] - 1)
        a4 = admitted
        fmaps_buf = jnp.where(
            a4, fmaps_buf.at[idx].set(fmap_cur.astype(fmaps_buf.dtype)),
            fmaps_buf,
        )
        nets_buf = jnp.where(
            a4, nets_buf.at[idx].set(net0[0].astype(nets_buf.dtype)), nets_buf
        )
        inps_buf = jnp.where(
            a4, inps_buf.at[idx].set(inp0[0].astype(inps_buf.dtype)), inps_buf
        )
        kf_fmap = jnp.where(a4, fmap_cur, kf_fmap)
        kf_net = jnp.where(a4, net0[0].astype(kf_net.dtype), kf_net)
        kf_inp = jnp.where(a4, inp0[0].astype(kf_inp.dtype), kf_inp)
        t1n = t1 + admitted.astype(jnp.int32)

        # ---- edge transition (gated: identity when not admitted)
        tr = edge_transition(
            ii, jj, age, e_valid, ii_i, jj_i, i_valid,
            bad_ii, bad_jj, bad_valid,
            prox_d, t1n, gcfg.frontend_thresh,
            src=src, wf=wf, n_skip=n_skip, skip_offsets=skip,
            rad=gcfg.frontend_radius, nms=gcfg.frontend_nms,
            max_factors=gcfg.max_factors, max_age=gcfg.max_age,
            active_window=cfg.frontend.active_window,
            visual_only=True, max_out=4 * (gcfg.max_factors + 60),
        )
        E = ii.shape[0]
        I = ii_i.shape[0]
        idE = jnp.arange(E, dtype=jnp.int32)
        idI = jnp.arange(I, dtype=jnp.int32)
        sel = lambda new, old: jnp.where(admitted, new, old)
        ii2 = sel(tr["ii"], ii)
        jj2 = sel(tr["jj"], jj)
        age2 = sel(tr["age"], age)
        e_valid2 = sel(tr["valid"], e_valid)
        perm = sel(tr["perm"], idE)
        is_new = sel(tr["is_new"], jnp.zeros((E,), bool))
        ii_i2 = sel(tr["ii_i"], ii_i)
        jj_i2 = sel(tr["jj_i"], jj_i)
        i_valid2 = sel(tr["i_valid"], i_valid)
        ip_old = sel(tr["inact_perm_old"], idI)
        ip_act = sel(tr["inact_from_act"], jnp.zeros((I,), bool))
        ip_idx = sel(tr["inact_act_idx"], jnp.zeros((I,), jnp.int32))

        t_inac, w_inac = _rebuild_inactive(
            t_inac, w_inac, ip_old, ip_act, ip_idx, e_target, e_weight
        )
        edges = _rebuild_edges(
            e_net, e_target, e_weight, perm, is_new, ii2, jj2,
            poses, disps, intrinsics, nets_buf.astype(jnp.bfloat16),
        )

        # ---- in-kernel rollup (dbaf_frontend.py:253-257 / video.rollup +
        # graph.shift_indices): pure index bookkeeping, applied in the
        # synchronous flow's position -- after edge selection, before the
        # update rounds (frontend._update_visual_fused).  The host mirrors
        # the tstamp/images shift from the lagged pack flag; the pipeline
        # never drains for a rollup.
        do_roll = t1n > roll_start
        I = ii_i.shape[0]

        def _apply_roll(op):
            (poses, disps, disps_sens, damping,
             fmaps_buf, nets_buf, inps_buf,
             ii2, jj2, ii_i2, jj_i2, i_valid2,
             bad_ii, bad_jj, bad_valid, t_inac, w_inac, t1n) = op
            r = roll_shift
            roll = lambda b: jnp.roll(b, -r, axis=0)
            poses, disps, disps_sens, damping = (
                roll(poses), roll(disps), roll(disps_sens), roll(damping))
            fmaps_buf, nets_buf, inps_buf = (
                roll(fmaps_buf), roll(nets_buf), roll(inps_buf))
            # active edges only re-index: the visual stale rule (age AND
            # window) lets negative indices survive; kernels clip them
            # (graph.shift_indices)
            ii2 = ii2 - r
            jj2 = jj2 - r
            # inactive/bad stores: drop negatives + compact + re-index
            # (shared in-kernel twin of graph.shift_indices)
            rt = roll_transition(ii_i2, jj_i2, i_valid2,
                                 bad_ii, bad_jj, bad_valid, r)
            t_inac, w_inac = _rebuild_inactive(
                t_inac, w_inac, rt["inact_perm_old"],
                jnp.zeros((I,), bool), jnp.zeros((I,), jnp.int32),
                edges.target, edges.weight)
            return (poses, disps, disps_sens, damping,
                    fmaps_buf, nets_buf, inps_buf,
                    ii2, jj2, rt["ii_i"], rt["jj_i"], rt["i_valid"],
                    rt["bad_ii"], rt["bad_jj"], rt["bad_valid"],
                    t_inac, w_inac, t1n - r)

        (poses, disps, disps_sens, damping,
         fmaps_buf, nets_buf, inps_buf,
         ii2, jj2, ii_i2, jj_i2, i_valid2,
         bad_ii, bad_jj, bad_valid, t_inac, w_inac, t1n) = jax.lax.cond(
            do_roll, _apply_roll, lambda op: op,
            (poses, disps, disps_sens, damping,
             fmaps_buf, nets_buf, inps_buf,
             ii2, jj2, ii_i2, jj_i2, i_valid2,
             bad_ii, bad_jj, bad_valid, t_inac, w_inac, t1n),
        )

        # ---- update rounds (the mega body, 0 rounds when not admitted)
        big = jnp.int32(10**6)
        t0r = jnp.maximum(
            1, jnp.min(jnp.where(e_valid2, ii2, big)).astype(jnp.int32) + 1
        )
        s0 = jnp.maximum(0, t1n - P)
        ra = jnp.where(admitted, rounds_a, 0).astype(jnp.int32)
        rb = jnp.where(admitted, rounds_b, 0).astype(jnp.int32)

        res, traj_row = mega_raw(
            poses, disps, disps_sens, damping, intrinsics,
            fmaps_buf, inps_buf, None,
            edges.net, edges.target, edges.weight,
            ii2, jj2, e_valid2,
            t_inac, w_inac, ii_i2, jj_i2, i_valid2,
            t0r, t1n, s0,
            jnp.asarray(False),
            {},
            ra, rb,
            iters=cfg.ba.iters, use_inactive=True, do_ba=True,
            use_sens=False, seed_next=False, mega=True,
        )

        # ages advance by the executed rounds; on a cull the mega body
        # gates rounds_b off, so they don't count (graph.finish_mega)
        cull = res.host_pack[0] > 0.5
        rb_run = jnp.where(cull, 0, rb)
        age3 = jnp.where(e_valid2, age2 + ra + rb_run, age2)

        # pack: [admitted, delta, cull_flag, d_cull, roll_flag, traj(7),
        # prox...]
        pack = jnp.concatenate([
            jnp.asarray([adm_f, delta_mag]),
            res.host_pack[:2],
            do_roll.astype(jnp.float32)[None],
            traj_row.astype(jnp.float32),
            res.host_pack[2:],
        ])
        prox_next = res.host_pack[2:]

        state = dict(
            poses=res.poses, disps=res.disps, disps_sens=disps_sens,
            damping=damping, intrinsics=intrinsics,
            fmaps_buf=fmaps_buf, nets_buf=nets_buf, inps_buf=inps_buf,
            e_net=res.edges.net, e_target=res.edges.target,
            e_weight=res.edges.weight,
            ii=ii2, jj=jj2, age=age3, e_valid=e_valid2,
            t_inac=t_inac, w_inac=w_inac, ii_i=ii_i2, jj_i=jj_i2,
            i_valid=i_valid2,
            bad_ii=bad_ii, bad_jj=bad_jj, bad_valid=bad_valid,
            kf_fmap=kf_fmap, kf_net=kf_net, kf_inp=kf_inp,
            t1=t1n, prox_d=prox_next,
            # the cull decided by this step's rounds resolves at the START
            # of the next step (mirrors frontend._pending_t1); zero rounds
            # (non-admitted) leave d_cull at +inf so the flag stays False
            prev_cull=cull,
            pack_ring=jax.lax.dynamic_update_index_in_dim(
                pack_ring, pack, ring_pos % ring, 0
            ),
            ring_pos=ring_pos + 1,
        )
        return state, pack

    # donate the carried state (args 1..31 except image/scalars).  The
    # pack ring is deliberately NOT donated: the host queue keeps each
    # step's ring VERSION so the drain can pull the ring as of the
    # newest drained step — which is ``lag`` steps old and long
    # executed — instead of blocking on the whole enqueued backlog
    # (~12 ms/step of transport dispatch overhead).  The copy is a few
    # hundred floats per step.
    return jax.jit(step, donate_argnums=tuple(range(1, 27)))


_STATE_KEYS = (
    "poses", "disps", "disps_sens", "damping", "intrinsics",
    "fmaps_buf", "nets_buf", "inps_buf",
    "e_net", "e_target", "e_weight",
    "ii", "jj", "age", "e_valid",
    "t_inac", "w_inac", "ii_i", "jj_i", "i_valid",
    "bad_ii", "bad_jj", "bad_valid",
    "kf_fmap", "kf_net", "kf_inp",
    "t1", "prox_d", "prev_cull",
    "pack_ring", "ring_pos",
)


class AsyncPipeline:
    """Streams frames through the step kernel with a lagged pack drain."""

    def __init__(self, system, lag: int = 2):
        self.sys = system
        self.cfg = system.cfg
        self.lag = lag
        self.kernel = None
        self.state = None
        self.queue: deque = deque()
        self.t1_mirror = 0
        self.active = False
        # save_pkl must archive marginalized rows host-side at rollup, so
        # it keeps the drain->host-rollup->re-enter path; everything else
        # rolls in-kernel (the kernel sees an unreachable trigger when
        # archival is on)
        self.host_rollup = bool(getattr(self.cfg, "save_pkl", False))
        self._roll_start = (
            10 ** 9 if self.host_rollup else self.cfg.frontend.rollup_start
        )
        # packs pulled per host D2H round trip (one stacked transfer).
        # Host-rollup mode: clamped so the lagged rollup trigger keeps
        # buffer headroom (device t1 runs up to lag+batch frames ahead of
        # t1_mirror).  Device-rollup mode: t1 is bounded by the in-kernel
        # roll itself, no clamp needed.
        batch = int(getattr(self.cfg.frontend, "async_drain_batch", 1))
        if self.host_rollup:
            slack = (
                self.cfg.buffer - self.cfg.frontend.rollup_start - lag - 3
            )
            batch = min(batch, slack)
        self.drain_batch = max(1, batch)
        # per-frame pack ring capacity (device-side; see make_step_kernel)
        self.ring = self.lag + self.drain_batch
        self._abs_idx = 0

    # ------------------------------------------------------------------
    def can_activate(self) -> bool:
        fe = self.sys.frontend
        cfg = self.cfg
        return (
            bool(getattr(cfg.frontend, "async_pipeline", False))
            and fe.is_initialized
            and fe.all_imu is None
            and not cfg.stereo
            and not self.sys.video.has_depth
            and fe.t1 >= max(cfg.graph.frontend_window, 5)
        )

    def activate(self):
        """Enter async mode from a fully synchronized host state."""
        sysm = self.sys
        g, v, fe, flt = sysm.graph, sysm.video, sysm.frontend, sysm.filter
        fe._resolve_pending()
        g._flush()
        if self.kernel is None:
            # ring must cover the maximum queue depth (lag + drain batch)
            self.ring = self.lag + self.drain_batch
            self.kernel = make_step_kernel(
                self.cfg, g.update_fn, flt.feat, flt.ctx, g.e_cap, g.i_cap,
                ring=self.ring,
            )

        E, I = g.e_cap, g.i_cap
        pad = lambda a, n, cap: np.concatenate(
            [np.asarray(a, np.int32), np.zeros(cap - n, np.int32)]
        )
        pre = np.zeros
        prox = g._host_pack_dev
        off = g._prox_offset
        bc = 64
        nb = min(len(g.ii_bad), bc)
        self.state = dict(
            poses=v.poses, disps=v.disps, disps_sens=v.disps_sens,
            damping=v.damping, intrinsics=v.intrinsics,
            fmaps_buf=v.fmaps, nets_buf=v.nets, inps_buf=v.inps,
            e_net=g.edges.net, e_target=g.edges.target,
            e_weight=g.edges.weight,
            ii=jnp.asarray(pad(g.ii, g.n, E)),
            jj=jnp.asarray(pad(g.jj, g.n, E)),
            age=jnp.asarray(pad(g.age, g.n, E)),
            e_valid=jnp.asarray(np.arange(E) < g.n),
            t_inac=g.t_inac, w_inac=g.w_inac,
            ii_i=jnp.asarray(pad(g.ii_inac, len(g.ii_inac), I)),
            jj_i=jnp.asarray(pad(g.jj_inac, len(g.jj_inac), I)),
            i_valid=jnp.asarray(np.arange(I) < len(g.ii_inac)),
            bad_ii=jnp.asarray(pad(g.ii_bad[:nb], nb, bc)),
            bad_jj=jnp.asarray(pad(g.jj_bad[:nb], nb, bc)),
            bad_valid=jnp.asarray(np.arange(bc) < nb),
            kf_fmap=flt._kf_fmap, kf_net=flt._kf_net, kf_inp=flt._kf_inp,
            t1=jnp.asarray(fe.t1, jnp.int32),
            prox_d=prox[off:].astype(jnp.float32),
            prev_cull=jnp.asarray(False),  # _resolve_pending ran above
            pack_ring=jnp.zeros(
                (self.ring, 12 + 5 * self.cfg.graph.frontend_window
                 + (len(self.cfg.graph.skip_edge)
                    if self.cfg.graph.frontend_window == 5 else 0)),
                jnp.float32),
            ring_pos=jnp.asarray(0, jnp.int32),
        )
        self.t1_mirror = fe.t1
        self.queue.clear()
        self._abs_idx = 0
        self.active = True

    # ------------------------------------------------------------------
    def track(self, tstamp: float, image: np.ndarray):
        img = jnp.asarray(np.asarray(image, dtype=np.uint8))[None]
        st = self.state
        args = [st[k] for k in _STATE_KEYS]
        state, pack = self.kernel(
            img, *args,
            jnp.asarray(self.cfg.frontend.iters1, jnp.int32),
            jnp.asarray(self.cfg.frontend.iters2, jnp.int32),
            jnp.asarray(self._roll_start, jnp.int32),
            jnp.asarray(self.cfg.frontend.rollup_shift, jnp.int32),
        )
        self.state = state
        small = np.asarray(image[::8, ::8]).astype(np.uint8)
        self.queue.append(
            (tstamp, small, self._abs_idx, state["pack_ring"])
        )
        self._abs_idx += 1
        if len(self.queue) >= self.lag + self.drain_batch:
            self._drain(self.drain_batch)
        # save_pkl only: rollup check on the lagged mirror (lag+batch
        # slack is covered by the buffer headroom; see drain_batch clamp)
        if self.host_rollup and \
                self.t1_mirror > self.cfg.frontend.rollup_start:
            self.sync()
            self._host_rollup()
            self.activate()

    def _drain(self, k: int):
        """Pull ``k`` queued packs via ONE D2H transfer of the carried
        pack RING and apply them in order (see make_step_kernel's ring
        note for the measured cost structure)."""
        batch = [self.queue.popleft() for _ in range(min(k, len(self.queue)))]
        if not batch:
            return
        # ring as of the NEWEST drained step: contains every batch pack
        # (batch span <= ring size) and only waits for a step that is
        # ``lag`` dispatches old — not the whole enqueued backlog
        ring = np.asarray(batch[-1][3])  # one pull
        for tstamp, small, idx, _ in batch:
            self._apply_pack(tstamp, small, ring[idx % self.ring])

    def _drain_one(self):
        self._drain(1)

    def _apply_pack(self, tstamp, small, pack):
        admitted = pack[0] > 0.5
        v = self.sys.video
        fe = self.sys.frontend
        if admitted:
            idx = self.t1_mirror
            if idx < len(v.tstamp):
                v.tstamp[idx] = tstamp
                v.images_small[idx] = small
            self.t1_mirror += 1
            fe.trajectory.append((tstamp, pack[5:12]))
        if pack[4] > 0.5:
            # in-kernel rollup this step: mirror the host-side buffers
            # (video.rollup's tstamp/image shift; no archival -- save_pkl
            # configs use the host-rollup path instead)
            roll = self.cfg.frontend.rollup_shift
            v.tstamp = np.roll(v.tstamp, -roll)
            v.images_small = np.roll(v.images_small, -roll, axis=0)
            self.t1_mirror -= roll
            fe.rollup_count += 1
        if pack[2] > 0.5:
            # this step decided to cull keyframe t1-2; mirror the host
            # tstamp/image shift (video.rm_keyframe) so later admissions
            # land in the right slots.  The device applies the same shift
            # at the start of its NEXT step (prev_cull).
            ix = self.t1_mirror - 2
            v.tstamp[ix] = v.tstamp[ix + 1]
            v.images_small[ix] = v.images_small[ix + 1]
            self.t1_mirror -= 1
        self.sys.video.counter = self.t1_mirror

    # ------------------------------------------------------------------
    def sync(self):
        """Drain everything and write the device edge state back into the
        host mirrors so the synchronous machinery can resume."""
        while self.queue:
            self._drain(len(self.queue))
        st = self.state
        g, v, fe, flt = (
            self.sys.graph, self.sys.video, self.sys.frontend,
            self.sys.filter,
        )
        n = int(np.sum(np.asarray(st["e_valid"])))
        ni = int(np.sum(np.asarray(st["i_valid"])))
        g.ii = np.asarray(st["ii"])[:n].astype(np.int64)
        g.jj = np.asarray(st["jj"])[:n].astype(np.int64)
        g.age = np.asarray(st["age"])[:n].astype(np.int64)
        g.ii_inac = np.asarray(st["ii_i"])[:ni].astype(np.int64)
        g.jj_inac = np.asarray(st["jj_i"])[:ni].astype(np.int64)
        g.edges = EdgeArrays(st["e_net"], st["e_target"], st["e_weight"])
        g.t_inac, g.w_inac = st["t_inac"], st["w_inac"]
        g._perm = np.arange(g.e_cap, dtype=np.int32)
        g._is_new = np.zeros(g.e_cap, dtype=bool)
        g._dirty = False
        g._host_pack_dev = jnp.concatenate(
            [jnp.asarray([0.0, 0.0]), st["prox_d"]]
        )
        g._host_pack_np = None
        g._prox_offset = 2
        g._host_pack_t1 = int(st["t1"])
        v.poses, v.disps = st["poses"], st["disps"]
        v.disps_sens, v.damping = st["disps_sens"], st["damping"]
        v.intrinsics = st["intrinsics"]
        v.fmaps, v.nets, v.inps = (
            st["fmaps_buf"], st["nets_buf"], st["inps_buf"],
        )
        v.counter = int(st["t1"])
        fe.t1 = int(st["t1"])
        flt._kf_fmap = st["kf_fmap"]
        flt._kf_net = st["kf_net"]
        flt._kf_inp = st["kf_inp"]
        if bool(np.asarray(st["prev_cull"])):
            # the last step's cull never reached the device (it would have
            # resolved at the start of the next step): finish it host-side,
            # exactly frontend.resolve_pending.  The drain already applied
            # the tstamp/image shift; video.rm_keyframe's re-write of the
            # same two rows is idempotent.
            g.rm_keyframe(fe.t1 - 2)
            fe.t1 -= 1
            v.seed_next(fe.t1)
            g._host_pack_t1 = -(10 ** 6)  # prox pack is pre-shift: invalid
        self.t1_mirror = fe.t1
        self.active = False

    def _host_rollup(self):
        fe, v, g = self.sys.frontend, self.sys.video, self.sys.graph
        roll = self.cfg.frontend.rollup_shift
        v.rollup(roll)
        g.shift_indices(roll)
        fe.t1 -= roll
        fe.count -= roll
        self.t1_mirror = fe.t1
