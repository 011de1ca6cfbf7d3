"""Fused multi-round coupled keyframe step: ONE dispatch per KEYFRAME.

The sync coupled path issues ~3 dispatches per update round (update kernel,
edge gather, solve) and on a remote-transport TPU each dispatch costs a
round trip, dominating the keyframe budget.  This composes the update
kernel's raw body (slam/graph.py) with the device factor-graph solve
(fusion/device_graph.py) inside one ``lax.fori_loop``, so a whole
coupled keyframe step -- ``rounds_a`` update rounds (reprojection,
correlation, GRU, reduced camera system, factor-graph LM x2, retraction
each), the in-kernel multisensor CULL decision (flow distance +
translation hysteresis, dbaf_frontend.py:317-336), and the conditional
``rounds_b`` post-decision rounds -- is a single jit dispatch with zero
host syncs.  The coupled analog of the visual mega step
(graph.py update_mega / slam/async_pipeline.py).

``run_coupled_rounds`` is the traceable core, shared with the fully
device-resident async coupled pipeline (slam/coupled_async.py).

Reference flow being fused: dbaf_frontend.py:243-357 (iters1 rounds of
covisible_graph.update -> depth_video.ba multi-sensor branch -> keyframe
cull decision -> iters2 rounds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fusion import device_graph as dg
from ..ops import lie
from ..utils.config import DBAFusionConfig

MAX_ROUNDS = 8  # static lm_stats capacity (iters1 + iters2 <= 8 everywhere)


def run_coupled_rounds(
    update_raw, cfg: DBAFusionConfig, NW: int, pack_len: int,
    # video buffers
    poses, disps, disps_sens, damping, intrinsics, fmaps_buf, inps_buf,
    fmaps_right_buf,
    # active + inactive edges (device)
    e_net, e_target, e_weight, ii, jj, e_mask,
    it_target, it_weight, ii_i, jj_i, i_mask,
    # scalars
    t0, t1, s0, aux,
    # coupled-solve operands (window origin fg_t0)
    sel_pad, ii_d, jj_d, mask_d, fg_t0, n_fg, fg, pg, mgd, A,
    # traced round counts
    rounds_a, rounds_b,
    # static
    iters: int, use_inactive: bool, use_sens: bool,
):
    """Traceable core: rounds_a update+solve rounds, the in-kernel cull
    decision on the post-rounds_a state, conditional rounds_b.  Returns
    (poses, disps, e_net, e_target, e_weight, fg, host_pack, cur_target,
    cur_weight, lm_stats, cull, d_cull, wtb_dec)."""
    P = cfg.ba.window
    kf_thresh = cfg.frontend.keyframe_thresh
    t_thresh = cfg.frontend.translation_threshold
    sel_pose = jnp.asarray(dg._sel_pose(NW))
    imu_enabled = jnp.asarray(True, dtype=bool)

    # round-invariant correlation operands, hoisted out of the round loop
    # (features/edges are fixed across a keyframe's rounds; the gathers +
    # Pallas layout packing are ~100 MB of HBM traffic per evaluation)
    from .graph import corr_operands

    corr_prep = corr_operands(
        cfg, fmaps_buf, fmaps_right_buf, inps_buf, ii, jj
    )

    def one(r, carry):
        (poses, disps, e_net, e_target, e_weight, fg, _, _, _,
         lm_stats) = carry
        # the host-metrics pack is consumed on the decide round and (via
        # the carry) the final executed round only; skip it elsewhere
        want = (r == rounds_a - 1) | (r == rounds_a + rounds_b - 1)
        res, (t_all, w_ba) = update_raw(
            poses, disps, disps_sens, damping, intrinsics, fmaps_buf,
            inps_buf, fmaps_right_buf,
            e_net, e_target, e_weight, ii, jj, e_mask,
            it_target, it_weight, ii_i, jj_i, i_mask,
            t0, t1, s0, imu_enabled, aux,
            jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32),
            iters=iters, use_inactive=use_inactive, do_ba=False,
            use_sens=use_sens, seed_next=False, mega=False,
            corr_prep=corr_prep, want_pack=want,
        )
        cur_target = t_all[sel_pad]
        cur_weight = w_ba[sel_pad]
        poses, disps, fg, lm_its = dg.coupled_rounds_body(
            res.poses, res.disps, damping, intrinsics,
            cur_target, cur_weight, ii_d, jj_d, mask_d,
            fg_t0, n_fg, fg, pg, mgd, A, sel_pose,
            P=P, NW=NW, n_iters=cfg.ba.lm_iters, eps_damping=cfg.ba.eps_damping,
        )
        return (poses, disps, res.edges.net, res.edges.target,
                res.edges.weight, fg, res.host_pack,
                cur_target, cur_weight,
                lm_stats.at[jnp.minimum(r, MAX_ROUNDS - 1)].set(lm_its))

    def hyst_norms(poses):
        # translation-hysteresis norms (dbaf_frontend.py:319-325):
        # |rel t| between candidates t1-10+k (k<7) and reference t1-2
        cand = jnp.clip(t1 - 10 + jnp.arange(7, dtype=jnp.int32),
                        0, P - 1)
        ref = poses[jnp.clip(t1 - 2, 0, P - 1)]
        rel = lie.se3_mul(poses[cand], lie.se3_inv(ref)[None])
        return jnp.linalg.norm(rel[:, :3], axis=1)

    def decide(core):
        """Multisensor cull decision on the post-rounds_a state
        (frontend semantics: d from the last round's pre-solve metric
        pack, hysteresis on the post-solve poses; the out-of-range
        candidate slots are masked exactly like the host's k0 slice).
        Also captures the post-rounds_a body pose of the new keyframe
        (12 floats [R(9)|t(3)]) -- the reference writes the trajectory
        row from the post-iters1 state (dbaf_frontend.py:261-274), so
        it must be snapshotted here, before rounds_b run."""
        poses, pack, fg_c = core[0], core[6], core[5]
        d = pack[0]
        hyst = hyst_norms(poses)
        lo = jnp.where(t1 > 10, t1 - 10, t1 - 6)
        k0 = jnp.maximum(lo, 0) - (t1 - 10)
        valid = jnp.arange(7, dtype=jnp.int32) >= k0
        cull = (d < kf_thresh) | jnp.any((hyst < t_thresh) & valid)
        slot = jnp.clip(t1 - 1 - fg_t0, 0, NW - 1)
        wtb = jnp.concatenate([fg_c.R[slot].reshape(9), fg_c.t[slot]])
        return cull, d, wtb

    E_all = sel_pad.shape[0]
    H, W = e_target.shape[1], e_target.shape[2]
    core0 = (poses, disps, e_net, e_target, e_weight, fg,
             jnp.zeros((pack_len,), jnp.float32),
             jnp.zeros((E_all, H, W, 2), jnp.float32),
             jnp.zeros((E_all, H, W, 2), jnp.float32),
             jnp.zeros((MAX_ROUNDS, 2), jnp.int32))

    def gated_body(i, carry):
        core, cull, d_c, wtb = carry
        run = (i < rounds_a) | ~cull
        core = jax.lax.cond(run, lambda c: one(i, c), lambda c: c, core)
        cull, d_c, wtb = jax.lax.cond(
            i == rounds_a - 1, decide, lambda c: (cull, d_c, wtb), core,
        )
        return core, cull, d_c, wtb

    core, cull, d_cull, wtb_dec = jax.lax.fori_loop(
        0, rounds_a + rounds_b, gated_body,
        (core0, jnp.asarray(False), jnp.asarray(jnp.inf, jnp.float32),
         jnp.zeros((12,), jnp.float32)),
    )
    (poses, disps, e_net, e_target, e_weight, fg, host_pack,
     cur_target, cur_weight, lm_stats) = core
    return (poses, disps, e_net, e_target, e_weight, fg, host_pack,
            cur_target, cur_weight, lm_stats, cull, d_cull, wtb_dec,
            hyst_norms(poses))


def make_coupled_fused(update_raw, cfg: DBAFusionConfig, NW: int):
    """Build the fused kernel around an update kernel's ``.raw`` body."""
    # host_pack layout of the update kernel (graph.py host_metrics):
    # [cull_dist] ++ 5*frontend_window proximity candidates ++ skip edges
    wf = cfg.graph.frontend_window
    n_skip = len(cfg.graph.skip_edge) if wf == 5 else 0
    pack_len = 1 + 5 * wf + n_skip

    def fused(
        # video buffers
        poses, disps, disps_sens, damping, intrinsics, fmaps_buf, inps_buf,
        fmaps_right_buf,
        # active + inactive edges (device)
        e_net, e_target, e_weight, ii, jj, e_mask,
        it_target, it_weight, ii_i, jj_i, i_mask,
        # scalars
        t0, t1, s0, imu_enabled, aux,
        # coupled-solve operands: ONE flat f32 buffer (single H2D/keyframe,
        # coupled.prepare_device layout [graph | state | sel_pad | ii_d |
        # jj_d | mask | t0c | n]), the dense marginal prior (device-
        # resident MargDense), and the cached camera->body adjoint
        blob, mgd, A,
        # traced round counts: rounds_a pre-decision rounds, rounds_b
        # post-decision rounds (skipped when the keyframe is culled)
        rounds_a, rounds_b,
        # static
        iters: int, use_inactive: bool, use_sens: bool,
    ):
        G = dg.graph_flat_size(NW)
        e_all = (blob.shape[0] - G - NW * 21 - 2) // 4
        pg = dg.unflatten_graph(blob[:G], NW)
        o = G + NW * 21
        sel_pad = blob[o: o + e_all].astype(jnp.int32)
        ii_d = blob[o + e_all: o + 2 * e_all].astype(jnp.int32)
        jj_d = blob[o + 2 * e_all: o + 3 * e_all].astype(jnp.int32)
        mask_d = blob[o + 3 * e_all: o + 4 * e_all] > 0.5
        fg_t0 = blob[-2].astype(jnp.int32)
        n_fg = blob[-1].astype(jnp.int32)
        fg = dg.unflatten_state(blob[G: o], n_fg, NW)

        (poses, disps, e_net, e_target, e_weight, fg, host_pack,
         cur_target, cur_weight, lm_stats, cull, d_cull, wtb_dec,
         hyst) = run_coupled_rounds(
            update_raw, cfg, NW, pack_len,
            poses, disps, disps_sens, damping, intrinsics, fmaps_buf,
            inps_buf, fmaps_right_buf,
            e_net, e_target, e_weight, ii, jj, e_mask,
            it_target, it_weight, ii_i, jj_i, i_mask,
            t0, t1, s0, aux,
            sel_pad, ii_d, jj_d, mask_d, fg_t0, n_fg, fg, pg, mgd, A,
            rounds_a, rounds_b,
            iters=iters, use_inactive=use_inactive, use_sens=use_sens,
        )
        edge_conf = jnp.mean(e_weight, axis=(1, 2, 3))
        fg_flat_out = dg.flatten_state(fg)
        # append [hysteresis(7) | flat window state | post-rounds_a body
        # pose (12)]: the host pulls the cull-decision pack every keyframe
        # anyway, so everything rides the same single D2H round trip
        host_pack = jnp.concatenate([
            jnp.asarray([jnp.where(cull, 1.0, 0.0), d_cull]),
            host_pack[1:], hyst, fg_flat_out, wtb_dec,
        ])
        return (poses, disps, e_net, e_target, e_weight, edge_conf,
                host_pack, cur_target, cur_weight, fg_flat_out,
                lm_stats)

    return jax.jit(
        fused,
        static_argnames=("iters", "use_inactive", "use_sens"),
        donate_argnums=(0, 1, 8, 9, 10),
    )
