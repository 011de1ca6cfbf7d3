"""Fully device-resident coupled keyframe step: the async multisensor
pipeline (VERDICT r1 item 3).

The fused coupled kernel (slam/coupled_fused.py) already runs a whole
keyframe -- update rounds, factor-graph solve, cull decision -- in ONE
dispatch, but the host still blocks on one D2H pull per keyframe (~25-30
ms on the remote transport) because three consumers of the pulled pack
sit on the host: proximity-edge management, the solved-state sync that
feeds the next keyframe's pose seed / solve init values, and the
window-advance marginalization trigger.  This module moves all three on
device:

* edge lifecycle via the device scheduler replica
  (slam/edge_select.edge_transition, multisensor stale rule);
* state continuation: the factor-graph window state stays device-resident
  between keyframes; the new keyframe's init value and the video pose
  seed are PREDICTED in-kernel from the last state row and the uploaded
  preintegration factor (dbaf_frontend.py:222-228 semantics);
* window-advance marginalization composed in-kernel
  (fusion/device_graph.marginalize_window_body), with the packed factor
  graph re-uploaded per keyframe (pure host data: preintegrations and
  priors never depend on the solve).

Per keyframe the host ingests sensors, packs the factor blob (one H2D),
dispatches, and drains ONE lagged pack (zero pulls when culling is
disabled and the drain finds nothing to mirror -- the pull itself always
overlaps compute).  Trajectory rows are device 7-vecs resolved at
terminate.

Scope: post-VI-init steady state.  save_pkl archival rides the pipeline
(v5): the step kernel emits the rows an in-kernel rollup retires
(``roll_out``, captured pre-roll) and the host archives them lazily at
the next lagged drain -- the reference's dense-mapping export
(dbaf.py:64-140) thus runs at flagship speed.  IMU-rate high-frequency
output (``all_stamp``, dbaf_frontend.py:169-186) also stays on: the
rows propagate host-side from the velocity/bias mirrors, which lag the
device solve by the pipeline depth (ONE keyframe) -- the same bounded
staleness the ZUPT gate sees.  GNSS/odometry/ZUPT factors are fully
supported (v4): they ride the
per-keyframe factor pack (fusion/device_graph.pack_graph_np already
packs gnss/odo rows for the device solver), and on an in-kernel cull the
culled frame's measurement is re-linked onto its predecessor inside the
DEVICE marginal (_relink_culled_gnss_odo == coupled.rm_new_gnss,
reference depth_video.py:272-304) before the per-frame pack rows shift.
GNSS configs activate only after georeferencing (init_gnss rewrites all
poses, a host-side event); the ZUPT admission gate keeps its host
semantics and reads the IMU-propagated velocity mirror, which lags the
device solve by the pipeline depth (one keyframe).  Only init/reinit
events drain the pipeline back to the synchronous host flow (which
remains fully general); ROLLUP runs in-kernel (v3): the step kernel itself decides
``t1 > rollup_start`` (sync semantics, post-cull count), rolls the
video buffers and re-bases every absolute frame index -- the factor
pack, fg state rows, marginal prior, and prox distances are
origin-relative or shift-invariant and stay untouched -- and the host
replays the identical decision right after its lagged drain, before the
next pack is built.  The fg state never leaves device across a rollup,
which removes the round-3 drain/re-enter transient at its root.

Keyframe CULLING (v2) runs fully inside the pipeline: the in-kernel cull
decision (coupled_fused.run_coupled_rounds) is applied at the start of
the NEXT step by the kernel's prev_cull branch (video-row shifts, edge
re-indexing via cull_transition, factor-window row drop, and an exact
preintegration-chunk composition repairing the one factor pack the host
built before learning the cull).  The host mirrors the cull -- the
MultiSensorState preintegration merge and the fresh-buffer row shifts --
from a pack pulled with a ONE-step lag, so the ~RTT pull overlaps device
compute and the pipeline stays full (the step is device-compute-bound at
~75 ms vs ~30 ms RTT).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fusion import device_graph as dg
from ..fusion import preint_device as pint
from ..ops import lie
from ..ops import projective as pj
from ..utils.config import DBAFusionConfig
from .coupled_fused import run_coupled_rounds
from .edge_select import cull_transition, edge_transition, roll_transition
from .graph import EdgeArrays, _rebuild_edges, _rebuild_inactive


def _shift2_kernel(buf, c):
    """Rows c+1 -> c and c+2 -> c+1 (the two rows above a culled slot)."""
    B = buf.shape[0]
    r1 = jax.lax.dynamic_index_in_dim(
        buf, jnp.clip(c + 1, 0, B - 1), 0, keepdims=False
    )
    buf = jax.lax.dynamic_update_index_in_dim(
        buf, r1, jnp.clip(c, 0, B - 1), 0
    )
    r2 = jax.lax.dynamic_index_in_dim(
        buf, jnp.clip(c + 2, 0, B - 1), 0, keepdims=False
    )
    return jax.lax.dynamic_update_index_in_dim(
        buf, r2, jnp.clip(c + 1, 0, B - 1), 0
    )


_shift2_jit = jax.jit(_shift2_kernel, donate_argnums=(0,))


def _shift2_rows(buf, c: int):
    """Host-side twin of the kernel's cull row shift for the video
    buffers the kernel reads fresh per step (jnp device arrays)."""
    return _shift2_jit(buf, jnp.asarray(c, jnp.int32))


def _inv15(M):
    """Jacobi-scaled f32 inverse of a 15x15 SPD information/covariance
    block (the IMU information spans ~10 decades; raw f32 inversion loses
    the small pivots -- same treatment as the device marginalization)."""
    d = jax.lax.rsqrt(jnp.clip(jnp.diagonal(M), 1e-30, None))
    S = M * d[:, None] * d[None, :]
    Sinv = jnp.linalg.inv(S)
    return Sinv * d[:, None] * d[None, :]


def _pg_chunk(pg: dg.PackedGraph, s) -> pint.Chunk:
    """IMU factor slot ``s`` of a packed graph as a preint Chunk (cov
    recovered from the packed information)."""
    return pint.Chunk(
        dR=pg.imu_dR[s], dv=pg.imu_dv[s], dp=pg.imu_dp[s], dt=pg.imu_dt[s],
        dRg=pg.imu_dRg[s], dvg=pg.imu_dvg[s], dva=pg.imu_dva[s],
        dpg=pg.imu_dpg[s], dpa=pg.imu_dpa[s], bias0=pg.imu_bias0[s],
        cov=_inv15(pg.imu_info[s]),
    )


_PG_CHUNK_FIELDS = (
    ("imu_dR", "dR"), ("imu_dv", "dv"), ("imu_dp", "dp"), ("imu_dt", "dt"),
    ("imu_dRg", "dRg"), ("imu_dvg", "dvg"), ("imu_dva", "dva"),
    ("imu_dpg", "dpg"), ("imu_dpa", "dpa"), ("imu_bias0", "bias0"),
)


def _pg_merge_slot(pg: dg.PackedGraph, s, NW: int) -> dg.PackedGraph:
    """Merge IMU factor slots ``s`` and ``s+1`` (a keyframe cull joining
    their intervals) into slot ``s`` via exact chunk composition
    (fusion/preint_device.compose == the host's sequential re-integration,
    multi_sensor.py merge_keyframe), shifting the slots above down."""
    NF = NW - 1
    C = pint.compose(_pg_chunk(pg, s), _pg_chunk(pg, s + 1))
    arF = jnp.arange(NF)
    take = jnp.clip(jnp.where(arF >= s + 1, arF + 1, arF), 0, NF - 1)
    rep = {}
    for pg_name, c_name in _PG_CHUNK_FIELDS:
        arr = getattr(pg, pg_name)
        arr = arr.at[s].set(getattr(C, c_name).astype(arr.dtype))
        rep[pg_name] = arr[take]
    info = pg.imu_info.at[s].set(_inv15(C.cov))
    rep["imu_info"] = info[take]
    # slots >= s+1 take their successor's mask (slot NF-1 gathers itself
    # but is forced dead -- one interval fewer after a merge)
    rep["imu_mask"] = jnp.where(
        arF >= s + 1, pg.imu_mask[take] & (arF < NF - 1), pg.imu_mask
    )
    return pg._replace(**rep)


def _pg_cull_frame_rows(pg: dg.PackedGraph, rc, NW: int) -> dg.PackedGraph:
    """Drop the per-frame GNSS/odo rows of culled pack slot ``rc``,
    shifting the slots above down (the host's merge_keyframe list
    deletion for gnss_valid/gnss_position/odo_valid/odo_vel; the culled
    frame's own measurement was re-linked into the marginal first --
    coupled.rm_new_gnss semantics, reference depth_video.py:272-304)."""
    arW = jnp.arange(NW)
    take = jnp.clip(jnp.where(arW >= rc, arW + 1, arW), 0, NW - 1)
    return pg._replace(
        gnss_pos=pg.gnss_pos[take],
        gnss_mask=jnp.where(arW >= rc, pg.gnss_mask[take] & (arW < NW - 1),
                            pg.gnss_mask),
        odo_vel=pg.odo_vel[take],
        odo_mask=jnp.where(arW >= rc, pg.odo_mask[take] & (arW < NW - 1),
                           pg.odo_mask),
    )


def _relink_culled_gnss_odo(pg: dg.PackedGraph, rows, mgd: dg.MargDense,
                            c, o_prev, h0, NW: int):
    """In-kernel coupled.rm_new_gnss (reference depth_video.py:272-304):
    when the culled keyframe ``c`` carries a GNSS/odometry measurement,
    transfer it onto frame c-1 -- offset by the current relative state --
    and bake the LINEARIZED factor into the device marginal (the host
    flow rebuilds marg_factor via linearize_to_hessian; the lin point is
    the marginal's stored one when frame c-1 is already in it, else the
    current solved state, matching values[X(t1-1)] = cur_result)."""
    rc = c - h0          # pack slot of the culled frame
    f = c - 1 - o_prev   # marginal slot receiving the re-linked factors
    f = jnp.clip(f, 0, NW - 1)
    row_c = rows[jnp.clip(c - o_prev, 0, NW - 1)]
    row_p = rows[f]
    lin_raw = jnp.where(mgd.mask[f], mgd.lin[f], row_p)
    R_lin = lin_raw[:9].reshape(3, 3)
    t_lin = lin_raw[9:12]
    v_lin = lin_raw[12:15]
    H, v = mgd.H, mgd.v
    any_fct = jnp.zeros((), bool)

    # ---- GNSS (GPSFactor on X(c-1); Cauchy weight at the lin point)
    has_g = pg.gnss_mask[jnp.clip(rc, 0, NW - 1)]
    p_new = (pg.gnss_pos[jnp.clip(rc, 0, NW - 1)]
             - row_c[9:12] + row_p[9:12])
    r_g = t_lin - p_new
    e2 = r_g @ (pg.gnss_info @ r_g)
    w = pg.gnss_k2 / (pg.gnss_k2 + e2)
    Lam_g = w * pg.gnss_info
    JtL = R_lin.T @ Lam_g
    mg = has_g.astype(H.dtype)
    g_rows = 15 * f + 3 + jnp.arange(3)
    H = H.at[g_rows[:, None], g_rows[None, :]].add(mg * (JtL @ R_lin))
    v = v.at[g_rows].add(mg * (-(JtL @ r_g)))
    any_fct = any_fct | has_g

    # ---- odometry (VelFactor on X(c-1), V(c-1))
    has_o = pg.odo_mask[jnp.clip(rc, 0, NW - 1)]
    Rc = row_c[:9].reshape(3, 3)
    Rp = row_p[:9].reshape(3, 3)
    v_new = (pg.odo_vel[jnp.clip(rc, 0, NW - 1)]
             - Rc.T @ row_c[12:15] + Rp.T @ row_p[12:15])
    vb = R_lin.T @ v_lin
    r_o = vb - v_new
    Jo = jnp.concatenate([dg._hat(vb), R_lin.T], axis=1)  # (3, 6) [w, vel]
    JtLo = Jo.T @ pg.odo_info
    mo = has_o.astype(H.dtype)
    o_rows = jnp.concatenate(
        [15 * f + jnp.arange(3), 15 * f + 6 + jnp.arange(3)]
    )
    H = H.at[o_rows[:, None], o_rows[None, :]].add(mo * (JtLo @ Jo))
    v = v.at[o_rows].add(mo * (-(JtLo @ r_o)))
    any_fct = any_fct | has_o

    mask = mgd.mask.at[f].set(mgd.mask[f] | any_fct)
    lin = mgd.lin.at[f].set(
        jnp.where(any_fct, lin_raw, mgd.lin[f])
    )
    return dg.MargDense(mask, lin, H, v)


def _roll_pg(pg: dg.PackedGraph, shift, NW: int) -> dg.PackedGraph:
    """Re-base a packed factor graph by ``shift`` window slots (traced
    int >= 0).  IMU slot k connects frames (origin+k, origin+k+1); prior
    frames are window-relative (device_graph.pack_graph_np)."""
    NF = NW - 1
    arF = jnp.arange(NF)
    arW = jnp.arange(NW)
    rep = {}
    for name in ("imu_dR", "imu_dv", "imu_dp", "imu_dt", "imu_dRg",
                 "imu_dvg", "imu_dva", "imu_dpg", "imu_dpa", "imu_bias0",
                 "imu_info"):
        rep[name] = jnp.roll(getattr(pg, name), -shift, axis=0)
    rep["imu_mask"] = jnp.roll(pg.imu_mask, -shift) & (arF < NF - shift)
    rep["pp_frame"] = pg.pp_frame - shift
    rep["pp_mask"] = pg.pp_mask & (pg.pp_frame >= shift)
    rep["pb_frame"] = pg.pb_frame - shift
    rep["pb_mask"] = pg.pb_mask & (pg.pb_frame >= shift)
    for name in ("gnss_pos", "odo_vel"):
        rep[name] = jnp.roll(getattr(pg, name), -shift, axis=0)
    rep["gnss_mask"] = jnp.roll(pg.gnss_mask, -shift) & (arW < NW - shift)
    rep["odo_mask"] = jnp.roll(pg.odo_mask, -shift) & (arW < NW - shift)
    return pg._replace(**rep)


def _predict_row(row_prev, pg: dg.PackedGraph, k, g_vec):
    """NavState propagation of one 21-wide state row through IMU factor
    slot ``k`` with first-order bias correction
    (fusion/preintegration.py::predict, multi_sensor.py:114-134)."""
    R_i = row_prev[:9].reshape(3, 3)
    p_i = row_prev[9:12]
    v_i = row_prev[12:15]
    b = row_prev[15:21]
    db = b - pg.imu_bias0[k]
    dR = pg.imu_dR[k] @ dg._so3_exp(pg.imu_dRg[k] @ db[3:])
    dv = pg.imu_dv[k] + pg.imu_dva[k] @ db[:3] + pg.imu_dvg[k] @ db[3:]
    dp = pg.imu_dp[k] + pg.imu_dpa[k] @ db[:3] + pg.imu_dpg[k] @ db[3:]
    dt = pg.imu_dt[k]
    R_j = R_i @ dR
    p_j = p_i + v_i * dt + 0.5 * g_vec * dt * dt + R_i @ dp
    v_j = v_i + g_vec * dt + R_i @ dv
    return jnp.concatenate([R_j.reshape(9), p_j, v_j, b])


def _pose7_cw(R_wb, t_wb, Tbc12):
    """Camera<-world 7-vec from a body pose and the body<-camera extrinsic
    (dbaf_frontend.py:223-228: Twc = wTb * Tbc; video stores Tcw)."""
    R_bc = Tbc12[:9].reshape(3, 3)
    t_bc = Tbc12[9:12]
    R_wc = R_wb @ R_bc
    t_wc = R_wb @ t_bc + t_wb
    R_cw = R_wc.T
    t_cw = -(R_cw @ t_wc)
    return jnp.concatenate(
        [t_cw, lie.matrix_to_quat(R_cw)]
    ).astype(jnp.float32)


def make_coupled_step(update_raw, cfg: DBAFusionConfig, NW: int,
                      e_cap: int, i_cap: int):
    """One-dispatch coupled keyframe step with zero host pulls."""
    gcfg = cfg.graph
    fc = cfg.frontend
    P = cfg.ba.window
    SHIFT = int(fc.rollup_shift)  # static: shapes the roll-out capture
    wf = gcfg.frontend_window
    skip = tuple(gcfg.skip_edge) if wf == 5 else ()
    n_skip = len(skip)
    pack_len = 1 + 5 * wf + n_skip
    e_all = i_cap + e_cap
    big = jnp.int32(10**6)

    def step(
        # video buffers (read-only in-kernel except poses/disps)
        poses, disps, disps_sens, damping, intrinsics,
        fmaps_buf, nets_buf, inps_buf, fmaps_right_buf,
        # edge stores (device, carried)
        e_net, e_target, e_weight, ii, jj, age, e_valid,
        t_inac, w_inac, ii_i, jj_i, i_valid,
        bad_ii, bad_jj, bad_valid,
        # coupled carried state
        prox_d, fg_flat, o_prev,
        mgd_mask, mgd_lin, mgd_H, mgd_v,
        cur_ii, cur_jj, cur_mask, cur_target, cur_weight,
        prev_cull,
        # per-keyframe upload: ONE f32 blob [factor pack | h0 | t1] --
        # separate scalar uploads cost ~0.5-2 ms each on the remote
        # transport, so the per-step scalars ride the pack
        pgf, aux, Tbc12, A,
        rounds_a, rounds_b, roll_start, roll_shift,
        # static
        iters: int, use_sens: bool,
    ):
        mgd = dg.MargDense(mgd_mask, mgd_lin, mgd_H, mgd_v)
        G = dg.graph_flat_size(NW)
        h0 = pgf[G].astype(jnp.int32)
        t1 = pgf[G + 1].astype(jnp.int32)
        pg_h0 = dg.unflatten_graph(pgf[:G], NW)
        rows = fg_flat.reshape(NW, 21)

        # ---- 0. deferred cull resolution (the cull decided by the LAST
        # step's rounds; the host learns it from the lagged pack drain and
        # has already appended this frame + packed the factor graph from
        # its pre-merge state, so the kernel applies the whole
        # rm_keyframe + merge_keyframe transition itself:
        # frontend.py:416-419 / dbaf_frontend.py:324-353).
        t1r = t1                     # host keyframe count (pre-cull)
        c = t1r - 3                  # culled keyframe (pre-cull numbering)

        def _apply_cull(op):
            (pg_h0, poses, disps, disps_sens, damping,
             fmaps_buf, nets_buf, inps_buf,
             e_net, e_target, e_weight, ii, jj, age, e_valid,
             t_inac, w_inac, ii_i, jj_i, i_valid, rows, prox_d, aux,
             mgd) = op
            # (a0) re-link the culled frame's GNSS/odometry measurement
            # onto its predecessor inside the marginal (the sync flow's
            # coupled.rm_new_gnss BEFORE merge_keyframe,
            # frontend.py:428-431), then drop its per-frame pack rows
            mgd = _relink_culled_gnss_odo(pg_h0, rows, mgd, c, o_prev,
                                          h0, NW)
            pg_h0 = _pg_cull_frame_rows(pg_h0, c - h0, NW)
            # (a) repair the uploaded factor pack: the host packed the
            # culled frame's two IMU intervals separately; compose them
            # (== the host's merge_keyframe re-integration)
            pg2 = _pg_merge_slot(pg_h0, c - 1 - h0, NW)
            # (b) video-row shifts (video.rm_keyframe): exactly two rows
            # sit above the culled slot -- the previous keyframe and the
            # just-appended frame.  The host applies the same shift to its
            # own buffers at drain time, before the next dispatch.

            def shift2(buf):
                B = buf.shape[0]
                r1 = jax.lax.dynamic_index_in_dim(
                    buf, jnp.clip(c + 1, 0, B - 1), 0, keepdims=False
                )
                buf = jax.lax.dynamic_update_index_in_dim(
                    buf, r1, jnp.clip(c, 0, B - 1), 0
                )
                r2 = jax.lax.dynamic_index_in_dim(
                    buf, jnp.clip(c + 2, 0, B - 1), 0, keepdims=False
                )
                return jax.lax.dynamic_update_index_in_dim(
                    buf, r2, jnp.clip(c + 1, 0, B - 1), 0
                )

            poses = shift2(poses)
            disps = shift2(disps)
            disps_sens = shift2(disps_sens)
            damping = shift2(damping)
            fmaps_buf = shift2(fmaps_buf)
            nets_buf = shift2(nets_buf)
            inps_buf = shift2(inps_buf)
            # aux leaves indexed by video slot (e.g. the synthetic
            # oracle's id_map) were uploaded pre-shift too
            B_ = poses.shape[0]
            aux = jax.tree_util.tree_map(
                lambda a: shift2(a)
                if getattr(a, "ndim", 0) >= 1 and a.shape[0] == B_ else a,
                aux,
            )
            # (c) edge re-indexing (graph.rm_keyframe; cull_transition is
            # fuzz-tested bit-equal to the host scheduler)
            ct = cull_transition(
                ii, jj, age, e_valid, ii_i, jj_i, i_valid, c
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
            # (d) factor-graph window state: drop the culled row (the
            # host's merge_keyframe list deletion)
            rc = c - o_prev
            arW = jnp.arange(NW)
            rows = rows[
                jnp.clip(jnp.where(arW >= rc, arW + 1, arW), 0, NW - 1)
            ]
            return (pg2, poses, disps, disps_sens, damping,
                    fmaps_buf, nets_buf, inps_buf,
                    edges0.net, edges0.target, edges0.weight,
                    ct["ii"], ct["jj"], ct["age"], ct["valid"],
                    t_inac, w_inac, ct["ii_i"], ct["jj_i"], ct["i_valid"],
                    rows, prox_d, aux, mgd)

        (pg_h0, poses, disps, disps_sens, damping,
         fmaps_buf, nets_buf, inps_buf,
         e_net, e_target, e_weight, ii, jj, age, e_valid,
         t_inac, w_inac, ii_i, jj_i, i_valid, rows, prox_d,
         aux, mgd) = jax.lax.cond(
            prev_cull, _apply_cull, lambda op: op,
            (pg_h0, poses, disps, disps_sens, damping,
             fmaps_buf, nets_buf, inps_buf,
             e_net, e_target, e_weight, ii, jj, age, e_valid,
             t_inac, w_inac, ii_i, jj_i, i_valid, rows, prox_d, aux, mgd),
        )
        # effective keyframe count; the host's pre-merge bookkeeping
        # values (last_t0/last_t1, cur_ii/cur_jj) deliberately keep the
        # raw numbering, replicating the synchronous host flow exactly
        t1 = t1r - prev_cull.astype(jnp.int32)

        # ---- 1. state continuation + IMU pose seed (in-kernel replica of
        # sync_host -> set_pose; the solved window state never left device)
        k_seed = jnp.clip(t1 - 2 - h0, 0, NW - 2)
        row_prev = rows[jnp.clip(t1 - 2 - o_prev, 0, NW - 1)]
        new_row = _predict_row(row_prev, pg_h0, k_seed, pg_h0.g_vec)
        rows = rows.at[jnp.clip(t1 - 1 - o_prev, 0, NW - 1)].set(new_row)
        poses = poses.at[jnp.clip(t1 - 1, 0, poses.shape[0] - 1)].set(
            _pose7_cw(new_row[:9].reshape(3, 3), new_row[9:12], Tbc12)
        )

        # ---- 1b. post-cull proximity-distance recompute: the carried
        # pack was computed pre-shift, so the sync flow invalidates it
        # (graph.finish_mega) and falls back to a fresh video.distance on
        # the post-cull poses INCLUDING the new frame's IMU-predicted
        # pose (frontend.py:341-371 ordering) -- hence after step 1
        def _fresh_prox(_):
            t_c = t1
            pi_ = jnp.repeat(
                t_c - 5 + jnp.arange(5, dtype=jnp.int32), wf
            )
            pj_ = jnp.tile(t_c - wf + jnp.arange(wf, dtype=jnp.int32), 5)
            if n_skip:
                sk = jnp.asarray(list(skip), jnp.int32)
                pi_ = jnp.concatenate([pi_, jnp.full((n_skip,), t_c - 1)])
                pj_ = jnp.concatenate([pj_, t_c - 5 + sk])
            B = poses.shape[0]
            return pj.frame_distance_bidirectional(
                poses, disps, intrinsics,
                jnp.clip(pi_, 0, B - 1), jnp.clip(pj_, 0, B - 1),
                beta=gcfg.beta,
            )

        prox_d = jax.lax.cond(
            prev_cull, _fresh_prox, lambda _: prox_d, None
        )

        # ---- 2. edge lifecycle on device (frontend.py:269-291 multisensor
        # stale rule + proximity selection)
        tr = edge_transition(
            ii, jj, age, e_valid, ii_i, jj_i, i_valid,
            bad_ii, bad_jj, bad_valid,
            prox_d, t1, gcfg.frontend_thresh,
            src=5, wf=wf, n_skip=n_skip, skip_offsets=skip,
            rad=gcfg.frontend_radius, nms=gcfg.frontend_nms,
            max_factors=gcfg.max_factors, max_age=gcfg.max_age,
            active_window=fc.active_window,
            visual_only=False, max_out=4 * (gcfg.max_factors + 60),
        )
        ii2, jj2, age2, e_valid2 = tr["ii"], tr["jj"], tr["age"], tr["valid"]
        t_inac2, w_inac2 = _rebuild_inactive(
            t_inac, w_inac, tr["inact_perm_old"], tr["inact_from_act"],
            tr["inact_act_idx"], e_target, e_weight,
        )
        edges = _rebuild_edges(
            e_net, e_target, e_weight, tr["perm"], tr["is_new"], ii2, jj2,
            poses, disps, intrinsics, nets_buf.astype(jnp.bfloat16),
        )
        ii_i2, jj_i2, i_valid2 = tr["ii_i"], tr["jj_i"], tr["i_valid"]

        # ---- 2b. in-kernel rollup (dbaf_frontend.py:253-257; sync order:
        # after edge selection, before window selection/marg/rounds,
        # frontend.py rollup block).  Pure index bookkeeping: the factor
        # pack, fg rows, marginal and prox distances are origin-relative
        # or shift-invariant, so only video buffers roll and absolute
        # frame indices re-base.  The host replays the same decision
        # (fe.t1 post-drain > rollup_start) right after its lagged drain,
        # before the next step's pack is built, so no flag travels.
        do_roll = t1 > roll_start
        shift = jnp.where(do_roll, roll_shift, 0).astype(jnp.int32)
        # save_pkl archival: the rows a roll would retire, captured
        # BEFORE the in-kernel roll reuses their slots (the reference
        # archives marginalized rows host-side, depth_video.py:336-343;
        # in this pipeline the device marginal never surfaces, so
        # retirement == the roll).  Always emitted (static shapes); the
        # host only pulls it when it replays a roll with save_pkl on --
        # unused outputs cost nothing on the lazy transport.
        roll_out = jnp.concatenate(
            [poses[:SHIFT], disps[:SHIFT].reshape(SHIFT, -1)], axis=1
        ).astype(jnp.float32)

        def _apply_roll(op):
            (poses, disps, disps_sens, damping,
             fmaps_buf, nets_buf, inps_buf, aux,
             ii_i2, jj_i2, i_valid2, bad_ii, bad_jj, bad_valid,
             t_inac2, w_inac2) = op
            r = roll_shift
            rollb = lambda b: jnp.roll(b, -r, axis=0)
            poses, disps = rollb(poses), rollb(disps)
            disps_sens, damping = rollb(disps_sens), rollb(damping)
            fmaps_buf, nets_buf, inps_buf = (
                rollb(fmaps_buf), rollb(nets_buf), rollb(inps_buf))
            B_ = poses.shape[0]
            aux = jax.tree_util.tree_map(
                lambda a: rollb(a)
                if getattr(a, "ndim", 0) >= 1 and a.shape[0] == B_ else a,
                aux,
            )
            # inactive/bad stores: drop negatives + compact + re-index
            # (shared in-kernel twin of graph.shift_indices); active edges
            # stay nonnegative by the config rule rollup_start -
            # rollup_shift >= active_window (checked at activation)
            I = ii_i2.shape[0]
            rt = roll_transition(ii_i2, jj_i2, i_valid2,
                                 bad_ii, bad_jj, bad_valid, r)
            t_inac2, w_inac2 = _rebuild_inactive(
                t_inac2, w_inac2, rt["inact_perm_old"],
                jnp.zeros((I,), bool), jnp.zeros((I,), jnp.int32),
                edges.target, edges.weight)
            return (poses, disps, disps_sens, damping,
                    fmaps_buf, nets_buf, inps_buf, aux,
                    rt["ii_i"], rt["jj_i"], rt["i_valid"],
                    rt["bad_ii"], rt["bad_jj"], rt["bad_valid"],
                    t_inac2, w_inac2)

        (poses, disps, disps_sens, damping,
         fmaps_buf, nets_buf, inps_buf, aux,
         ii_i2, jj_i2, i_valid2, bad_ii, bad_jj, bad_valid,
         t_inac2, w_inac2) = jax.lax.cond(
            do_roll, _apply_roll, lambda op: op,
            (poses, disps, disps_sens, damping,
             fmaps_buf, nets_buf, inps_buf, aux,
             ii_i2, jj_i2, i_valid2, bad_ii, bad_jj, bad_valid,
             t_inac2, w_inac2),
        )
        # unconditional index re-basing (shift == 0 off-path)
        ii2 = ii2 - shift
        jj2 = jj2 - shift
        cur_ii = cur_ii - shift
        cur_jj = cur_jj - shift
        o_prev = o_prev - shift
        h0 = h0 - shift
        t1 = t1 - shift
        t1r = t1r - shift

        # ---- 3. coupled window selection (graph.update_coupled_mega +
        # coupled.prepare_device index logic)
        t0_a = jnp.maximum(
            1, jnp.min(jnp.where(e_valid2, ii2, big)) + 1
        ).astype(jnp.int32)
        keep_i = i_valid2 & (ii_i2 >= t0_a - gcfg.inac_range) & (
            jj_i2 >= t0_a - gcfg.inac_range
        )
        ii_full = jnp.concatenate([ii_i2, ii2])
        jj_full = jnp.concatenate([jj_i2, jj2])
        valid_full = jnp.concatenate([keep_i, e_valid2])
        sel_min = jnp.minimum(
            jnp.min(jnp.where(valid_full, ii_full, big)),
            jnp.min(jnp.where(valid_full, jj_full, big)),
        ).astype(jnp.int32)
        t0_c = jnp.maximum(sel_min, o_prev)  # window never moves back

        # ---- 4. window-advance marginalization, in-kernel
        # (coupled._marginalize_device semantics: visual info of the
        # previous selection's out-of-window edges + factors anchored on
        # the eliminated frames + the old marginal)
        m = t0_c - o_prev
        # the host stores last_t1 at solve time and does NOT re-number it
        # on a cull (coupled.py bookkeeping); t1r - 1 reproduces that
        last_t1 = t1r - 1
        marg_idx = (
            cur_mask & (cur_ii >= o_prev) & (cur_ii < t0_c)
            & (cur_ii < last_t1 - 2) & (cur_jj < last_t1 - 2)
        )
        marg_t1 = jnp.maximum(
            jnp.max(jnp.where(marg_idx, cur_jj, -1)) + 1, t0_c + 1
        ).astype(jnp.int32)
        pg_o = _roll_pg(pg_h0, o_prev - h0, NW)
        # old-window state (the new keyframe's predicted row sits at the
        # first invalid slot; the marg only reads slots < k_end)
        fg_old = dg.unflatten_state(rows.reshape(-1), last_t1 - o_prev, NW)

        def do_marg(_):
            ii_m = jnp.clip(cur_ii - o_prev, 0, P - 1)
            jj_m = jnp.clip(cur_jj - o_prev, 0, P - 1)
            return dg.marginalize_window_body(
                poses, disps, damping, intrinsics,
                cur_target, cur_weight, ii_m, jj_m, marg_idx,
                o_prev, fg_old, pg_o, mgd, A,
                m, marg_t1 - o_prev,
                P=P, NW=NW, eps_damping=cfg.ba.eps_damping,
            )

        mgd2 = jax.lax.cond(m > 0, do_marg, lambda _: mgd, None)

        # ---- 5. re-base state + graph to the new origin
        rows2 = jnp.roll(rows, -m, axis=0)
        n_fg = t1 - t0_c
        fg = dg.unflatten_state(rows2.reshape(-1), n_fg, NW)
        pg_c = _roll_pg(pg_h0, t0_c - h0, NW)

        # ---- 6. compaction of the coupled edge selection
        order = jnp.argsort(~valid_full).astype(jnp.int32)  # stable
        nn = jnp.sum(valid_full).astype(jnp.int32)
        mask_d = jnp.arange(e_all, dtype=jnp.int32) < nn
        ii_d = jnp.clip(ii_full[order] - t0_c, 0, P - 1)
        jj_d = jnp.clip(jj_full[order] - t0_c, 0, P - 1)

        # ---- 7. rounds + cull decision (shared fused core)
        s0 = jnp.maximum(0, t1 - P)
        (poses, disps, e_net2, e_target2, e_weight2, fg, host_pack,
         cur_target2, cur_weight2, lm_stats, cull, d_cull, wtb_dec,
         hyst) = run_coupled_rounds(
            update_raw, cfg, NW, pack_len,
            poses, disps, disps_sens, damping, intrinsics, fmaps_buf,
            inps_buf, fmaps_right_buf,
            edges.net, edges.target, edges.weight, ii2, jj2, e_valid2,
            t_inac2, w_inac2, ii_i2, jj_i2, i_valid2,
            t0_a, t1, s0, aux,
            order, ii_d, jj_d, mask_d, t0_c, n_fg, fg, pg_c, mgd2, A,
            rounds_a, rounds_b,
            iters=iters, use_inactive=True, use_sens=use_sens,
        )
        rb_run = jnp.where(cull, 0, rounds_b)
        age3 = jnp.where(e_valid2, age2 + rounds_a + rb_run, age2)

        # ---- 8. tail: seed the next incoming slot (video.seed_next) +
        # trajectory row from the decision-time body pose
        slot = jnp.clip(t1, 0, poses.shape[0] - 1)
        poses = poses.at[slot].set(poses[jnp.clip(t1 - 1, 0, P - 1)])
        disps = disps.at[slot].set(
            jnp.mean(disps[jnp.clip(t1 - 1, 0, P - 1)])
        )
        traj7 = jnp.concatenate([
            wtb_dec[9:12],
            lie.matrix_to_quat(wtb_dec[:9].reshape(3, 3)),
        ]).astype(jnp.float32)

        pack = jnp.concatenate([
            jnp.asarray([jnp.where(cull, 1.0, 0.0), d_cull]),
            host_pack[1:], hyst, dg.flatten_state(fg), wtb_dec,
            jnp.asarray([t0_c], jnp.float32),
        ])
        state = dict(
            poses=poses, disps=disps,
            e_net=e_net2, e_target=e_target2, e_weight=e_weight2,
            ii=ii2, jj=jj2, age=age3, e_valid=e_valid2,
            t_inac=t_inac2, w_inac=w_inac2, ii_i=ii_i2, jj_i=jj_i2,
            i_valid=i_valid2,
            bad_ii=bad_ii, bad_jj=bad_jj, bad_valid=bad_valid,
            prox_d=host_pack[1:],
            fg_flat=dg.flatten_state(fg), o_prev=t0_c,
            mgd_mask=mgd2.mask, mgd_lin=mgd2.lin, mgd_H=mgd2.H,
            mgd_v=mgd2.v,
            cur_ii=ii_full[order], cur_jj=jj_full[order], cur_mask=mask_d,
            cur_target=cur_target2, cur_weight=cur_weight2,
            # resolved at the start of the NEXT step (and by the host at
            # its lagged pack drain)
            prev_cull=cull,
        )
        return state, pack, traj7, roll_out

    # donate the big carried operands (poses, disps, edge stores, inactive
    # stores, marg H, cur target/weight)
    return jax.jit(
        step,
        static_argnames=("iters", "use_sens"),
        donate_argnums=(0, 1, 9, 10, 11, 16, 17, 29, 34, 35),
    )


_CARRY = (
    "poses", "disps", "e_net", "e_target", "e_weight",
    "ii", "jj", "age", "e_valid",
    "t_inac", "w_inac", "ii_i", "jj_i", "i_valid",
    "bad_ii", "bad_jj", "bad_valid",
    "prox_d", "fg_flat", "o_prev",
    "mgd_mask", "mgd_lin", "mgd_H", "mgd_v",
    "cur_ii", "cur_jj", "cur_mask", "cur_target", "cur_weight",
    "prev_cull",
)


class CoupledAsync:
    """Streams coupled keyframes through the zero-pull step kernel."""

    def __init__(self, frontend):
        self.fe = frontend
        self.cfg = frontend.cfg
        self.kernel = None
        self.state: Optional[dict] = None
        self.active = False
        self.steps = 0        # steps since the last activation
        self.total_steps = 0  # lifetime async keyframes
        self.culls = 0        # lifetime async culls
        # packs awaiting the lagged drain: [(pack_dev, t1_at_dispatch)].
        # Culling needs ONE pull per keyframe so the host can mirror the
        # merge -- but pulled with a one-step lag, AFTER dispatching the
        # next step, so the ~RTT pull overlaps device compute and the
        # pipeline stays full (the kernel repairs the one stale upload
        # via its prev_cull branch).
        self.pending = []
        # save_pkl roll-out archives awaiting their lazy device pull:
        # [(tstamps, images, roll_out_dev, archive_mark_at_roll)]
        self._pending_archive = []

    # ------------------------------------------------------------------
    def can_activate(self) -> bool:
        fe = self.fe
        cfg = self.cfg
        coupled = fe.coupled
        g = fe.graph
        fc = cfg.frontend
        NW = cfg.sensors.fg_cap
        return (
            bool(getattr(cfg.sensors, "coupled_async", False))
            and cfg.sensors.device_solver and cfg.sensors.coupled_mega
            and fe.video.imu_enabled
            and coupled is not None
            and not coupled.reinit
            and coupled._fg_state is not None
            and coupled._fg_key == (coupled.last_t0, coupled.last_t1)
            and coupled.cur_target is not None
            # the last sync keyframe must NOT have culled: after a cull the
            # host keeps _fg_state/cur_ii/cur_jj/last_t1 in pre-cull
            # numbering (the next sync solve repacks from the merged host
            # state), so snapshotting them raw against the post-cull
            # video/edge stores would skew every row index by one.  Wait
            # for the next non-culled keyframe instead.
            and fe.t1 == coupled.last_t1
            # scope gates (culling is fully supported: in-kernel
            # decision + deferred prev_cull transition + lagged host
            # mirror -- v2.  GNSS/odo/ZUPT factors ride the per-keyframe
            # pack and, on a cull, are re-linked into the device marginal
            # in-kernel -- v4; GNSS configs wait for georeferencing
            # (init_gnss) since that alignment rewrites every pose.
            # save_pkl archival and IMU-rate high-freq output are carried
            # by the pipeline -- v5: retired rows ride the kernel's
            # roll_out output, high-freq rows propagate from the lagged
            # host mirrors (one-keyframe lag, documented above).
            # stereo / RGB-D / upsample stay on the sync flow: none is a
            # reference COUPLED operating point (every reference demo is
            # mono+IMU; stereo/depth are inherited DROID visual modes),
            # so the faithful behavior for them is the general sync path)
            and not cfg.stereo and not cfg.upsample
            and not fe.video.has_depth
            and (len(fe.all_gnss) == 0 or coupled.gnss_init_time > 0.0)
            and len(coupled.prior_factor_map) == 0
            # capacity: the window can never outgrow the state buffer
            and NW >= fc.active_window + cfg.graph.inac_range + 4
            and coupled.last_t1 - coupled.last_t0 <= NW - 2
        )

    # ------------------------------------------------------------------
    def activate(self):
        fe = self.fe
        g, v, coupled = fe.graph, fe.video, fe.coupled
        cfg = self.cfg
        fc = cfg.frontend
        if fc.rollup_start + 2 <= cfg.buffer:
            # rollup reachable: the in-kernel roll cannot fail loudly, so
            # enforce the invariant graph.shift_indices checks host-side
            # (no active edge may go negative) up front
            if fc.rollup_start - fc.rollup_shift < fc.active_window:
                raise ValueError(
                    "coupled async rollup needs rollup_start - "
                    f"rollup_shift >= active_window ({fc.rollup_start} - "
                    f"{fc.rollup_shift} < {fc.active_window})"
                )
        g._flush()
        coupled.sync_host()
        if self.kernel is None:
            self.kernel = make_coupled_step(
                g._kernel.raw, cfg, cfg.sensors.fg_cap, g.e_cap, g.i_cap
            )

        E, I = g.e_cap, g.i_cap
        pad = lambda a, cap: np.concatenate(
            [np.asarray(a, np.int32), np.zeros(cap - len(a), np.int32)]
        )
        e_all = I + E
        nsel = len(coupled.cur_ii)
        cur_ii = np.zeros(e_all, np.int32)
        cur_jj = np.zeros(e_all, np.int32)
        cur_ii[:nsel] = coupled.cur_ii
        cur_jj[:nsel] = coupled.cur_jj
        NW = cfg.sensors.fg_cap
        mgd = coupled._mgd_device(coupled.last_t0, coupled.last_t1, NW)
        assert mgd is not None, "async coupled: no device marginal"
        bc = 64
        nb = min(len(g.ii_bad), bc)
        wf = cfg.graph.frontend_window
        n_skip = len(cfg.graph.skip_edge) if wf == 5 else 0
        off = g._prox_offset
        prox = g._host_pack_dev[off: off + 5 * wf + n_skip]
        self.state = dict(
            poses=v.poses, disps=v.disps,
            e_net=g.edges.net, e_target=g.edges.target,
            e_weight=g.edges.weight,
            ii=jnp.asarray(pad(g.ii, E)), jj=jnp.asarray(pad(g.jj, E)),
            age=jnp.asarray(pad(g.age, E)),
            e_valid=jnp.asarray(np.arange(E) < g.n),
            t_inac=g.t_inac, w_inac=g.w_inac,
            ii_i=jnp.asarray(pad(g.ii_inac, I)),
            jj_i=jnp.asarray(pad(g.jj_inac, I)),
            i_valid=jnp.asarray(np.arange(I) < len(g.ii_inac)),
            bad_ii=jnp.asarray(pad(g.ii_bad[:nb], bc)),
            bad_jj=jnp.asarray(pad(g.jj_bad[:nb], bc)),
            bad_valid=jnp.asarray(np.arange(bc) < nb),
            prox_d=prox.astype(jnp.float32),
            fg_flat=jnp.asarray(coupled._fg_state).reshape(-1),
            o_prev=jnp.asarray(coupled.last_t0, jnp.int32),
            mgd_mask=jnp.asarray(mgd.mask), mgd_lin=jnp.asarray(mgd.lin),
            mgd_H=jnp.asarray(mgd.H), mgd_v=jnp.asarray(mgd.v),
            cur_ii=jnp.asarray(cur_ii), cur_jj=jnp.asarray(cur_jj),
            cur_mask=jnp.asarray(np.arange(e_all) < nsel),
            cur_target=coupled.cur_target, cur_weight=coupled.cur_weight,
            prev_cull=jnp.asarray(False),
        )
        self.active = True
        self.steps = 0
        self.pending.clear()
        self._last_t1 = fe.t1  # == coupled.last_t1 (can_activate gate)
        self._drained_cull = False  # cull flag of the last-drained pack
        # run-constant device scalars, uploaded ONCE (each per-step
        # jnp.asarray(scalar) costs a transport round trip)
        self._consts = (
            jnp.asarray(fe.iters1, jnp.int32),
            jnp.asarray(fe.iters2, jnp.int32),
            jnp.asarray(cfg.frontend.rollup_start, jnp.int32),
            jnp.asarray(cfg.frontend.rollup_shift, jnp.int32),
        )

    # ------------------------------------------------------------------
    def step(self, cur_t: float):
        """Run one keyframe (frontend already ingested sensors and bumped
        t1).  Zero pulls; the trajectory row stays on device."""
        fe = self.fe
        g, v, coupled = fe.graph, fe.video, fe.coupled
        cfg = self.cfg
        NW = cfg.sensors.fg_cap
        t1 = fe.t1
        h0 = max(0, t1 - NW)
        pgf = dg.pack_graph_flat(coupled, h0, t1, NW)
        assert pgf is not None, "async coupled: factor pack capacity miss"

        st = self.state
        args = [st[k] for k in _CARRY]
        # the prox pack layout expected by edge_transition is
        # [cull_dist, prox...][1:] -- state stores it that way already
        roll_start = cfg.frontend.rollup_start
        roll_shift = cfg.frontend.rollup_shift
        state, pack, traj7, roll_out = self.kernel(
            args[0], args[1], v.disps_sens, v.damping, v.intrinsics,
            v.fmaps, v.nets, v.inps, v.fmaps_right,
            *args[2:],
            jnp.asarray(np.concatenate(
                [pgf, np.asarray([h0, t1], np.float32)])),
            g.aux,
            coupled._Tbc12_dev(), coupled._A_block(),
            *self._consts,
            iters=cfg.ba.iters, use_sens=v.has_depth,
        )
        self.state = state
        self.steps += 1
        self.total_steps += 1
        # keep video/graph refs pointing at the carried device arrays so
        # host-side appends/reads between steps stay consistent
        v.poses = state["poses"]
        v.disps = state["disps"]
        g.edges = EdgeArrays(state["e_net"], state["e_target"],
                             state["e_weight"])
        # lagged pack drain (one pull/keyframe; overlaps this dispatch's
        # device compute): mirror the PREVIOUS step's cull into the host
        # bookkeeping before the next pack is built
        self.pending.append((pack, t1, cur_t))
        if len(self.pending) > 1:
            self._drain_one()
        # replay the kernel's in-kernel rollup decision (do_roll = post-
        # cull count > rollup_start; fe.t1 reflects the cull after the
        # drain above) BEFORE the next step's pack is built -- the host
        # mirrors shift exactly once per kernel roll
        if fe.t1 > roll_start:
            self._host_roll(roll_shift, roll_out)
        # effective solve-time keyframe count for sync(): when the kernel
        # resolved a lagged cull this step (prev_cull branch), the drain
        # above just mirrored it into fe.t1, so fe.t1 == the count the
        # solve actually ran at
        self._last_t1 = fe.t1
        # pack stays on device; layout matches the fused pull
        # ([cull, d, prox | hyst(7) | state(NW*21) | wtb(12) | t0_c])
        # so any lazy host consumer parses it correctly
        g._host_pack_dev = pack
        g._host_pack_np = None
        g._host_pack_t1 = fe.t1  # post drain/roll numbering of the pack
        g._host_pack_tail = NW * 21
        g._host_pack_dec = 13
        g._prox_offset = 2
        g.hyst_norms = None
        g.mega_count += 1
        fe.trajectory.append((cur_t, traj7))

    # ------------------------------------------------------------------
    def _resolve_archives(self):
        """Pull any pending save_pkl roll-out rows (the steps that
        produced them have long completed; this is pure transfer) and
        append them to the video save buffers."""
        v = self.fe.video
        h8, w8 = v.h8, v.w8
        while self._pending_archive:
            tstamps, images, dev, mark0 = self._pending_archive.pop(0)
            rows = np.asarray(dev)
            for i in range(mark0, len(tstamps)):
                v.saved_tstamps.append(float(tstamps[i]))
                v.saved_poses.append(rows[i, :7].copy())
                v.saved_disps.append(rows[i, 7:].reshape(h8, w8).copy())
                v.saved_images.append(images[i].copy())

    def _drain_one(self):
        pack_dev, t1_at, cur_t = self.pending.pop(0)
        pack = np.asarray(pack_dev)
        self._resolve_archives()
        self._refresh_mirrors_from_pack(pack, t1_at)
        self._monitor_from_pack(pack, t1_at, cur_t)
        if pack[0] > 0.5:
            # the culled frame is ALWAYS the third-newest at drain time:
            # the cull removed the then-second-newest keyframe, exactly
            # one frame has been appended since (lag 1), and drains are
            # strictly ordered -- robust across consecutive culls
            self._host_apply_cull(self.fe.t1 - 3)
        self._drained_cull = bool(pack[0] > 0.5)

    def _parse_pack(self, pack: np.ndarray, t1_at: int):
        """Decode the lagged drain pack's tail.  Layout
        (make_coupled_step): [... | state(NW*21) | wtb_dec(12) | t0_c].
        The kernel-side keyframe count at that step is the host's t1 at
        dispatch, minus the PREVIOUS pack's cull (resolved in-kernel at
        the step's start), minus the step's own in-kernel roll; the
        kernel's post-roll numbering equals the host's numbering at drain
        time (the host replayed the roll right after dispatching)."""
        NW = self.cfg.sensors.fg_cap
        fc = self.cfg.frontend
        t0_c = int(pack[-1])
        wtb = pack[-13:-1]
        rows = pack[-(13 + NW * 21):-13].reshape(NW, 21)
        t1_k = t1_at - int(self._drained_cull)
        rolled = t1_k > fc.rollup_start
        if rolled:
            t1_k -= fc.rollup_shift
        return t0_c, wtb, rows, t1_k, rolled

    def _refresh_mirrors_from_pack(self, pack: np.ndarray, t1_at: int):
        """Mirror the solved window state of the drained pack into the
        host MultiSensorState (wTbs/vs/bs) -- the async counterpart of the
        sync flow's per-keyframe sync_host, at zero extra pulls (the pack
        is on host anyway).  Keeps the ZUPT admission gate, the GNSS
        lever-arm correction, and the preintegration linearization biases
        at a bounded one-keyframe lag instead of dead-reckoning from the
        activation-time solve; frames appended after the drained step are
        re-predicted from the refreshed states."""
        from ..fusion.preintegration import NavState
        from ..fusion.se3np import Pose

        ms = self.fe.coupled.state
        t0_c, _wtb, rows, t1_k, _rolled = self._parse_pack(pack, t1_at)
        n = len(ms)
        for i in range(max(t0_c, 0), min(t1_k, n)):
            row = np.asarray(rows[i - t0_c], np.float64)
            ms.wTbs[i] = Pose(row[:9].reshape(3, 3), row[9:12])
            ms.vs[i] = row[12:15]
            ms.bs[i] = row[15:21]
        # in-flight frames (appended since that step) were IMU-propagated
        # from the old mirrors: re-predict from the refreshed states
        for i in range(min(t1_k, n), n):
            if i < 1:
                continue
            pim = ms.preintegrations[i - 1]
            prev = NavState(ms.wTbs[i - 1], ms.vs[i - 1])
            prop = prev if pim.dt > 1.0 else pim.predict(prev, ms.bs[i - 1])
            ms.wTbs[i] = prop.pose
            ms.vs[i] = prop.vel
            ms.bs[i] = ms.bs[i - 1].copy()

    def _monitor_from_pack(self, pack: np.ndarray, t1_at: int,
                           cur_t: float):
        """Feed the file-dump monitor from the lagged drain pack -- the
        flagship pipeline's observability costs no extra pull (VERDICT r3
        weak 8): the pack already carries the decision-time body pose and
        the solved window state (biases).  Rows lag the solve by the
        pipeline depth (one keyframe)."""
        fe = self.fe
        mon = fe.monitor
        if mon is None:
            return
        NW = self.cfg.sensors.fg_cap
        t0_c, wtb, rows, t1_k, rolled = self._parse_pack(pack, t1_at)
        r = int(np.clip(t1_k - 1 - t0_c, 0, NW - 1))
        T = np.eye(4)
        T[:3, :3] = wtb[:9].reshape(3, 3)
        T[:3, 3] = wtb[9:12]
        mon.record_keyframe(cur_t, T, gyro_bias=rows[r, 18:21])
        if rolled:
            mon.dump_summary()

    def _host_roll(self, roll: int, roll_out_dev=None):
        """Mirror an in-kernel rollup (of the step just dispatched) into
        the host state: the video slabs the kernel reads fresh per step,
        the host-only buffers, the MultiSensorState window, and the
        frontend counters.  poses/disps/edge stores are carried device-
        side -- the kernel's own roll block shifted those already.  Runs
        BEFORE the next step's factor pack is built.

        save_pkl: the retired rows' host halves (tstamp, image) are
        captured here, pre-roll; their device halves (pose, disp) ride
        the kernel's ``roll_out`` output and are pulled LAZILY at the
        next lagged drain -- blocking on the just-dispatched step here
        would stall the pipeline for a full step latency."""
        from .video import _roll as _roll_buf

        fe = self.fe
        v = fe.video
        if self.cfg.save_pkl and roll_out_dev is not None:
            self._pending_archive.append((
                v.tstamp[:roll].copy(), v.images_small[:roll].copy(),
                roll_out_dev, v.archive_mark,
            ))
            v.archive_mark = max(v.archive_mark - roll, 0)
        for name in ("disps_sens", "damping", "fmaps", "nets", "inps",
                     "fmaps_right", "disps_up"):
            buf = getattr(v, name, None)
            if buf is not None:
                setattr(v, name, _roll_buf(buf, roll))
        v.tstamp = np.roll(v.tstamp, -roll)
        v.images_small = np.roll(v.images_small, -roll, axis=0)
        # slot-keyed aux leaves (e.g. a test oracle's id_map) are
        # re-uploaded from graph.aux on every later step, so the host
        # mirror must shift too (the kernel's in-step aux roll only
        # covers the step the roll happened in) -- frontend._roll_aux
        fe._roll_aux(roll)
        fe.coupled.state.rollup(roll)
        fe.t1 -= roll
        fe.count -= roll
        fe.rollup_count += 1
        v.counter = fe.t1

    def _host_apply_cull(self, c: int):
        """Mirror a device-decided cull (of keyframe ``c``, numbering at
        its decision time) into the host state: the preintegration merge
        (multi_sensor.merge_keyframe == frontend.py:416-419) plus the
        video-row shifts for the buffers the kernel reads fresh per step.
        poses/disps/edge stores are carried device-side -- the kernel's
        own prev_cull branch shifted those already."""
        fe = self.fe
        v = fe.video
        for name in ("disps_sens", "damping", "fmaps", "nets", "inps"):
            buf = getattr(v, name, None)
            if buf is not None:
                setattr(v, name, _shift2_rows(buf, c))
        n = fe.t1
        v.tstamp[c: n - 1] = v.tstamp[c + 1: n]
        if getattr(v, "images_small", None) is not None:
            v.images_small[c: n - 1] = v.images_small[c + 1: n]
        # slot-keyed aux mirrors the same way as the roll (see _host_roll)
        if fe.graph.aux:
            B_ = self.cfg.buffer
            fe.graph.aux = jax.tree_util.tree_map(
                lambda a: _shift2_rows(a, c)
                if getattr(a, "ndim", 0) >= 1 and a.shape[0] == B_ else a,
                fe.graph.aux,
            )
        fe.coupled.state.merge_keyframe(c)
        fe.t1 -= 1
        v.counter = fe.t1
        self.culls += 1

    # ------------------------------------------------------------------
    def sync(self):
        """Drain: ONE pack pull restores every host mirror; the device
        edge/video state is handed back to the synchronous machinery."""
        if not self.active:
            return
        fe = self.fe
        g, v, coupled = fe.graph, fe.video, fe.coupled
        cfg = self.cfg
        NW = cfg.sensors.fg_cap
        st = self.state
        # solve-time keyframe count: all carried state is numbered at the
        # LAST step's t1.  fe.t1 equals it when draining between frames
        # (drain_async/terminate) but is one higher when the drain fires
        # from inside _update (rollup/reinit), where the new frame was
        # already appended and ingested.
        t1 = self._last_t1
        in_flight = fe.t1 - t1  # 0 or 1
        # the one still-pending pack is the LAST step's; its cull flag is
        # the carried prev_cull, resolved wholesale below -- never via
        # _drain_one (the device state has not applied it either).  Its
        # monitor row would otherwise be silently dropped: record it
        # before discarding (the pack pull is rare -- reinit/terminate).
        if fe.monitor is not None and self.pending:
            pack_dev, t1_at, cur_t = self.pending[-1]
            self._monitor_from_pack(np.asarray(pack_dev), t1_at, cur_t)
        self.pending.clear()
        self._resolve_archives()
        pend_cull = bool(np.asarray(st["prev_cull"]))

        n = int(np.sum(np.asarray(st["e_valid"])))
        ni = int(np.sum(np.asarray(st["i_valid"])))
        g.ii = np.asarray(st["ii"])[:n].astype(np.int64)
        g.jj = np.asarray(st["jj"])[:n].astype(np.int64)
        g.age = np.asarray(st["age"])[:n].astype(np.int64)
        g.ii_inac = np.asarray(st["ii_i"])[:ni].astype(np.int64)
        g.jj_inac = np.asarray(st["jj_i"])[:ni].astype(np.int64)
        g.t_inac, g.w_inac = st["t_inac"], st["w_inac"]
        g._perm = np.arange(g.e_cap, dtype=np.int32)
        g._is_new = np.zeros(g.e_cap, dtype=bool)
        g._dirty = False
        g._prox_offset = 2
        g._host_pack_t1 = t1 if self.steps else -(10**6)

        o = int(np.asarray(st["o_prev"]))
        coupled.last_t0 = o
        # last_t1 keeps the pre-cull numbering, replicating the host flow
        # (coupled.py stores it at solve time and never re-numbers it)
        coupled.last_t1 = t1
        fg_flat = st["fg_flat"]
        if pend_cull:
            # drop the culled window row (the host merge_keyframe list
            # deletion) so sync_host maps rows onto the merged state
            # device_get may hand back a read-only buffer view: copy
            rows = np.array(jax.device_get(fg_flat)).reshape(NW, 21)
            rows[t1 - 2 - o: -1] = rows[t1 - 1 - o:]
            coupled._fg_rows_np = rows.reshape(-1)
            coupled._fg_key = (o, t1 - 1)
            coupled._fg_state = jnp.asarray(rows.reshape(-1), jnp.float32)
        else:
            coupled._fg_state = fg_flat
            coupled._fg_key = (o, t1)
        coupled._fg_synced = False
        if not pend_cull:
            coupled._fg_rows_np = None
        coupled._marg_dev = dg.MargDense(
            st["mgd_mask"], st["mgd_lin"], st["mgd_H"], st["mgd_v"]
        )
        coupled._marg_dev_origin = o
        nsel = int(np.sum(np.asarray(st["cur_mask"])))
        coupled.cur_ii = np.asarray(st["cur_ii"])[:nsel].astype(np.int64)
        coupled.cur_jj = np.asarray(st["cur_jj"])[:nsel].astype(np.int64)
        coupled.cur_target = st["cur_target"]
        coupled.cur_weight = st["cur_weight"]
        if pend_cull:
            # the device never resolved its own last cull (it would have
            # at the start of the next step): finish it host-side --
            # exactly the synchronous flow's post-mega cull block
            # (frontend.py:416-419), INCLUDING the GNSS/odometry re-link
            # into the marginal (rm_new_gnss pulls the just-restored
            # device marginal to host and rebuilds it)
            c = t1 - 2
            coupled.rm_new_gnss(c)
            g.rm_keyframe(c)              # edges + video-row shifts
            if in_flight:
                # a frame appended after the last step sits one above the
                # culled window top; rm_keyframe shifted only row c+1
                v.copy_row(c + 1, c + 2)
            coupled.state.merge_keyframe(c)
            fe.t1 -= 1
            v.counter = fe.t1
            v.seed_next(fe.t1)
            g._host_pack_t1 = -(10 ** 6)  # prox pack is pre-shift
            self.culls += 1
        coupled.sync_host()
        if in_flight:
            # the in-flight frame's host state was IMU-propagated (by
            # append_img) from mirrors that were stale while the pipeline
            # ran; re-predict it from the just-restored last solved state
            # so the synchronous flow's pose seed (frontend.py:341-347)
            # matches what a pure-sync run would use
            from ..fusion.preintegration import NavState

            ms = coupled.state
            pim = ms.preintegrations[-2]
            prev = NavState(ms.wTbs[-2], ms.vs[-2])
            prop = prev if pim.dt > 1.0 else pim.predict(prev, ms.bs[-2])
            ms.wTbs[-1] = prop.pose
            ms.vs[-1] = prop.vel
            ms.bs[-1] = ms.bs[-2].copy()
        self.active = False
        self.state = None
