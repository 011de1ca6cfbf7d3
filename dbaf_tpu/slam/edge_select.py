"""Device-side proximity/NMS edge selection.

JAX replica of the host edge scheduler (native/graphops.cpp, itself a
native port of /root/reference/dbaf/covisible_graph.py:357-441): forced
radius edges, distance-ranked greedy selection with Manhattan-gated NMS
suppression, and the opportunistic best skip edge.  Everything is fixed
shape so it can run INSIDE the fused keyframe kernel, which lets the next
keyframe's edge set be computed on device without waiting for the host
round trip.

The algorithm must stay bit-identical to the host path: the host replays
the same selection from the (asynchronously pulled) distance pack to keep
its bookkeeping mirrors in sync.  ``tests/test_edge_select.py`` fuzzes
both against each other.

Shapes are static: the steady-state call sites use spans t-t0 = SRC (5)
and t-t1 = WIN (frontend_window), so candidates form a fixed (SRC x WIN)
grid plus a fixed number of skip-edge candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.inf


@functools.partial(
    jax.jit,
    static_argnames=("src", "win", "n_skip", "rad", "nms", "max_factors",
                     "max_out"),
)
def select_proximity_edges(
    d: jnp.ndarray,          # (src*win + n_skip,) candidate distances
    ii_cand: jnp.ndarray,    # (src*win + n_skip,) int32 source frames
    jj_cand: jnp.ndarray,    # (src*win + n_skip,) int32 target frames
    exist_ii: jnp.ndarray,   # (NE,) int32 existing edges (active+bad+inac)
    exist_jj: jnp.ndarray,
    exist_mask: jnp.ndarray,  # (NE,) bool valid rows of exist_*
    t0: jnp.ndarray,         # scalar int32: candidate src range [t0, t)
    t1: jnp.ndarray,         # scalar int32: candidate tgt range [t1, t)
    t: jnp.ndarray,          # scalar int32: current frame count
    thresh: float,
    *,
    src: int,
    win: int,
    n_skip: int,
    rad: int,
    nms: int,
    max_factors: int,
    max_out: int,
):
    """Returns (out_ii, out_jj, out_mask) with shape (max_out,).

    Mirrors native/graphops.cpp::select_proximity_edges exactly, including
    emission order (forced radius edges first, then ranked pairs both
    directions, then the best skip edge).
    """
    cc = src * win
    i32 = jnp.int32
    t0 = t0.astype(i32)
    t1 = t1.astype(i32)
    t = t.astype(i32)

    # candidate validity (graphops.cpp:63-66)
    d = jnp.where(ii_cand - rad < jj_cand, INF, d)
    d = jnp.where(d > 100.0, INF, d)

    # d as a (src, win) grid for suppression writes; skip candidates are
    # never suppressed (indices >= cc)
    dg = d[:cc].reshape(src, win)

    # Manhattan-gated NMS ball (graphops.cpp:30-44): for seed (i, j),
    # suppress (i+di, j+dj) with |di|+|dj| <= r, r = clamp(|i-j|-2, 0, nms)
    di = jnp.arange(-nms, nms + 1, dtype=i32)
    dj = jnp.arange(-nms, nms + 1, dtype=i32)
    DI, DJ = jnp.meshgrid(di, dj, indexing="ij")
    manh = jnp.abs(DI) + jnp.abs(DJ)

    def suppress(dg, i, j):
        r = jnp.clip(jnp.abs(i - j) - 2, 0, nms)
        gi = (i - t0)[None, None] + DI  # grid row of suppressed pair
        gj = (j - t1)[None, None] + DJ
        hit = (
            (manh <= r)
            & (gi >= 0) & (gi < src) & (t0 + gi < t)
            & (gj >= 0) & (gj < win) & (t1 + gj < t)
        )
        gi_c = jnp.clip(gi, 0, src - 1)
        gj_c = jnp.clip(gj, 0, win - 1)
        upd = jnp.full_like(dg, False, dtype=bool).at[gi_c, gj_c].max(hit)
        return jnp.where(upd, INF, dg)

    # seeds from existing edges (graphops.cpp:69)
    def seed_body(e, dg):
        i = exist_ii[e].astype(i32)
        j = exist_jj[e].astype(i32)
        dg_s = suppress(dg, i, j)
        return jnp.where(exist_mask[e], dg_s, dg)

    dg = jax.lax.fori_loop(0, exist_ii.shape[0], seed_body, dg)

    out_ii = jnp.zeros((max_out,), i32)
    out_jj = jnp.zeros((max_out,), i32)

    def emit(state, a, b, on):
        out_ii, out_jj, n = state
        idx = jnp.clip(n, 0, max_out - 1)
        can = on & (n < max_out)
        out_ii = out_ii.at[idx].set(jnp.where(can, a, out_ii[idx]))
        out_jj = out_jj.at[idx].set(jnp.where(can, b, out_jj[idx]))
        return (out_ii, out_jj, n + can.astype(i32))

    # forced radius edges (graphops.cpp:77-86): i in [t0, t),
    # j in [max(i-rad-1, 0), i), emitted (i,j) then (j,i)
    def radius_body(k, carry):
        dg, state = carry
        i = t0 + k // (rad + 1)
        j_rel = k % (rad + 1)
        j = jnp.maximum(i - rad - 1, 0) + j_rel
        on = (i < t) & (j < i)
        state = emit(state, i, j, on)
        state = emit(state, j, i, on)
        gi, gj = i - t0, j - t1
        ok = on & (gi >= 0) & (gi < src) & (gj >= 0) & (gj < win)
        dg = jnp.where(
            ok,
            dg.at[jnp.clip(gi, 0, src - 1), jnp.clip(gj, 0, win - 1)].set(INF),
            dg,
        )
        return dg, state

    dg, state = jax.lax.fori_loop(
        0, src * (rad + 1), radius_body, (dg, (out_ii, out_jj, jnp.int32(0)))
    )

    # distance-ranked greedy pass (graphops.cpp:89-103): order by the
    # POST-invalidation d, but re-check current d (suppression) per step
    d_rank = jnp.where(jnp.isinf(d), 1e30, d)
    order = jnp.argsort(d_rank).astype(i32)

    def greedy_body(kk, carry):
        dg, state = carry
        k = order[kk]
        dcur = jnp.where(
            k < cc, dg.reshape(-1)[jnp.clip(k, 0, cc - 1)], INF
        )
        n = state[2]
        on = (k < cc) & (dcur <= thresh) & (n <= max_factors)
        i = ii_cand[k].astype(i32)
        j = jj_cand[k].astype(i32)
        state = emit(state, i, j, on)
        state = emit(state, j, i, on)
        dg = jnp.where(on, suppress(dg, i, j), dg)
        return dg, state

    dg, state = jax.lax.fori_loop(0, cc + n_skip, greedy_body, (dg, state))

    # opportunistic best skip edge (graphops.cpp:106-119)
    if n_skip > 0:
        dskip = jnp.where(
            ii_cand[cc:] - rad < jj_cand[cc:], INF, d[cc:]
        )
        dskip = jnp.where(dskip > 100.0, INF, dskip)
        best = jnp.argmin(dskip).astype(i32)
        bd = dskip[best]
        on = (bd < thresh) & (bd > 0)
        bi = ii_cand[cc + best].astype(i32)
        bj = jj_cand[cc + best].astype(i32)
        state = emit(state, bi, bj, on)
        state = emit(state, bj, bi, on)

    out_ii, out_jj, n_out = state
    mask = jnp.arange(max_out, dtype=i32) < n_out
    return out_ii, out_jj, mask


# ---------------------------------------------------------------------------
# Full per-keyframe edge-state transition (device side).
#
# Replicates the host sequence for a new visual keyframe exactly
# (slam/frontend.py:255-276 + slam/graph.py rm_factors/add_factors):
#   1. stale retirement (age/window) into the inactive store
#   2. proximity selection from the carried distance pack
#   3. dedup against active+inactive edges and within the new list
#   4. age-ranked budget eviction (also retired to inactive)
#   5. append, producing the (perm, is_new) pair _rebuild_edges consumes.
# Inactive-store semantics: appends drop the OLDEST entries on overflow,
# which composes to "concat everything, keep the last i_cap rows".


def _stable_compact(valid):
    """positions[k] = output slot of input k (order-preserving); count."""
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    return jnp.where(valid, pos, -1), jnp.sum(valid.astype(jnp.int32))


def roll_transition(ii_i, jj_i, i_valid, bad_ii, bad_jj, bad_valid, r):
    """Rollup re-indexing of the inactive and bad-edge stores: the
    in-kernel twin of ``graph.shift_indices`` (entries whose indices go
    negative drop, survivors compact stably and shift down by ``r``).
    Shared by both async step kernels (slam/async_pipeline.py and
    slam/coupled_async.py _apply_roll).

    Returns a dict with the new ``ii_i/jj_i/i_valid`` plus
    ``inact_perm_old`` (feed to ``graph._rebuild_inactive`` with
    all-False from_act) and the compacted ``bad_ii/bad_jj/bad_valid``.
    """
    I = ii_i.shape[0]
    keep = i_valid & (ii_i >= r) & (jj_i >= r)
    pos, n_k = _stable_compact(keep)
    tgt = jnp.where(keep, pos, I + 1)
    ar_i = jnp.arange(I, dtype=jnp.int32)
    new_ii_i = jnp.zeros((I,), jnp.int32).at[tgt].set(
        (ii_i - r).astype(jnp.int32), mode="drop")
    new_jj_i = jnp.zeros((I,), jnp.int32).at[tgt].set(
        (jj_i - r).astype(jnp.int32), mode="drop")
    perm_old = jnp.zeros((I,), jnp.int32).at[tgt].set(ar_i, mode="drop")
    bcn = bad_ii.shape[0]
    keep_b = bad_valid & (bad_ii >= r) & (bad_jj >= r)
    pos_b, n_b = _stable_compact(keep_b)
    tgt_b = jnp.where(keep_b, pos_b, bcn + 1)
    ar_b = jnp.arange(bcn, dtype=jnp.int32)
    return dict(
        ii_i=new_ii_i, jj_i=new_jj_i, i_valid=ar_i < n_k,
        inact_perm_old=perm_old,
        bad_ii=jnp.zeros((bcn,), jnp.int32).at[tgt_b].set(
            (bad_ii - r).astype(jnp.int32), mode="drop"),
        bad_jj=jnp.zeros((bcn,), jnp.int32).at[tgt_b].set(
            (bad_jj - r).astype(jnp.int32), mode="drop"),
        bad_valid=ar_b < n_b,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "src", "wf", "n_skip", "skip_offsets", "rad", "nms",
        "max_factors", "max_age", "active_window", "visual_only", "max_out",
    ),
)
def edge_transition(
    ii, jj, age, e_valid,
    ii_i, jj_i, i_valid,
    bad_ii, bad_jj, bad_valid,
    prox_d,                 # (src*wf + n_skip,) distances for the new frame
    t1,                     # scalar int32 keyframe count incl. the new frame
    thresh: float,
    *,
    src: int,
    wf: int,
    n_skip: int,
    skip_offsets: tuple,
    rad: int,
    nms: int,
    max_factors: int,
    max_age: int,
    active_window: int,
    visual_only: bool,
    max_out: int,
):
    """Returns a dict with the new active/inactive index state plus the
    gather plans (perm/is_new for _rebuild_edges, perm_old/from_active/
    act_idx for _rebuild_inactive)."""
    i32 = jnp.int32
    E = ii.shape[0]
    I = ii_i.shape[0]
    t1 = t1.astype(i32)

    # ---- 1. stale retirement (frontend.py:257-266)
    out_win = (ii < t1 - active_window) | (jj < t1 - active_window)
    if visual_only:
        stale = (age > max_age) & out_win
    else:
        stale = (age > max_age) | out_win
    stale = stale & e_valid
    keep1 = e_valid & ~stale

    # ---- 2. selection candidates (graph.py add_proximity + host_metrics)
    t0 = t1 - src
    t1p = t1 - wf
    ii_c = t0 + jnp.arange(src, dtype=i32)
    jj_c = t1p + jnp.arange(wf, dtype=i32)
    cand_i = jnp.repeat(ii_c, wf)
    cand_j = jnp.tile(jj_c, src)
    d = prox_d
    if n_skip:
        skip = jnp.asarray(list(skip_offsets), i32)
        si = jnp.full((n_skip,), t1 - 1, i32)
        sj = t0 + skip
        cand_i = jnp.concatenate([cand_i, si])
        cand_j = jnp.concatenate([cand_j, sj])
        # host drops non-positive skip targets (graph.py:934)
        d = d.at[src * wf:].set(jnp.where(sj <= 0, INF, d[src * wf:]))

    # NMS seeds: post-retirement actives + bad + inactive INCLUDING the
    # just-retired edges (they are in ii_inac by selection time on host)
    exist_ii = jnp.concatenate([ii, bad_ii, ii_i, ii])
    exist_jj = jnp.concatenate([jj, bad_jj, jj_i, jj])
    exist_m = jnp.concatenate([keep1, bad_valid, i_valid, stale])

    sel_ii, sel_jj, sel_m = select_proximity_edges(
        d, cand_i, cand_j, exist_ii, exist_jj, exist_m,
        t0, jnp.maximum(t1p, 0), t1, thresh,
        src=src, win=wf, n_skip=n_skip, rad=rad, nms=nms,
        max_factors=max_factors, max_out=max_out,
    )

    # ---- 3. dedup (graph.py:469-480): vs active(kept) U inactive(+retired),
    # and within the new list (first occurrence wins)
    def pair_eq(a1, b1, a2, b2, m2):
        return (a1[:, None] == a2[None, :]) & (b1[:, None] == b2[None, :]) \
            & m2[None, :]

    in_active = jnp.any(pair_eq(sel_ii, sel_jj, ii, jj, keep1), axis=1)
    in_inac = jnp.any(
        pair_eq(sel_ii, sel_jj, ii_i, jj_i, i_valid), axis=1
    ) | jnp.any(pair_eq(sel_ii, sel_jj, ii, jj, stale), axis=1)
    same = (sel_ii[:, None] == sel_ii[None, :]) & \
        (sel_jj[:, None] == sel_jj[None, :]) & sel_m[None, :]
    earlier = jnp.tril(same, k=-1)
    dup_within = jnp.any(earlier, axis=1)
    new_m = sel_m & ~in_active & ~in_inac & ~dup_within
    n_new = jnp.sum(new_m.astype(i32))

    # ---- 4. age-ranked budget eviction (graph.py:482-495): evict oldest
    # actives beyond the budget, retiring them too
    n1 = jnp.sum(keep1.astype(i32))
    do_evict = (n1 + n_new > max_factors) & (n1 > 0) & (max_factors > 0)
    # ranks among kept actives by ascending age (stable): rank 0 = newest.
    # Host ranks over its compacted array; padding rows get huge keys so
    # kept rows occupy ranks 0..n1-1 in the same relative order.
    order_key = jnp.where(keep1, age.astype(jnp.int32), jnp.int32(2**30))
    order = jnp.argsort(order_key, stable=True)
    ranks = jnp.zeros((E,), i32).at[order].set(jnp.arange(E, dtype=i32))
    evict = do_evict & keep1 & (
        ranks >= jnp.maximum(max_factors - n_new, 0)
    )
    keep2 = keep1 & ~evict

    # ---- 5. compose the new active set: kept (order) then new (order)
    pos_k, n_keep = _stable_compact(keep2)
    cap_left = E - n_keep
    pos_n, _ = _stable_compact(new_m)
    new_slot = n_keep + pos_n
    take_new = new_m & (pos_n < cap_left)

    # scatter kept: slot pos_k[s] <- source s (only where keep2)
    perm = jnp.zeros((E,), i32).at[
        jnp.where(keep2, pos_k, E + 1)
    ].set(jnp.arange(E, dtype=i32), mode="drop")

    ii2 = jnp.zeros((E,), i32).at[
        jnp.where(keep2, pos_k, E + 1)
    ].set(ii.astype(i32), mode="drop")
    jj2 = jnp.zeros((E,), i32).at[
        jnp.where(keep2, pos_k, E + 1)
    ].set(jj.astype(i32), mode="drop")
    age2 = jnp.zeros((E,), i32).at[
        jnp.where(keep2, pos_k, E + 1)
    ].set(age.astype(i32), mode="drop")

    sel_slots = jnp.where(take_new, new_slot, E + 1)
    ii2 = ii2.at[sel_slots].set(sel_ii, mode="drop")
    jj2 = jj2.at[sel_slots].set(sel_jj, mode="drop")

    n_total = n_keep + jnp.sum(take_new.astype(i32))
    valid2 = jnp.arange(E, dtype=i32) < n_total
    is_new = (jnp.arange(E, dtype=i32) >= n_keep) & valid2

    # ---- inactive composition: concat(prior, stale, evicted), keep LAST I
    n_i = jnp.sum(i_valid.astype(i32))
    pos_s, n_s = _stable_compact(stale)
    pos_e, n_e = _stable_compact(evict)
    total = n_i + n_s + n_e
    drop = jnp.maximum(total - I, 0)

    # virtual concat index: prior at [0, n_i), stale at [n_i, n_i+n_s),
    # evicted after; final slot = virtual - drop
    pos_i, _ = _stable_compact(i_valid)
    slot_prior = jnp.where(i_valid, pos_i - drop, -1)
    slot_stale = jnp.where(stale, n_i + pos_s - drop, -1)
    slot_evict = jnp.where(evict, n_i + n_s + pos_e - drop, -1)

    perm_old = jnp.zeros((I,), i32)
    from_act = jnp.zeros((I,), bool)
    act_idx = jnp.zeros((I,), i32)
    ok_p = i_valid & (slot_prior >= 0)
    perm_old = perm_old.at[jnp.where(ok_p, slot_prior, I + 1)].set(
        jnp.arange(I, dtype=i32), mode="drop")
    for flags, slots in ((stale, slot_stale), (evict, slot_evict)):
        ok = flags & (slots >= 0)
        tgt = jnp.where(ok, slots, I + 1)
        from_act = from_act.at[tgt].set(True, mode="drop")
        act_idx = act_idx.at[tgt].set(jnp.arange(E, dtype=i32), mode="drop")

    ii_i2 = jnp.zeros((I,), i32).at[
        jnp.where(ok_p, slot_prior, I + 1)
    ].set(ii_i.astype(i32), mode="drop")
    jj_i2 = jnp.zeros((I,), i32).at[
        jnp.where(ok_p, slot_prior, I + 1)
    ].set(jj_i.astype(i32), mode="drop")
    for flags, slots in ((stale, slot_stale), (evict, slot_evict)):
        ok = flags & (slots >= 0)
        tgt = jnp.where(ok, slots, I + 1)
        ii_i2 = ii_i2.at[tgt].set(ii.astype(i32), mode="drop")
        jj_i2 = jj_i2.at[tgt].set(jj.astype(i32), mode="drop")
    i_valid2 = jnp.arange(I, dtype=i32) < jnp.minimum(total, I)

    return dict(
        ii=ii2, jj=jj2, age=age2, valid=valid2,
        perm=perm, is_new=is_new,
        ii_i=ii_i2, jj_i=jj_i2, i_valid=i_valid2,
        inact_perm_old=perm_old, inact_from_act=from_act,
        inact_act_idx=act_idx,
    )


@jax.jit
def cull_transition(ii, jj, age, e_valid, ii_i, jj_i, i_valid, ix):
    """Edge re-indexing for a culled keyframe (graph.rm_keyframe).

    Drops edges touching slot ``ix`` (no retirement), decrements indices
    above it, and compacts both stores order-preservingly.  Returns the
    new index state plus gather plans (perm for _rebuild_edges with
    is_new=False everywhere; perm_old for _rebuild_inactive with no
    active-sourced rows).
    """
    i32 = jnp.int32
    E = ii.shape[0]
    I = ii_i.shape[0]
    ix = ix.astype(i32)

    drop = ((ii == ix) | (jj == ix)) & e_valid
    keep = e_valid & ~drop
    ii2 = jnp.where(ii >= ix, ii - 1, ii)
    jj2 = jnp.where(jj >= ix, jj - 1, jj)
    pos, n_keep = _stable_compact(keep)
    tgt = jnp.where(keep, pos, E + 1)
    out_ii = jnp.zeros((E,), i32).at[tgt].set(ii2.astype(i32), mode="drop")
    out_jj = jnp.zeros((E,), i32).at[tgt].set(jj2.astype(i32), mode="drop")
    out_age = jnp.zeros((E,), i32).at[tgt].set(age.astype(i32), mode="drop")
    perm = jnp.zeros((E,), i32).at[tgt].set(
        jnp.arange(E, dtype=i32), mode="drop"
    )
    valid2 = jnp.arange(E, dtype=i32) < n_keep

    drop_i = ((ii_i == ix) | (jj_i == ix)) & i_valid
    keep_i = i_valid & ~drop_i
    ii_i2 = jnp.where(ii_i >= ix, ii_i - 1, ii_i)
    jj_i2 = jnp.where(jj_i >= ix, jj_i - 1, jj_i)
    pos_i, n_ki = _stable_compact(keep_i)
    tgt_i = jnp.where(keep_i, pos_i, I + 1)
    o_ii_i = jnp.zeros((I,), i32).at[tgt_i].set(
        ii_i2.astype(i32), mode="drop"
    )
    o_jj_i = jnp.zeros((I,), i32).at[tgt_i].set(
        jj_i2.astype(i32), mode="drop"
    )
    perm_old = jnp.zeros((I,), i32).at[tgt_i].set(
        jnp.arange(I, dtype=i32), mode="drop"
    )
    i_valid2 = jnp.arange(I, dtype=i32) < n_ki

    return dict(
        ii=out_ii, jj=out_jj, age=out_age, valid=valid2, perm=perm,
        ii_i=o_ii_i, jj_i=o_jj_i, i_valid=i_valid2, inact_perm_old=perm_old,
    )
