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
