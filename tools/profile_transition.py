"""Slope-timing of the fixed (non-round) pieces of the coupled-async step
kernel at the bench operating point: edge_transition, its inner
select_proximity_edges, the edge/inactive rebuilds, and the device
marginalization.  Identifies where the ~21 ms/keyframe fixed cost lives.

Usage: python tools/profile_transition.py [piece ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbaf_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp

from dbaf_tpu.slam.edge_select import edge_transition, select_proximity_edges
from dbaf_tpu.slam.graph import _rebuild_edges, _rebuild_inactive

E_CAP, I_CAP = 48, 64
H8, W8 = 48, 64
WF, SRC, NSKIP = 5, 5, 3
BC = 64


def _pull(state):
    leaf = jax.tree_util.tree_leaves(state)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def slope(name, step, state, n=8):
    s = step(state)
    _pull(s)
    t0 = time.perf_counter()
    s1 = step(s)
    _pull(s1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cur = s1
    for _ in range(n):
        cur = step(cur)
    _pull(cur)
    tn = time.perf_counter() - t0
    print(f"{name:12s} {(tn - t1) / (n - 1) * 1e3:8.3f} ms", flush=True)


def mix_int(arr, seed):
    """Data-dependent no-op keeping values in range (chains dispatches)."""
    return arr + (seed - seed).astype(arr.dtype)


def main():
    which = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    skip = (-4, -5, -6)

    ii = jnp.asarray(rng.integers(5, 20, E_CAP), jnp.int32)
    jj = jnp.asarray(rng.integers(5, 20, E_CAP), jnp.int32)
    age = jnp.asarray(rng.integers(0, 10, E_CAP), jnp.int32)
    e_valid = jnp.asarray(np.arange(E_CAP) < 44)
    ii_i = jnp.asarray(rng.integers(0, 18, I_CAP), jnp.int32)
    jj_i = jnp.asarray(rng.integers(0, 18, I_CAP), jnp.int32)
    i_valid = jnp.asarray(np.arange(I_CAP) < 40)
    bad_ii = jnp.zeros(BC, jnp.int32)
    bad_jj = jnp.zeros(BC, jnp.int32)
    bad_valid = jnp.zeros(BC, bool)
    prox_d = jnp.asarray(rng.uniform(0, 30, SRC * WF + NSKIP), jnp.float32)
    t1 = jnp.asarray(21, jnp.int32)

    if not which or "transition" in which:
        @jax.jit
        def step_tr(state):
            ii, jj, age, prox = state
            tr = edge_transition(
                ii, jj, age, e_valid, ii_i, jj_i, i_valid,
                bad_ii, bad_jj, bad_valid, prox, t1, 16.0,
                src=SRC, wf=WF, n_skip=NSKIP, skip_offsets=skip,
                rad=2, nms=1, max_factors=48, max_age=25,
                active_window=12, visual_only=False,
                max_out=4 * (48 + 60),
            )
            return (mix_int(ii, tr["ii"][0]), jj, tr["age"],
                    prox + 1e-12 * tr["ii"][0].astype(jnp.float32))

        slope("transition", step_tr, (ii, jj, age, prox_d))

    if not which or "select" in which:
        cand_i = jnp.repeat(t1 - SRC + jnp.arange(SRC, dtype=jnp.int32), WF)
        cand_j = jnp.tile(t1 - WF + jnp.arange(WF, dtype=jnp.int32), SRC)
        cand_i = jnp.concatenate(
            [cand_i, jnp.full((NSKIP,), t1 - 1, jnp.int32)])
        cand_j = jnp.concatenate(
            [cand_j, t1 - SRC + jnp.asarray(skip, jnp.int32)])
        ex_ii = jnp.concatenate([ii, bad_ii, ii_i, ii])
        ex_jj = jnp.concatenate([jj, bad_jj, jj_i, jj])
        ex_m = jnp.concatenate(
            [e_valid, bad_valid, i_valid, jnp.zeros(E_CAP, bool)])

        @jax.jit
        def step_sel(state):
            d, = state
            o_ii, o_jj, o_m = select_proximity_edges(
                d, cand_i, cand_j, ex_ii, ex_jj, ex_m,
                t1 - SRC, t1 - WF, t1, 16.0,
                src=SRC, win=WF, n_skip=NSKIP, rad=2, nms=1,
                max_factors=48, max_out=4 * (48 + 60),
            )
            return (d + 1e-12 * o_ii[0].astype(jnp.float32),)

        slope("select", step_sel, (prox_d,))

    if not which or "rebuild" in which:
        poses = jnp.asarray(rng.standard_normal((64, 7)), jnp.float32)
        poses = poses.at[:, 3:].set(
            poses[:, 3:] / jnp.linalg.norm(poses[:, 3:], axis=1, keepdims=True))
        disps = jnp.ones((64, H8, W8), jnp.float32)
        intr = jnp.asarray([96.0, 96.0, 32.0, 24.0], jnp.float32)
        nets_buf = jnp.asarray(
            rng.standard_normal((64, H8, W8, 128)), jnp.bfloat16)
        e_net = jnp.asarray(
            rng.standard_normal((E_CAP, H8, W8, 128)), jnp.bfloat16)
        e_t = jnp.asarray(
            rng.standard_normal((E_CAP, H8, W8, 2)), jnp.float32)
        e_w = jnp.asarray(
            rng.standard_normal((E_CAP, H8, W8, 2)), jnp.float32)
        perm = jnp.arange(E_CAP, dtype=jnp.int32)
        is_new = jnp.asarray(np.arange(E_CAP) % 7 == 0)

        @jax.jit
        def step_rb(state):
            e_net, e_t, e_w = state
            out = _rebuild_edges(
                e_net, e_t, e_w, perm, is_new, ii, jj, poses, disps, intr,
                nets_buf)
            return (out.net, out.target, out.weight)

        slope("rebuild_e", step_rb, (e_net, e_t, e_w))

        t_in = jnp.asarray(
            rng.standard_normal((I_CAP, H8, W8, 2)), jnp.float32)
        w_in = jnp.asarray(
            rng.standard_normal((I_CAP, H8, W8, 2)), jnp.float32)
        perm_o = jnp.arange(I_CAP, dtype=jnp.int32)
        from_a = jnp.asarray(np.arange(I_CAP) % 9 == 0)
        act_i = jnp.arange(I_CAP, dtype=jnp.int32) % E_CAP

        @jax.jit
        def step_ri(state):
            t_in, w_in = state
            return _rebuild_inactive(t_in, w_in, perm_o, from_a, act_i,
                                     e_t, e_w)

        slope("rebuild_i", step_ri, (t_in, w_in))

    if not which or "marg" in which:
        from dbaf_tpu.fusion import device_graph as dg

        NW = 20
        P = 59
        B = 63
        poses = jnp.tile(
            jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32)[None], (B, 1))
        disps = jnp.ones((B, H8, W8), jnp.float32)
        damping = 1e-6 * jnp.ones((B, H8, W8), jnp.float32)
        intr = jnp.asarray([96.0, 96.0, 32.0, 24.0], jnp.float32)
        EA = E_CAP + I_CAP
        tgt = jnp.asarray(rng.standard_normal((EA, H8, W8, 2)), jnp.float32)
        wgt = jnp.abs(jnp.asarray(
            rng.standard_normal((EA, H8, W8, 2)), jnp.float32))
        ii_m = jnp.asarray(rng.integers(0, 10, EA), jnp.int32)
        jj_m = jnp.asarray(rng.integers(0, 10, EA), jnp.int32)
        m_idx = jnp.asarray(np.arange(EA) < 12)
        flat = jnp.abs(jnp.asarray(
            rng.standard_normal(dg.graph_flat_size(NW)), jnp.float32))
        pg = dg.unflatten_graph(flat, NW)
        fg = dg.unflatten_state(
            jnp.asarray(rng.standard_normal(NW * 21), jnp.float32), 16, NW)
        mgd = dg.MargDense(
            jnp.zeros((NW,), bool),
            jnp.zeros((NW, 21), jnp.float32),  # [R(9)|t|vel|bias] rows
            jnp.zeros((NW * 15, NW * 15), jnp.float32),
            jnp.zeros((NW * 15,), jnp.float32),
        )
        A = jnp.eye(6, dtype=jnp.float32)  # camera->body tangent adjoint

        @jax.jit
        def step_mg(state):
            tgt, = state
            out = dg.marginalize_window_body(
                poses, disps, damping, intr, tgt, wgt, ii_m, jj_m, m_idx,
                jnp.asarray(2, jnp.int32), fg, pg, mgd, A,
                jnp.asarray(1, jnp.int32), jnp.asarray(4, jnp.int32),
                P=P, NW=NW, eps_damping=1e-7,
            )
            return (tgt + 1e-12 * out.v[0],)

        slope("marg", step_mg, (tgt,))


if __name__ == "__main__":
    main()
