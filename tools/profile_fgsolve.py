"""TPU stage timing for the device factor-graph solver (device_graph.py).

Times, with the chained-dispatch slope method (CLAUDE.md):
  linearize   one full factor linearization (H, b, err) at NW=fg_cap
  chol        damped Cholesky factor+solve of the (NW*15)^2 system
  lm          one lm_optimize call (while_loop, realized ~1-3 iters)
  rounds      coupled_rounds_device (2 LM calls + visual hessian/retract)

Usage: python tools/profile_fgsolve.py [linearize chol lm rounds]
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

from dbaf_tpu.fusion import device_graph as dg

NW = 20
P = 48
E = 48
HH, WW = 40, 64


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    n = NW - 4

    def rot(scale):
        w = rng.normal(size=3) * scale
        return np.asarray(dg._so3_exp(jnp.asarray(w, jnp.float32)))

    R = np.stack([rot(0.2) for _ in range(NW)]).astype(np.float32)
    st = dg.FgState(
        jnp.asarray(R),
        jnp.asarray(rng.normal(size=(NW, 3)) * 0.5, jnp.float32),
        jnp.asarray(rng.normal(size=(NW, 3)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(NW, 6)) * 0.01, jnp.float32),
        jnp.arange(NW) < n,
    )
    d = {}
    NF = NW - 1
    d["imu_mask"] = np.arange(NF) < n - 1
    d["imu_dR"] = np.stack([rot(0.05) for _ in range(NF)])
    d["imu_dv"] = rng.normal(size=(NF, 3)) * 0.05
    d["imu_dp"] = rng.normal(size=(NF, 3)) * 0.1
    d["imu_dt"] = np.full(NF, 0.25)
    for k in ("imu_dRg", "imu_dvg", "imu_dva", "imu_dpg", "imu_dpa"):
        d[k] = rng.normal(size=(NF, 3, 3)) * 0.01
    d["imu_bias0"] = rng.normal(size=(NF, 6)) * 0.01
    info = rng.normal(size=(NF, 15, 15)) * 0.1
    d["imu_info"] = info @ info.transpose(0, 2, 1) + 10 * np.eye(15)
    d["g_vec"] = np.asarray([0, 0, -9.81])
    PP = 4
    d["pp_mask"] = np.arange(PP) < 1
    d["pp_frame"] = np.zeros(PP, np.int32)
    d["pp_R"] = np.tile(np.eye(3), (PP, 1, 1))
    d["pp_t"] = np.zeros((PP, 3))
    d["pp_info"] = np.tile(100 * np.eye(6), (PP, 1, 1))
    PB = 4
    d["pb_mask"] = np.arange(PB) < 1
    d["pb_frame"] = np.zeros(PB, np.int32)
    d["pb_prior"] = np.zeros((PB, 6))
    d["pb_info"] = np.tile(10 * np.eye(6), (PB, 1, 1))
    d["gnss_mask"] = np.zeros(NW, bool)
    d["gnss_pos"] = np.zeros((NW, 3))
    d["gnss_info"] = np.eye(3)
    d["gnss_k2"] = 1.0
    d["odo_mask"] = np.zeros(NW, bool)
    d["odo_vel"] = np.zeros((NW, 3))
    d["odo_info"] = np.eye(3)
    pg_flat = dg.flatten_graph_np(d, NW)
    pg = dg.unflatten_graph(jnp.asarray(pg_flat), NW)
    md = dg.marg_identity_np(NW)
    md.mask[:3] = True
    blk = rng.normal(size=(45, 45)) * 0.03
    md.H[:45, :45] = blk @ blk.T
    md.v[:45] = rng.normal(size=45) * 0.01
    mgd = dg.MargDense(*(jnp.asarray(a) for a in md))

    vh = rng.normal(size=(NW * 6, NW * 6)) * 0.1
    vis_H = jnp.asarray(vh @ vh.T + 5 * np.eye(NW * 6), jnp.float32)
    vis_v = jnp.asarray(rng.normal(size=(NW * 6,)) * 0.1, jnp.float32)
    sel = jnp.asarray(dg._sel_pose(NW))
    return st, pg, mgd, vis_H, vis_v, sel, n


def slope(fn, mix, x0, n1=2, n2=12, reps=3):
    """Chained-dispatch slope timing: run n1 and n2 chained iterations,
    return (t(n2)-t(n1))/(n2-n1).  fn must be jitted; mix feeds the
    output back into a varying input."""
    def chain(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = mix(x, fn(x))
        jax.block_until_ready(x)
        return time.perf_counter() - t0
    chain(1)  # compile
    best = 1e9
    for _ in range(reps):
        t1, t2 = chain(n1), chain(n2)
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def main():
    want = set(sys.argv[1:]) or {"linearize", "chol", "lm", "rounds"}
    print("backend:", jax.default_backend(), flush=True)
    st, pg, mgd, vis_H, vis_v, sel, n = make_inputs()

    if "linearize" in want:
        @jax.jit
        def lin_step(x):
            st2 = st._replace(t=st.t + 1e-6 * x[:NW, :3])
            with jax.default_matmul_precision("highest"):
                H, b, err = dg.linearize(st2, pg, vis_H, vis_v, st.R,
                                         st.t, sel, mgd)
            return H

        t = slope(lin_step, lambda x, out: out[: NW, : NW * 15], st.t[:, :1]
                  * jnp.ones((NW, NW * 15)))
        print(f"linearize     {t*1e3:8.2f} ms", flush=True)

    if "chol" in want:
        @jax.jit
        def chol_step(H):
            with jax.default_matmul_precision("highest"):
                Hd = H + 1e-3 * jnp.diag(jnp.diagonal(H))
                c, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
                d = jax.scipy.linalg.cho_solve((c, low), H[:, 0])
            return H + 1e-9 * jnp.outer(d, d)

        with jax.default_matmul_precision("highest"):
            H0, _, _ = jax.jit(dg.linearize)(st, pg, vis_H, vis_v,
                                             st.R, st.t, sel, mgd)
        t = slope(chol_step, lambda x, out: out, H0)
        print(f"chol          {t*1e3:8.2f} ms", flush=True)

    if "lm" in want:
        @jax.jit
        def lm_step(x):
            st2 = st._replace(t=st.t + 1e-7 * x[:, :3])
            st3, (err, it) = dg.lm_optimize(st2, pg, vis_H, vis_v,
                                            st.R, st.t, sel, mgd)
            return jnp.concatenate([st3.t, st3.vel], axis=1)

        t = slope(lm_step, lambda x, out: out, jnp.zeros((NW, 6)))
        print(f"lm            {t*1e3:8.2f} ms", flush=True)

    if "rounds" in want:
        rng = np.random.default_rng(1)
        poses = jnp.asarray(rng.normal(size=(P, 7)) * 0.01, jnp.float32)
        poses = poses.at[:, 6].set(1.0)
        disps = jnp.asarray(
            np.abs(rng.normal(size=(P, HH, WW))) + 0.5, jnp.float32)
        damping = jnp.full((P, HH, WW), 1e-4, jnp.float32)
        intr = jnp.asarray([16.0, 16.0, WW / 2, HH / 2], jnp.float32)
        target = jnp.asarray(
            rng.normal(size=(E, HH, WW, 2)) * 2 + 16, jnp.float32)
        weight = jnp.asarray(
            np.abs(rng.normal(size=(E, HH, WW, 2))), jnp.float32)
        ii = jnp.asarray(rng.integers(0, n - 1, size=E), jnp.int32)
        jj = jnp.asarray((np.asarray(ii) + 1) % n, jnp.int32)
        mask = jnp.ones((E,), bool)
        fg_flat = dg.flatten_state(st)
        spec = dg._graph_spec(NW, 4, 4)
        pg_flat = jnp.concatenate(
            [jnp.asarray(getattr(pg, name), jnp.float32).reshape(-1)
             for name, _, _ in spec])
        A = jnp.eye(6, dtype=jnp.float32)

        @jax.jit
        def rounds_step(x):
            out = dg.coupled_rounds_device(
                poses + 1e-8 * x[:, :7], disps, damping, intr, target,
                weight, ii, jj, mask, jnp.asarray(0, jnp.int32),
                jnp.asarray(n, jnp.int32), fg_flat, pg_flat, mgd, A,
                P=P, NW=NW, n_iters=2)
            return out[0]

        t = slope(rounds_step, lambda x, out: out, poses,
                  n1=1, n2=6, reps=3)
        print(f"rounds(x2LM)  {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
