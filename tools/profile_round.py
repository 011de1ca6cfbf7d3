"""Per-component timing of the update round at the bench operating point.

Measures (on the real TPU, chained-dispatch protocol -- see CLAUDE.md):
  corr   : Pallas multi-scale lookup, vol (64, 3072, 48, 64) bf16
  gru    : UpdateModule forward, 64 edges
  ba     : dba.ba, P=48 window, 128 combined edge rows, 2 GN iters
  edge   : build_edge_system alone (128 rows)
  pair   : assemble_pairwise alone
  chol   : damped_solve alone (288x288)
  fnet   : feature extraction (1, 384, 512, 3)

Usage: python tools/profile_round.py [component ...]
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

E_CAP, I_CAP, P_WIN = 48, 64, 48
HT, WD = 384, 512
H8, W8 = HT // 8, WD // 8
D = H8 * W8
E_ALL = E_CAP + I_CAP


def _pull(state):
    """Force real completion: D2H pull of one scalar (block_until_ready can
    lie on the axon transport)."""
    leaf = jax.tree_util.tree_leaves(state)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def slope(name, step, state, n=None):
    if n is None:
        n = int(os.environ.get("SLOPE_N", "8"))
    """Time `state = step(state)` chained; report (t_n - t_1) / (n - 1).

    Both timed regions end in a scalar pull so the pull cost cancels in the
    slope."""
    s = step(state)  # compile + warm
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

    per = (tn - t1) / (n - 1)
    print(f"{name:8s} {per * 1e3:8.2f} ms   (1-call+pull {t1 * 1e3:.1f} ms)",
          flush=True)
    return per


def feed(x, out):
    """Fold a scalar of `out` into x to defeat dispatch memoization.

    The perturbation must be large enough to change the f32 bits of x
    (the axon transport memoizes bit-identical dispatches) but small
    enough to keep the inputs in a valid range."""
    delta = jnp.mean(out).astype(jnp.float32) % jnp.float32(1.0)
    return x + (1e-3 * delta).astype(x.dtype)


def main():
    want = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    def on(name):
        return not want or name in want

    if on("corr"):
        from dbaf_tpu.ops.corr_pallas import lookup_pallas

        vol = jnp.asarray(
            rng.standard_normal((E_CAP, D, H8, W8)), jnp.bfloat16
        )
        coords = jnp.asarray(
            rng.uniform(0, 48, (E_CAP, H8, W8, 2)), jnp.float32
        )

        def step_corr(c):
            out = lookup_pallas(vol, c, 3, 4)
            return feed(c, out)

        slope("corr", step_corr, coords)

    if on("gru") or on("fnet"):
        from dbaf_tpu.models import DroidNet

        model = DroidNet()
        probe = jnp.zeros((1, HT, WD, 3), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), probe, method=model.extract_features
        )["params"]
        uparams = model.init(
            jax.random.PRNGKey(1), None,
            jnp.zeros((1, H8, W8, 128), jnp.bfloat16),
            jnp.zeros((1, H8, W8, 128), jnp.bfloat16),
            jnp.zeros((1, H8, W8, 196), jnp.bfloat16),
            jnp.zeros((1, H8, W8, 4), jnp.bfloat16),
        )["params"]
        params = {**params, **uparams}

    if on("gru"):
        @jax.jit
        def gru_step(net, inp, corr, motn):
            net_new, delta, weight, _, _ = model.apply(
                {"params": params}, None, net, inp, corr, motn
            )
            return net_new, delta, weight

        net = jnp.asarray(rng.standard_normal((E_CAP, H8, W8, 128)), jnp.bfloat16)
        inp = jnp.asarray(rng.standard_normal((E_CAP, H8, W8, 128)), jnp.bfloat16)
        corr = jnp.asarray(rng.standard_normal((E_CAP, H8, W8, 196)), jnp.bfloat16)
        motn = jnp.asarray(rng.standard_normal((E_CAP, H8, W8, 4)), jnp.bfloat16)

        def step_gru(n):
            nn, d, w = gru_step(n, inp, corr, motn)
            return nn

        slope("gru", step_gru, net)

    if on("fnet"):
        @jax.jit
        def feat(images):
            return model.apply({"params": params}, images, method=model.features_only)

        img = jnp.asarray(rng.standard_normal((1, HT, WD, 3)), jnp.float32)

        def step_f(x):
            out = feat(x)
            return feed(x, out)

        slope("fnet", step_f, img)

    # ---- BA pieces ----
    need_ba = any(on(x) for x in ("ba", "edge", "pair", "chol", "bsub"))
    if need_ba:
        from dbaf_tpu.ops import dba

        poses = jnp.asarray(
            np.concatenate(
                [rng.standard_normal((P_WIN, 3)) * 0.1,
                 np.tile([0, 0, 0, 1.0], (P_WIN, 1))], axis=1
            ), jnp.float32,
        )
        disps = jnp.asarray(
            rng.uniform(0.5, 2.0, (P_WIN, H8, W8)), jnp.float32
        )
        intr = jnp.asarray([460.0 / 8, 460.0 / 8, W8 / 2, H8 / 2], jnp.float32)
        targets = jnp.asarray(
            rng.uniform(0, 48, (E_ALL, H8, W8, 2)), jnp.float32
        )
        weights = jnp.asarray(
            rng.uniform(0.1, 1.0, (E_ALL, H8, W8, 2)), jnp.float32
        )
        eta = jnp.full((P_WIN, D), 0.005, jnp.float32)
        ii = jnp.asarray(rng.integers(0, P_WIN, E_ALL), jnp.int32)
        jj = jnp.asarray(rng.integers(0, P_WIN, E_ALL), jnp.int32)
        mask = jnp.ones((E_ALL,), bool)
        nfixed = jnp.asarray(1, jnp.int32)
        nactive = jnp.asarray(P_WIN, jnp.int32)

    if on("ba"):
        def step_ba(st):
            p, d = st
            out = dba.ba(
                p, d, intr, targets, weights, eta, ii, jj, mask,
                nfixed, nactive, iterations=2,
            )
            return (out.poses, out.disps)

        slope("ba2", step_ba, (poses, disps))

    if on("edge"):
        bes = jax.jit(dba.build_edge_system)

        def step_edge(d):
            es = bes(poses, d, intr, targets, weights, ii, jj, mask)
            return feed(d, es.C)

        slope("edge", step_edge, disps)

    if on("pair") or on("chol") or on("bsub"):
        es0 = jax.jit(dba.build_edge_system)(
            poses, disps, intr, targets, weights, ii, jj, mask
        )
        es0 = jax.block_until_ready(es0)

        ap = jax.jit(
            lambda es, nf, na: dba.assemble_pairwise(
                es, ii, jj, P_WIN, nf, na, eta
            )
        )

    if on("pair"):
        def step_pair(esC):
            es = es0._replace(C=esC)
            ps = ap(es, nfixed, nactive)
            return feed(esC, ps.S)

        slope("pair", step_pair, es0.C)

    if on("chol") or on("bsub"):
        ps0 = jax.block_until_ready(ap(es0, nfixed, nactive))
        dsolve = jax.jit(
            lambda S, v, pa: dba.damped_solve(S, v, pa, 1e-4, 0.1)
        )

    if on("chol"):
        def step_chol(S):
            dx = dsolve(S, ps0.v, ps0.pose_active)
            return feed(S, dx)

        slope("chol", step_chol, ps0.S)

    if on("bsub"):
        dx0 = jax.block_until_ready(dsolve(ps0.S, ps0.v, ps0.pose_active))
        bs = jax.jit(
            lambda es, dx: dba.back_substitute_pairwise(
                ps0, es, ii, jj, dx, nfixed, nactive
            )
        )

        def step_bsub(dx):
            dz = bs(es0, dx)
            return feed(dx, dz)

        slope("bsub", step_bsub, dx0)


if __name__ == "__main__":
    main()
