"""Multi-process worker: edge-sharded DBA over a jax.distributed mesh.

One OS process per host.  Every process builds the same seeded synthetic
window, keeps only its slice of the edge arrays, joins the global mesh,
and runs N edge-sharded GN iterations (parallel/shard_ba.py -- sharded
linearization, psum assembly, all_gather couplings, replicated solve).
Process 0 saves the final poses/disps and timing to ``--out``.

CPU emulation of a 2-host run (tests/test_multihost.py):

    python -m dbaf_tpu.parallel.dist_worker --process-id 0 --num-processes 2 \
        --coordinator localhost:9876 --cpu-devices 2 --out /tmp/p0.npz &
    python -m dbaf_tpu.parallel.dist_worker --process-id 1 --num-processes 2 \
        --coordinator localhost:9876 --cpu-devices 2 --out /tmp/p1.npz

On real multi-host TPU hardware, omit ``--cpu-devices`` and launch one
process per host (the coordinator defaults resolve from the TPU metadata
or the JAX_* environment); ``--iters``/``--time`` then produce the
BASELINE.md scaling-efficiency numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="emulate: N virtual CPU devices per process")
    ap.add_argument("--edges", type=int, default=128)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--time", type=int, default=0,
                    help="additionally time this many chained iterations")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args(argv)

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from ..utils.jax_setup import setup
        setup()
        import jax

    import numpy as np

    from . import dist

    # join the job BEFORE importing modules that build jnp constants at
    # import time (ops.*) -- jax.distributed.initialize must precede any
    # backend initialization
    n_proc = dist.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp  # noqa: F401

    from ..ops import lie
    from .shard_ba import make_sharded_ba_iteration
    mesh = dist.global_edge_mesh()
    n_dev = len(jax.devices())
    print(f"# process {jax.process_index()}/{n_proc} devices={n_dev}",
          file=sys.stderr, flush=True)

    H8, W8 = 24, 32
    P_win, E = args.window, args.edges
    assert E % n_dev == 0, (E, n_dev)
    rng = np.random.default_rng(0)  # SAME seed on every process

    xi = rng.normal(size=(P_win, 6)).astype(np.float32) * 0.02
    poses = np.asarray(lie.se3_retr(
        jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                 (P_win, 1)),
        jnp.asarray(xi),
    ))
    disps = (0.5 + 0.1 * rng.random((P_win, H8, W8))).astype(np.float32)
    intr = np.asarray([80.0, 80.0, W8 / 2, H8 / 2], np.float32)
    ii = np.repeat(np.arange(P_win), E // P_win + 1)[:E].astype(np.int32)
    jj = np.clip(ii + rng.integers(1, 4, size=E), 0, P_win - 1).astype(
        np.int32)
    targets = (rng.random((E, H8, W8, 2)) * [W8, H8]).astype(np.float32)
    weights = (0.5 * np.ones((E, H8, W8, 2))).astype(np.float32)
    eta = np.full((P_win, H8 * W8), 1e-4, np.float32)
    mask = np.ones((E,), bool)

    sl = dist.process_edge_slice(E)
    tg, wg, iig, jjg, mg = dist.global_edge_arrays(
        mesh, "edge", targets[sl], weights[sl], ii[sl], jj[sl], mask[sl]
    )
    pg, dg, ig, eg = dist.replicated(mesh, poses, disps, intr, eta)
    one, Pw = dist.replicated(mesh, np.asarray(1), np.asarray(P_win))

    step = make_sharded_ba_iteration(mesh, P_win)
    p, d = pg, dg
    for _ in range(args.iters):
        p, d = step(p, d, ig, tg, wg, eg, iig, jjg, mg, one, Pw)
    jax.block_until_ready(d)

    timing = None
    if args.time:
        t0 = time.perf_counter()
        tp, td = p, d
        for _ in range(args.time):
            tp, td = step(tp, td, ig, tg, wg, eg, iig, jjg, mg, one, Pw)
        jax.block_until_ready(td)
        timing = (time.perf_counter() - t0) / args.time
        print(json.dumps({
            "metric": "multihost_sharded_ba_iter_ms",
            "processes": n_proc, "devices": n_dev,
            "value": round(timing * 1e3, 3), "unit": "ms/iter",
        }), flush=True)

    if args.out and jax.process_index() == 0:
        from jax.experimental import multihost_utils  # noqa: F401
        p_host = np.asarray(jax.device_get(p))
        d_host = np.asarray(jax.device_get(d))
        np.savez(args.out, poses=p_host, disps=d_host,
                 iter_ms=-1.0 if timing is None else timing * 1e3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
