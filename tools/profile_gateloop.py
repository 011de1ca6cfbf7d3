"""Phase breakdown of the gate-rejected frame loop (async visual
pipeline, bench.py mode "gateonly"): where do the ~46 ms/frame go when
the device compute is ~1 ms (tools/profile_gate.py)?

Phases per frame: image H2D, kernel dispatch (enqueue), host small-image
subsample, drain (stacked pull, amortized), other.
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

HT, WD = 384, 512


def main():
    import bench

    from dbaf_tpu.models import DroidNet
    from dbaf_tpu.slam.system import DBAFusion
    from dbaf_tpu.utils.config import tumvi_config

    cfg = tumvi_config()
    cfg.frontend.rollup_start = 40
    cfg.frontend.rollup_shift = 15
    cfg.frontend.async_pipeline = True
    cfg.ba.window = 48
    cfg.frontend.filter_thresh = -1.0  # admit-all warmup; flipped below
    cfg.frontend.keyframe_thresh = -1.0

    model = DroidNet()
    params = bench._make_params(model, jax, jnp)
    rng = np.random.default_rng(0)
    intr = np.asarray([460.0, 460.0, WD / 2, HT / 2], dtype=np.float32)
    base = rng.integers(0, 255, size=(HT + 64, WD + 64, 3)).astype(np.float32)

    def frame(k):
        ox, oy = (3 * k) % 64, (2 * k) % 64
        return base[oy: oy + HT, ox: ox + WD]

    system = DBAFusion(cfg, params=params)
    k = 0
    t_w = time.time()
    while k < 90 and not (system._async is not None and system._async.active
                          and k >= 20):
        system.track(float(k), frame(k), intrinsics=intr)
        k += 1
        if k % 2 == 0:
            print(f"warm {k} ({time.time() - t_w:.0f}s) "
                  f"async={system._async is not None and system._async.active}",
                  flush=True)
    assert system._async is not None and system._async.active
    a = system._async
    jax.block_until_ready(a.state["poses"])
    a._drain(len(a.queue))
    # flip the gate to reject-everything (bench.py gateonly semantics)
    a.sync()
    cfg.frontend.filter_thresh = 1e9
    a.kernel = None
    a.activate()
    for _ in range(6):
        system.track(float(k), frame(k), intrinsics=intr)
        k += 1
    jax.block_until_ready(a.state["poses"])
    a._drain(len(a.queue))

    # instrumented replica of AsyncPipeline.track
    t_img = t_disp = t_small = t_drain = 0.0
    n = 40
    t0 = time.time()
    for i in range(n):
        image = frame(k + i)
        tstamp = float(k + i)
        t1 = time.time()
        img = jnp.asarray(np.asarray(image, dtype=np.uint8))[None]
        t2 = time.time()
        st = a.state
        args = [st[kk] for kk in
                __import__("dbaf_tpu.slam.async_pipeline",
                           fromlist=["_STATE_KEYS"])._STATE_KEYS]
        state, pack = a.kernel(
            img, *args,
            jnp.asarray(a.cfg.frontend.iters1, jnp.int32),
            jnp.asarray(a.cfg.frontend.iters2, jnp.int32),
            jnp.asarray(a._roll_start, jnp.int32),
            jnp.asarray(a.cfg.frontend.rollup_shift, jnp.int32),
        )
        a.state = state
        t3 = time.time()
        small = np.asarray(image[::8, ::8]).astype(np.uint8)
        a.queue.append((tstamp, small, a._abs_idx, state["pack_ring"]))
        a._abs_idx += 1
        t4 = time.time()
        if len(a.queue) >= a.lag + a.drain_batch:
            a._drain(a.drain_batch)
        t5 = time.time()
        t_img += t2 - t1
        t_disp += t3 - t2
        t_small += t4 - t3
        t_drain += t5 - t4
    jax.block_until_ready(a.state["poses"])
    a._drain(len(a.queue))
    dt = time.time() - t0
    print(f"total      {1e3 * dt / n:7.2f} ms/frame ({n / dt:.1f} fps)")
    print(f"  img H2D  {1e3 * t_img / n:7.2f}")
    print(f"  dispatch {1e3 * t_disp / n:7.2f}")
    print(f"  small    {1e3 * t_small / n:7.2f}")
    print(f"  drain    {1e3 * t_drain / n:7.2f}")


if __name__ == "__main__":
    main()
