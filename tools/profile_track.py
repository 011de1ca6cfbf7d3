"""Wall-clock phase breakdown of the bench keyframe loop on the TPU.

Replicates bench.py's setup, then times filter.track vs frontend() per
frame over the measurement window (each keyframe ends in the frontend's
packed pull, so per-call wall time is the real cost)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbaf_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp

from dbaf_tpu.models import DroidNet
from dbaf_tpu.slam.system import DBAFusion
from dbaf_tpu.utils.config import tumvi_config


def main():
    cfg = tumvi_config()
    cfg.frontend.filter_thresh = -1.0
    cfg.frontend.rollup_start = 40
    cfg.frontend.rollup_shift = 15
    cfg.frontend.keyframe_thresh = -1.0
    cfg.ba.window = 48

    model = DroidNet()
    rng = np.random.default_rng(0)
    ht, wd = cfg.image_size
    probe = jnp.zeros((1, ht, wd, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), probe, method=model.extract_features
    )["params"]
    uparams = model.init(
        jax.random.PRNGKey(1), None,
        jnp.zeros((1, ht // 8, wd // 8, 128), jnp.bfloat16),
        jnp.zeros((1, ht // 8, wd // 8, 128), jnp.bfloat16),
        jnp.zeros((1, ht // 8, wd // 8, 196), jnp.bfloat16),
        jnp.zeros((1, ht // 8, wd // 8, 4), jnp.bfloat16),
    )["params"]
    params = {**params, **uparams}

    system = DBAFusion(cfg, params=params)
    intr = np.asarray([460.0, 460.0, wd / 2, ht / 2], dtype=np.float32)
    base = rng.integers(0, 255, size=(ht + 64, wd + 64, 3)).astype(np.float32)

    def frame(k):
        ox, oy = (3 * k) % 64, (2 * k) % 64
        return base[oy : oy + ht, ox : ox + wd]

    n_warm, n_meas = 14, 12
    for k in range(n_warm):
        system.track(float(k), frame(k), intrinsics=intr)
    jax.block_until_ready(system.video.poses)

    tf_sum = te_sum = 0.0
    for k in range(n_warm, n_warm + n_meas):
        t0 = time.perf_counter()
        system.filter.track(float(k), frame(k), intrinsics=intr)
        t1 = time.perf_counter()
        system.frontend()
        t2 = time.perf_counter()
        print(f"frame {k}: filter {1e3*(t1-t0):7.1f} ms  "
              f"frontend {1e3*(t2-t1):7.1f} ms", flush=True)
        if k >= n_warm + 2:
            tf_sum += t1 - t0
            te_sum += t2 - t1
    n = n_meas - 2
    print(f"mean: filter {1e3*tf_sum/n:.1f} ms  frontend {1e3*te_sum/n:.1f} ms")


if __name__ == "__main__":
    main()
