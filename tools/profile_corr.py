"""TPU timing: correlation lookup variants at the bench operating point.

  old    : build_volume_nhwc + lookup_pallas + NHWC transpose (current path)
  fused  : corr_fused_pallas (volume+lookup in one kernel, blockdiag MXU)

Usage: python tools/profile_corr.py [old fused fused2 fusedg2 ...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbaf_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp

from profile_round import slope  # noqa: E402  (same directory)

E, H, W, C = 64, 48, 64, 128


def main():
    want = set(sys.argv[1:]) or {"old", "fused"}
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    f1 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.bfloat16)
    coords0 = jnp.asarray(rng.uniform(0, 48, (E, H, W, 2)), jnp.float32)

    from dbaf_tpu.ops import corr as corr_ops
    from dbaf_tpu.ops.corr_pallas import corr_fused_pallas, lookup_pallas

    if "old" in want:
        @jax.jit
        def old_step(c):
            vol = corr_ops.build_volume_nhwc(f1, f2)
            out = lookup_pallas(vol, c, 3, 4)
            out = out.transpose(0, 2, 3, 1)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("old", old_step, coords0)

    if "fused" in want:
        @jax.jit
        def fused_step(c):
            out = corr_fused_pallas(f1, f2, c)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("fused", fused_step, coords0)

    if "fused2" in want:
        @jax.jit
        def fused2_step(c):
            out = corr_fused_pallas(f1, f2, c, tile=256)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("fused256", fused2_step, coords0)

    if "fusedg2" in want:
        @jax.jit
        def fusedg2_step(c):
            out = corr_fused_pallas(f1, f2, c, group=2)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("fusedg2", fusedg2_step, coords0)


if __name__ == "__main__":
    main()
