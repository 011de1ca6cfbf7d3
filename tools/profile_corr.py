"""TPU timing: correlation lookup variants at the bench operating point.

  old   : build_volume_nhwc + lookup_pallas + NHWC transpose (fallback)
  v5*   : corr_fused_xy_pallas flag/shape sweep (hot path = v5g16yt4)

Retired kernel generations (blk/blk2/fused-blk/v6-xyp/v8-cached/i8-vol)
were deleted in round 4; their measured numbers live in
docs/ABLATION_CORR.md and the code in git history.

Usage: python tools/profile_corr.py [old v5g16yt4 ...]
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
    want = set(sys.argv[1:]) or {"old", "v5g16yt4"}
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    f1 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.bfloat16)
    coords0 = jnp.asarray(rng.uniform(0, 48, (E, H, W, 2)), jnp.float32)

    from dbaf_tpu.ops import corr as corr_ops
    from dbaf_tpu.ops.corr_pallas import (
        corr_fused_xy_pallas, lookup_pallas, raw_corr_index,
    )

    if "old" in want:
        @jax.jit
        def old_step(c):
            vol = corr_ops.build_volume_nhwc(f1, f2)
            out = lookup_pallas(vol, c, 3, 4)
            out = out.transpose(0, 2, 3, 1)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("old", old_step, coords0)

    for name, kw in (
        ("v5g8", dict(group=8)),
        ("v5g8t256", dict(group=8, tile=256)),
        ("v5g16", dict(group=16, tile=256)),
        ("v5g16i8", dict(group=16, tile=256, int8=True)),
        ("v5g16yt4", dict(group=16, tile=256, y_tab=4)),
        ("v5g16yt4raw", dict(group=16, tile=256, y_tab=4, raw=True)),
        # endpoint-equal pair: lookup + first 1x1 of the corr encoder,
        # reference layout vs raw block layout with a scattered weight
        ("v5g16yt4enc", dict(group=16, tile=256, y_tab=4, _enc=196)),
        ("v5g16yt4rawenc",
         dict(group=16, tile=256, y_tab=4, raw=True, _enc=1024)),
        ("v5g16t512yt4", dict(group=16, tile=512, y_tab=4)),
        ("v5g16yt2", dict(group=16, tile=256, y_tab=2)),
        ("v5g16yt8", dict(group=16, tile=256, y_tab=8)),
        ("v5g8yt4", dict(group=8, y_tab=4)),
    ):
        if name in want:
            fn = corr_fused_xy_pallas
            enc = kw.pop("_enc", 0)
            if enc:
                w196 = jnp.asarray(
                    rng.standard_normal((196, 128)), jnp.bfloat16
                )
                if enc == 1024:
                    idx = np.asarray(raw_corr_index())
                    w_np = np.zeros((1024, 128), np.float32)
                    w_np[idx >= 0] = np.asarray(
                        w196.astype(jnp.float32)
                    )[idx[idx >= 0]]
                    w_enc = jnp.asarray(w_np, jnp.bfloat16)
                else:
                    w_enc = w196

                def _step(c, kw=kw, fn=fn, w_enc=w_enc):
                    out = fn(f1, f2, c, **kw)
                    o2 = jnp.einsum(
                        "ehwc,cf->ehwf", out, w_enc,
                        preferred_element_type=jnp.float32,
                    )
                    return c + 1e-3 * (jnp.mean(o2) % 1.0)
            else:
                def _step(c, kw=kw, fn=fn):
                    out = fn(f1, f2, c, **kw)
                    return c + 1e-3 * (jnp.mean(out) % 1.0)

            slope(name, jax.jit(_step), coords0)


if __name__ == "__main__":
    main()
