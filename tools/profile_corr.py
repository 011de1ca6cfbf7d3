"""TPU timing: correlation lookup variants at the bench operating point.

  old    : build_volume_nhwc + lookup_pallas + NHWC transpose (current path)
  fused  : corr_fused_pallas (volume+lookup in one kernel, blockdiag MXU)

Usage: python tools/profile_corr.py [old fused fused2 fusedg2 ...]
"""

import functools
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

    if "blk" in want:
        from dbaf_tpu.ops.corr_pallas import lookup_blk_pallas

        @jax.jit
        def blk_step(c):
            vol = corr_ops.build_volume_nhwc(f1, f2)
            out = lookup_blk_pallas(vol, c, 3, 4)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("blk", blk_step, coords0)

    if "blk2" in want:
        from dbaf_tpu.ops.corr_pallas import lookup_blk2_pallas

        @jax.jit
        def blk2_step(c):
            vol = corr_ops.build_volume_nhwc(f1, f2)
            out = lookup_blk2_pallas(vol, c, 3, 4)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("blk2", blk2_step, coords0)

    if "blkg8" in want:
        from dbaf_tpu.ops.corr_pallas import lookup_blk_pallas

        @jax.jit
        def blkg8_step(c):
            vol = corr_ops.build_volume_nhwc(f1, f2)
            out = lookup_blk_pallas(vol, c, 3, 4, tile=256, group=8)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("blkg8", blkg8_step, coords0)

    if "vol" in want:
        @jax.jit
        def vol_step(c):
            vol = corr_ops.build_volume_nhwc(f1 + c[..., :1].astype(f1.dtype) * 0, f2)
            return c + 1e-3 * (jnp.mean(vol) % 1.0)

        slope("vol", vol_step, coords0)

    if "fusedg2" in want:
        @jax.jit
        def fusedg2_step(c):
            out = corr_fused_pallas(f1, f2, c, group=2)
            return c + 1e-3 * (jnp.mean(out) % 1.0)

        slope("fusedg2", fusedg2_step, coords0)

    if "v3" in want or "v3t256" in want:
        from dbaf_tpu.ops.corr_pallas import corr_fused_blk_pallas

        if "v3" in want:
            @jax.jit
            def v3_step(c):
                out = corr_fused_blk_pallas(f1, f2, c)
                return c + 1e-3 * (jnp.mean(out) % 1.0)

            slope("v3", v3_step, coords0)

        if "v3t256" in want:
            @jax.jit
            def v3t256_step(c):
                out = corr_fused_blk_pallas(f1, f2, c, tile=256)
                return c + 1e-3 * (jnp.mean(out) % 1.0)

            slope("v3t256", v3t256_step, coords0)

    for name, kw in (
        ("v3g2", dict(group=2)),
        ("v3g2t256", dict(group=2, tile=256)),
        ("v3g8", dict(group=8)),
        ("v3g8t512", dict(group=8, tile=512)),
        ("v3g16", dict(group=16, tile=256)),
        ("v3g16t512", dict(group=16, tile=512)),
    ):
        if name in want:
            from dbaf_tpu.ops.corr_pallas import corr_fused_blk_pallas

            def _step(c, kw=kw):
                out = corr_fused_blk_pallas(f1, f2, c, **kw)
                return c + 1e-3 * (jnp.mean(out) % 1.0)

            slope(name, jax.jit(_step), coords0)

    if "i8build" in want or "i8look" in want:
        from dbaf_tpu.ops.corr_pallas import (
            build_xy_volume_i8, corr_fused_xy_from_vol_i8, prepare_corr_fmaps,
        )

        f1p, f2h = prepare_corr_fmaps(f1, f2)
        if "i8build" in want:
            @jax.jit
            def i8b_step(f):
                v, dq = build_xy_volume_i8(f, f2h, tile=256, group=16)
                return f + 1e-3 * (jnp.mean(dq[:, :, 0, 0]) % 1.0).astype(f.dtype)

            slope("i8build", i8b_step, f1p)
        if "i8look" in want:
            vol_i8, dq8 = build_xy_volume_i8(f1p, f2h, tile=256, group=16)

            @jax.jit
            def i8l_step(v, dq, c):
                out = corr_fused_xy_from_vol_i8(v, dq, c, tile=256, group=16,
                                                y_tab=4)
                return c + 1e-3 * (jnp.mean(out) % 1.0)

            slope("i8lookup", functools.partial(i8l_step, vol_i8, dq8),
                  coords0)

    if "v8" in want or "v8build" in want:
        from dbaf_tpu.ops.corr_pallas import (
            build_xy_volume, corr_fused_xy_from_vol, prepare_corr_fmaps,
        )

        f1p, f2h = prepare_corr_fmaps(f1, f2)
        if "v8build" in want:
            @jax.jit
            def v8b_step(f):
                v = build_xy_volume(f, f2h, tile=256, group=16)
                return f + 1e-3 * (
                    jnp.mean(v[:, 0, 0].astype(jnp.float32)) % 1.0
                ).astype(f.dtype)

            slope("v8build", v8b_step, f1p)
        if "v8" in want:
            vol8 = build_xy_volume(f1p, f2h, tile=256, group=16)

            # NB: vol8 must be an ARGUMENT -- capturing a ~1.2 GB device
            # array as a jit closure constant hangs jax's const embedding.
            @jax.jit
            def v8_step(v, c):
                out = corr_fused_xy_from_vol(v, c, tile=256, group=16)
                return c + 1e-3 * (jnp.mean(out) % 1.0)

            slope("v8lookup", functools.partial(v8_step, vol8), coords0)

    for name, kw in (
        ("v5g8", dict(group=8)),
        ("v5g8t256", dict(group=8, tile=256)),
        ("v5g8t256yt4", dict(group=8, tile=256, y_tab=4)),
        ("v5g4t256yt4", dict(group=4, tile=256, y_tab=4)),
        ("v5g4t512yt4", dict(group=4, tile=512, y_tab=4)),
        ("v5g2t256yt2", dict(group=2, tile=256, y_tab=2)),
        ("v5g4", dict(group=4)),
        ("v5g4t256", dict(group=4, tile=256)),
        ("v5g16", dict(group=16, tile=256)),
        ("v5g16i8", dict(group=16, tile=256, int8=True)),
        ("v5g8i8", dict(group=8, int8=True)),
        ("v5g16y4", dict(group=16, tile=256, y_sub=4)),
        ("v5g16yt4", dict(group=16, tile=256, y_tab=4)),
        ("v5g16yt4raw", dict(group=16, tile=256, y_tab=4, raw=True)),
        # endpoint-equal pair: lookup + first 1x1 of the corr encoder,
        # reference layout vs raw block layout with a scattered weight
        ("v5g16yt4enc", dict(group=16, tile=256, y_tab=4, _enc=196)),
        ("v5g16yt4rawenc",
         dict(group=16, tile=256, y_tab=4, raw=True, _enc=1024)),
        ("v5g16t512yt4", dict(group=16, tile=512, y_tab=4)),
        ("v5g16yt2", dict(group=16, tile=256, y_tab=2)),
        ("v5g32t512yt4", dict(group=32, tile=512, y_tab=4)),
        ("v5g16yt8", dict(group=16, tile=256, y_tab=8)),
        ("v5g8yt4", dict(group=8, y_tab=4)),
        ("v5g16y8", dict(group=16, tile=256, y_sub=8)),
        ("v5g16y16", dict(group=16, tile=256, y_sub=16)),
        ("v5g8y4", dict(group=8, y_sub=4)),
        ("v6g4", dict(group=4)),
        ("v6g8", dict(group=8)),
        ("v6g8t256", dict(group=8, tile=256)),
        ("v6g16", dict(group=16, tile=256)),
    ):
        if name in want:
            from dbaf_tpu.ops.corr_pallas import (
                corr_fused_xy_pallas, corr_fused_xyp_pallas, raw_corr_index,
            )

            fn = corr_fused_xyp_pallas if name.startswith("v6") else corr_fused_xy_pallas

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
