"""TPU timing of the per-frame gate stage pieces (async step prologue).

Pieces, each slope-timed as its own jit at the bench operating point
(384x512 frames, 48x64 feature grid):
  feat  : fnet encoder forward
  ctx   : cnet context encoder forward
  tail  : 1-edge volume build + identity-coords lookup + 1 update step
  gate  : all three fused (what the async step actually pays)

Usage: python tools/profile_gate.py [feat ctx tail gate]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbaf_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp

from profile_round import slope  # noqa: E402

from dbaf_tpu.models import DroidNet
from dbaf_tpu.ops import corr as corr_ops
from dbaf_tpu.ops import projective as pj
from dbaf_tpu.slam.system import _model_fns
from dbaf_tpu.utils.config import tumvi_config


def main():
    want = set(sys.argv[1:]) or {"feat", "ctx", "tail", "gate"}
    cfg = tumvi_config()
    ht, wd = cfg.image_size
    H, W = ht // 8, wd // 8

    model = DroidNet()
    rng = np.random.default_rng(0)
    probe = jnp.zeros((1, ht, wd, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), probe, method=model.extract_features
    )["params"]
    uparams = model.init(
        jax.random.PRNGKey(1), None,
        jnp.zeros((1, H, W, 128), jnp.bfloat16),
        jnp.zeros((1, H, W, 128), jnp.bfloat16),
        jnp.zeros((1, H, W, 196), jnp.bfloat16),
        jnp.zeros((1, H, W, 4), jnp.bfloat16),
    )["params"]
    params = {**params, **uparams}
    feat_fn, ctx_fn, update_fn, _ = _model_fns(cfg, params)

    img0 = jnp.asarray(
        rng.integers(0, 255, (1, ht, wd, 3)), jnp.uint8
    )
    fmap_kf = jnp.asarray(rng.standard_normal((H, W, 128)), jnp.bfloat16)
    net_kf = jnp.asarray(rng.standard_normal((H, W, 128)), jnp.bfloat16)
    inp_kf = jnp.asarray(
        rng.standard_normal((H, W, 128)), jnp.bfloat16
    )
    print("backend:", jax.default_backend(), flush=True)

    if "feat" in want:
        @jax.jit
        def feat_step(img):
            f = feat_fn(img.astype(jnp.float32))
            # chain: rotate image by the fmap mean so dispatches differ
            return jnp.roll(img, 1, axis=2) + (
                jnp.mean(f).astype(jnp.uint8) % 2
            )

        slope("feat", feat_step, img0)

    if "ctx" in want:
        @jax.jit
        def ctx_step(img):
            n, i = ctx_fn(img.astype(jnp.float32))
            return jnp.roll(img, 1, axis=2) + (
                jnp.mean(n).astype(jnp.uint8) % 2
            )

        slope("ctx", ctx_step, img0)

    if "tail" in want:
        @jax.jit
        def tail_step(fmap_cur):
            vol = corr_ops.build_volume_nhwc(
                fmap_kf[None], fmap_cur[None].astype(jnp.bfloat16)
            )
            coords0 = pj.coords_grid(H, W)[None]
            corr = corr_ops.lookup_auto(vol, coords0).transpose(0, 2, 3, 1)
            zero_motn = jnp.zeros((1, H, W, 4), dtype=net_kf.dtype)
            z = jnp.zeros((1,), dtype=jnp.int32)
            _, delta, _ = update_fn(
                net_kf[None], inp_kf[None], corr.astype(net_kf.dtype),
                zero_motn, z, z, {},
            )
            d = jnp.mean(jnp.linalg.norm(delta[0], axis=-1))
            return fmap_cur + (d % 1.0).astype(fmap_cur.dtype) * 1e-3

        slope("tail", tail_step, fmap_kf)

    if "gate" in want:
        @jax.jit
        def gate_step(img):
            fmap_cur = feat_fn(img.astype(jnp.float32))[0]
            vol = corr_ops.build_volume_nhwc(
                fmap_kf[None], fmap_cur[None].astype(jnp.bfloat16)
            )
            coords0 = pj.coords_grid(H, W)[None]
            corr = corr_ops.lookup_auto(vol, coords0).transpose(0, 2, 3, 1)
            zero_motn = jnp.zeros((1, H, W, 4), dtype=net_kf.dtype)
            z = jnp.zeros((1,), dtype=jnp.int32)
            _, delta, _ = update_fn(
                net_kf[None], inp_kf[None], corr.astype(net_kf.dtype),
                zero_motn, z, z, {},
            )
            n, i = ctx_fn(img.astype(jnp.float32))
            d = jnp.mean(jnp.linalg.norm(delta[0], axis=-1))
            return jnp.roll(img, 1, axis=2) + (
                (d % 2.0) > 1.0
            ).astype(jnp.uint8)

        slope("gate", gate_step, img0)


if __name__ == "__main__":
    main()
