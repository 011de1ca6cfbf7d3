"""Ablation microbench of the blockdiag lookup kernel: which stage costs.

Variants (all same grid/IO shapes as the real kernel, bench operating point
E=64, P=3072, tile=128, group=4):
  io      : DMA-only kernel (copy a slice of vol to out)  -> invocation+DMA floor
  tables  : build ky/kx from tables, reduce to out, no matmuls
  s1      : tables + stage-1 batched matmul only
  s2      : tables + stage-2 batched matmul only (tmp faked from vol slice)
  full    : the real v2 kernel
  full512 : real v2 with tile=512 (fewer invocations)
  mm      : pure batched-matmul kernel, same dot shapes, no tables/reshape

Usage: python tools/ablate_corr.py [variant ...]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_round import slope  # noqa: E402

from dbaf_tpu.ops.corr_pallas import _blk_tables

E, H, W, C = 64, 48, 64, 128
P, H2, W2 = H * W, H, W
TILE, GROUP = 128, 4
G, M = TILE // GROUP, GROUP * 32


def make_variant(which, tile=TILE):
    g = GROUP
    Gt = tile // g

    g0y, s0y, inv_m = _blk_tables(H2, 3, 4, g, M)
    g0x, s0x, _ = _blk_tables(W2, 3, 4, 1, M)

    def kern(vol_ref, ym2_ref, xm2_ref, g0y_r, s0y_r, g0x_r, s0x_r, out_ref):
        dt = jnp.bfloat16
        vol = vol_ref[0]
        TP = vol.shape[0]
        Gk = TP // g

        if which == "io":
            volr0 = vol.reshape(Gk, g, H2, W2)
            vb = jnp.concatenate([volr0[:, s] for s in range(g)], axis=1)
            out_ref[0] = vb[:, :M, :32].astype(out_ref.dtype)
            return

        volr = vol.reshape(Gk, g, H2, W2)
        vol_blk = jnp.concatenate([volr[:, s] for s in range(g)], axis=1)

        ky = (
            jnp.maximum(0.0, 1.0 - jnp.abs(g0y_r[...] - ym2_ref[0][:, :, None]))
            * s0y_r[...]
        ).astype(dt)
        kx = (
            jnp.maximum(0.0, 1.0 - jnp.abs(g0x_r[...] - xm2_ref[0][:, :, None]))
            * s0x_r[...]
        ).astype(dt)

        if which == "tables":
            out_ref[0] = (
                jnp.sum(ky, axis=2)[:, :, None] + jnp.sum(kx, axis=2)[:, :, None]
            ).astype(out_ref.dtype) * jnp.ones((1, 1, 32), out_ref.dtype) + (
                vol_blk[:, :M, :32].astype(out_ref.dtype)
            )
            return

        if which in ("s1", "full"):
            tmp = jax.lax.dot_general(
                ky, vol_blk, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:  # s2: fake tmp from vol without a matmul
            tmp = vol_blk[:, :M, :].astype(jnp.float32)

        if which == "s1":
            out_ref[0] = tmp[:, :, :32].astype(out_ref.dtype)
            return

        out2 = jax.lax.dot_general(
            kx, tmp.astype(dt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
        acc = None
        for r in range(g):
            part = out2[:, :, 32 * r: 32 * (r + 1)] * (
                rows // 32 == r
            ).astype(jnp.float32)
            acc = part if acc is None else acc + part
        out_ref[0] = acc.astype(out_ref.dtype)

    n_tiles = P // tile
    const = lambda e, t: (0, 0)

    @jax.jit
    def run(vol, ym2, xm2):
        return pl.pallas_call(
            kern,
            grid=(E, n_tiles),
            in_specs=[
                pl.BlockSpec((1, tile, H2, W2), lambda e, t: (e, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Gt, M), lambda e, t: (e, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Gt, M), lambda e, t: (e, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, GROUP * H2), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((M, GROUP * H2), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((M, W2), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((M, W2), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Gt, M, 32), lambda e, t: (e, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, P // GROUP, M, 32), jnp.bfloat16),
        )(vol, ym2, xm2, jnp.asarray(g0y), jnp.asarray(s0y),
          jnp.asarray(g0x), jnp.asarray(s0x))

    return run


def make_mm():
    """Pure batched-matmul kernel: batch G=32, (128,192)x(192,64) +
    (128,64)x(64,128 via dual contraction) -- the dot shapes of the real
    kernel with zero table/reshape work."""

    def kern(a_ref, b_ref, kx_ref, out_ref):
        tmp = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, M, W2)
        out2 = jax.lax.dot_general(
            kx_ref[0], tmp.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, M, M)
        out_ref[0] = out2[:, :, :32].astype(out_ref.dtype)

    n_tiles = P // TILE

    @jax.jit
    def run(a, b, kx):
        return pl.pallas_call(
            kern,
            grid=(E, n_tiles),
            in_specs=[
                pl.BlockSpec((1, G, M, GROUP * H2), lambda e, t: (e, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, GROUP * H2, W2), lambda e, t: (e, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, M, W2), lambda e, t: (e, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, M, 32), lambda e, t: (e, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (E, P // GROUP, M, 32), jnp.bfloat16
            ),
        )(a, b, kx)

    return run


def main():
    want = sys.argv[1:] or ["io", "tables", "s1", "s2", "full"]
    mm_names = [w for w in want if w.startswith("mm_")]
    st_names = [w for w in want if w.startswith(("s2", "build"))]
    if mm_names or st_names:
        print("backend:", jax.default_backend(), flush=True)
        if mm_names:
            run_mm_variants(mm_names)
        if st_names:
            run_stage_variants([n for n in st_names if n != "s1T"])
            if "s1T" in st_names:
                run_s1t(["s1T"])
        want = [w for w in want if w not in mm_names + st_names]
        if not want:
            return
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    vol = jnp.asarray(rng.standard_normal((E, P, H2, W2)), jnp.bfloat16)
    cm = rng.uniform(0, 48, (E, P // GROUP, GROUP, 2)).astype(np.float32)
    _, _, inv_m = _blk_tables(H2, 3, 4, GROUP, M)
    ym2 = jnp.asarray(np.repeat(cm[..., 1], 32, axis=-1) * inv_m)
    xm2 = jnp.asarray(np.repeat(cm[..., 0], 32, axis=-1) * inv_m)

    for which in want:
        if which == "mm":
            run = make_mm()
            a = jnp.asarray(
                rng.standard_normal((E, G, M, GROUP * H2)), jnp.bfloat16
            )
            b = jnp.asarray(
                rng.standard_normal((E, G, GROUP * H2, W2)), jnp.bfloat16
            )
            kx = jnp.asarray(
                rng.standard_normal((E, G, M, W2)), jnp.bfloat16
            )

            def step_mm(x):
                out = run(x, b, kx)
                return x + (jnp.mean(out).astype(x.dtype) % 1) * 1e-3

            slope("mm", step_mm, a)
            continue

        tile = 512 if which == "full512" else TILE
        run = make_variant("full" if which == "full512" else which, tile)

        def step(c, run=run):
            out = run(vol, c, xm2)
            return c + 1e-3 * (jnp.mean(out.astype(jnp.float32)) % 1.0)

        slope(which, step, ym2)




def make_mm_variant(which):
    """Controlled variants of the stage-dot shapes to find the util limiter.

    mm_bf16 : accumulate/output bf16 (halves VMEM traffic of tmp)
    mm_m256 : M doubled per batch item (G=16, M=256) - fewer, taller dots
    mm_n128 : N=128 (two W2 blocks fused) - full lanes
    mm_k384 : K doubled (G=16, K=384) - g8-like stage-1 shape
    mm_flat : ONE unbatched dot (M=4096, K=192, N=64) per cell
    mm_p2 / mm_p2_i8       : the wired v5g16 P2 shape (G16 M768 K64 N512),
                             bf16 vs int8xint8->int32 (v5e int8 peak 2x bf16)
    mm_build / mm_build_i8 : the volume-build shape (G48 M256 K128 N64)
    mm_i8                  : base shape in int8
    """
    G_, M_, K_, N_ = 32, 128, 192, 64
    if which == "mm_m256":
        G_, M_ = 16, 256
    if which == "mm_k384":
        G_, K_ = 16, 384
    if which == "mm_n128":
        N_ = 128
    if which == "mm_flat":
        G_, M_ = 1, 4096
    if which in ("mm_p2", "mm_p2_i8"):
        G_, M_, K_, N_ = 16, 768, 64, 512
    if which in ("mm_build", "mm_build_i8"):
        G_, M_, K_, N_ = 48, 256, 128, 64
    # v6-paired P2 shapes (K=128 fills the systolic rows; parity-blockdiag
    # doubles FLOPs, so same useful work as the v5 shape at half the group)
    if which in ("mm_p2v6", "mm_p2v6_i8"):
        G_, M_, K_, N_ = 32, 192, 128, 512
    if which in ("mm_p2v6g16", "mm_p2v6g16_i8"):
        G_, M_, K_, N_ = 16, 384, 128, 1024
    if which in ("mm_buildp", "mm_buildp_i8"):  # paired build: K=128 N=128
        G_, M_, K_, N_ = 24, 256, 128, 128
    # --- v9 level-split candidates (round 2) ---
    if which == "mm_p2l01":   # levels {0,1} P2: LRpad 16 halves N vs mm_p2
        G_, M_, K_, N_ = 16, 768, 64, 256
    if which == "mm_p2q":     # levels {2,3} P2 on a 4x4-pooled volume
        G_, M_, K_, N_ = 16, 192, 16, 256
    if which == "mm_buildq":  # pooled-volume build: one (256,128)x(128,192)
        G_, M_, K_, N_ = 1, 256, 128, 192
    if which == "mm_build1":  # unsplit build: one (256,128)x(128,3072) dot
        G_, M_, K_, N_ = 1, 256, 128, 3072
    # y-stage subgroup-4 blockdiag: per 256-px tile, 4 subgroups x G=16
    # cells -> 64 batched (128, 48) x (48, 128) dots (4x useful work)
    if which == "mm_y4":
        G_, M_, K_, N_ = 64, 128, 48, 128
    if which == "mm_y8":  # subgroup-8: (256, 48) x (48, 256), 8x waste
        G_, M_, K_, N_ = 32, 256, 48, 256
    # multi-res P2 for levels 1-3 on a w-pooled (H2, 32) volume
    if which == "mm_p2w32":
        G_, M_, K_, N_ = 16, 768, 32, 384
    if which == "mm_poolw":  # vol0 -> w-pooled volume via (64, 32) matmul
        G_, M_, K_, N_ = 16, 768, 64, 32
    # --- round-3 full level-split candidates ---
    if which in ("mm_p2l0", "mm_p2l0_i8"):   # level 0 alone: N = group*8
        G_, M_, K_, N_ = 16, 768, 64, 128
    if which == "mm_p2l1":   # level 1 on a 2x2-pooled volume
        G_, M_, K_, N_ = 16, 384, 32, 128
    if which == "mm_pool21":  # 2x2-pooled vol -> 4x4 x-pool (32, 16) matmul
        G_, M_, K_, N_ = 16, 384, 32, 16
    if which == "mm_yl0":     # level-0 y-stage, S=4 blockdiag, N=8 taps pad 32
        G_, M_, K_, N_ = 64, 32, 192, 32
    int8 = which.endswith("_i8") or which == "mm_i8"
    in_dt = jnp.int8 if int8 else jnp.bfloat16
    out_dt = jnp.int32 if int8 else jnp.bfloat16
    acc_dt = (
        jnp.int32 if int8
        else (jnp.bfloat16 if which == "mm_bf16" else jnp.float32)
    )

    def kern(a_ref, b_ref, out_ref):
        a = a_ref[0]
        b = b_ref[0]
        if which == "mm_flat":
            out = jax.lax.dot_general(
                a[0], b[0], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
            )[None]
        else:
            out = jax.lax.dot_general(
                a, b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=acc_dt,
            )
        out_ref[0] = out.astype(out_dt)

    n_tiles = P // TILE

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(E, n_tiles),
            in_specs=[
                pl.BlockSpec((1, G_, M_, K_), lambda e, t: (e, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G_, K_, N_), lambda e, t: (e, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G_, M_, N_), lambda e, t: (e, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, G_, M_, N_), out_dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(a, b)

    flops = 2 * E * n_tiles * G_ * M_ * K_ * N_
    return run, (G_, M_, K_, N_), flops


def run_mm_variants(names):
    rng = np.random.default_rng(0)
    for which in names:
        run, (G_, M_, K_, N_), flops = make_mm_variant(which)
        int8 = which.endswith("_i8") or which == "mm_i8"
        if int8:
            a = jnp.asarray(
                rng.integers(-127, 128, (E, G_, M_, K_)), jnp.int8
            )
            b = jnp.asarray(
                rng.integers(-127, 128, (E, G_, K_, N_)), jnp.int8
            )

            def step(x, run=run, b=b):
                out = run(x, b)
                # consume out + shift input so the transport cannot memoize
                # (int8 add wraps; cycle >= 86 steps >> n)
                return x + (jnp.max(out) % 3 + 1).astype(jnp.int8)
        else:
            a = jnp.asarray(
                rng.standard_normal((E, G_, M_, K_)), jnp.bfloat16
            )
            b = jnp.asarray(
                rng.standard_normal((E, G_, K_, N_)), jnp.bfloat16
            )

            def step(x, run=run, b=b):
                out = run(x, b)
                return x + (jnp.mean(out).astype(x.dtype) % 1) * 1e-3

        t = slope(which, step, a)
        print(f"    -> {flops / t / 1e12:.1f} TFLOP/s "
              f"(G={G_} M={M_} K={K_} N={N_})", flush=True)




def run_stage_variants(names):
    """Production-shape (E=48, tile=128, group=8) stage experiments.

    s2loop   : current per-slot masked stage 2 (8 dots, N=32)
    s2big    : ONE (G,256,64)x(G,256,64)->(G,256,256) dot (N=256, full
               lanes) + mask-add diagonal extraction
    build64  : 48 per-h dots (tile,C)x(C,64) + interleave concat
    build128 : 24 paired-h dots (tile,C)x(C,128) + 32-aligned lane slices
    """
    E_, TILE_, G_ = 48, 128, 8
    Gb = TILE_ // G_   # 16 batches
    M_ = G_ * 32       # 256
    rng = np.random.default_rng(0)

    if any(n.startswith("s2") for n in names):
        kx = jnp.asarray(rng.standard_normal((E_, Gb, M_, W2)), jnp.bfloat16)
        tmp = jnp.asarray(rng.standard_normal((E_, Gb, M_, W2)), jnp.bfloat16)

        def kern_loop(kx_ref, tmp_ref, out_ref):
            kxv = kx_ref[0]
            tmpv = tmp_ref[0]
            rows = jax.lax.broadcasted_iota(jnp.int32, (M_, 1), 0)
            acc = None
            for r in range(G_):
                kx_r = kxv * (rows // 32 == r).astype(jnp.bfloat16)[None]
                tmp_r = tmpv[:, 32 * r: 32 * (r + 1), :]
                part = jax.lax.dot_general(
                    kx_r, tmp_r, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            out_ref[0] = acc.astype(jnp.bfloat16)

        def kern_big(kx_ref, tmp_ref, out_ref):
            kxv = kx_ref[0]
            tmpv = tmp_ref[0]
            out2 = jax.lax.dot_general(
                kxv, tmpv, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (Gb, M, M)
            rows = jax.lax.broadcasted_iota(jnp.int32, (M_, 1), 0)
            acc = None
            for r in range(G_):
                part = out2[:, :, 32 * r: 32 * (r + 1)] * (
                    rows // 32 == r
                ).astype(jnp.float32)
                acc = part if acc is None else acc + part
            out_ref[0] = acc.astype(jnp.bfloat16)

        for name, kern in (("s2loop", kern_loop), ("s2big", kern_big)):
            if name not in names:
                continue

            @jax.jit
            def run(a, b, kern=kern):
                return pl.pallas_call(
                    kern,
                    grid=(E_, P // TILE_),
                    in_specs=[
                        pl.BlockSpec((1, Gb, M_, W2), lambda e, t: (e, 0, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, Gb, M_, W2), lambda e, t: (e, 0, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, Gb, M_, 32), lambda e, t: (e, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (E_, Gb, M_, 32), jnp.bfloat16
                    ),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024,
                    ),
                )(a, b)

            def step(x, run=run, b=tmp):
                out = run(x, b)
                return x + (jnp.mean(out).astype(x.dtype) % 1) * 1e-3

            slope(name, step, kx)

    if any(n.startswith("build") for n in names):
        f1 = jnp.asarray(rng.standard_normal((E_, P, C)), jnp.bfloat16)
        f2h = jnp.asarray(rng.standard_normal((E_, H, C, W2)), jnp.bfloat16)
        f2hp = jnp.asarray(
            rng.standard_normal((E_, H // 2, C, 2 * W2)), jnp.bfloat16
        )

        def kern_b64(f1_ref, f2_ref, out_ref):
            f1v = f1_ref[0]
            pieces = []
            for h in range(H):
                vol_h = jax.lax.dot_general(
                    f1v, f2_ref[0, h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                pieces.append(
                    vol_h.astype(jnp.bfloat16).reshape(Gb, G_, W2)
                )
            out_ref[0] = jnp.concatenate(pieces, axis=1)

        def kern_b128(f1_ref, f2_ref, out_ref):
            f1v = f1_ref[0]
            pieces = []
            for h2 in range(H // 2):
                vol_h = jax.lax.dot_general(
                    f1v, f2_ref[0, h2], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)  # (tile, 2*W2)
                pieces.append(vol_h[:, :W2].reshape(Gb, G_, W2))
                pieces.append(vol_h[:, W2:].reshape(Gb, G_, W2))
            out_ref[0] = jnp.concatenate(pieces, axis=1)

        for name, kern, f2in in (
            ("build64", kern_b64, f2h), ("build128", kern_b128, f2hp),
        ):
            if name not in names:
                continue
            hdim = f2in.shape[1]
            wdim = f2in.shape[3]

            @jax.jit
            def run(a, b, kern=kern, hdim=hdim, wdim=wdim):
                return pl.pallas_call(
                    kern,
                    grid=(E_, P // TILE_),
                    in_specs=[
                        pl.BlockSpec((1, TILE_, C), lambda e, t: (e, t, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (1, hdim, C, wdim), lambda e, t: (e, 0, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, Gb, H * G_, W2), lambda e, t: (e, t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (E_, P // TILE_ * Gb, H * G_, W2), jnp.bfloat16
                    ),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024,
                    ),
                )(a, b)

            def step(x, run=run, b=f2in):
                out = run(x, b)
                return x + (jnp.mean(out).astype(x.dtype) % 1) * 1e-3

            slope(name, step, f1)


def run_s1t(names):
    """Transposed stage-1 shape probe: (Gb,W2,K)x(Gb,K,M) -> (Gb,W2,M).

    Same MACs as the current stage 1 but full 256-lane output; measures
    whether the orientation lifts the ~45 TF/s N=64 ceiling (assembly
    feasibility handled separately if it wins).
    """
    E_, TILE_, G_ = 48, 128, 8
    Gb = TILE_ // G_
    M_ = G_ * 32
    K_ = G_ * H
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((E_, Gb, W2, K_)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((E_, Gb, K_, M_)), jnp.bfloat16)

    def kern(a_ref, b_ref, out_ref):
        out = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = out.astype(jnp.bfloat16)

    @jax.jit
    def run(a_, b_):
        return pl.pallas_call(
            kern,
            grid=(E_, P // TILE_),
            in_specs=[
                pl.BlockSpec((1, Gb, W2, K_), lambda e, t: (e, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Gb, K_, M_), lambda e, t: (e, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Gb, W2, M_), lambda e, t: (e, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E_, Gb, W2, M_), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(a_, b_)

    def step(x):
        out = run(x, b)
        return x + (jnp.mean(out).astype(x.dtype) % 1) * 1e-3

    t = slope("s1T", step, a)
    flops = 2 * E_ * (P // TILE_) * Gb * W2 * K_ * M_
    print(f"    -> {flops / t / 1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Stage ablation of the REAL v5 (x-first, g16) and v6 (paired, g8) fused
# kernels at the production operating point (E=64, 48x64 grid, tile=256).
# Variants: *_full (whole kernel), *_noy (y dots replaced by a slice),
# *_nop2 (P2 dot replaced by a lane broadcast), *_build (volume dots only).
# Subtraction gives per-stage cost; run as e.g.
#   python tools/ablate_corr.py xy5_full xy6_full xy6_noy xy6_nop2 xy6_build


def run_xy_stages(names):
    from dbaf_tpu.ops.corr_pallas import (
        _xy_tables, _xyp_tables, prepare_corr_fmaps,
        prepare_corr_fmaps_paired,
    )

    rng = np.random.default_rng(0)
    Ee, Hh, Ww, Cc = 64, 48, 64, 128
    Pp = Hh * Ww
    tile = 256
    H2_, W2_ = Hh, Ww
    Hp = H2_ // 2
    f1 = jnp.asarray(rng.standard_normal((Ee, Hh, Ww, Cc)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((Ee, Hh, Ww, Cc)), jnp.bfloat16)
    coords0 = jnp.asarray(
        rng.uniform(2, 40, (Ee, Hh, Ww, 2)), jnp.float32
    )

    def make6(stage, group=8):
        G_ = tile // group
        M_ = group * 32
        n_tiles = Pp // tile
        g0ye, g0yo, s0yc, g0xt2, s0xt2, inv_m = _xyp_tables(
            H2_, W2_, 3, 4, M_
        )
        f1p, f2hp = prepare_corr_fmaps_paired(f1, f2)
        inv_j = jnp.asarray(inv_m)

        def kern(f1_ref, f2p_ref, ym2_ref, xm22_ref, g0ye_r, g0yo_r,
                 s0yc_r, g0xt2_r, s0xt2_r, out_ref):
            dt = jnp.bfloat16
            f1k = f1_ref[0]
            pieces = []
            for q in range(Hp):
                vol_q = jax.lax.dot_general(
                    f1k, f2p_ref[0, q], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                pieces.append(vol_q.astype(dt).reshape(G_, group, 2 * W2_))
            volp = jnp.concatenate(pieces, axis=1)  # (G, Hp*group, 2W2)
            if stage == "build":
                out_ref[0] = volp[:, :, :32]
                return
            kxt2 = (
                jnp.maximum(
                    0.0,
                    1.0 - jnp.abs(g0xt2_r[...] - xm22_ref[0][:, None, :]),
                )
                * s0xt2_r[...]
            ).astype(dt)
            if stage == "nop2":
                # fake P2 by a lane broadcast (keeps build/tables/y)
                p2 = (
                    volp[:, :, :1]
                    + jnp.max(kxt2, axis=1, keepdims=True)[:, :1, :]
                )
            else:
                p2 = jax.lax.dot_general(
                    volp, kxt2, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
            if stage == "noy":
                out_ref[0] = p2[:, :, :32]
                return
            p2s = p2.reshape(G_, Hp, group, 2 * M_)
            ym = ym2_ref[0][:, :, None]
            kye = (
                jnp.maximum(0.0, 1.0 - jnp.abs(g0ye_r[...] - ym))
                * s0yc_r[...]
            ).astype(dt)
            kyo = (
                jnp.maximum(0.0, 1.0 - jnp.abs(g0yo_r[...] - ym))
                * s0yc_r[...]
            ).astype(dt)
            kyes = kye.reshape(G_, group, 32, Hp)
            kyos = kyo.reshape(G_, group, 32, Hp)
            outs = []
            for r in range(group):
                pe = p2s[:, :, r, 32 * r: 32 * (r + 1)]
                po = p2s[:, :, r, M_ + 32 * r: M_ + 32 * (r + 1)]
                oe = jax.lax.dot_general(
                    kyes[:, r], pe, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                oo = jax.lax.dot_general(
                    kyos[:, r], po, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                outs.append((oe + oo).astype(dt))
            out_ref[0] = jnp.concatenate(outs, axis=1)

        out_rows = {
            "build": Hp * group, "noy": Hp * group,
        }.get(stage, M_)
        out_cols = 32
        const = lambda e, t: (0, 0)

        @jax.jit
        def run(coords):
            flat = coords.reshape(Ee, Pp, 2)
            cm_ = flat.reshape(Ee, Pp // group, group, 2)
            xm2_ = jnp.repeat(cm_[..., 0], 32, axis=-1) * inv_j
            ym2_ = jnp.repeat(cm_[..., 1], 32, axis=-1) * inv_j
            xm22_ = jnp.concatenate([xm2_, xm2_], axis=-1)
            return pl.pallas_call(
                kern,
                grid=(Ee, n_tiles),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
                in_specs=[
                    pl.BlockSpec((1, tile, Cc), lambda e, t: (e, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Hp, Cc, 2 * W2_),
                                 lambda e, t: (e, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile // group, M_),
                                 lambda e, t: (e, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile // group, 2 * M_),
                                 lambda e, t: (e, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M_, Hp), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((M_, Hp), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((M_, Hp), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((2 * W2_, 2 * M_), const,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2 * W2_, 2 * M_), const,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, G_, out_rows, out_cols),
                    lambda e, t: (e, t, 0, 0), memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (Ee, Pp // group, out_rows, out_cols), jnp.bfloat16,
                ),
            )(f1p, f2hp, ym2_, xm22_, jnp.asarray(g0ye), jnp.asarray(g0yo),
              jnp.asarray(s0yc), jnp.asarray(g0xt2), jnp.asarray(s0xt2))

        return run

    def make5(stage, group=16):
        G_ = tile // group
        M_ = group * 32
        n_tiles = Pp // tile
        g0yc, s0yc, g0xt, s0xt, inv_m = _xy_tables(H2_, W2_, 3, 4, M_)
        f1p, f2h = prepare_corr_fmaps(f1, f2)
        inv_j = jnp.asarray(inv_m)

        def kern(f1_ref, f2h_ref, ym2_ref, xm2_ref, g0yc_r, s0yc_r,
                 g0xt_r, s0xt_r, out_ref):
            dt = jnp.bfloat16
            f1k = f1_ref[0]
            pieces = []
            for h in range(H2_):
                vol_h = jax.lax.dot_general(
                    f1k, f2h_ref[0, h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                pieces.append(vol_h.astype(dt).reshape(G_, group, W2_))
            vol_blk = jnp.concatenate(pieces, axis=1)
            if stage == "build":
                out_ref[0] = vol_blk[:, :, :32]
                return
            kxt = (
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(g0xt_r[...] - xm2_ref[0][:, None, :])
                )
                * s0xt_r[...]
            ).astype(dt)
            if stage == "nop2":
                p2 = (
                    vol_blk[:, :, :1]
                    + jnp.max(kxt, axis=1, keepdims=True)[:, :1, :]
                )
            else:
                p2 = jax.lax.dot_general(
                    vol_blk, kxt, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
            if stage == "noy":
                out_ref[0] = p2[:, :, :32]
                return
            p2s = p2.reshape(G_, H2_, group, M_)
            ky = (
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(g0yc_r[...] - ym2_ref[0][:, :, None])
                )
                * s0yc_r[...]
            ).astype(dt)
            kys = ky.reshape(G_, group, 32, H2_)
            outs = []
            for r in range(group):
                p2_r = p2s[:, :, r, 32 * r: 32 * (r + 1)]
                o = jax.lax.dot_general(
                    kys[:, r], p2_r, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                outs.append(o.astype(dt))
            out_ref[0] = jnp.concatenate(outs, axis=1)

        out_rows = {
            "build": H2_ * group, "noy": H2_ * group,
        }.get(stage, M_)
        const = lambda e, t: (0, 0)

        @jax.jit
        def run(coords):
            flat = coords.reshape(Ee, Pp, 2)
            cm_ = flat.reshape(Ee, Pp // group, group, 2)
            xm2_ = jnp.repeat(cm_[..., 0], 32, axis=-1) * inv_j
            ym2_ = jnp.repeat(cm_[..., 1], 32, axis=-1) * inv_j
            return pl.pallas_call(
                kern,
                grid=(Ee, n_tiles),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
                in_specs=[
                    pl.BlockSpec((1, tile, Cc), lambda e, t: (e, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H2_, Cc, W2_),
                                 lambda e, t: (e, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile // group, M_),
                                 lambda e, t: (e, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile // group, M_),
                                 lambda e, t: (e, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M_, H2_), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((M_, H2_), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((W2_, M_), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((W2_, M_), const, memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, G_, out_rows, 32),
                    lambda e, t: (e, t, 0, 0), memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (Ee, Pp // group, out_rows, 32), jnp.bfloat16,
                ),
            )(f1p, f2h, ym2_, xm2_, jnp.asarray(g0yc), jnp.asarray(s0yc),
              jnp.asarray(g0xt), jnp.asarray(s0xt))

        return run

    for which in names:
        fam, stage = which.split("_", 1)
        run = make6(stage) if fam == "xy6" else make5(stage)

        def step(c, run=run):
            out = run(c)
            return c + 1e-3 * (
                jnp.mean(out[..., :2].astype(jnp.float32)) % 1.0
            )

        slope(which, step, coords0)
