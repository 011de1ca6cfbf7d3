"""Pallas TPU kernel for the multi-scale correlation lookup.

The XLA formulation (ops/corr.lookup_fused) plateaus around 0.45% MXU
utilization: the contraction is ~200k independent (28,48)x(48,64) matmuls
(one per source pixel) and XLA's batched-matmul loop is overhead-bound.
This kernel tiles pixels into VMEM-resident blocks and issues the per-pixel
dots back-to-back from inside one program so the MXU pipeline stays fed,
with the interpolation kernels built on the VPU in-register.

Same contract as ``corr.lookup_fused``: volume (E, P, H2, W2), coords
(E, H, W, 2) level-0 scale, output (E, L*(2r+1)^2, H, W) in the reference
channel order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_RADIUS = 3
DEFAULT_LEVELS = 4


def _tri_kernels(coord, size, radius, num_levels, dtype):
    """Stacked per-level effective kernels (TP, L*(2r+1) padded to 32, size)."""
    R = 2 * radius + 1
    ks = []
    for lvl in range(num_levels):
        scale = float(2**lvl)
        taps = coord[:, None, None] / scale + (
            jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1).astype(jnp.float32)
            - radius
        )
        grid = jnp.floor(
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2).astype(jnp.float32)
            / scale
        )
        ks.append(jnp.maximum(0.0, 1.0 - jnp.abs(grid - taps)) / scale)
    k = jnp.concatenate(ks, axis=1)  # (TP, L*R, size)
    pad = 32 - num_levels * R
    k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    return k.astype(dtype)


def _lookup_kernel(vol_ref, coords_ref, out_ref, *, radius, num_levels):
    R = 2 * radius + 1
    LR = num_levels * R
    vol = vol_ref[0]          # (TP, H2, W2)
    coords = coords_ref[0]    # (TP, 2)
    H2, W2 = vol.shape[1], vol.shape[2]
    dt = vol.dtype

    ky = _tri_kernels(coords[:, 1], H2, radius, num_levels, dt)  # (TP,32,H2)
    kx = _tri_kernels(coords[:, 0], W2, radius, num_levels, dt)  # (TP,32,W2)

    # batched per-pixel contractions; Mosaic issues these back-to-back
    tmp = jax.lax.dot_general(
        ky, vol, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TP, 32, W2)
    full = jax.lax.dot_general(
        kx, tmp.astype(dt), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TP, 32a, 32b)
    out_ref[0] = full[:, :LR, :LR]



@functools.partial(
    jax.jit, static_argnames=("radius", "num_levels", "tile", "interpret")
)
def lookup_pallas(
    volume: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-pixel batched lookup (channels-first output, reference order).

    Superseded by :func:`lookup_blk_pallas` in the hot path; kept as the
    simpler oracle variant."""
    E, P_in, H2, W2 = volume.shape
    _, H, W, _ = coords.shape
    R = 2 * radius + 1
    LR = num_levels * R
    flat = coords.reshape(E, P_in, 2)
    pad = (-P_in) % tile
    if pad:
        volume = jnp.pad(volume, ((0, 0), (0, pad), (0, 0), (0, 0)))
        flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
    P = P_in + pad
    n_tiles = P // tile

    full = pl.pallas_call(
        functools.partial(
            _lookup_kernel, radius=radius, num_levels=num_levels
        ),
        grid=(E, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile, H2, W2), lambda e, t: (e, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, 2), lambda e, t: (e, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, LR, LR), lambda e, t: (e, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((E, P, LR, LR), jnp.float32),
        interpret=interpret,
    )(volume, flat)
    full = full[:, :P_in]

    # diagonal level blocks -> reference channel order
    outs = [
        full[:, :, l * R : (l + 1) * R, l * R : (l + 1) * R].reshape(
            E, P_in, R * R
        )
        for l in range(num_levels)
    ]
    out = jnp.concatenate(outs, axis=-1)
    return out.transpose(0, 2, 1).reshape(E, num_levels * R * R, H, W)


# Block-diagonal lookup: packs ``group`` pixels per MXU call so M=128 and
# the K dimension is filled (group*H2 = 192 vs 48), which amortizes the
# per-matmul weight-load stalls that bound the per-pixel variant.  Only
# Mosaic-safe ops are used (probed on this toolchain): batch-dim splits,
# sublane concats, iota-formula-built masks, batched dot_general.  The
# earlier 5-D select / lane-split variants crash the compiler.


def _tri_ext(val_m, size, radius, num_levels, group, dtype):
    """Block-diagonal effective kernels, built directly from iotas.

    val_m: (G, M=group*32) fractional lookup centers, row m = pixel
    ``g*group + m//32``, kernel row ``i = m%32`` packing (level, offset)
    level-major.  Returns (G, M, group*size): row m holds the level-(i//R)
    pooled-bilinear kernel of its pixel, placed in column block m//32 --
    the r==s mask makes the operand block-diagonal without any reshapes.
    """
    G, M = val_m.shape
    R = 2 * radius + 1
    K = group * size
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, K), 1)
    i = rows % 32
    lvl = jnp.minimum(i // R, num_levels - 1)
    inv = jnp.exp2(-lvl.astype(jnp.float32))  # 1 / 2^level
    off = (i % R - radius).astype(jnp.float32)
    h = (cols % size).astype(jnp.float32)
    base = jnp.floor(h * inv) - off  # grid - offset, (M, K)
    blockdiag = ((cols // size) == (rows // 32) % group) & (i < num_levels * R)
    scale = jnp.where(blockdiag, inv, 0.0)
    v = jnp.maximum(
        0.0, 1.0 - jnp.abs(base[None] - val_m[:, :, None] * inv[None])
    )
    return (v * scale[None]).astype(dtype)


def _row_mask(M, r, dtype):
    """(M, 1) mask selecting rows of pixel-slot r (m//32 == r)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    return (rows // 32 == r).astype(dtype)


def _lookup_blk_kernel(
    vol_ref, xm_ref, ym_ref, out_ref, *, radius, num_levels, H2, W2, group
):
    """One pixel tile: blockdiag stage-1 over y, per-slot stage-2 over x.

    vol_ref: (1, TP, H2, W2); xm/ym_ref: (1, G, M) pre-broadcast coords;
    out_ref: (1, G, M, 32) -- flat-compatible with (TP, 32, 32) pixel-major.
    """
    dt = jnp.bfloat16
    vol = vol_ref[0]
    TP = vol.shape[0]
    G = TP // group
    M = group * 32

    volr = vol.reshape(G, group, H2, W2)
    vol_blk = jnp.concatenate(
        [volr[:, s] for s in range(group)], axis=1
    )  # (G, group*H2, W2)

    ky = _tri_ext(ym_ref[0], H2, radius, num_levels, group, dt)
    tmp = jax.lax.dot_general(
        ky, vol_blk, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, M, W2): row m = (pixel slot r=m//32, y-kernel row i=m%32)

    # stage 2: contract W2 against the x kernels; kx row m only pairs with
    # tmp rows of ITS pixel slot, so accumulate per-slot masked matmuls
    # (rows of foreign slots are zeroed, so the sum compacts the diagonal)
    kx_full = _tri_ext(xm_ref[0], W2, radius, num_levels, 1, dt)  # (G,M,W2)
    tmpb = tmp.astype(dt)
    acc = None
    for r in range(group):
        kx_r = kx_full * _row_mask(M, r, dt)[None]
        tmp_r = tmpb[:, 32 * r : 32 * (r + 1), :]  # (G, 32, W2)
        part = jax.lax.dot_general(
            kx_r, tmp_r, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, M, 32)
        acc = part if acc is None else acc + part
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def lookup_blk_pallas(
    volume: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-scale lookup, blockdiag-packed, **channels-last** output.

    volume: (E, P, H2, W2); coords: (E, H, W, 2) level-0 scale.
    Returns (E, H, W, L*(2r+1)^2) in the reference channel order
    (level-major, x-offset-major, correlation_kernels.cu:47-66) -- the
    layout the GRU consumes, so no NHWC transpose afterwards.
    """
    E, P_in, H2, W2 = volume.shape
    _, H, W, _ = coords.shape
    R = 2 * radius + 1
    LR = num_levels * R
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    n_tiles = P_in // tile
    G = tile // group
    M = group * 32

    flat = coords.reshape(E, P_in, 2)
    # pre-broadcast coords onto blockdiag rows: m = r*32 + i -> pixel
    # group*g + r (XLA-side; free next to the volume matmul)
    cm = flat.reshape(E, P_in // group, group, 2)
    xm = jnp.repeat(cm[..., 0], 32, axis=-1)  # (E, P/group, M)
    ym = jnp.repeat(cm[..., 1], 32, axis=-1)

    full = pl.pallas_call(
        functools.partial(
            _lookup_blk_kernel, radius=radius, num_levels=num_levels,
            H2=H2, W2=W2, group=group,
        ),
        grid=(E, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, H2, W2), lambda e, t: (e, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile // group, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile // group, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile // group, M, 32), lambda e, t: (e, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (E, P_in // group, M, 32), jnp.bfloat16
        ),
        interpret=interpret,
    )(volume, xm, ym)

    # (E, P/g, M=g*32, 32) is pixel-major flat -> (E, P, 32, 32)
    full = full.reshape(E, P_in, 32, 32)
    outs = [
        full[:, :, l * R : (l + 1) * R, l * R : (l + 1) * R].reshape(
            E, P_in, R * R
        )
        for l in range(num_levels)
    ]
    return jnp.concatenate(outs, axis=-1).reshape(E, H, W, LR * R)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def corr_fused_pallas(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Correlation volume build (XLA matmul) + blockdiag Pallas lookup,
    channels-last.  Called once per update round; the volume matmul is
    cheap (~150 GFLOP on the MXU) next to the lookup."""
    from .corr import build_volume_nhwc

    vol = build_volume_nhwc(
        fmap1.astype(jnp.bfloat16), fmap2.astype(jnp.bfloat16)
    )
    return lookup_blk_pallas(
        vol, coords, radius, num_levels, tile=tile, group=group,
        interpret=interpret,
    )


# --------------------------------------------------------------------------
# v2 blockdiag lookup: host-precomputed kernel tables + single-matmul stage 2
#
# Profiling the v1 kernel shows the per-element exp2/floor/iota formula work
# for the bilinear tables costs more than the matmuls they feed.  v2 moves
# everything that does not depend on the lookup coordinate into two constant
# (M, K) tables (grid-minus-offset G0 and level-scale-with-blockdiag-mask S0)
# built in numpy at trace time, so the in-kernel table build is 4 VPU ops per
# element:  k = relu(1 - |G0 - coord*inv|) * S0.  Stage 2 collapses the
# per-slot masked-matmul loop into ONE (G,128,64)x(G,128,64)->(G,128,128)
# dot_general followed by mask-add diagonal extraction.


def _blk_tables(size: int, radius: int, num_levels: int, group: int, M: int):
    """Constant tables for the blockdiag bilinear kernels.

    Row m packs (pixel slot r = (m//32) % group, kernel row i = m%32,
    i = level*R + offset).  Returns (G0, S0, inv_row):
      G0[m,k]  = floor(h*inv_l(i)) - off(i)   (h = k % size)
      S0[m,k]  = inv_l(i) * blockdiag(r, k) * (i < L*R)
      inv[m]   = inv_l(i)  -- premultiplied onto the coordinate outside.
    """
    import numpy as np

    R = 2 * radius + 1
    K = group * size
    i = np.arange(M) % 32
    r = (np.arange(M) // 32) % group
    lvl = np.minimum(i // R, num_levels - 1)
    inv = 2.0 ** (-lvl.astype(np.float64))
    off = (i % R - radius).astype(np.float64)
    h = (np.arange(K) % size).astype(np.float64)
    G0 = np.floor(h[None, :] * inv[:, None]) - off[:, None]
    blockdiag = ((np.arange(K)[None, :] // size) == r[:, None]) & (
        i[:, None] < num_levels * R
    )
    S0 = np.where(blockdiag, inv[:, None], 0.0)
    return (
        G0.astype(np.float32),
        S0.astype(np.float32),
        inv.astype(np.float32),
    )


def _lookup_blk2_kernel(
    vol_ref, ym2_ref, xm2_ref, g0y_ref, s0y_ref, g0x_ref, s0x_ref, out_ref,
    *, H2, W2, group,
):
    """One pixel tile: table-built kernels, two batched matmuls, mask-add
    diagonal extraction.  See _lookup_blk_kernel for the packing."""
    dt = jnp.bfloat16
    vol = vol_ref[0]
    TP = vol.shape[0]
    G = TP // group
    M = group * 32

    volr = vol.reshape(G, group, H2, W2)
    vol_blk = jnp.concatenate(
        [volr[:, s] for s in range(group)], axis=1
    )  # (G, group*H2, W2)

    # stage 1: y kernels from tables (4 VPU ops/elem) + one batched matmul
    ky = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0y_ref[...] - ym2_ref[0][:, :, None]))
        * s0y_ref[...]
    ).astype(dt)  # (G, M, group*H2)
    tmp = jax.lax.dot_general(
        ky, vol_blk, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, M, W2)

    # stage 2: x kernels + ONE batched matmul contracting W2 on both sides
    kx = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0x_ref[...] - xm2_ref[0][:, :, None]))
        * s0x_ref[...]
    ).astype(dt)  # (G, M, W2)
    out2 = jax.lax.dot_general(
        kx, tmp.astype(dt), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, M, M): row m = x-kernel row (pixel r=m//32), col n = y row
    #   (pixel r'=n//32) -- x-major matches the reference channel order

    # keep the r == r' diagonal 32x32 blocks: out[g,m,j] = out2[g,m,(m//32)*32+j]
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    acc = None
    for r in range(group):
        part = out2[:, :, 32 * r : 32 * (r + 1)] * (rows // 32 == r).astype(
            jnp.float32
        )
        acc = part if acc is None else acc + part
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def lookup_blk2_pallas(
    volume: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-scale lookup, blockdiag-packed, channels-last (v2: table-driven).

    Same contract as :func:`lookup_blk_pallas`: volume (E, P, H2, W2),
    coords (E, H, W, 2) level-0 scale, output (E, H, W, L*(2r+1)^2) in the
    reference channel order (correlation_kernels.cu:47-66)."""
    import numpy as np

    E, P_in, H2, W2 = volume.shape
    _, H, W, _ = coords.shape
    R = 2 * radius + 1
    LR = num_levels * R
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    n_tiles = P_in // tile
    G = tile // group
    M = group * 32

    g0y, s0y, inv_m = _blk_tables(H2, radius, num_levels, group, M)
    g0x, s0x, _ = _blk_tables(W2, radius, num_levels, 1, M)

    flat = coords.reshape(E, P_in, 2)
    cm = flat.reshape(E, P_in // group, group, 2)
    inv_j = jnp.asarray(inv_m)  # (M,)
    xm2 = jnp.repeat(cm[..., 0], 32, axis=-1) * inv_j  # (E, P/group, M)
    ym2 = jnp.repeat(cm[..., 1], 32, axis=-1) * inv_j

    const = lambda e, t: (0, 0)
    full = pl.pallas_call(
        functools.partial(
            _lookup_blk2_kernel, H2=H2, W2=W2, group=group,
        ),
        grid=(E, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, H2, W2), lambda e, t: (e, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, group * H2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, group * H2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W2), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, G, M, 32), lambda e, t: (e, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((E, P_in // group, M, 32), jnp.bfloat16),
        interpret=interpret,
    )(
        volume, ym2, xm2,
        jnp.asarray(g0y), jnp.asarray(s0y), jnp.asarray(g0x), jnp.asarray(s0x),
    )

    full = full.reshape(E, P_in, 32, 32)
    outs = [
        full[:, :, l * R : (l + 1) * R, l * R : (l + 1) * R].reshape(
            E, P_in, R * R
        )
        for l in range(num_levels)
    ]
    return jnp.concatenate(outs, axis=-1).reshape(E, H, W, LR * R)


# --------------------------------------------------------------------------
# v3 fused build+lookup: the correlation volume never touches HBM.
#
# Ablation of the v1/v2 lookup shows 18 of ~22 ms is the HBM->VMEM DMA of
# the (E, P, H2, W2) volume (1.2 GB/round; the trailing (48, 64) block
# shape reaches only ~67 GB/s).  Average-pooling commutes with the
# correlation (pool(f1 f2^T) = f1 pool(f2)^T), so the per-pixel volume
# rows can be rebuilt INSIDE the kernel from the (tile, C) source features
# and the (H2, C, W2) target features: H2 small (tile,C)x(C,W2) MXU dots
# whose outputs are born in VMEM.  Packing is h-interleaved (vol_blk row =
# h*group + r) so the per-h dot results land in place with only batch-dim
# splits and sublane concats (Mosaic-safe); the stage-1 tables are built
# for that column order.


def _blk_tables_interleaved(
    size: int, radius: int, num_levels: int, group: int, M: int
):
    """Constant stage-1 tables for the h-interleaved blockdiag packing.

    Row m packs (pixel slot r = (m//32) % group, kernel row i = m%32,
    i = level*R + offset).  Column k maps to (h = k//group, r' = k%group).
    Returns (G0, S0, inv_row):
      G0[m,k] = floor(h*inv_l(i)) - off(i)
      S0[m,k] = inv_l(i) * (r' == r) * (i < L*R)
      inv[m]  = inv_l(i) -- premultiplied onto the coordinate outside.
    """
    import numpy as np

    R = 2 * radius + 1
    K = group * size
    i = np.arange(M) % 32
    r = (np.arange(M) // 32) % group
    lvl = np.minimum(i // R, num_levels - 1)
    inv = 2.0 ** (-lvl.astype(np.float64))
    off = (i % R - radius).astype(np.float64)
    h = (np.arange(K) // group).astype(np.float64)
    G0 = np.floor(h[None, :] * inv[:, None]) - off[:, None]
    blockdiag = ((np.arange(K)[None, :] % group) == r[:, None]) & (
        i[:, None] < num_levels * R
    )
    S0 = np.where(blockdiag, inv[:, None], 0.0)
    return (
        G0.astype(np.float32),
        S0.astype(np.float32),
        inv.astype(np.float32),
    )


def _fused_blk_kernel(
    f1_ref, f2h_ref, ym2_ref, xm2_ref, g0y_ref, s0y_ref, g0x_ref, s0x_ref,
    out_ref, *, H2, W2, group,
):
    """One pixel tile: in-VMEM volume build + blockdiag two-stage lookup."""
    dt = jnp.bfloat16
    f1 = f1_ref[0]            # (tile, C)
    TP = f1.shape[0]
    G = TP // group
    M = group * 32

    # volume rows, h-interleaved: vol_blk[g, h*group + r, w]
    pieces = []
    for h in range(H2):
        vol_h = jax.lax.dot_general(
            f1, f2h_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tile, W2)
        pieces.append(vol_h.astype(dt).reshape(G, group, W2))
    vol_blk = jnp.concatenate(pieces, axis=1)  # (G, H2*group, W2)

    # stage 1: y kernels from tables + one batched matmul
    ky = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0y_ref[...] - ym2_ref[0][:, :, None]))
        * s0y_ref[...]
    ).astype(dt)  # (G, M, group*H2)
    tmp = jax.lax.dot_general(
        ky, vol_blk, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, M, W2): row m = (pixel slot r=m//32, y-kernel row i=m%32)

    # stage 2: per-slot masked matmuls (v1 structure, Mosaic-proven)
    kx_full = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0x_ref[...] - xm2_ref[0][:, :, None]))
        * s0x_ref[...]
    ).astype(dt)  # (G, M, W2)
    tmpb = tmp.astype(dt)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    acc = None
    for r in range(group):
        kx_r = kx_full * (rows // 32 == r).astype(dt)[None]
        tmp_r = tmpb[:, 32 * r : 32 * (r + 1), :]  # (G, 32, W2)
        part = jax.lax.dot_general(
            kx_r, tmp_r, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, M, 32)
        acc = part if acc is None else acc + part
    out_ref[0] = acc.astype(out_ref.dtype)


def prepare_corr_fmaps(fmap1: jnp.ndarray, fmap2: jnp.ndarray):
    """Preprocess feature maps for :func:`corr_fused_blk_prepared`.

    Hoist this out of the per-round loop: the operands only depend on the
    per-keyframe feature buffers, not on the lookup coordinates.
    Returns (f1p (E, P, C), f2h (E, H2, C, W2)), both bf16 and /4-scaled
    so <f1p[p], f2h[h,:,w]> is the reference volume entry (corr.py:63-71).
    """
    E, H2, W2, C = fmap1.shape
    f1p = (fmap1.astype(jnp.bfloat16) / 4.0).reshape(E, H2 * W2, C)
    f2h = (fmap2.astype(jnp.bfloat16) / 4.0).transpose(0, 1, 3, 2)
    return f1p, f2h


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def corr_fused_blk_pallas(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused correlation build + multi-scale lookup, channels-last.

    fmap1, fmap2: (E, H2, W2, C) feature maps; coords: (E, H, W, 2) at
    level-0 scale.  Returns (E, H, W, L*(2r+1)^2) in the reference channel
    order (correlation_kernels.cu:47-66), numerically matching
    ``corr_fused_pallas`` (volume = <fmap1/4, fmap2/4>, corr.py:63-71 of
    the reference) without materializing the volume in HBM.
    """
    f1p, f2h = prepare_corr_fmaps(fmap1, fmap2)
    return corr_fused_blk_prepared(
        f1p, f2h, coords, radius, num_levels, tile=tile, group=group,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def corr_fused_blk_prepared(
    f1p: jnp.ndarray,
    f2h: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused lookup on preprocessed operands (see :func:`prepare_corr_fmaps`)."""
    E, P_in, C = f1p.shape
    _, H2, _, W2 = f2h.shape
    _, H, W, _ = coords.shape
    R = 2 * radius + 1
    LR = num_levels * R
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    n_tiles = P_in // tile
    G = tile // group
    M = group * 32

    g0y, s0y, inv_m = _blk_tables_interleaved(H2, radius, num_levels, group, M)
    g0x, s0x, _ = _blk_tables(W2, radius, num_levels, 1, M)

    flat = coords.reshape(E, P_in, 2)
    cm = flat.reshape(E, P_in // group, group, 2)
    inv_j = jnp.asarray(inv_m)  # (M,)
    xm2 = jnp.repeat(cm[..., 0], 32, axis=-1) * inv_j  # (E, P/group, M)
    ym2 = jnp.repeat(cm[..., 1], 32, axis=-1) * inv_j

    const = lambda e, t: (0, 0)
    full = pl.pallas_call(
        functools.partial(_fused_blk_kernel, H2=H2, W2=W2, group=group),
        grid=(E, n_tiles),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2, C, W2), lambda e, t: (e, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, group * H2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, group * H2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W2), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, G, M, 32), lambda e, t: (e, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (E, P_in // group, M, 32), jnp.bfloat16
        ),
        interpret=interpret,
    )(
        f1p, f2h, ym2, xm2,
        jnp.asarray(g0y), jnp.asarray(s0y), jnp.asarray(g0x), jnp.asarray(s0x),
    )

    full = full.reshape(E, P_in, 32, 32)
    outs = [
        full[:, :, l * R : (l + 1) * R, l * R : (l + 1) * R].reshape(
            E, P_in, R * R
        )
        for l in range(num_levels)
    ]
    return jnp.concatenate(outs, axis=-1).reshape(E, H, W, LR * R)


# --------------------------------------------------------------------------
# v5 fused build+lookup, x-first order: P2 = vol @ KXT, then per-slot
# y-contraction.
#
# MXU efficiency on this toolchain follows eff ~ (N/128) * M/(M+K) (weight
# load K cycles + stream M rows; N lanes).  The v3 y-first blockdiag stage
# runs at M/K = 2/3 and N=64 -> ~20% peak.  Applying the X kernels FIRST
# turns the big contraction into (M=g*H2, K=W2, N=g*32): M >> K and full
# lanes (~86% weight efficiency), computing all (r, r') cross blocks --
# the extra blocks are free relative to v3.  The y-contraction then only
# needs each pixel's own (H2, 32) slice of P2, which after a safe
# sublane split (384 -> 48 x 8, h-interleaved rows) is a plain index plus
# a 32-aligned lane slice: per-slot (32, H2) x (H2, 32) dots with ZERO
# blockdiag waste.  Executed MACs/px drop ~28% and land on far better
# shapes; the tables shrink ~3.5x (compact ky over H2, full-but-small
# KXT).


def _xy_tables(H2: int, W2: int, radius: int, num_levels: int, M: int):
    """Constant tables for the x-first kernel (M = group*32 rows).

    Returns (G0YC (M, H2), S0YC (M, H2), G0XT (W2, M), S0XT (W2, M), inv):
      row/col m packs (pixel slot r = m//32, kernel row i = m%32).
      G0YC[m,h] = floor(h*inv_i) - off_i ; S0YC[m,h] = inv_i * (i < L*R)
      G0XT[w,m] = floor(w*inv_i) - off_i ; S0XT[w,m] = inv_i * (i < L*R)
      inv[m] = inv_i (premultiplied onto the coordinate outside).
    """
    import numpy as np

    R = 2 * radius + 1
    i = np.arange(M) % 32
    lvl = np.minimum(i // R, num_levels - 1)
    inv = 2.0 ** (-lvl.astype(np.float64))
    off = (i % R - radius).astype(np.float64)
    live = (i < num_levels * R).astype(np.float64)
    h = np.arange(H2, dtype=np.float64)
    w = np.arange(W2, dtype=np.float64)
    G0YC = np.floor(h[None, :] * inv[:, None]) - off[:, None]
    S0YC = (inv * live)[:, None] * np.ones_like(G0YC)
    G0XT = np.floor(w[:, None] * inv[None, :]) - off[None, :]
    S0XT = (inv * live)[None, :] * np.ones_like(G0XT)
    return (
        G0YC.astype(np.float32), S0YC.astype(np.float32),
        G0XT.astype(np.float32), S0XT.astype(np.float32),
        inv.astype(np.float32),
    )


def _fused_xy_kernel(
    f1_ref, f2h_ref, ym2_ref, xm2_ref, g0yc_ref, s0yc_ref, g0xt_ref,
    s0xt_ref, out_ref, *, H2, W2, group,
):
    """One pixel tile: in-VMEM volume build, x-first two-stage lookup."""
    dt = jnp.bfloat16
    f1 = f1_ref[0]            # (tile, C)
    TP = f1.shape[0]
    G = TP // group           # batches per cell
    M = group * 32

    # volume rows, h-interleaved: vol_blk[g, h*group + r, w]
    pieces = []
    for h in range(H2):
        vol_h = jax.lax.dot_general(
            f1, f2h_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tile, W2)
        pieces.append(vol_h.astype(dt).reshape(G, group, W2))
    vol_blk = jnp.concatenate(pieces, axis=1)  # (G, H2*group, W2)

    # X kernels, transposed: (G, W2, M)
    kxt = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0xt_ref[...] - xm2_ref[0][:, None, :]))
        * s0xt_ref[...]
    ).astype(dt)

    # P2[g, (h,r), (r',j)] = sum_w vol[r][h,w] * kx[r'][j,w]
    p2 = jax.lax.dot_general(
        vol_blk, kxt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (G, H2*group, M)
    p2s = p2.reshape(G, H2, group, M)  # safe sublane split (h, r)

    # compact Y kernels: (G, M, H2), row m uses only its own pixel's slice
    ky = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0yc_ref[...] - ym2_ref[0][:, :, None]))
        * s0yc_ref[...]
    ).astype(dt)
    kys = ky.reshape(G, group, 32, H2)

    outs = []
    for r in range(group):
        p2_r = p2s[:, :, r, 32 * r: 32 * (r + 1)]  # (G, H2, 32)
        ky_r = kys[:, r]                           # (G, 32, H2)
        o = jax.lax.dot_general(
            ky_r, p2_r, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, 32y, 32x)
        outs.append(o.astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(outs, axis=1)  # (G, M, 32): rows (r, y)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def corr_fused_xy_prepared(
    f1p: jnp.ndarray,
    f2h: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """x-first fused lookup on preprocessed operands (prepare_corr_fmaps).

    Same contract and numerics as :func:`corr_fused_blk_prepared`."""
    E, P_in, C = f1p.shape
    _, H2, _, W2 = f2h.shape
    _, H, W, _ = coords.shape
    R = 2 * radius + 1
    LR = num_levels * R
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    n_tiles = P_in // tile
    G = tile // group
    M = group * 32

    g0yc, s0yc, g0xt, s0xt, inv_m = _xy_tables(H2, W2, radius, num_levels, M)

    flat = coords.reshape(E, P_in, 2)
    cm = flat.reshape(E, P_in // group, group, 2)
    inv_j = jnp.asarray(inv_m)  # (M,)
    xm2 = jnp.repeat(cm[..., 0], 32, axis=-1) * inv_j  # (E, P/group, M)
    ym2 = jnp.repeat(cm[..., 1], 32, axis=-1) * inv_j

    const = lambda e, t: (0, 0)
    full = pl.pallas_call(
        functools.partial(_fused_xy_kernel, H2=H2, W2=W2, group=group),
        grid=(E, n_tiles),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2, C, W2), lambda e, t: (e, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, H2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, H2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W2, M), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W2, M), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, G, M, 32), lambda e, t: (e, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (E, P_in // group, M, 32), jnp.bfloat16
        ),
        interpret=interpret,
    )(
        f1p, f2h, ym2, xm2,
        jnp.asarray(g0yc), jnp.asarray(s0yc),
        jnp.asarray(g0xt), jnp.asarray(s0xt),
    )

    # rows are (r, y-row i), cols x-row j: swap to x-major before the
    # diagonal-level extraction so the channel order matches the reference
    full = full.reshape(E, P_in, 32, 32)
    outs = [
        jnp.swapaxes(
            full[:, :, l * R : (l + 1) * R, l * R : (l + 1) * R], -1, -2
        ).reshape(E, P_in, R * R)
        for l in range(num_levels)
    ]
    return jnp.concatenate(outs, axis=-1).reshape(E, H, W, LR * R)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def corr_fused_xy_pallas(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """x-first fused correlation build + lookup (see corr_fused_xy_prepared)."""
    f1p, f2h = prepare_corr_fmaps(fmap1, fmap2)
    return corr_fused_xy_prepared(
        f1p, f2h, coords, radius, num_levels, tile=tile, group=group,
        interpret=interpret,
    )
