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
    s0xt_ref, out_ref, *scratch, H2, W2, group, int8=False, y_sub=0,
    y_tab=0,
):
    """One pixel tile: in-VMEM volume build, x-first two-stage lookup.

    ``int8=True`` runs the dominant P2 dot on the int8 MXU path (measured
    77 -> 106 TFLOP/s at the g16 shape, tools/ablate_corr.py mm_p2_i8):
    the volume is quantized per tile (dynamic symmetric, scale 127/max|vol|)
    and the tent x-tables with fixed scale 127 (values in [0, 1]).  Worst-
    case error ~1.2% of the tile's max correlation (vol 0.4% + 2 tent
    weights 0.8%); the y stage stays bf16.

    (Note: asking the MXU for bf16 results directly
    (preferred_element_type=bf16) is rejected by Mosaic -- 'Expected
    matmul acc to be 32-bit' -- so the f32-result + astype(bf16) pairs
    below are the only option; Mosaic fuses the cast into the result
    store.)"""
    dt = jnp.bfloat16
    f1 = f1_ref[0]            # (tile, C)
    TP = f1.shape[0]
    G = TP // group           # batches per cell
    M = group * 32

    # volume rows, h-interleaved: vol_blk[g, h*group + r, w]
    vol_dt = jnp.float32 if int8 else dt
    pieces = []
    for h in range(H2):
        vol_h = jax.lax.dot_general(
            f1, f2h_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tile, W2)
        pieces.append(vol_h.astype(vol_dt).reshape(G, group, W2))
    vol_blk = jnp.concatenate(pieces, axis=1)  # (G, H2*group, W2)

    # X kernels, transposed: (G, W2, M)
    kxt = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0xt_ref[...] - xm2_ref[0][:, None, :]))
        * s0xt_ref[...]
    )

    # P2[g, (h,r), (r',j)] = sum_w vol[r][h,w] * kx[r'][j,w]
    if int8:
        vmax = jnp.maximum(jnp.max(jnp.abs(vol_blk)), 1e-20)
        vol_i8 = jnp.round(vol_blk * (127.0 / vmax)).astype(jnp.int8)
        kxt_i8 = jnp.round(kxt * 127.0).astype(jnp.int8)
        p2 = (
            jax.lax.dot_general(
                vol_i8, kxt_i8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            * (vmax * (1.0 / (127.0 * 127.0)))
        ).astype(dt)
    else:
        p2 = jax.lax.dot_general(
            vol_blk, kxt.astype(dt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)  # (G, H2*group, M)
    p2s = p2.reshape(G, H2, group, M)  # safe sublane split (h, r)

    if y_tab > 1:
        # table-blockdiag y-stage: the per-slot (32, H2) x (H2, 32) dots
        # starve the MXU; the earlier y_sub rewrite fixed the dot shape
        # but paid ~10 ms assembling the block operands.  Here the
        # BLOCK-DIAGONAL y-kernel is generated straight from extended
        # tent tables (off-diagonal table offsets of -1e6 make the tent
        # weight an exact 0), so no ky assembly exists at all; the P2
        # slices are stacked through a VMEM scratch ref (stores relayout
        # their operand; concatenate refuses lane-offset operands).
        # Each kept output element is the identical dot product with
        # 0-terms appended; executed y FLOPs scale with y_tab.
        #
        # MEASURED (v5e, 2026-08-18, SLOPE_N=32, E=64): y_tab=4 16.14 ms
        # vs per-slot 16.35 ms (y_tab=8 16.63, neutral) -- the scratch
        # relayout stores eat most of the dot-shape win, leaving ~1.3%.
        # Wired as the default (graph.py) since the output is exact.
        S = y_tab
        assert group % S == 0, (group, S)
        stack_ref = scratch[0]  # (G, S*H2, 32) VMEM
        for s in range(group // S):
            ms = slice(32 * S * s, 32 * S * (s + 1))
            ym_s = ym2_ref[0, :, ms]  # (G, S*32) ref-level static slice
            ky4 = (
                jnp.maximum(
                    0.0,
                    1.0 - jnp.abs(g0yc_ref[...] - ym_s[:, :, None]),
                )
                * s0yc_ref[...]
            ).astype(dt)  # (G, S*32, S*H2), exact block-diagonal
            # Mosaic refuses to CONCAT lane-offset slices ("offset
            # mismatch on non-concat dimension") but a STORE relayouts
            # its operand: stack the S pixels' own P2 columns through a
            # VMEM scratch ref.
            for q in range(S):
                r = S * s + q
                stack_ref[:, q * H2:(q + 1) * H2, :] = p2s[
                    :, :, r, 32 * r: 32 * (r + 1)
                ]
            o = jax.lax.dot_general(
                ky4, stack_ref[...], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, S*32, 32)
            out_ref[0, :, ms, :] = o.astype(out_ref.dtype)
        return

    # compact Y kernels: (G, M, H2), row m uses only its own pixel's slice
    ky = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0yc_ref[...] - ym2_ref[0][:, :, None]))
        * s0yc_ref[...]
    ).astype(dt)
    kys = ky.reshape(G, group, 32, H2)

    if y_sub > 1:
        # subgroup blockdiag y-stage: the per-slot (32, H2) x (H2, 32)
        # dots run at ~4 TFLOP/s (M=32 starves the MXU).  Stacking S
        # pixels' y-kernels on sublanes and their own 32-wide P2 slices
        # on lanes turns S dots into ONE (S*32, H2) x (H2, S*32) dot
        # (S x executed FLOPs, cross blocks discarded) on MXU-happy
        # shapes; every kept output element is the identical dot product.
        # Layout glue avoids lane concats (Mosaic: "offset mismatch on
        # non-concat dimension"): p24 assembled by iota-mask + add, the
        # kernel rows taken as one contiguous sublane slice of ky, and
        # the diagonal blocks written straight into out_ref (stores
        # relayout their operand; concatenate does not).
        #
        # MEASURED NEGATIVE (v5e, 2026-08-18, tools/profile_corr.py):
        # v5g16y4 23.38 ms vs wired v5g16 17.1 ms (y8 42 ms) even though
        # the pure y4 dot shape runs at 48 TFLOP/s (tools/ablate_corr
        # mm_y4 => ~1.6 ms production vs ~5 ms per-slot).  The mask-add
        # assembly + 16 lane-offset relayout stores cost ~10 ms of VPU
        # work -- same failure mode as the v6 paired kernel.  Kept as a
        # parity-tested ablation; do not wire, do not re-litigate.
        S = y_sub
        assert group % S == 0, (group, S)
        Mi = 32 * S
        G = p2s.shape[0]
        lane_q = jax.lax.broadcasted_iota(
            jnp.int32, (G, H2, Mi), 2) // 32
        for s in range(group // S):
            ky4 = ky[:, Mi * s: Mi * (s + 1), :]       # (G, Mi, H2)
            blk = p2s[:, :, S * s: S * (s + 1), Mi * s: Mi * (s + 1)]
            p24 = jnp.zeros((G, H2, Mi), dt)
            for q in range(S):
                p24 = p24 + jnp.where(lane_q == q, blk[:, :, q, :], 0)
            o = jax.lax.dot_general(
                ky4, p24, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, Mi rows (q,i), Mi cols (q',j))
            for q in range(S):
                out_ref[
                    0, :,
                    32 * (S * s + q): 32 * (S * s + q + 1), :,
                ] = o[:, 32 * q: 32 * (q + 1), 32 * q: 32 * (q + 1)].astype(
                    out_ref.dtype
                )
    else:
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


def _blockdiag_y_tables(g0yc, s0yc, S: int):
    """Extend the (M, H2) y-tables to exact block-diagonal (S*32, S*H2):
    diagonal blocks repeat the 32-row base pattern (rows depend only on
    m % 32); off-diagonal grid offsets of -1e6 drive the tent weight to
    an exact 0, so no masking is needed in the kernel."""
    import numpy as np

    H2 = g0yc.shape[1]
    base_g = g0yc[:32]
    base_s = s0yc[:32]
    G0 = np.full((S * 32, S * H2), -1e6, np.float32)
    S0 = np.zeros((S * 32, S * H2), np.float32)
    for q in range(S):
        G0[32 * q: 32 * (q + 1), H2 * q: H2 * (q + 1)] = base_g
        S0[32 * q: 32 * (q + 1), H2 * q: H2 * (q + 1)] = base_s
    return G0, S0


def raw_corr_index(radius: int = DEFAULT_RADIUS,
                   num_levels: int = DEFAULT_LEVELS):
    """Gather index mapping the raw 32x32 block layout of the fused xy
    kernels to the reference channel order.

    The kernel's per-pixel output block is (y-tap row = l*R+dy, x-tap col
    = l*R+dx) flattened to 32*32 = 1024; the reference channel is
    c = l*R*R + dx*R + dy (see the swapaxes in the epilogue of
    :func:`corr_fused_xy_prepared`).  Returns ``idx`` (1024,) int32 with
    idx[raw_pos] = c, or -1 for positions outside every level's diagonal
    block (cross-level y/x products the reference never reads -- a
    consumer must give them zero weight).  Use either direction:
      ref[c] = raw[pos] via raw.take(pos_of_c)   (pos = argsort trick), or
      W_raw = zeros(1024, F).at[pos].set(W_ref[c]) to fold the extraction
      into a following 1x1 conv / matmul.
    """
    import numpy as np

    R = 2 * radius + 1
    idx = np.full(32 * 32, -1, np.int32)
    for l in range(num_levels):
        for dy in range(R):
            for dx in range(R):
                idx[(l * R + dy) * 32 + (l * R + dx)] = (
                    l * R * R + dx * R + dy
                )
    return idx


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "num_levels", "tile", "group", "interpret", "int8",
        "y_sub", "y_tab", "raw",
    ),
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
    int8: bool = False,
    y_sub: int = 0,
    y_tab: int = 0,
    raw: bool = False,
) -> jnp.ndarray:
    """x-first fused lookup on preprocessed operands (prepare_corr_fmaps).

    Same contract and numerics as :func:`corr_fused_blk_prepared`; with
    ``int8=True`` the P2 stage runs on the int8 MXU (see _fused_xy_kernel,
    error ~1% of the per-tile max correlation).  With ``raw=True`` the
    diagonal-extraction epilogue (a multi-pass XLA shuffle of the ~300 MB
    block tensor) is skipped and the (E, H, W, 1024) raw block layout is
    returned for a consumer that folds the extraction into its first
    1x1 contraction (see :func:`raw_corr_index`)."""
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
    if y_tab > 1:
        g0yc, s0yc = _blockdiag_y_tables(g0yc, s0yc, y_tab)
    ysh = g0yc.shape  # (M, H2) or blockdiag (y_tab*32, y_tab*H2)

    flat = coords.reshape(E, P_in, 2)
    cm = flat.reshape(E, P_in // group, group, 2)
    inv_j = jnp.asarray(inv_m)  # (M,)
    xm2 = jnp.repeat(cm[..., 0], 32, axis=-1) * inv_j  # (E, P/group, M)
    ym2 = jnp.repeat(cm[..., 1], 32, axis=-1) * inv_j

    const = lambda e, t: (0, 0)
    full = pl.pallas_call(
        functools.partial(
            _fused_xy_kernel, H2=H2, W2=W2, group=group, int8=int8,
            y_sub=y_sub, y_tab=y_tab,
        ),
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
            pl.BlockSpec(ysh, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(ysh, const, memory_space=pltpu.VMEM),
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
        scratch_shapes=(
            [pltpu.VMEM((G, y_tab * H2, 32), jnp.bfloat16)]
            if y_tab > 1 else []
        ),
        interpret=interpret,
    )(
        f1p, f2h, ym2, xm2,
        jnp.asarray(g0yc), jnp.asarray(s0yc),
        jnp.asarray(g0xt), jnp.asarray(s0xt),
    )

    if raw:
        return full.reshape(E, H, W, 32 * 32)

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
    static_argnames=(
        "radius", "num_levels", "tile", "group", "interpret", "int8",
        "y_sub", "y_tab", "raw",
    ),
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
    int8: bool = False,
    y_sub: int = 0,
    y_tab: int = 0,
    raw: bool = False,
) -> jnp.ndarray:
    """x-first fused correlation build + lookup (see corr_fused_xy_prepared)."""
    f1p, f2h = prepare_corr_fmaps(fmap1, fmap2)
    return corr_fused_xy_prepared(
        f1p, f2h, coords, radius, num_levels, tile=tile, group=group,
        interpret=interpret, int8=int8, y_sub=y_sub, y_tab=y_tab, raw=raw,
    )


# --------------------------------------------------------------------------
# v8 round-cached volume: build once per keyframe step, stream per round.
#
# The volume depends only on the edge feature maps, which are constant
# across a keyframe step's update rounds -- the in-kernel rebuild of the
# v3/v5 kernels pays the build matmuls every round for identical results.
# Storing the volume in the lookup kernel's OWN tile layout
# (E, T*G, group*H2, W2) makes every grid step's input one contiguous
# (G, group*H2, W2) block (~1.5 MB at g16/t256) for the Pallas pipeline
# to double-buffer.
#
# MEASURED NEGATIVE (v5e, 2026-08-18, tools/profile_corr.py, E=64):
# v8lookup 21.87 ms + v8build 4.46 ms/keyframe vs fused v5g16 16.66 ms --
# streaming the ~1.2 GB volume costs MORE than the ~2 ms/round in-kernel
# rebuild (100 MB of features).  The (.., W2=64) trailing blocks run at
# half lane width, and 1.2 GB/round is ~5 ms even at full HBM bandwidth;
# the in-kernel build turns that bandwidth into MXU work instead.  Kept
# as a parity-tested ablation (tests/test_corr.py); do not wire.
#
# Related measured negatives at the same operating point (same date):
# int8 P2 (v5g16i8 21.58, v5g8i8 20.40 ms): the per-tile quantize /
# dequantize VPU work swamps the int8 MXU gain.
# group sweep: v5g4 48.6, v5g8 17.76, v5g16 16.66 ms -- the blockdiag
# waste (each pixel uses only its own 32 of M=group*32 P2 columns, so
# executed FLOPs scale with group) is MORE than paid back by MXU-happy
# N=M shapes and fewer, larger y-stage dots.  group=16/tile=256 stays.
#
# Round-3 measured negatives (v5e, 2026-08-20, tools/profile_corr.py):
# * int8 PREBUILT volume (build_xy_volume_i8 1.30 ms/keyframe +
#   corr_fused_xy_from_vol_i8 20.04 ms/round vs fused v5g16yt4 16.15):
#   even at half the bytes of v8, streaming the volume from HBM loses to
#   the in-kernel rebuild -- the (.., W2=64) int8 trailing blocks run at
#   a quarter of the (32,128)-tile lane width.
# * bf16 MXU results (preferred_element_type=bfloat16) inside the kernel:
#   rejected by Mosaic ("Expected matmul acc to be 32-bit"); the f32-dot +
#   astype(bf16) pairs are already fused into the result store.
# * raw block-layout output consumed by a scattered corr-encoder weight
#   (raw=True + models.net._CorrEnc0, endpoint-equal pair v5g16yt4enc
#   16.67 vs v5g16yt4rawenc 17.55 ms): the 1024-wide contraction (5.2x
#   the 196-channel MACs) costs more than the XLA diagonal-extraction
#   shuffle it removes.  Kept (flag + dual-width encoder, parity-tested)
#   as an ablation; do not wire.


def _build_vol_kernel(f1_ref, f2h_ref, out_ref, *, H2, group):
    """One pixel tile of the h-interleaved blocked volume (v5 layout)."""
    f1 = f1_ref[0]            # (tile, C)
    G = f1.shape[0] // group
    W2 = f2h_ref.shape[3]
    pieces = []
    for h in range(H2):
        vol_h = jax.lax.dot_general(
            f1, f2h_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tile, W2)
        pieces.append(vol_h.astype(jnp.bfloat16).reshape(G, group, W2))
    out_ref[0] = jnp.concatenate(pieces, axis=1)  # (G, H2*group, W2)


@functools.partial(
    jax.jit, static_argnames=("tile", "group", "interpret")
)
def build_xy_volume(
    f1p: jnp.ndarray,
    f2h: jnp.ndarray,
    tile: int = 128,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Materialize the correlation volume in the x-first kernel's blocked
    layout: (E, n_tiles*G, group*H2, W2) bf16, rows h-interleaved
    (vol row = h*group + r).  Numerically identical to the in-kernel build
    of :func:`corr_fused_xy_prepared` (f32 accumulate, bf16 store)."""
    E, P_in, C = f1p.shape
    _, H2, _, W2 = f2h.shape
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    n_tiles = P_in // tile
    G = tile // group
    return pl.pallas_call(
        functools.partial(_build_vol_kernel, H2=H2, group=group),
        grid=(E, n_tiles),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2, C, W2), lambda e, t: (e, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, G, group * H2, W2), lambda e, t: (e, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (E, n_tiles * G, group * H2, W2), jnp.bfloat16
        ),
        interpret=interpret,
    )(f1p, f2h)


def _xy_lookup_kernel(
    vol_ref, ym2_ref, xm2_ref, g0yc_ref, s0yc_ref, g0xt_ref, s0xt_ref,
    out_ref, *, H2, W2, group,
):
    """x-first two-stage lookup on a prebuilt blocked volume tile."""
    dt = jnp.bfloat16
    vol_blk = vol_ref[0]      # (G, H2*group, W2)
    G = vol_blk.shape[0]
    M = group * 32

    kxt = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0xt_ref[...] - xm2_ref[0][:, None, :]))
        * s0xt_ref[...]
    )
    p2 = jax.lax.dot_general(
        vol_blk, kxt.astype(dt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (G, H2*group, M)
    p2s = p2.reshape(G, H2, group, M)

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
        )
        outs.append(o.astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(outs, axis=1)  # (G, M, 32)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def corr_fused_xy_from_vol(
    vol_blk: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """x-first lookup from a :func:`build_xy_volume` cache (same tile/group).

    Same contract and numerics as :func:`corr_fused_xy_prepared`; use when
    several lookups share the same feature maps (update rounds within one
    keyframe step)."""
    E, TG, gH2, W2 = vol_blk.shape
    H2 = gH2 // group
    _, H, W, _ = coords.shape
    P_in = H * W
    R = 2 * radius + 1
    LR = num_levels * R
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    assert TG == P_in // group, (TG, P_in, group)
    n_tiles = P_in // tile
    G = tile // group
    M = group * 32

    g0yc, s0yc, g0xt, s0xt, inv_m = _xy_tables(H2, W2, radius, num_levels, M)

    flat = coords.reshape(E, P_in, 2)
    cm = flat.reshape(E, P_in // group, group, 2)
    inv_j = jnp.asarray(inv_m)
    xm2 = jnp.repeat(cm[..., 0], 32, axis=-1) * inv_j
    ym2 = jnp.repeat(cm[..., 1], 32, axis=-1) * inv_j

    const = lambda e, t: (0, 0)
    full = pl.pallas_call(
        functools.partial(
            _xy_lookup_kernel, H2=H2, W2=W2, group=group,
        ),
        grid=(E, n_tiles),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((1, G, group * H2, W2), lambda e, t: (e, t, 0, 0),
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
        vol_blk, ym2, xm2,
        jnp.asarray(g0yc), jnp.asarray(s0yc),
        jnp.asarray(g0xt), jnp.asarray(s0xt),
    )

    full = full.reshape(E, P_in, 32, 32)
    outs = [
        jnp.swapaxes(
            full[:, :, l * R : (l + 1) * R, l * R : (l + 1) * R], -1, -2
        ).reshape(E, P_in, R * R)
        for l in range(num_levels)
    ]
    return jnp.concatenate(outs, axis=-1).reshape(E, H, W, LR * R)


# --------------------------------------------------------------------------
# int8 prebuilt volume: build + quantize ONCE per keyframe step, then every
# update round runs the lookup with the dominant P2 dot on the int8 MXU
# path (measured 77 -> 106 TFLOP/s at the g16 shape, ablate_corr mm_p2_i8).
# The earlier in-kernel int8 variant (corr_fused_xy_prepared int8=True) is
# NET-NEGATIVE (19.9 vs 16.6 ms) because it pays an f32 volume build plus a
# per-round quantize; pre-quantizing moves both out of the round loop.
# Precision: reduced-precision correlation is reference-faithful -- the
# CUDA lookup runs fp16 (correlation_kernels.cu:145 AT_DISPATCH..HALF);
# int8 symmetric per-tile quantization keeps the error ~1% of the tile's
# max correlation (vol 0.4% + one x tent weight 0.4%; y stage stays bf16).


def _build_vol_i8_kernel(f1_ref, f2h_ref, out_ref, dq_ref, *, H2, group):
    """Blocked volume tile, f32 accumulate -> per-tile symmetric int8.

    dq is the x-stage dequant factor max|vol| / 127^2 (the int8 P2 result
    times dq*inv_level recovers the bf16 kernel's tent-scaled value)."""
    f1 = f1_ref[0]            # (tile, C)
    G = f1.shape[0] // group
    W2 = f2h_ref.shape[3]
    pieces = []
    for h in range(H2):
        vol_h = jax.lax.dot_general(
            f1, f2h_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pieces.append(vol_h.reshape(G, group, W2))
    vol = jnp.concatenate(pieces, axis=1)  # (G, group*H2, W2) f32
    vmax = jnp.maximum(jnp.max(jnp.abs(vol)), 1e-20)
    out_ref[0] = jnp.round(vol * (127.0 / vmax)).astype(jnp.int8)
    # scalar broadcast into one (8, 128) tile (TPU block-shape minimum)
    dq_ref[0, 0] = jnp.full((8, 128), vmax * (1.0 / (127.0 * 127.0)),
                            jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("tile", "group", "interpret")
)
def build_xy_volume_i8(
    f1p: jnp.ndarray,
    f2h: jnp.ndarray,
    tile: int = 256,
    group: int = 16,
    interpret: bool = False,
):
    """Materialize the blocked correlation volume as per-tile-quantized
    int8: (vol (E, n_tiles*G, group*H2, W2) int8, dq (E, n_tiles, 8, 128)
    f32 -- the scalar dequant factor broadcast into one minimum-size TPU
    tile per (edge, pixel tile)).  Layout matches :func:`build_xy_volume`
    (rows h-interleaved)."""
    E, P_in, C = f1p.shape
    _, H2, _, W2 = f2h.shape
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    n_tiles = P_in // tile
    G = tile // group
    return pl.pallas_call(
        functools.partial(_build_vol_i8_kernel, H2=H2, group=group),
        grid=(E, n_tiles),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2, C, W2), lambda e, t: (e, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, group * H2, W2), lambda e, t: (e, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda e, t: (e, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, n_tiles * G, group * H2, W2), jnp.int8),
            jax.ShapeDtypeStruct((E, n_tiles, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(f1p, f2h)


def _xy_lookup_i8_kernel(
    vol_ref, dq_ref, ym2_ref, xm2_ref, g0yc_ref, s0yc_ref, g0xt_ref,
    l0xt_ref, inv_ref, out_ref, *scratch, H2, W2, group, y_tab,
):
    """x-first lookup on a prebuilt int8 volume tile.

    The x tent is built at UNIT scale (values in [0,1], live-masked) and
    quantized with the fixed scale 127; the level scaling 1/2^l moves into
    the dequant vector so high pyramid levels keep full tent precision."""
    dt = jnp.bfloat16
    vol_i8 = vol_ref[0]       # (G, group*H2, W2) int8
    G = vol_i8.shape[0]
    M = group * 32

    kxt_u = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0xt_ref[...] - xm2_ref[0][:, None, :]))
        * l0xt_ref[...]
    )  # (G, W2, M) unit-scale tents
    kxt_q = jnp.round(kxt_u * 127.0).astype(jnp.int8)
    p2_i = jax.lax.dot_general(
        vol_i8, kxt_q, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (G, group*H2, M)
    p2 = (
        p2_i.astype(jnp.float32)
        * (dq_ref[0, 0, 0, 0] * inv_ref[0][None, None, :])
    ).astype(dt)
    p2s = p2.reshape(G, H2, group, M)

    if y_tab > 1:
        # table-blockdiag y stage (see _fused_xy_kernel y_tab branch)
        S = y_tab
        assert group % S == 0, (group, S)
        stack_ref = scratch[0]
        for s in range(group // S):
            ms = slice(32 * S * s, 32 * S * (s + 1))
            ym_s = ym2_ref[0, :, ms]
            ky4 = (
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(g0yc_ref[...] - ym_s[:, :, None])
                ) * s0yc_ref[...]
            ).astype(dt)
            for q in range(S):
                r = S * s + q
                stack_ref[:, q * H2:(q + 1) * H2, :] = p2s[
                    :, :, r, 32 * r: 32 * (r + 1)
                ]
            o = jax.lax.dot_general(
                ky4, stack_ref[...], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, :, ms, :] = o.astype(out_ref.dtype)
        return

    ky = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0yc_ref[...] - ym2_ref[0][:, :, None]))
        * s0yc_ref[...]
    ).astype(dt)
    kys = ky.reshape(G, group, 32, H2)
    outs = []
    for r in range(group):
        p2_r = p2s[:, :, r, 32 * r: 32 * (r + 1)]
        ky_r = kys[:, r]
        o = jax.lax.dot_general(
            ky_r, p2_r, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "num_levels", "tile", "group", "interpret", "y_tab",
    ),
)
def corr_fused_xy_from_vol_i8(
    vol_i8: jnp.ndarray,
    dq: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 256,
    group: int = 16,
    interpret: bool = False,
    y_tab: int = 0,
) -> jnp.ndarray:
    """x-first lookup from a :func:`build_xy_volume_i8` cache.

    Same contract as :func:`corr_fused_xy_prepared`; quantization error is
    ~1% of the per-tile max correlation (tested in tests/test_corr.py)."""
    E, TG, gH2, W2 = vol_i8.shape
    H2 = gH2 // group
    _, H, W, _ = coords.shape
    P_in = H * W
    R = 2 * radius + 1
    LR = num_levels * R
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    assert TG == P_in // group, (TG, P_in, group)
    n_tiles = P_in // tile
    G = tile // group
    M = group * 32

    g0yc, s0yc, g0xt, s0xt, inv_m = _xy_tables(H2, W2, radius, num_levels, M)
    l0xt = (s0xt > 0).astype(s0xt.dtype)
    if y_tab > 1:
        g0yc, s0yc = _blockdiag_y_tables(g0yc, s0yc, y_tab)
    ysh = g0yc.shape

    flat = coords.reshape(E, P_in, 2)
    cm = flat.reshape(E, P_in // group, group, 2)
    inv_j = jnp.asarray(inv_m)
    xm2 = jnp.repeat(cm[..., 0], 32, axis=-1) * inv_j
    ym2 = jnp.repeat(cm[..., 1], 32, axis=-1) * inv_j

    const = lambda e, t: (0, 0)
    full = pl.pallas_call(
        functools.partial(
            _xy_lookup_i8_kernel, H2=H2, W2=W2, group=group, y_tab=y_tab,
        ),
        grid=(E, n_tiles),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((1, G, group * H2, W2), lambda e, t: (e, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda e, t: (e, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ysh, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(ysh, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W2, M), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W2, M), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, G, M, 32), lambda e, t: (e, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (E, P_in // group, M, 32), jnp.bfloat16
        ),
        scratch_shapes=(
            [pltpu.VMEM((G, y_tab * H2, 32), jnp.bfloat16)]
            if y_tab > 1 else []
        ),
        interpret=interpret,
    )(
        vol_i8, dq, ym2, xm2,
        jnp.asarray(g0yc), jnp.asarray(s0yc),
        jnp.asarray(g0xt), jnp.asarray(l0xt),
        jnp.asarray(inv_m)[None, :],
    )

    full = full.reshape(E, P_in, 32, 32)
    outs = [
        jnp.swapaxes(
            full[:, :, l * R : (l + 1) * R, l * R : (l + 1) * R], -1, -2
        ).reshape(E, P_in, R * R)
        for l in range(num_levels)
    ]
    return jnp.concatenate(outs, axis=-1).reshape(E, H, W, LR * R)


# --------------------------------------------------------------------------
# v6 paired x-first: every MXU dot gets K >= 128 and N >= 128.
#
# Measured on v5e (tools/ablate_corr.py): dots with N=64 or K=64 run at
# 13-30 TFLOP/s; the same FLOPs at K,N >= 128 run at ~80.  The v5 kernel's
# two big stages are both misshapen: the build contracts C=128 into N=W2=64
# (half lanes), and P2 contracts K=W2=64 (half the systolic rows).  Pairing
# adjacent volume rows on the lane axis fixes both AT THE SAME TOTAL FLOPs:
#
#   build : f2 rows h=2q,2q+1 pre-concatenated on W -> H2/2 dots of
#           (tile, C) x (C, 2*W2): K=128, N=128;
#   P2    : contract 2*W2=128 against a parity-BLOCKDIAG x-table
#           (2W2, 2M) -> (G, (H2/2)*group, 2M): K=128, N=2M.  The
#           parity zeros double the per-dot FLOPs, which is exactly
#           cancelled by halving ``group`` (the r/r' cross-block waste);
#   y     : per-slot dots split into even/odd-row halves (the compact y
#           tables are just re-sampled at h=2q / 2q+1), two (32, H2/2, 32)
#           dots + f32 add -- identical sums, zero extra FLOPs.
#
# All data movement stays Mosaic-safe: sublane splits/concats plus the
# 32-aligned lane slices the v5 kernel already uses (the lane-slice+concat
# un-pairing that Mosaic rejects is never needed -- pairs stay paired until
# the final per-slot slices).
#
# MEASURED NEGATIVE RESULT (v5e, tools/profile_corr.py, 2026-08-17): best
# v6 config (g8, tile=256) = 18.38 ms vs the wired v5 x-first g16 =
# 17.06 ms; v6g4 = 27 ms, v6g8 = 19.45 ms.  The K,N>=128 dot shapes do not
# pay for the extra VMEM traffic of the paired volume + doubled x-table at
# these sizes.  Kept (with the interpret-mode parity test) as ablation
# evidence -- do not wire into the hot path, do not re-litigate.


def _xyp_tables(
    H2: int, W2: int, radius: int, num_levels: int, M: int
):
    """Constant tables for the paired x-first kernel.

    Returns (G0YE, G0YO, S0YC, G0XT2, S0XT2, inv):
      G0YE/G0YO (M, H2//2): the v5 compact y-table sampled at even/odd h;
      S0YC (M, H2//2): shared y scale (h-independent);
      G0XT2/S0XT2 (2*W2, 2*M): parity-blockdiag x-tables -- block (p, p')
        holds the v5 (W2, M) x-table when p == p', scale 0 otherwise;
      inv (M,): level scale, premultiplied onto the coordinates outside.
    """
    import numpy as np

    R = 2 * radius + 1
    i = np.arange(M) % 32
    lvl = np.minimum(i // R, num_levels - 1)
    inv = 2.0 ** (-lvl.astype(np.float64))
    off = (i % R - radius).astype(np.float64)
    live = (i < num_levels * R).astype(np.float64)
    Hp = H2 // 2
    he = 2.0 * np.arange(Hp, dtype=np.float64)
    G0YE = np.floor(he[None, :] * inv[:, None]) - off[:, None]
    G0YO = np.floor((he + 1.0)[None, :] * inv[:, None]) - off[:, None]
    S0YC = (inv * live)[:, None] * np.ones((M, Hp))

    w = np.arange(W2, dtype=np.float64)
    G0XT = np.floor(w[:, None] * inv[None, :]) - off[None, :]
    S0XT = (inv * live)[None, :] * np.ones((W2, M))
    G0XT2 = np.tile(G0XT, (2, 2))
    par_w = (np.arange(2 * W2)[:, None] >= W2)
    par_m = (np.arange(2 * M)[None, :] >= M)
    S0XT2 = np.tile(S0XT, (2, 2)) * (par_w == par_m)
    return (
        G0YE.astype(np.float32), G0YO.astype(np.float32),
        S0YC.astype(np.float32),
        G0XT2.astype(np.float32), S0XT2.astype(np.float32),
        inv.astype(np.float32),
    )


def _fused_xyp_kernel(
    f1_ref, f2p_ref, ym2_ref, xm22_ref, g0ye_ref, g0yo_ref, s0yc_ref,
    g0xt2_ref, s0xt2_ref, out_ref, *, Hp, W2, group,
):
    """One pixel tile: paired in-VMEM build + paired x-first lookup."""
    dt = jnp.bfloat16
    f1 = f1_ref[0]            # (tile, C)
    TP = f1.shape[0]
    G = TP // group
    M = group * 32

    # paired volume rows: volp[g, q*group + r, (parity, w)]
    pieces = []
    for q in range(Hp):
        vol_q = jax.lax.dot_general(
            f1, f2p_ref[0, q], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tile, 2*W2)
        pieces.append(vol_q.astype(dt).reshape(G, group, 2 * W2))
    volp = jnp.concatenate(pieces, axis=1)  # (G, Hp*group, 2*W2)

    # parity-blockdiag X kernels: (G, 2*W2, 2*M)
    kxt2 = (
        jnp.maximum(
            0.0, 1.0 - jnp.abs(g0xt2_ref[...] - xm22_ref[0][:, None, :])
        )
        * s0xt2_ref[...]
    ).astype(dt)

    # P2[g, (q,r), (parity, r', j)] = sum_w vol[r][2q+parity, w] * kx[r'][j, w]
    p2 = jax.lax.dot_general(
        volp, kxt2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (G, Hp*group, 2*M)
    p2s = p2.reshape(G, Hp, group, 2 * M)  # safe sublane split (q, r)

    # compact even/odd Y kernels: (G, M, Hp)
    ym = ym2_ref[0][:, :, None]
    kye = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0ye_ref[...] - ym)) * s0yc_ref[...]
    ).astype(dt)
    kyo = (
        jnp.maximum(0.0, 1.0 - jnp.abs(g0yo_ref[...] - ym)) * s0yc_ref[...]
    ).astype(dt)
    kyes = kye.reshape(G, group, 32, Hp)
    kyos = kyo.reshape(G, group, 32, Hp)

    outs = []
    for r in range(group):
        pe = p2s[:, :, r, 32 * r: 32 * (r + 1)]          # (G, Hp, 32)
        po = p2s[:, :, r, M + 32 * r: M + 32 * (r + 1)]  # (G, Hp, 32)
        oe = jax.lax.dot_general(
            kyes[:, r], pe, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        oo = jax.lax.dot_general(
            kyos[:, r], po, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append((oe + oo).astype(out_ref.dtype))  # (G, 32y, 32x)
    out_ref[0] = jnp.concatenate(outs, axis=1)  # (G, M, 32): rows (r, y)


def prepare_corr_fmaps_paired(fmap1: jnp.ndarray, fmap2: jnp.ndarray):
    """Preprocess feature maps for :func:`corr_fused_xyp_prepared`.

    Like :func:`prepare_corr_fmaps` but f2 comes h-row-PAIRED on the lane
    axis: f2hp (E, H2//2, C, 2*W2) with f2hp[:, q, :, p*W2 + w] =
    fmap2[:, 2q+p, w, :] / 4.
    """
    E, H2, W2, C = fmap1.shape
    assert H2 % 2 == 0, H2
    f1p = (fmap1.astype(jnp.bfloat16) / 4.0).reshape(E, H2 * W2, C)
    f2h = (fmap2.astype(jnp.bfloat16) / 4.0).transpose(0, 1, 3, 2)
    f2hp = (
        f2h.reshape(E, H2 // 2, 2, C, W2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(E, H2 // 2, C, 2 * W2)
    )
    return f1p, f2hp


@functools.partial(
    jax.jit,
    static_argnames=("radius", "num_levels", "tile", "group", "interpret"),
)
def corr_fused_xyp_prepared(
    f1p: jnp.ndarray,
    f2hp: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paired x-first fused lookup on prepare_corr_fmaps_paired operands.

    Same contract and numerics as :func:`corr_fused_blk_prepared`."""
    E, P_in, C = f1p.shape
    _, Hp, _, W22 = f2hp.shape
    W2 = W22 // 2
    H2 = 2 * Hp
    _, H, W, _ = coords.shape
    R = 2 * radius + 1
    LR = num_levels * R
    assert P_in % tile == 0 and tile % group == 0, (P_in, tile, group)
    n_tiles = P_in // tile
    G = tile // group
    M = group * 32

    g0ye, g0yo, s0yc, g0xt2, s0xt2, inv_m = _xyp_tables(
        H2, W2, radius, num_levels, M
    )

    flat = coords.reshape(E, P_in, 2)
    cm = flat.reshape(E, P_in // group, group, 2)
    inv_j = jnp.asarray(inv_m)  # (M,)
    xm2 = jnp.repeat(cm[..., 0], 32, axis=-1) * inv_j  # (E, P/group, M)
    ym2 = jnp.repeat(cm[..., 1], 32, axis=-1) * inv_j
    xm22 = jnp.concatenate([xm2, xm2], axis=-1)        # (E, P/group, 2M)

    const = lambda e, t: (0, 0)
    full = pl.pallas_call(
        functools.partial(_fused_xyp_kernel, Hp=Hp, W2=W2, group=group),
        grid=(E, n_tiles),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, C, 2 * W2), lambda e, t: (e, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 2 * M), lambda e, t: (e, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, Hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, Hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, Hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * W2, 2 * M), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * W2, 2 * M), const, memory_space=pltpu.VMEM),
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
        f1p, f2hp, ym2, xm22,
        jnp.asarray(g0ye), jnp.asarray(g0yo), jnp.asarray(s0yc),
        jnp.asarray(g0xt2), jnp.asarray(s0xt2),
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
def corr_fused_xyp_pallas(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 128,
    group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paired x-first fused correlation (see corr_fused_xyp_prepared)."""
    f1p, f2hp = prepare_corr_fmaps_paired(fmap1, fmap2)
    return corr_fused_xyp_prepared(
        f1p, f2hp, coords, radius, num_levels, tile=tile, group=group,
        interpret=interpret,
    )
