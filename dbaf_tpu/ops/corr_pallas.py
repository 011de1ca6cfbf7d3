"""Pallas TPU kernel for the multi-scale correlation lookup.

The XLA formulation (ops/corr.lookup_fused) plateaus around 0.45% MXU
utilization: the contraction is ~200k independent (28,48)x(48,64) matmuls
(one per source pixel) and XLA's batched-matmul loop is overhead-bound.
This kernel tiles pixels into VMEM-resident blocks and issues the per-pixel
dots back-to-back from inside one program so the MXU pipeline stays fed,
with the interpolation kernels built on the VPU in-register.

Surviving surface (round 4): ``lookup_pallas`` (v1 fallback on a prebuilt
volume) and the wired hot path ``prepare_corr_fmaps`` +
``corr_fused_xy_prepared`` (v5 x-first fused build+lookup; wrapper
``corr_fused_xy_pallas``).  Six retired kernel generations (blk, blk2,
fused-blk, paired-xyp, round-cached volume, int8 prebuilt volume) were
measured NEGATIVE on v5e and deleted in round 4 -- the full record with
numbers lives in docs/ABLATION_CORR.md; recover the code from git
(`git show 6d0f623:dbaf_tpu/ops/corr_pallas.py`).

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

    Superseded by :func:`corr_fused_xy_prepared` in the hot path; kept as
    the simpler oracle variant on a prebuilt volume."""
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


def prepare_corr_fmaps(fmap1: jnp.ndarray, fmap2: jnp.ndarray):
    """Preprocess feature maps for :func:`corr_fused_xy_prepared`.

    Hoist this out of the per-round loop: the operands only depend on the
    per-keyframe feature buffers, not on the lookup coordinates.
    Returns (f1p (E, P, C), f2h (E, H2, C, W2)), both bf16 and /4-scaled
    so <f1p[p], f2h[h,:,w]> is the reference volume entry (corr.py:63-71).
    """
    E, H2, W2, C = fmap1.shape
    f1p = (fmap1.astype(jnp.bfloat16) / 4.0).reshape(E, H2 * W2, C)
    f2h = (fmap2.astype(jnp.bfloat16) / 4.0).transpose(0, 1, 3, 2)
    return f1p, f2h


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
    77 -> 106 TFLOP/s at the g16 shape, docs/ABLATION_CORR.md, mm_p2_i8):
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
        # the pure y4 dot shape runs at 48 TFLOP/s (docs/ABLATION_CORR.md
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

    Same contract and numerics as ``corr.lookup_fused`` (channels-last); with
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


