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


# NOTE: a block-diagonal variant (grouping 4 pixels into one M=128 matmul to
# fill the systolic array) was prototyped but crashes the current Mosaic
# toolchain (remote tpu_compile_helper exit 1 on the 5-D select / in-kernel
# transpose); revisit when the toolchain moves.


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
