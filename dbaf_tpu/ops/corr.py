"""Correlation volume: all-pairs build, pyramid, and windowed lookup.

Replaces the reference's CUDA correlation stack (volume build
/root/reference/dbaf/modules/corr.py:63-71, pyramid :35-38, and the bilinear
(2r+1)^2 lookup kernel /root/reference/src/correlation_kernels.cu:19-70) with
TPU-native formulations:

* the volume build is a plain batched matmul (MXU);
* the lookup is **reformulated as two separable small matmuls** per pixel
  with on-the-fly triangular (bilinear) interpolation weights, instead of the
  CUDA per-pixel gather.  For a window of offsets ``a, b in [-r, r]``::

      corr[p, a, b] = interp2(vol[p], y = y0 - r + b, x = x0 - r + a)
                    = sum_{h,w} vol[p,h,w] * tri(h - (y0-r+b)) * tri(w - (x0-r+a))

  with ``tri(t) = max(0, 1 - |t|)``.  Out-of-bounds taps contribute exact
  zeros, matching the CUDA kernel's ``within_bounds`` skip.  The two
  contractions are dense dot_generals -- no gathers anywhere, which is the
  TPU-idiomatic design (gathers are hostile to the VPU; matmuls ride the
  MXU).

Channel layout of the lookup output matches the reference exactly:
level-major, then x-offset-major / y-offset-minor within each level
(correlation_kernels.cu:47-66 with i = x offset, j = y offset), so converted
DROID weights consume it unchanged.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

DEFAULT_RADIUS = 3
DEFAULT_LEVELS = 4


def build_volume(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation volume.

    fmap1, fmap2: (E, C, H, W) feature maps (any float dtype).
    Returns (E, H*W, H, W) volume = <fmap1/4, fmap2/4> over channels,
    mirroring /root/reference/dbaf/modules/corr.py:63-71.
    """
    E, C, H, W = fmap1.shape
    a = fmap1.reshape(E, C, H * W) / 4.0
    b = fmap2.reshape(E, C, H * W) / 4.0
    vol = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return vol.reshape(E, H * W, H, W).astype(fmap1.dtype)


def build_volume_nhwc(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs volume from channels-last features (layout-native on TPU).

    fmap1, fmap2: (E, H, W, C).  Returns (E, H*W, H, W).  Contracting the
    trailing channel dim avoids the relayout the NCHW path forces.
    """
    E, H, W, C = fmap1.shape
    a = fmap1.reshape(E, H * W, C) / 4.0
    b = fmap2.reshape(E, H * W, C) / 4.0
    vol = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return vol.reshape(E, H * W, H, W).astype(fmap1.dtype)


def build_pyramid(
    volume: jnp.ndarray, num_levels: int = DEFAULT_LEVELS
) -> List[jnp.ndarray]:
    """Average-pool pyramid over the *target*-frame dims.

    volume: (E, P, H2, W2) -> list of (E, P, H2/2^l, W2/2^l).
    """
    pyramid = [volume]
    v = volume
    for _ in range(num_levels - 1):
        E, P, H2, W2 = v.shape
        v = v.reshape(E, P, H2 // 2, 2, W2 // 2, 2).mean(axis=(3, 5))
        pyramid.append(v)
    return pyramid


def _tri_kernel(coord: jnp.ndarray, size: int, radius: int) -> jnp.ndarray:
    """Triangular interpolation weights.

    coord: (...,) fractional sample centers; returns (..., 2r+1, size) with
    row ``k`` holding bilinear weights for sample position ``coord - r + k``.
    """
    taps = coord[..., None, None] + (
        jnp.arange(2 * radius + 1, dtype=coord.dtype)[:, None] - radius
    )
    grid = jnp.arange(size, dtype=coord.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(grid - taps))


def lookup_level(
    volume: jnp.ndarray, coords: jnp.ndarray, radius: int = DEFAULT_RADIUS
) -> jnp.ndarray:
    """Windowed bilinear lookup at one pyramid level (separable matmuls).

    volume: (E, P, H2, W2); coords: (E, P, 2) as (x, y) in this level's
    scale.  Returns (E, P, (2r+1)^2) with channel = a*(2r+1)+b, a = x offset.
    """
    E, P, H2, W2 = volume.shape
    x0 = coords[..., 0]
    y0 = coords[..., 1]

    ky = _tri_kernel(y0, H2, radius)  # (E, P, R, H2)
    kx = _tri_kernel(x0, W2, radius)  # (E, P, R, W2)

    compute_dtype = volume.dtype
    ky = ky.astype(compute_dtype)
    kx = kx.astype(compute_dtype)

    # contract H2: (E,P,R,H2) x (E,P,H2,W2) -> (E,P,R,W2)
    tmp = jax.lax.dot_general(
        ky,
        volume,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    # contract W2: (E,P,Ra,W2) x (E,P,Rb,W2) -> (E,P,Ra,Rb) ... note order:
    # out[a,b] needs x-kernel row a against y-contracted row b.
    out = jax.lax.dot_general(
        kx,
        tmp.astype(compute_dtype),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # (E, P, Ra, Rb)
    R = 2 * radius + 1
    return out.reshape(E, P, R * R)


def lookup_level_gather(
    volume: jnp.ndarray, coords: jnp.ndarray, radius: int = DEFAULT_RADIUS
) -> jnp.ndarray:
    """Gather-based reference lookup (same contract as :func:`lookup_level`).

    Kept as a numerically-identical fallback/oracle; the separable-matmul
    path is the production kernel on TPU.
    """
    E, P, H2, W2 = volume.shape
    R = 2 * radius + 1
    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx)[..., None, None]
    dy = (y0 - fy)[..., None, None]

    offs = jnp.arange(R)
    xi = fx[..., None, None] + (offs - radius)[None, None, :, None]
    yi = fy[..., None, None] + (offs - radius)[None, None, None, :]
    xi = jnp.broadcast_to(xi, x0.shape + (R, R))
    yi = jnp.broadcast_to(yi, y0.shape + (R, R))

    vol_flat = volume.reshape(E, P, H2 * W2)

    def tap(ddx, ddy):
        xq = xi + ddx
        yq = yi + ddy
        inb = (xq >= 0) & (xq < W2) & (yq >= 0) & (yq < H2)
        idx = (
            jnp.clip(yq, 0, H2 - 1).astype(jnp.int32) * W2
            + jnp.clip(xq, 0, W2 - 1).astype(jnp.int32)
        )
        vals = jnp.take_along_axis(
            vol_flat, idx.reshape(E, P, R * R), axis=2
        ).reshape(E, P, R, R)
        return jnp.where(inb, vals, 0.0)

    w00 = (1 - dx) * (1 - dy)
    w10 = dx * (1 - dy)
    w01 = (1 - dx) * dy
    w11 = dx * dy
    out = (
        w00 * tap(0, 0) + w10 * tap(1, 0) + w01 * tap(0, 1) + w11 * tap(1, 1)
    )
    return out.reshape(E, P, R * R).astype(jnp.float32)


def lookup_pyramid(
    pyramid: Sequence[jnp.ndarray],
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    impl: str = "separable",
) -> jnp.ndarray:
    """Full multi-level lookup.

    pyramid: list of (E, P, H2/2^l, W2/2^l); coords: (E, H, W, 2) pixel
    coords in level-0 scale (P == H*W).  Returns (E, L*(2r+1)^2, H, W) in the
    reference's channel order (level-major, x-offset-major).
    """
    E, H, W, _ = coords.shape
    P = H * W
    flat = coords.reshape(E, P, 2)
    fn = lookup_level if impl == "separable" else lookup_level_gather
    outs = []
    for lvl, vol in enumerate(pyramid):
        outs.append(fn(vol, flat / (2.0**lvl), radius))
    out = jnp.concatenate(outs, axis=-1)  # (E, P, L*R^2)
    return out.transpose(0, 2, 1).reshape(E, -1, H, W)


def build_pyramid_fast(
    volume: jnp.ndarray, num_levels: int = DEFAULT_LEVELS
) -> List[jnp.ndarray]:
    """Pyramid via strided adds (layout-friendlier than reshape-mean)."""
    pyramid = [volume]
    v = volume
    for _ in range(num_levels - 1):
        v = 0.25 * (
            v[:, :, 0::2, 0::2]
            + v[:, :, 0::2, 1::2]
            + v[:, :, 1::2, 0::2]
            + v[:, :, 1::2, 1::2]
        )
        pyramid.append(v)
    return pyramid


def lookup_crop(
    pyramid: Sequence[jnp.ndarray],
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
) -> jnp.ndarray:
    """Windowed lookup via integer-window crops (two take_along_axis
    gathers: 8 rows then 8 columns) + a 4-tap bilinear combine on the VPU.

    Exact same contract as :func:`lookup_pyramid`; an alternative mapping
    that reads only the needed volume rows instead of contracting the full
    target extent.
    """
    E, H, W, _ = coords.shape
    P = H * W
    R = 2 * radius + 1
    flat = coords.reshape(E, P, 2)
    outs = []
    for lvl, vol in enumerate(pyramid):
        _, _, H2, W2 = vol.shape
        c = flat / (2.0**lvl)
        fx = jnp.floor(c[..., 0])
        fy = jnp.floor(c[..., 1])
        dx = (c[..., 0] - fx)[..., None, None]
        dy = (c[..., 1] - fy)[..., None, None]

        ry = fy[..., None] + (jnp.arange(R + 1, dtype=fy.dtype) - radius)
        rx = fx[..., None] + (jnp.arange(R + 1, dtype=fx.dtype) - radius)
        my = (ry >= 0) & (ry < H2)
        mx = (rx >= 0) & (rx < W2)
        iy = jnp.clip(ry, 0, H2 - 1).astype(jnp.int32)
        ix = jnp.clip(rx, 0, W2 - 1).astype(jnp.int32)

        # rows: (E, P, R+1, W2)
        strip = jnp.take_along_axis(vol, iy[..., None], axis=2)
        # columns: (E, P, R+1, R+1)
        win = jnp.take_along_axis(
            strip, ix[:, :, None, :].astype(jnp.int32), axis=3
        ).astype(jnp.float32)
        win = win * my[..., None] * mx[..., None, :]

        # bilinear combine of the 4 integer-shifted taps; win dims are
        # (y=row, x=col); output channel = a*R+b with a = x offset
        out = (
            (1 - dy) * (1 - dx) * win[:, :, :R, :R]
            + (1 - dy) * dx * win[:, :, :R, 1:]
            + dy * (1 - dx) * win[:, :, 1:, :R]
            + dy * dx * win[:, :, 1:, 1:]
        )
        outs.append(out.transpose(0, 1, 3, 2).reshape(E, P, R * R))
    out = jnp.concatenate(outs, axis=-1)
    return out.transpose(0, 2, 1).reshape(E, -1, H, W)


def lookup_auto(
    volume: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
) -> jnp.ndarray:
    """Backend-dispatching lookup: the Pallas kernel on TPU (1.7x the XLA
    formulation), the fused XLA path elsewhere."""
    if jax.default_backend() == "tpu":
        from .corr_pallas import lookup_pallas

        return lookup_pallas(volume, coords, radius, num_levels)
    return lookup_fused(volume, coords, radius, num_levels)


def _pooled_tri_kernel(
    coord: jnp.ndarray, size: int, radius: int, level: int
) -> jnp.ndarray:
    """Effective lookup kernel of pyramid level ``level`` against the
    *level-0* volume.

    Average-pooling commutes into the interpolation kernel: the level-l
    bilinear tap at pooled position ``coord/2^l - r + k`` equals a level-0
    contraction with ``tri(floor(h/2^l) - (coord/2^l - r + k)) / 2^l``.
    Returns (..., 2r+1, size).
    """
    scale = float(2**level)
    taps = coord[..., None, None] / scale + (
        jnp.arange(2 * radius + 1, dtype=coord.dtype)[:, None] - radius
    )
    grid = jnp.floor(jnp.arange(size, dtype=coord.dtype) / scale)
    return jnp.maximum(0.0, 1.0 - jnp.abs(grid - taps)) / scale


def lookup_fused(
    volume: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
) -> jnp.ndarray:
    """Multi-level windowed lookup straight from the level-0 volume.

    Folds the whole pyramid into per-level effective kernels so the volume
    is read ONCE for all levels and no pooled copies are ever materialized
    -- the TPU-native replacement for pyramid-build + per-level gather
    (/root/reference/dbaf/modules/corr.py:35-50,
    /root/reference/src/correlation_kernels.cu:19-70).

    volume: (E, P, H2, W2); coords: (E, H, W, 2) with P == H*W.
    Returns (E, L*(2r+1)^2, H, W), reference channel order (level-major,
    x-offset-major).
    """
    E, P, H2, W2 = volume.shape
    _, H, W, _ = coords.shape
    R = 2 * radius + 1
    flat = coords.reshape(E, P, 2)
    x0 = flat[..., 0]
    y0 = flat[..., 1]

    ky = jnp.concatenate(
        [_pooled_tri_kernel(y0, H2, radius, l) for l in range(num_levels)],
        axis=-2,
    )  # (E, P, L*R, H2)
    kx = jnp.concatenate(
        [_pooled_tri_kernel(x0, W2, radius, l) for l in range(num_levels)],
        axis=-2,
    )  # (E, P, L*R, W2)

    dt = volume.dtype
    # contract H2 once for all levels: (E,P,LR,H2) x (E,P,H2,W2)
    tmp = jax.lax.dot_general(
        ky.astype(dt),
        volume,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    # contract W2: (E,P,LRa,W2) x (E,P,LRb,W2) -> (E,P,LRa,LRb); only the
    # per-level diagonal blocks are needed
    full = jax.lax.dot_general(
        kx.astype(dt),
        tmp.astype(dt),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    outs = [
        full[:, :, l * R : (l + 1) * R, l * R : (l + 1) * R].reshape(E, P, R * R)
        for l in range(num_levels)
    ]
    out = jnp.concatenate(outs, axis=-1)  # (E, P, L*R^2)
    return out.transpose(0, 2, 1).reshape(E, num_levels * R * R, H, W)


def lookup_fused_tiled(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = DEFAULT_RADIUS,
    num_levels: int = DEFAULT_LEVELS,
    tile: int = 512,
) -> jnp.ndarray:
    """Memory-light on-the-fly correlation (the altcorr capability,
    /root/reference/src/altcorr_kernel.cu:27-236, modules/corr.py:91-139).

    Instead of materializing the full (P x H2 x W2) volume per edge, builds
    it in pixel tiles (one MXU matmul per tile) and looks up immediately --
    peak correlation memory drops from O(P * H2W2) to O(tile * H2W2) while
    total FLOPs are unchanged.  fmap1/fmap2: (E, H, W, C) channels-last.
    """
    E, H, W, C = fmap1.shape
    P = H * W
    f1 = fmap1.reshape(E, P, C) / 4.0
    f2 = fmap2.reshape(E, P, C) / 4.0
    flat = coords.reshape(E, P, 2)
    R = 2 * radius + 1

    n_tiles = (P + tile - 1) // tile
    pad = n_tiles * tile - P
    f1p = jnp.pad(f1, ((0, 0), (0, pad), (0, 0)))
    cp = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
    f1t = f1p.reshape(E, n_tiles, tile, C).transpose(1, 0, 2, 3)
    ct = cp.reshape(E, n_tiles, tile, 2).transpose(1, 0, 2, 3)

    def one_tile(args):
        f1_tile, c_tile = args  # (E, tile, C), (E, tile, 2)
        vol = jax.lax.dot_general(
            f1_tile, f2,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(fmap1.dtype).reshape(E, tile, H, W)
        c4 = c_tile.reshape(E, tile, 1, 2)  # fake (E, H'=tile, W'=1, 2)
        out = lookup_fused(vol, c4.reshape(E, tile, 1, 2), radius, num_levels)
        return out.reshape(E, num_levels * R * R, tile)

    outs = jax.lax.map(one_tile, (f1t, ct))  # (n_tiles, E, L*R^2, tile)
    out = outs.transpose(1, 2, 0, 3).reshape(E, num_levels * R * R, n_tiles * tile)
    return out[..., :P].reshape(E, num_levels * R * R, H, W)


def projmap(poses, disps, intrinsics, ii, jj):
    """Dense reprojection coords + validity (the droid_backends.projmap
    surface, /root/reference/src/droid_kernels.cu:471-560)."""
    from . import projective as _pj

    return _pj.projective_transform(poses, disps, intrinsics, ii, jj)


class CorrPyramid:
    """Convenience wrapper holding a pyramid for a fixed set of edges.

    The TPU analogue of the reference ``CorrBlock``
    (/root/reference/dbaf/modules/corr.py:23-60); edge-set mutation
    (cat/index) is done functionally by the graph manager on padded arrays.
    """

    def __init__(self, fmap1, fmap2, num_levels=DEFAULT_LEVELS, radius=DEFAULT_RADIUS):
        self.num_levels = num_levels
        self.radius = radius
        vol = build_volume(fmap1, fmap2)
        self.pyramid = build_pyramid(vol, num_levels)

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        return lookup_pyramid(self.pyramid, coords, self.radius)
