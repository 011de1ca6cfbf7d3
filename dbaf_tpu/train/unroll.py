"""Unrolled training forward pass of the full system.

The training graph of the reference (/root/reference/dbaf/droid_net.py:171-221):
feature extraction -> per-edge correlation -> ``num_steps`` iterations of
(lookup -> update operator with GraphAgg -> 2 x differentiable BA) ->
convex-upsampled disparities and weighted residuals for the losses.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..models import DroidNet
from ..ops import corr as corr_ops, projective as pj
from .ba_layer import ba_step


def cvx_upsample(data: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex 8x upsampling with learned 3x3 masks (droid_net.py:17-31).

    data: (N, H, W, C); mask: (N, H, W, 9*64).  Returns (N, 8H, 8W, C).
    """
    N, H, W, C = data.shape
    m = mask.reshape(N, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood stack (the unfold), tap order row-major like torch
    taps = jnp.stack(
        [
            pad[:, dy : dy + H, dx : dx + W]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # (N, H, W, 9, C)
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", m, taps)  # (N,H,W,8,8,C)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(N, 8 * H, 8 * W, C)


def upsample_disp(disp: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) disparity + (N, H, W, 576) mask -> (N, 8H, 8W)."""
    return cvx_upsample(disp[..., None], mask)[..., 0]


def forward(
    model: DroidNet,
    params,
    images: jnp.ndarray,
    poses0: jnp.ndarray,
    disps0: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    num_steps: int = 12,
    fixedp: int = 2,
) -> Tuple[List, List, List]:
    """Unrolled estimation (droid_net.py:171-221).

    images: (N, H, W, 3) BGR-valued; poses0: (N, 7); disps0: (N, H/8, W/8);
    intrinsics: (4,) at 1/8 scale.  Returns (poses_list, disps_up_list,
    residuals_list) for the training losses.
    """
    fmaps, net_c, inp_c = model.apply(
        {"params": params}, images, method=model.extract_features
    )
    net = net_c[ii]
    inp = inp_c[ii]
    vol = corr_ops.build_volume_nhwc(fmaps[ii], fmaps[jj])

    h8, w8 = disps0.shape[-2:]
    grid = pj.coords_grid(h8, w8)

    poses, disps = poses0, disps0
    coords1, _ = pj.projective_transform(poses, disps, intrinsics, ii, jj)
    target = coords1

    poses_list, disps_list, residual_list = [], [], []
    N = poses.shape[0]
    eta0 = jnp.zeros((N, h8 * w8), dtype=jnp.float32)

    for _ in range(num_steps):
        poses = jax.lax.stop_gradient(poses)
        disps = jax.lax.stop_gradient(disps)
        coords1 = jax.lax.stop_gradient(coords1)
        target = jax.lax.stop_gradient(target)

        corr = corr_ops.lookup_fused(vol, coords1).transpose(0, 2, 3, 1)
        resd = target - coords1
        flow = coords1 - grid
        motn = jnp.concatenate([flow, resd], axis=-1).clip(-64.0, 64.0)

        net, delta, weight, eta, upmask = model.apply(
            {"params": params},
            net,
            inp.astype(net.dtype),
            corr.astype(net.dtype),
            motn.astype(net.dtype),
            ii,
            N,
            method=model.update_with_agg,
        )
        target = coords1 + delta

        eta_frames = eta0 + eta.reshape(N, h8 * w8)
        for _inner in range(2):
            poses, disps = ba_step(
                target, weight, eta_frames, poses, disps, intrinsics,
                ii, jj, fixedp=fixedp,
            )

        coords1, valid = pj.projective_transform(
            poses, disps, intrinsics, ii, jj
        )
        poses_list.append(poses)
        disps_list.append(upsample_disp(disps, upmask))
        residual_list.append(valid * (target - coords1))

    return poses_list, disps_list, residual_list
