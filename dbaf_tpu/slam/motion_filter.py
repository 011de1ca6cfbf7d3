"""Per-frame keyframe admission filter.

Redesign of /root/reference/dbaf/motion_filter.py:12-93: every incoming frame
runs the feature encoder; a single correlation + update-operator step against
the last keyframe estimates flow magnitude, gating admission at
``filter_thresh`` (default 2.4 px).  All three stages are separate jits so
non-keyframes cost exactly one encoder pass + one gate pass.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import corr as corr_ops
from ..ops import lie, projective as pj
from ..utils.config import DBAFusionConfig
from .video import DepthVideo


def make_feat_gate(feat_fn: Callable, update_fn: Callable):
    """Build the fused per-frame jit: feature extraction + flow-magnitude
    gate in ONE dispatch (one host round trip per non-keyframe).

    update_fn has the graph-kernel signature
    (net, inp, corr, motn, ii, jj, aux) -> (net, delta, weight).
    """

    @jax.jit
    def feat_gate(image, fmap_kf, net_kf, inp_kf):
        fmap_cur = feat_fn(image)[0]
        H, W = fmap_kf.shape[0], fmap_kf.shape[1]
        vol = corr_ops.build_volume_nhwc(
            fmap_kf[None].astype(jnp.bfloat16),
            fmap_cur[None].astype(jnp.bfloat16),
        )
        coords0 = pj.coords_grid(H, W)[None]
        corr = corr_ops.lookup_auto(vol, coords0).transpose(0, 2, 3, 1)
        zero_motn = jnp.zeros((1, H, W, 4), dtype=net_kf.dtype)
        ii = jnp.zeros((1,), dtype=jnp.int32)
        _, delta, _ = update_fn(
            net_kf[None], inp_kf[None], corr.astype(net_kf.dtype), zero_motn,
            ii, ii, {},
        )
        return fmap_cur, jnp.mean(jnp.linalg.norm(delta[0], axis=-1))

    return feat_gate


class MotionFilter:
    def __init__(
        self,
        video: DepthVideo,
        cfg: DBAFusionConfig,
        feat_fn: Callable,
        ctx_fn: Callable,
        update_fn: Callable,
    ):
        """feat_fn(image_nhwc) -> fmap (H/8, W/8, 128);
        ctx_fn(image) -> (net, inp); update_fn: graph-kernel signature."""
        self.video = video
        self.cfg = cfg
        self.thresh = cfg.frontend.filter_thresh
        self.feat = feat_fn
        self.ctx = ctx_fn
        self.feat_gate = make_feat_gate(feat_fn, update_fn)
        self.count = 0
        self._kf_fmap = None
        self._kf_net = None
        self._kf_inp = None

    def track(
        self,
        tstamp: float,
        image: np.ndarray,
        depth: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
        image_right: Optional[np.ndarray] = None,
    ) -> bool:
        """Process one frame; returns True if admitted as keyframe.

        image: (H, W, 3) BGR float/uint8 host array; image_right feeds the
        stereo feature buffer when the rig is stereo.
        """
        img = jnp.asarray(image, dtype=jnp.float32)[None]

        def right_fmap():
            if image_right is None:
                return None
            return self.feat(
                jnp.asarray(image_right, dtype=jnp.float32)[None]
            )[0]

        if self.video.counter == 0:
            fmap = self.feat(img)[0]
            net, inp = self.ctx(img)
            self._store(fmap, net[0], inp[0])
            small = np.asarray(image[::8, ::8]).astype(np.uint8)
            self.video.append(
                tstamp, small, lie.se3_identity(), 1.0,
                None if depth is None else jnp.asarray(depth),
                jnp.asarray(intrinsics, dtype=jnp.float32) / 8.0,
                fmap, net[0], inp[0], fmap_right=right_fmap(),
            )
            return True

        fmap, delta_dev = self.feat_gate(
            img, self._kf_fmap, self._kf_net, self._kf_inp
        )
        delta = float(delta_dev)
        if delta > self.thresh:
            self.count = 0
            net, inp = self.ctx(img)
            self._store(fmap, net[0], inp[0])
            small = np.asarray(image[::8, ::8]).astype(np.uint8)
            self.video.append(
                tstamp, small, None, None,
                None if depth is None else jnp.asarray(depth),
                jnp.asarray(intrinsics, dtype=jnp.float32) / 8.0,
                fmap, net[0], inp[0], fmap_right=right_fmap(),
            )
            return True
        self.count += 1
        return False

    def _store(self, fmap, net, inp):
        self._kf_fmap = fmap
        self._kf_net = net.astype(jnp.bfloat16)
        self._kf_inp = inp.astype(jnp.bfloat16)
