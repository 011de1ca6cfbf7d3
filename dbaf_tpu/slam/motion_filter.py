"""Per-frame keyframe admission filter.

Redesign of /root/reference/dbaf/motion_filter.py:12-93: every incoming frame
runs the feature encoder; a single correlation + update-operator step against
the last keyframe estimates flow magnitude, gating admission at
``filter_thresh`` (default 2.4 px).  All three stages are separate jits so
non-keyframes cost exactly one encoder pass + one gate pass.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import corr as corr_ops
from ..ops import lie, projective as pj
from ..utils.config import DBAFusionConfig
from .video import DepthVideo


def make_feat_gate(feat_fn: Callable, update_fn: Callable):
    """Build the fused per-frame jits: feature extraction + flow-magnitude
    gate in ONE dispatch (one host round trip per non-keyframe).

    update_fn has the graph-kernel signature
    (net, inp, corr, motn, ii, jj, aux) -> (net, delta, weight).

    Returns (feat_gate, feat_gate_pack); the ``_pack`` variant threads a
    deferred scalar pack from the previous keyframe's update kernel through
    its output so ONE host pull serves both the gate decision and the
    deferred cull/proximity bookkeeping.
    """

    def body(image, fmap_kf, net_kf, inp_kf):
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

    @jax.jit
    def feat_gate(image, fmap_kf, net_kf, inp_kf):
        return body(image, fmap_kf, net_kf, inp_kf)

    @jax.jit
    def feat_gate_pack(image, fmap_kf, net_kf, inp_kf, pack):
        fmap_cur, delta = body(image, fmap_kf, net_kf, inp_kf)
        return fmap_cur, jnp.concatenate([delta[None], pack])

    return feat_gate, feat_gate_pack


def make_admit(ctx_fn: Callable):
    """Fused keyframe admission: context encoding + feature-buffer writes in
    ONE dispatch (dispatch latency dominates on remote TPU transports)."""

    @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
    def admit(img, fmap, fmaps, nets, inps, idx):
        net, inp = ctx_fn(img)
        fmaps = fmaps.at[idx].set(fmap.astype(fmaps.dtype))
        nets = nets.at[idx].set(net[0].astype(nets.dtype))
        inps = inps.at[idx].set(inp[0].astype(inps.dtype))
        return fmaps, nets, inps, net[0], inp[0]

    return admit


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
        self.feat_gate, self.feat_gate_pack = make_feat_gate(feat_fn, update_fn)
        self.admit = make_admit(ctx_fn)
        self.frontend = None  # wired by the system facade: lets the gate
        # pull carry the previous keyframe's deferred update-kernel scalars
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
        # upload uint8 (3x less transport traffic); the encoders normalize
        img = jnp.asarray(np.asarray(image, dtype=np.uint8))[None]

        def right_fmap():
            if image_right is None:
                return None
            return self.feat(
                jnp.asarray(np.asarray(image_right, dtype=np.uint8))[None]
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

        pending = (
            self.frontend.pending_pack if self.frontend is not None else None
        )
        if pending is not None:
            # one pull serves the gate AND the previous keyframe's deferred
            # cull/proximity scalars (saves a ~25 ms transport round trip)
            fmap, scalars = self.feat_gate_pack(
                img, self._kf_fmap, self._kf_net, self._kf_inp, pending
            )
            scalars = np.asarray(scalars)
            delta = float(scalars[0])
            self.frontend.resolve_pending(scalars[1:])
        else:
            fmap, delta_dev = self.feat_gate(
                img, self._kf_fmap, self._kf_net, self._kf_inp
            )
            delta = float(delta_dev)
        if delta > self.thresh:
            self.count = 0
            v = self.video
            idx = v.counter
            # fused admit: context encoder + buffer writes, one dispatch
            v.fmaps, v.nets, v.inps, net0, inp0 = self.admit(
                img, fmap, v.fmaps, v.nets, v.inps,
                jnp.asarray(idx, jnp.int32),
            )
            self._store(fmap, net0, inp0)
            v.tstamp[idx] = tstamp
            v.images_small[idx] = np.asarray(image[::8, ::8]).astype(np.uint8)
            v.intrinsics = jnp.asarray(intrinsics, dtype=jnp.float32) / 8.0
            if depth is not None:
                d8 = jnp.asarray(depth)[3::8, 3::8]
                from .video import _set_row

                v.disps_sens = _set_row(
                    v.disps_sens, idx, jnp.where(d8 > 0, 1.0 / d8, d8)
                )
                v.has_depth = True
            fr = right_fmap()
            if fr is not None and v.fmaps_right is not None:
                from .video import _set_row

                v.fmaps_right = _set_row(
                    v.fmaps_right, idx, fr.astype(jnp.bfloat16)
                )
            v.counter += 1
            return True
        self.count += 1
        return False

    def _store(self, fmap, net, inp):
        self._kf_fmap = fmap
        self._kf_net = net.astype(jnp.bfloat16)
        self._kf_inp = inp.astype(jnp.bfloat16)
