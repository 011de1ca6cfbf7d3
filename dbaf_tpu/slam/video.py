"""Keyframe state store: the TPU-native DepthVideo.

Redesign of /root/reference/dbaf/depth_video.py:40-560.  Differences by
design:

* all hot state (poses, disparities, features, GRU context) lives in jax
  device arrays with **static buffer shapes**; per-keyframe mutation happens
  through tiny jitted index updates (no host round trips);
* timestamps and low-rate bookkeeping stay on host (numpy);
* marginalized-keyframe archival ("save buffers",
  depth_video.py:73-81,336-343) appends to host lists instead of fixed GPU
  tensors -- unbounded trajectories without device memory growth;
* the multiprocessing counter/lock is gone: the reference's filter and
  frontend already run sequentially in one thread (SURVEY.md 5.2), so the
  lock guarded nothing.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import projective as pj
from ..utils.config import DBAFusionConfig


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_row(buf, idx, value):
    return buf.at[idx].set(value)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_rows(buf, values, start):
    """Contiguous-range row write (ONE dispatch for a batch of rows)."""
    return jax.lax.dynamic_update_slice_in_dim(
        buf, values.astype(buf.dtype), start, 0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scale_rows(buf, n, scale):
    """Divide rows [0, n) by ``scale`` in one dispatch."""
    keep = jnp.arange(buf.shape[0]) < n
    s = jnp.where(keep, 1.0 / scale, 1.0).astype(buf.dtype)
    return buf * s.reshape((-1,) + (1,) * (buf.ndim - 1))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _set_features(fmaps, nets, inps, idx, fmap, net, inp):
    return (
        fmaps.at[idx].set(fmap.astype(fmaps.dtype)),
        nets.at[idx].set(net.astype(nets.dtype)),
        inps.at[idx].set(inp.astype(inps.dtype)),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_row(buf, dst, src):
    return buf.at[dst].set(buf[src])


@functools.partial(jax.jit, donate_argnums=tuple(range(9)))
def _copy_row_all(poses, disps, disps_sens, damping, fmaps, nets, inps,
                  fmaps_right, disps_up, dst, src):
    """Keyframe-removal slot shift across every buffer in one dispatch."""
    out = []
    for buf in (poses, disps, disps_sens, damping, fmaps, nets, inps,
                fmaps_right, disps_up):
        out.append(None if buf is None else buf.at[dst].set(buf[src]))
    return tuple(out)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
def _roll(buf, shift):
    return jnp.roll(buf, -shift, axis=0)


@jax.jit
def _distance(poses, disps, intrinsics, ii, jj, beta):
    return pj.frame_distance_bidirectional(poses, disps, intrinsics, ii, jj, beta)


@functools.partial(jax.jit, donate_argnums=(0,))
def _seed_depth(disps, disps_sens, idx):
    row = jnp.where(disps_sens[idx] > 0, disps_sens[idx], disps[idx])
    return disps.at[idx].set(row)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _seed_next(poses, disps, idx):
    """poses[idx] = poses[idx-1]; disps[idx] = mean(disps[idx-1])
    (dbaf_frontend.py:371-373) as one dispatch."""
    poses = poses.at[idx].set(poses[idx - 1])
    disps = disps.at[idx].set(jnp.mean(disps[idx - 1]))
    return poses, disps


@jax.jit
def _reproject(poses, disps, intrinsics, ii, jj):
    return pj.projective_transform(poses, disps, intrinsics, ii, jj)


@jax.jit
def _normalize(poses, disps, count_mask):
    s = jnp.sum(disps * count_mask[:, None, None]) / jnp.maximum(
        jnp.sum(count_mask) * disps.shape[1] * disps.shape[2], 1.0
    )
    disps = jnp.where(count_mask[:, None, None] > 0, disps / s, disps)
    poses = poses.at[:, :3].set(
        jnp.where(count_mask[:, None] > 0, poses[:, :3] * s, poses[:, :3])
    )
    return poses, disps


class DepthVideo:
    """Fixed-capacity keyframe ring with device-resident hot state."""

    def __init__(self, cfg: DBAFusionConfig):
        self.cfg = cfg
        ht, wd = cfg.image_size
        h8, w8 = ht // 8, wd // 8
        B = cfg.buffer
        self.ht, self.wd = ht, wd
        self.h8, self.w8 = h8, w8

        self.counter = 0
        self.tstamp = np.zeros(B, dtype=np.float64)

        ident = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=jnp.float32)
        self.poses = jnp.tile(ident[None], (B, 1))
        self.disps = jnp.ones((B, h8, w8), dtype=jnp.float32)
        self.disps_sens = jnp.zeros((B, h8, w8), dtype=jnp.float32)
        self.damping = 1e-6 * jnp.ones((B, h8, w8), dtype=jnp.float32)
        self.fmaps = jnp.zeros((B, h8, w8, 128), dtype=jnp.bfloat16)
        # right-camera features for stereo rigs (the c=2 axis of the
        # reference's fmaps buffer, depth_video.py:64); populated only when
        # cfg.stereo
        self.fmaps_right = (
            jnp.zeros((B, h8, w8, 128), dtype=jnp.bfloat16)
            if cfg.stereo else None
        )
        self.nets = jnp.zeros((B, h8, w8, 128), dtype=jnp.bfloat16)
        self.inps = jnp.zeros((B, h8, w8, 128), dtype=jnp.bfloat16)

        # keyframe-sharded feature buffers (SURVEY.md 2.9 bullet 3): the
        # fmaps/nets/inps slabs -- the reference's large DepthVideo axes
        # (depth_video.py:64-66) -- distributed over the device mesh by
        # keyframe slot.  The update kernels gather rows by edge index;
        # XLA/GSPMD inserts the collectives.  Poses/disps stay replicated
        # (tiny, solver state).
        self.kf_sharding = None
        if getattr(cfg, "shard_video", False):
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.mesh import make_mesh

            n_dev = len(_jax.devices())
            if n_dev > 1:
                if B % n_dev:
                    raise ValueError(
                        f"shard_video needs buffer ({B}) divisible by the "
                        f"device count ({n_dev})"
                    )
                mesh = make_mesh(n_dev, axis="kf")
                self.kf_sharding = NamedSharding(mesh, PartitionSpec("kf"))
                put = lambda x: _jax.device_put(x, self.kf_sharding)
                self.fmaps = put(self.fmaps)
                self.nets = put(self.nets)
                self.inps = put(self.inps)
                if self.fmaps_right is not None:
                    self.fmaps_right = put(self.fmaps_right)
        self.intrinsics = jnp.zeros((4,), dtype=jnp.float32)  # at 1/8 scale
        # full-resolution convex-upsampled disparities (depth_video.py:57),
        # filled by the GraphAgg path when cfg.upsample
        self.disps_up = (
            jnp.zeros((B, ht, wd), dtype=jnp.float32) if cfg.upsample else None
        )

        # host-side archival of marginalized keyframes (.pkl export path)
        self.saved_tstamps: List[float] = []
        self.saved_poses: List[np.ndarray] = []
        self.saved_disps: List[np.ndarray] = []
        self.saved_images: List[np.ndarray] = []
        # live rows [0, archive_mark) are already in the save buffers
        # (coupled marginalization archives at window advance, the
        # reference's timing, depth_video.py:336-343; the rollup archives
        # whatever retires unarchived).  Keeps rollup and the .pkl export
        # from double-counting rows in coupled runs.
        self.archive_mark = 0
        self.images_small = np.zeros((B, h8, w8, 3), dtype=np.uint8)

        self.imu_enabled = False
        self.has_depth = False  # any depth frame appended (RGB-D mode)

    # ------------------------------------------------------------------
    def append(
        self,
        tstamp: float,
        image_small: Optional[np.ndarray],
        pose: Optional[jnp.ndarray],
        disp: Optional[float],
        depth: Optional[jnp.ndarray],
        intrinsics: jnp.ndarray,
        fmap: jnp.ndarray,
        net: jnp.ndarray,
        inp: jnp.ndarray,
        fmap_right: Optional[jnp.ndarray] = None,
    ) -> int:
        """Add a keyframe at the next slot; returns its index."""
        idx = self.counter
        self.tstamp[idx] = tstamp
        if image_small is not None:
            self.images_small[idx] = image_small
        if pose is not None:
            self.poses = _set_row(self.poses, idx, pose)
        if disp is not None:
            self.disps = _set_row(
                self.disps, idx, jnp.full((self.h8, self.w8), disp, jnp.float32)
            )
        if depth is not None:
            # subsample like depth_video.py:146-147
            d8 = depth[3::8, 3::8]
            self.disps_sens = _set_row(
                self.disps_sens, idx, jnp.where(d8 > 0, 1.0 / d8, d8)
            )
            self.has_depth = True
        self.intrinsics = intrinsics
        self.fmaps, self.nets, self.inps = _set_features(
            self.fmaps, self.nets, self.inps, idx, fmap, net, inp
        )
        if fmap_right is not None and self.fmaps_right is not None:
            self.fmaps_right = _set_row(
                self.fmaps_right, idx, fmap_right.astype(jnp.bfloat16)
            )
        self.counter += 1
        return idx

    def set_pose(self, idx: int, pose: jnp.ndarray):
        self.poses = _set_row(self.poses, idx, pose)

    def set_poses_range(self, start: int, poses):
        """Write poses for frames [start, start+len) in ONE dispatch."""
        self.poses = _set_rows(
            self.poses, jnp.asarray(poses, jnp.float32),
            jnp.asarray(start, jnp.int32))

    def scale_disps(self, n: int, scale: float):
        """disps[:n] /= scale in ONE dispatch (init rescale)."""
        self.disps = _scale_rows(
            self.disps, jnp.asarray(n, jnp.int32),
            jnp.asarray(scale, jnp.float32))

    def set_disp(self, idx: int, disp: jnp.ndarray):
        self.disps = _set_row(self.disps, idx, disp)

    # ------------------------------------------------------------------
    _SHIFT_BUFFERS = ("poses", "disps", "disps_sens", "damping", "fmaps",
                      "nets", "inps", "fmaps_right", "disps_up")

    def rm_keyframe(self, ix: int):
        """Drop keyframe ``ix``, shifting slot ix+1 down (covisible_graph.py:180-195)."""
        dst = jnp.asarray(ix, jnp.int32)
        src = jnp.asarray(ix + 1, jnp.int32)
        out = _copy_row_all(
            self.poses, self.disps, self.disps_sens, self.damping,
            self.fmaps, self.nets, self.inps, self.fmaps_right, self.disps_up,
            dst, src,
        )
        (self.poses, self.disps, self.disps_sens, self.damping, self.fmaps,
         self.nets, self.inps, self.fmaps_right, self.disps_up) = out
        self.tstamp[ix] = self.tstamp[ix + 1]
        self.images_small[ix] = self.images_small[ix + 1]
        self.counter -= 1

    def copy_row(self, dst: int, src: int):
        """Copy every per-frame buffer row src -> dst (one fused dispatch
        for the device slabs).  Used by the async coupled drain to shift
        an in-flight frame below a lazily-applied cull."""
        out = _copy_row_all(
            self.poses, self.disps, self.disps_sens, self.damping,
            self.fmaps, self.nets, self.inps, self.fmaps_right, self.disps_up,
            jnp.asarray(dst, jnp.int32), jnp.asarray(src, jnp.int32),
        )
        (self.poses, self.disps, self.disps_sens, self.damping, self.fmaps,
         self.nets, self.inps, self.fmaps_right, self.disps_up) = out
        self.tstamp[dst] = self.tstamp[src]
        self.images_small[dst] = self.images_small[src]

    def archive(self, ix: int):
        """Host-side save-buffer append for a marginalized keyframe
        (depth_video.py:336-343 semantics)."""
        if not self.cfg.save_pkl:
            return
        self.saved_tstamps.append(float(self.tstamp[ix]))
        self.saved_poses.append(np.asarray(self.poses[ix]))
        self.saved_disps.append(np.asarray(self.disps[ix]))
        self.saved_images.append(self.images_small[ix].copy())
        self.archive_mark = max(self.archive_mark, ix + 1)

    def rollup(self, shift: int):
        """Shift the whole buffer down (dbaf_frontend.py:89-151).  Rows
        the coupled marginalization already archived are skipped (the
        visual path archives everything here: its window-advance has no
        archival hook, so retirement == rollup)."""
        for i in range(self.archive_mark, shift):
            self.archive(i)
        for name in self._SHIFT_BUFFERS:
            buf = getattr(self, name)
            if buf is not None:
                setattr(self, name, _roll(buf, shift))
        self.tstamp = np.roll(self.tstamp, -shift)
        self.images_small = np.roll(self.images_small, -shift, axis=0)
        self.counter -= shift
        self.archive_mark = max(self.archive_mark - shift, 0)

    # ------------------------------------------------------------------
    def distance(self, ii, jj, beta: float = 0.3) -> np.ndarray:
        d = _distance(
            self.poses,
            self.disps,
            self.intrinsics,
            jnp.asarray(ii, dtype=jnp.int32),
            jnp.asarray(jj, dtype=jnp.int32),
            beta,
        )
        return np.asarray(d)

    def reproject(self, ii, jj):
        return _reproject(
            self.poses,
            self.disps,
            self.intrinsics,
            jnp.asarray(ii, dtype=jnp.int32),
            jnp.asarray(jj, dtype=jnp.int32),
        )

    def normalize(self):
        mask = (jnp.arange(self.poses.shape[0]) < self.counter).astype(jnp.float32)
        self.poses, self.disps = _normalize(self.poses, self.disps, mask)

    def seed_next(self, idx: int):
        """Copy pose and mean disparity from slot idx-1 into idx (one jit)."""
        self.poses, self.disps = _seed_next(
            self.poses, self.disps, jnp.asarray(idx, jnp.int32)
        )

    def seed_depth(self, idx: int):
        """Seed the new frame's disparity from the depth sensor where valid
        (dbaf_frontend.py:247-248)."""
        self.disps = _seed_depth(
            self.disps, self.disps_sens, jnp.asarray(idx, jnp.int32)
        )
