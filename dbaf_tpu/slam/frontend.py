"""Frontend driver: initialization, per-keyframe update, culling, rollup.

Visual-only redesign of /root/reference/dbaf/dbaf_frontend.py:16-863 (the
multi-sensor coupling lands in :mod:`dbaf_tpu.fusion`; the hooks here --
``imu_enabled`` flag, pose seeding callback -- mirror the reference's
integration points).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..utils.config import DBAFusionConfig
from .graph import CovisibleGraph
from .video import DepthVideo


class Frontend:
    def __init__(
        self,
        video: DepthVideo,
        graph: CovisibleGraph,
        cfg: DBAFusionConfig,
    ):
        self.video = video
        self.graph = graph
        self.cfg = cfg

        fc = cfg.frontend
        gc = cfg.graph
        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0
        self.warmup = fc.warmup
        self.iters1 = fc.iters1
        self.iters2 = fc.iters2
        self.max_age = gc.max_age
        self.active_window = fc.active_window
        self.keyframe_thresh = fc.keyframe_thresh
        self.beta = gc.beta

        # trajectory log: (tstamp, Twc 7-vec) per keyframe update
        self.trajectory: List[Tuple[float, np.ndarray]] = []
        self.did_rollup = False

    # ------------------------------------------------------------------
    def __call__(self):
        if not self.is_initialized and self.video.counter == self.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()

    # ------------------------------------------------------------------
    def _initialize(self):
        """dbaf_frontend.py:816-851 (visual-only rounds)."""
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        self.graph.update(1, use_inactive=True, rounds=self.cfg.frontend.init_iters)

        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=self.cfg.graph.frontend_thresh,
            beta=self.beta, remove=False,
        )
        self.graph.update(
            1, use_inactive=True, rounds=2 * self.cfg.frontend.init_iters
        )

        # seed next slot (dbaf_frontend.py:843-845)
        self.video.set_pose(self.t1, self.video.poses[self.t1 - 1])
        mean_disp = jnp.mean(self.video.disps[self.t1 - 4 : self.t1])
        self.video.set_disp(
            self.t1,
            jnp.full((self.video.h8, self.video.w8), mean_disp, jnp.float32),
        )
        self.is_initialized = True
        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)

    # ------------------------------------------------------------------
    def _update(self):
        """dbaf_frontend.py:153-375 (visual-only path)."""
        self.count += 1
        self.t1 += 1
        fc = self.cfg.frontend

        # edge lifecycle (dbaf_frontend.py:233-239)
        if self.graph.n > 0:
            stale = (self.graph.age > self.max_age) & (
                (self.graph.ii < self.t1 - self.active_window)
                | (self.graph.jj < self.t1 - self.active_window)
            )
            self.graph.rm_factors(stale, store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5,
            max(self.t1 - self.cfg.graph.frontend_window, 0),
            rad=self.cfg.graph.frontend_radius,
            nms=self.cfg.graph.frontend_nms,
            thresh=self.cfg.graph.frontend_thresh,
            beta=self.beta,
            remove=True,
        )

        self.graph.update(None, None, use_inactive=True, rounds=self.iters1)

        # rollup (dbaf_frontend.py:253-257)
        self.did_rollup = False
        if self.t1 > fc.rollup_start:
            roll = fc.rollup_shift
            self.video.rollup(roll)
            self.graph.shift_indices(roll)
            self.t1 -= roll
            self.count -= roll
            self.did_rollup = True

        # trajectory output (camera-to-world)
        cur_t = float(self.video.tstamp[self.t1 - 1])
        Twc = np.asarray(lie.se3_inv(self.video.poses[self.t1 - 1]))
        self.trajectory.append((cur_t, Twc))

        # keyframe cull decision (dbaf_frontend.py:317-353)
        d = float(
            self.video.distance([self.t1 - 3], [self.t1 - 2], beta=self.beta)[0]
        )
        if d < self.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 2)
            self.t1 -= 1
        else:
            self.graph.update(None, None, use_inactive=True, rounds=self.iters2)

        # seed next slot (dbaf_frontend.py:371-373)
        self.video.set_pose(self.t1, self.video.poses[self.t1 - 1])
        mean_disp = jnp.mean(self.video.disps[self.t1 - 1])
        self.video.set_disp(
            self.t1,
            jnp.full((self.video.h8, self.video.w8), mean_disp, jnp.float32),
        )
