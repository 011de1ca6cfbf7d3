"""System facade: wires network, video, filter, graph, and frontend.

The TPU counterpart of /root/reference/dbaf/dbaf.py:16-140.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import DroidNet
from ..models.convert import load_droid_weights
from ..utils.config import DBAFusionConfig
from .frontend import Frontend
from .graph import CovisibleGraph
from .motion_filter import MotionFilter
from .video import DepthVideo


def _model_fns(cfg: DBAFusionConfig, params):
    """Build jitted feature/context/update callables from DroidNet params."""
    model = DroidNet()

    @jax.jit
    def feat_fn(images):
        return model.apply({"params": params}, images, method=model.features_only)

    @jax.jit
    def ctx_fn(images):
        return model.apply({"params": params}, images, method=model.context_only)

    def update_fn(net, inp, corr, motn, ii, jj, aux):
        net_new, delta, weight, _, _ = model.apply(
            {"params": params}, None, net, inp, corr, motn
        )
        return net_new, delta, weight

    agg_fn = None
    if cfg.upsample and "agg" in params.get("update", {}):
        from ..models.net import GraphAgg

        agg_mod = GraphAgg()

        def agg_fn(net, ii, num_frames):
            return agg_mod.apply(
                {"params": params["update"]["agg"]}, net, ii, num_frames
            )

    return feat_fn, ctx_fn, update_fn, agg_fn


class DBAFusion:
    """Streaming VIO system: feed frames via :meth:`track`.

    ``update_fn``/``feat_fn``/``ctx_fn`` may be injected (e.g. synthetic
    oracles for tests); by default they come from DroidNet with converted
    TartanAir weights (cfg.weights_path).
    """

    def __init__(
        self,
        cfg: DBAFusionConfig,
        params=None,
        feat_fn: Optional[Callable] = None,
        ctx_fn: Optional[Callable] = None,
        update_fn: Optional[Callable] = None,
    ):
        self.cfg = cfg
        self.video = DepthVideo(cfg)

        agg_fn = None
        if update_fn is None or feat_fn is None or ctx_fn is None:
            if params is None:
                if cfg.weights_path is None:
                    raise ValueError(
                        "need weights_path/params or injected feat/ctx/update fns"
                    )
                params = load_droid_weights(cfg.weights_path)
            f, c, u, agg_fn = _model_fns(cfg, params)
            feat_fn = feat_fn or f
            ctx_fn = ctx_fn or c
            update_fn = update_fn or u

        self.graph = CovisibleGraph(self.video, update_fn, cfg)
        self.graph.agg_fn = agg_fn
        self.filter = MotionFilter(self.video, cfg, feat_fn, ctx_fn, update_fn)
        self.frontend = Frontend(self.video, self.graph, cfg)
        # the motion-gate pull carries deferred update-kernel scalars
        self.filter.frontend = self.frontend
        self._async = None
        if getattr(cfg.frontend, "async_pipeline", False) and \
                not getattr(cfg.frontend, "monitor_dir", ""):
            # the monitor needs per-keyframe host state: stay synchronous
            from .async_pipeline import AsyncPipeline

            self._async = AsyncPipeline(self)

    def set_multisensor(
        self,
        all_imu,
        Tbc,
        all_gnss=None,
        all_odo=None,
        all_stamp=None,
        tbg=None,
        ten0=None,
        imu_noise=None,
        visual_only: bool = False,
    ):
        """Enable tightly-coupled fusion (the dbaf.py demo setup surface:
        extrinsics + sensor streams + noise, demo_vio_whu.py:190-211).

        Tbc: 4x4 body<-camera extrinsic; tbg: GNSS lever arm (body);
        ten0: ECEF reference for GNSS; imu_noise: (acc, gyro, acc_walk,
        gyro_walk) sigmas.
        """
        from ..fusion.se3np import Pose
        from .coupled import MultiSensorBA

        coupled = MultiSensorBA(self.video, self.cfg)
        coupled.Tbc = Pose.from_matrix(np.asarray(Tbc, float))
        if tbg is not None:
            coupled.tbg = np.asarray(tbg, float)
        if ten0 is not None:
            coupled.ten0 = np.asarray(ten0, float)
        if imu_noise is not None:
            coupled.state.set_imu_params(imu_noise)
        self.graph.coupled = coupled
        self.frontend.set_multisensor(
            all_imu, all_gnss, all_odo, all_stamp, visual_only=visual_only
        )
        return coupled

    def track(
        self,
        tstamp: float,
        image: np.ndarray,
        depth: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
        image_right: Optional[np.ndarray] = None,
    ):
        """Feed one frame (dbaf.py:50-58)."""
        if self._async is not None:
            if self._async.active:
                self._async.track(tstamp, image)
                return
            if self._async.can_activate():
                self._async.activate()
                self._async.track(tstamp, image)
                return
        self.filter.track(tstamp, image, depth, intrinsics, image_right)
        self.frontend()

    @property
    def trajectory(self):
        return self.frontend.trajectory

    @property
    def trajectory_ecef(self):
        """ECEF positions keyed by trajectory row index (rows written after
        GNSS init; dbaf_frontend.py:270-272)."""
        return self.frontend.trajectory_ecef

    # ------------------------------------------------------------------
    _VIDEO_ARRAYS = (
        "poses", "disps", "disps_sens", "damping", "fmaps", "nets", "inps",
        "fmaps_right", "disps_up", "intrinsics",
    )
    _GRAPH_HOST = ("ii", "jj", "age", "ii_inac", "jj_inac", "ii_bad", "jj_bad")

    def save_state(self, path: str):
        """Snapshot the full streaming state for resume/debug (the
        checkpointing capability SURVEY.md 5.4 calls for; the reference has
        none)."""
        import pickle

        import jax.numpy as jnp

        v, g, fe = self.video, self.graph, self.frontend
        fe.drain_async()  # finish any deferred device-side steps
        g._flush()  # apply pending edge permutations before snapshotting
        state = {
            "video": {
                name: (None if getattr(v, name) is None
                       else np.asarray(getattr(v, name)))
                for name in self._VIDEO_ARRAYS
            },
            "video_host": {
                "tstamp": v.tstamp.copy(),
                "images_small": v.images_small.copy(),
                "counter": v.counter,
                "saved": (v.saved_tstamps, v.saved_poses, v.saved_disps,
                          v.saved_images),
                "imu_enabled": v.imu_enabled,
            },
            "graph": {name: getattr(g, name).copy() for name in self._GRAPH_HOST},
            "graph_dev": {
                "net": np.asarray(g.edges.net),
                "target": np.asarray(g.edges.target),
                "weight": np.asarray(g.edges.weight),
                "t_inac": np.asarray(g.t_inac),
                "w_inac": np.asarray(g.w_inac),
            },
            "frontend": {
                "t0": fe.t0, "t1": fe.t1, "count": fe.count,
                "is_initialized": fe.is_initialized,
                "trajectory": fe.trajectory,
                "cur_imu_ii": fe.cur_imu_ii, "cur_stamp_ii": fe.cur_stamp_ii,
            },
            "coupled": self.graph.coupled,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_state(self, path: str):
        import pickle

        import jax.numpy as jnp

        with open(path, "rb") as f:
            state = pickle.load(f)
        v, g, fe = self.video, self.graph, self.frontend
        for name, arr in state["video"].items():
            if arr is not None:
                dtype = getattr(v, name).dtype
                setattr(v, name, jnp.asarray(arr, dtype))
        vh = state["video_host"]
        v.tstamp = vh["tstamp"]
        v.images_small = vh["images_small"]
        v.counter = vh["counter"]
        (v.saved_tstamps, v.saved_poses, v.saved_disps, v.saved_images) = vh["saved"]
        v.imu_enabled = vh["imu_enabled"]
        for name, arr in state["graph"].items():
            setattr(g, name, arr)
        gd = state["graph_dev"]
        from .graph import EdgeArrays

        g.edges = EdgeArrays(
            jnp.asarray(gd["net"], jnp.bfloat16),
            jnp.asarray(gd["target"], jnp.float32),
            jnp.asarray(gd["weight"], jnp.float32),
        )
        g.t_inac = jnp.asarray(gd["t_inac"], jnp.float32)
        g.w_inac = jnp.asarray(gd["w_inac"], jnp.float32)
        for k, val in state["frontend"].items():
            setattr(fe, k, val)
        if state["coupled"] is not None:
            coupled = state["coupled"]
            coupled.video = self.video
            g.coupled = coupled

    def terminate(self):
        """Flush state; returns the keyframe trajectory as (N, 8) array
        ``[t, x, y, z, qx, qy, qz, qw]`` (camera-to-world).

        Device-resident rows (the visual path defers pulls) are fetched in
        one batched transfer here."""
        import jax.numpy as jnp

        if self._async is not None and self._async.active:
            self._async.sync()
        self.frontend.drain_async()
        traj = self.frontend.trajectory
        if not traj:
            return np.zeros((0, 8))
        dev_idx = [k for k, (_, p) in enumerate(traj) if not isinstance(p, np.ndarray)]
        pulled = {}
        if dev_idx:
            stacked = np.asarray(jnp.stack([traj[k][1] for k in dev_idx]))
            pulled = {k: stacked[i] for i, k in enumerate(dev_idx)}
        rows = []
        for k, (t, p) in enumerate(traj):
            arr = pulled.get(k, p)
            rows.append(np.concatenate([[t], np.asarray(arr)]))
        # georeferenced runs: backfill ECEF rows for keyframes whose
        # trajectory row stayed on device (the async coupled pipeline
        # writes device 7-vecs; the sync flow writes ECEF eagerly,
        # frontend._write_traj_row)
        coupled = getattr(self.frontend, "coupled", None)
        if coupled is not None and getattr(coupled, "gnss_init_t1", -1) > 0 \
                and coupled.ten0 is not None:
            from ..utils import geodesy

            Cen = geodesy.Cen(coupled.ten0)
            ecef = self.frontend.trajectory_ecef
            for k in pulled:
                if k not in ecef:
                    ecef[k] = coupled.ten0 + Cen @ np.asarray(
                        rows[k][1:4], np.float64)
        return np.asarray(rows)
