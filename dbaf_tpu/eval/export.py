"""Dense reconstruction export: filtered + raw keyframe point clouds.

Capability of the reference's ``save_vis_easy``
(/root/reference/dbaf/dbaf.py:64-140): back-project archived keyframes,
multi-view depth-consistency filter, disparity floor mask, pickle as
{points, cameras, stamps} for the Open3D viewers.
"""

from __future__ import annotations

import pickle
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie, lie_np, projective as pj


@jax.jit
def _points_and_counts(poses, disps, intrinsics, thresh):
    Twc = lie.se3_inv(poses)
    points = pj.iproj_points(Twc, disps, intrinsics)
    ix = jnp.arange(poses.shape[0])
    count = pj.depth_consistency_count(poses, disps, intrinsics, ix, thresh)
    return points, count


def build_reconstruction(
    tstamps: np.ndarray,
    poses: np.ndarray,
    disps: np.ndarray,
    images_small: np.ndarray,
    intrinsics: np.ndarray,
    filtered: bool = True,
) -> Dict:
    """poses: (N, 7) Tcw; disps: (N, H, W); images_small: (N, H, W, 3) BGR.

    filtered=True applies the reference's strict mask (count>=1 and
    median-scaled threshold, dbaf.py:77-89); False is the permissive raw
    variant (:121-126).
    """
    N = len(tstamps)
    if N == 0:
        return {"points": {}, "cameras": {}, "stamps": {}}
    poses_j = jnp.asarray(poses, jnp.float32)
    disps_j = jnp.asarray(disps, jnp.float32)
    intr = jnp.asarray(intrinsics, jnp.float32)

    mean_d = disps.reshape(N, -1).mean(axis=1)
    if filtered:
        thresh = 0.4 * np.ones(N) / 4.0 / max(np.median(mean_d), 1e-8)
    else:
        thresh = 0.4 * np.ones(N)
    points, count = _points_and_counts(
        poses_j, disps_j, intr, jnp.asarray(thresh, jnp.float32)
    )
    points = np.asarray(points)
    count = np.asarray(count)

    min_count = 1 if filtered else 0
    mpoints, mcameras, mstamps = {}, {}, {}
    for i in range(N):
        Twc = lie_np.se3_matrix(
            lie_np.se3_inv(np.asarray(poses[i], np.float64)))
        mask = (count[i] >= min_count) & (disps[i] > 0.5 * mean_d[i])
        mask = mask.reshape(-1)
        pts = points[i].reshape(-1, 3)[mask]
        clr = (images_small[i].reshape(-1, 3)[mask][:, ::-1] / 255.0)
        mcameras[i] = Twc
        mpoints[i] = {"pts": pts, "clr": clr, "disp": disps[i],
                      "rgb": images_small[i]}
        mstamps[i] = float(tstamps[i])
    return {"points": mpoints, "cameras": mcameras, "stamps": mstamps}


def save_reconstruction(system, path: str):
    """Export filtered + raw .pkl files from a DBAFusion system's archived
    keyframes (requires cfg.save_pkl)."""
    v = system.video
    n_live = system.frontend.t1
    lo = v.archive_mark  # live rows below it are already archived
    tstamps = np.asarray(
        v.saved_tstamps + list(v.tstamp[lo:n_live])
    )
    poses = np.asarray(
        v.saved_poses + [np.asarray(v.poses[i]) for i in range(lo, n_live)]
    )
    disps = np.asarray(
        v.saved_disps + [np.asarray(v.disps[i]) for i in range(lo, n_live)]
    )
    images = np.asarray(
        v.saved_images + [v.images_small[i] for i in range(lo, n_live)]
    )
    intr = np.asarray(v.intrinsics)

    for filtered, suffix in ((True, ""), (False, "_raw")):
        d = build_reconstruction(tstamps, poses, disps, images, intr, filtered)
        out = path if not suffix else path.rsplit(".", 1)[0] + suffix + ".pkl"
        with open(out, "wb") as f:
            pickle.dump(d, f)
