"""Reconstruction viewers for exported .pkl point clouds.

Capability of the reference's Open3D check scripts
(/root/reference/visualization/check_reconstruction_*.py:53-101): per-
keyframe point clouds with height/color/depth masks plus camera frusta.
Uses Open3D when available, otherwise a matplotlib 3D fallback (Open3D is
not part of the baked TPU image).

Usage:
    python -m dbaf_tpu.eval.visualize reconstruction.pkl [--out view.png]
"""

from __future__ import annotations

import argparse
import pickle
from typing import Optional

import numpy as np


def load_reconstruction(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def merge_points(recon: dict, max_points: int = 500000,
                 z_clip: Optional[float] = None):
    pts_all, clr_all = [], []
    for k, entry in recon["points"].items():
        pts = np.asarray(entry["pts"])
        clr = np.asarray(entry["clr"])
        if len(pts) == 0:
            continue
        if z_clip is not None:
            m = pts[:, 2] < z_clip
            pts, clr = pts[m], clr[m]
        pts_all.append(pts)
        clr_all.append(clr)
    if not pts_all:
        return np.zeros((0, 3)), np.zeros((0, 3))
    pts = np.concatenate(pts_all)
    clr = np.concatenate(clr_all)
    if len(pts) > max_points:
        sel = np.random.default_rng(0).choice(len(pts), max_points, replace=False)
        pts, clr = pts[sel], clr[sel]
    return pts, clr


def camera_frustum(T: np.ndarray, scale: float = 0.1) -> np.ndarray:
    """5 points of a camera frustum wireframe in world coords."""
    c = np.zeros(3)
    corners = scale * np.array(
        [[-1, -0.75, 1.5], [1, -0.75, 1.5], [1, 0.75, 1.5], [-1, 0.75, 1.5]]
    )
    pts = np.vstack([c, corners])
    return pts @ T[:3, :3].T + T[:3, 3]


def view_matplotlib(recon: dict, out: Optional[str] = None):
    import matplotlib

    if out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts, clr = merge_points(recon)
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=np.clip(clr, 0, 1),
                   s=0.5, linewidths=0)
    for k, T in recon["cameras"].items():
        f = camera_frustum(np.asarray(T))
        for i in range(1, 5):
            ax.plot(*zip(f[0], f[i]), c="r", lw=0.5)
    ax.set_box_aspect((1, 1, 1))
    if out:
        fig.savefig(out, dpi=150)
        print(f"saved {out}")
    else:
        plt.show()


def view_open3d(recon: dict):  # pragma: no cover - optional dep
    import open3d as o3d

    pts, clr = merge_points(recon)
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(pts)
    pcd.colors = o3d.utility.Vector3dVector(np.clip(clr, 0, 1))
    geoms = [pcd]
    for k, T in recon["cameras"].items():
        frame = o3d.geometry.TriangleMesh.create_coordinate_frame(size=0.1)
        frame.transform(np.asarray(T))
        geoms.append(frame)
    o3d.visualization.draw_geometries(geoms)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pkl")
    ap.add_argument("--out", default=None, help="save a PNG instead of showing")
    args = ap.parse_args(argv)
    recon = load_reconstruction(args.pkl)
    try:
        if args.out is None:
            view_open3d(recon)
            return
    except ImportError:
        pass
    view_matplotlib(recon, args.out)


if __name__ == "__main__":
    main()
