"""Shared streaming runner for the dataset demos."""

from __future__ import annotations

import json
from typing import Iterable, Optional

from ..eval.ate import evaluate_trajectory
from ..eval.traj_io import write_tum
from ..slam.system import DBAFusion
from ..utils.jax_setup import setup as _jax_setup

_jax_setup()


def run(
    system: DBAFusion,
    stream: Iterable,
    result_path: Optional[str] = None,
    pkl_path: Optional[str] = None,
    gt_path: Optional[str] = None,
    max_frames: Optional[int] = None,
) -> dict:
    """Track a stream; write the TUM trajectory, optional reconstruction,
    optional ATE vs ground truth."""
    n = 0
    try:
        for t, image, intrinsics in stream:
            system.track(t, image, intrinsics=intrinsics)
            n += 1
            if max_frames is not None and n >= max_frames:
                break
    except KeyboardInterrupt:
        pass
    finally:
        traj = system.terminate()
        if result_path:
            ecef = system.trajectory_ecef
            if ecef:
                # reference row format once georeferenced: the 8 TUM fields
                # + 3 ECEF fields (dbaf_frontend.py:270-272)
                rows = [
                    list(r) + list(ecef[k]) if k in ecef else list(r)
                    for k, r in enumerate(traj)
                ]
                write_tum(result_path, rows)
            else:
                write_tum(result_path, traj)
        if pkl_path and system.cfg.save_pkl:
            from ..eval.export import save_reconstruction

            save_reconstruction(system, pkl_path)

    out = {"frames": n, "keyframes": int(len(traj))}
    if gt_path and len(traj) > 3:
        from ..eval.traj_io import read_tum

        ref = read_tum(gt_path)
        out.update(evaluate_trajectory(traj, ref, align="se3"))
    print(json.dumps(out))
    return out
