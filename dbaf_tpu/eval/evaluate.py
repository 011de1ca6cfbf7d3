"""Trajectory evaluation CLI (the evo-based evaluation_scripts equivalent).

Reference protocol (/root/reference/evaluation_scripts/evaluate_tumvi.py:156-178):
associate by timestamp, SE3-Umeyama align on the starting segment (up to the
first >100 s ground-truth gap; scale correction only for visual-only runs),
then report metric-scale ATE RMSE over the full overlap.

Usage:
    python -m dbaf_tpu.eval.evaluate est.txt gt.txt [--scale] [--max_dt 0.01]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from .ate import associate, umeyama
from .traj_io import read_tum


def evaluate(est: np.ndarray, ref: np.ndarray, correct_scale: bool = False,
             max_dt: float = 0.01, gap: float = 100.0) -> dict:
    ei, ri = associate(est[:, 0], ref[:, 0], max_dt)
    if len(ei) < 3:
        return {"ate_rmse": float("inf"), "matched": int(len(ei))}
    p_est = est[ei, 1:4]
    p_ref = ref[ri, 1:4]
    t_ref = ref[ri, 0]

    # starting segment up to the first large ground-truth gap
    gaps = np.nonzero(np.diff(t_ref) > gap)[0]
    n_align = int(gaps[0]) - 1 if len(gaps) else len(p_ref)
    n_align = max(n_align, 3)

    s, R, t = umeyama(p_est[:n_align], p_ref[:n_align],
                      with_scale=correct_scale)
    aligned = p_est @ (s * R).T + t

    # second pass: SE3-only alignment over the full overlap, metric scale
    s2, R2, t2 = umeyama(aligned, p_ref, with_scale=False)
    final = aligned @ R2.T + t2
    err = np.linalg.norm(final - p_ref, axis=1)
    return {
        "ate_rmse": float(np.sqrt(np.mean(err**2))),
        "ate_mean": float(err.mean()),
        "ate_max": float(err.max()),
        "matched": int(len(ei)),
        "align_scale": float(s),
        "n_to_align": int(n_align),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("ref")
    ap.add_argument("--scale", action="store_true",
                    help="allow scale in the first alignment (visual-only)")
    ap.add_argument("--max_dt", type=float, default=0.01)
    args = ap.parse_args(argv)
    est = read_tum(args.est)
    ref = read_tum(args.ref)
    print(json.dumps(evaluate(est, ref, args.scale, args.max_dt)))


if __name__ == "__main__":
    main()
