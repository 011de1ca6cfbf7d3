"""The reference's headline outputs ride the flagship coupled pipeline
(VERDICT r4 missing #2): dense-mapping archival (save_pkl) and IMU-rate
high-frequency trajectory rows must no longer force the synchronous
fallback, and must match the synchronous flow.

save_pkl: the step kernel emits the rows an in-kernel rollup retires
(coupled_async.py roll_out); the host archives them lazily at the next
lagged drain.  Equivalence: the full export input sequence (archived
rows + live tail) matches the synchronous run's frame for frame.

IMU-rate rows (reference dbaf_frontend.py:169-186): propagated from
host mirrors that lag the device solve by ONE keyframe; rows must agree
with the sync flow to the documented staleness bound.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_coupled_async import _gt_arrays
from tests.test_slam_multisensor import FPS, MsHarness, make_cfg


def _run(coupled_async, n_frames, arrays, save_pkl=False, all_stamp=None,
         rollup_start=1000, rollup_shift=8, keyframe_thresh=-1.0,
         translation_threshold=-1.0):
    imu_rows, poses_at, intr, gt_cw, gt_disps = arrays
    cfg = make_cfg(vi_warmup=12, keyframe_thresh=keyframe_thresh,
                   rollup_start=rollup_start, rollup_shift=rollup_shift)
    cfg.frontend.translation_threshold = translation_threshold
    cfg.sensors.device_solver = True
    cfg.sensors.coupled_mega = True
    cfg.sensors.coupled_async = coupled_async
    cfg.save_pkl = save_pkl
    h = MsHarness(cfg, jnp.asarray(gt_cw), jnp.asarray(gt_disps), intr,
                  imu_rows)
    if all_stamp is not None:
        h.frontend.set_multisensor(imu_rows, all_stamp=all_stamp,
                                   visual_only=False)
    for k in range(n_frames):
        h.feed(k)
    h.frontend.drain_async()
    return h


def _export_inputs(h):
    """The chronological frame sequence save_reconstruction would export:
    archived rows then the not-yet-archived live tail."""
    v = h.video
    t1 = h.frontend.t1
    lo = v.archive_mark
    stamps = np.asarray(v.saved_tstamps + list(v.tstamp[lo:t1]))
    poses = np.asarray(
        v.saved_poses + [np.asarray(v.poses[i]) for i in range(lo, t1)])
    disps = np.asarray(
        v.saved_disps + [np.asarray(v.disps[i]) for i in range(lo, t1)])
    return stamps, poses, disps


@pytest.mark.slow
def test_save_pkl_rides_flagship_pipeline(tmp_path):
    """save_pkl + in-pipeline rollups: the pipeline must stay active and
    the export inputs must match the synchronous run frame for frame."""
    n = 34
    arrays = _gt_arrays(n)
    kw = dict(save_pkl=True, rollup_start=22, rollup_shift=8)
    h_a = _run(True, n, arrays, **kw)
    h_s = _run(False, n, arrays, **kw)

    ca = h_a.frontend._casync
    assert ca is not None and ca.total_steps >= 4, \
        getattr(ca, "total_steps", None)
    # save_pkl no longer forces the sync fallback, and rollups stayed
    # in-pipeline (no drain/re-enter)
    assert ca.steps == ca.total_steps, (ca.steps, ca.total_steps)
    assert h_a.frontend.rollup_count >= 1
    assert h_a.frontend.rollup_count == h_s.frontend.rollup_count

    # the async run actually archived through the kernel roll_out path
    # (the roll retires rollup_shift rows per roll; a pre-activation sync
    # marginalization may have archived a prefix of them already)
    assert len(h_a.video.saved_tstamps) > 0
    assert not h_a.frontend._casync._pending_archive  # all resolved

    st_a, po_a, di_a = _export_inputs(h_a)
    st_s, po_s, di_s = _export_inputs(h_s)
    # every kept keyframe exported exactly once, in order, in both modes
    np.testing.assert_array_equal(st_a, st_s)
    assert len(np.unique(st_a)) == len(st_a)
    np.testing.assert_allclose(po_a[:, :3], po_s[:, :3], atol=5e-2)
    np.testing.assert_allclose(di_a, di_s, atol=2e-2)

    # the full export runs (filtered + raw .pkl)
    from dbaf_tpu.eval.export import save_reconstruction

    out = str(tmp_path / "recon.pkl")
    save_reconstruction(h_a, out)
    import pickle

    with open(out, "rb") as f:
        d = pickle.load(f)
    assert len(d["points"]) == len(st_a)
    assert len(d["cameras"]) == len(st_a)


@pytest.mark.slow
def test_save_pkl_flagship_with_culls():
    """Culled keyframes must never be archived, and the export sequence
    still matches sync when in-kernel culls interleave with rollups."""
    n = 36
    arrays = _gt_arrays(n)
    kw = dict(save_pkl=True, rollup_start=22, rollup_shift=8,
              keyframe_thresh=0.05, translation_threshold=0.35)
    h_a = _run(True, n, arrays, **kw)
    h_s = _run(False, n, arrays, **kw)
    ca = h_a.frontend._casync
    assert ca is not None and ca.total_steps >= 4
    assert ca.culls >= 1, ca.culls

    st_a, po_a, di_a = _export_inputs(h_a)
    st_s, po_s, di_s = _export_inputs(h_s)
    np.testing.assert_array_equal(st_a, st_s)
    assert len(np.unique(st_a)) == len(st_a)
    np.testing.assert_allclose(po_a[:, :3], po_s[:, :3], atol=5e-2)
    np.testing.assert_allclose(di_a, di_s, atol=2e-2)


@pytest.mark.slow
def test_imu_rate_output_rides_flagship_pipeline():
    """all_stamp no longer forces the sync fallback; IMU-rate rows match
    the synchronous flow to the one-keyframe mirror-staleness bound."""
    n = 28
    arrays = _gt_arrays(n)
    # full-rate stamps at 30 Hz between the 10 Hz keyframes
    stamps = np.asarray([[k / 30.0] for k in range(int(n / FPS * 30))])
    h_a = _run(True, n, arrays, all_stamp=stamps)
    h_s = _run(False, n, arrays, all_stamp=stamps)

    ca = h_a.frontend._casync
    assert ca is not None and ca.total_steps >= 5, \
        getattr(ca, "total_steps", None)

    rows_a = [(t, np.asarray(p, np.float64))
              for t, p in h_a.frontend.trajectory]
    rows_s = [(t, np.asarray(p, np.float64))
              for t, p in h_s.frontend.trajectory]
    t_a = np.asarray([t for t, _ in rows_a])
    t_s = np.asarray([t for t, _ in rows_s])
    # identical row schedule: keyframe rows + the same high-freq stamps
    np.testing.assert_allclose(t_a, t_s, atol=1e-9)
    # high-frequency rows actually present (strictly between keyframes)
    frac = np.abs(t_a * FPS - np.round(t_a * FPS))
    n_hf = int(np.sum(frac > 1e-6))
    assert n_hf >= 10, n_hf

    p_a = np.stack([p[:3] for _, p in rows_a])
    p_s = np.stack([p[:3] for _, p in rows_s])
    # documented staleness: async high-freq rows propagate from mirrors
    # one solve older than sync's -- bounded, small on this scene
    np.testing.assert_allclose(p_a, p_s, atol=5e-2)
    hf = frac > 1e-6
    assert np.mean(np.linalg.norm(p_a[hf] - p_s[hf], axis=1)) < 2e-2
