"""Observability smoke tests: the reference's live monitor + cv2 debug
views (dbaf_frontend.py:76-83, 278-314; covisible_graph.py:252-307) as
flag-gated PNG dumps (dbaf_tpu/eval/monitor.py)."""

import os

import numpy as np

from dbaf_tpu.eval.monitor import Monitor


def test_monitor_unit_dumps(tmp_path):
    """Every dump method writes a PNG; gt overlay turns attitude into an
    error series."""
    rng = np.random.default_rng(0)

    def gt(t):
        T = np.eye(4)
        T[:3, 3] = [t, 0.5 * t, 0.0]
        return T

    mon = Monitor(str(tmp_path), gt_lookup=gt)
    for k in range(6):
        T = np.eye(4)
        T[:3, 3] = [k, 0.5 * k + 0.01, 0.0]
        mon.record_keyframe(float(k), T, gyro_bias=[1e-4, -1e-4, 0.0])
    p = mon.dump_summary()
    assert os.path.exists(p) and os.path.getsize(p) > 0
    assert len(mon.pos_ref) == 6
    assert np.max(np.abs(np.asarray(mon.att))) < 1.0  # error, not attitude

    p = mon.dump_disparity(rng.uniform(0, 1, (8, 16)))
    assert os.path.exists(p)
    p = mon.dump_flow_weight(
        rng.integers(0, 255, (8, 16, 3)).astype(np.uint8),
        rng.uniform(0, 10, (8, 16, 2)),
        rng.uniform(0, 10, (8, 16, 2)),
        rng.uniform(0, 1, (8, 16, 2)),
    )
    assert os.path.exists(p)
    p = mon.dump_covisible(
        rng.normal(size=(6, 3)), np.array([0, 1, 2]), np.array([3, 4, 5]),
        np.array([0]), np.array([2]),
    )
    assert os.path.exists(p)
    # counters advance
    assert mon.dump_summary() != p


def test_monitor_system_smoke(tmp_path):
    """A monitor-enabled synthetic run produces the per-rollup summary and
    the per-rollup debug views."""
    from test_slam_e2e import make_cfg, run_system

    cfg = make_cfg(rollup_start=10, rollup_shift=4,
                   monitor_dir=str(tmp_path))
    h, _ = run_system(14, cfg)
    assert h.frontend.monitor is not None
    assert h.frontend.rollup_count >= 1
    files = os.listdir(tmp_path)
    for stem in ("monitor_", "disparity", "flow_weight", "covisible"):
        assert any(f.startswith(stem) for f in files), (stem, files)


def test_visualize_animation_frames(tmp_path):
    """Headless animation viewer: accumulating per-keyframe PNG frames
    with the chase camera (reference animation parity,
    check_reconstruction_tumvi_animation.py:73-126)."""
    import numpy as np
    from dbaf_tpu.eval.visualize import animate_matplotlib

    rng = np.random.default_rng(0)
    cams, points = {}, {}
    for k in range(5):
        T = np.eye(4)
        T[:3, 3] = [0.3 * k, 0.0, 0.0]
        cams[k] = T
        points[k] = dict(
            pts=rng.normal(size=(50, 3)) + T[:3, 3],
            clr=rng.random((50, 3)),
        )
    recon = {"cameras": cams, "points": points}
    out = tmp_path / "anim"
    frames = animate_matplotlib(recon, str(out), stride=2)
    assert len(frames) == 3
    for f in frames:
        assert (out / f.split("/")[-1]).stat().st_size > 1000
