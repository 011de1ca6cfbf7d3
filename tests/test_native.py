"""Native graph-scheduler tests: C++ edge selection vs the Python fallback."""

import numpy as np
import jax.numpy as jnp
import pytest

from dbaf_tpu.ops import lie
from dbaf_tpu.slam.graph import CovisibleGraph
from dbaf_tpu.slam.video import DepthVideo
from dbaf_tpu.utils import native
from dbaf_tpu.utils.config import DBAFusionConfig, GraphConfig


def _noop_update(net, inp, corr, motn, ii, jj, aux):
    return net, jnp.zeros(motn.shape[:-1] + (2,)), jnp.ones(motn.shape[:-1] + (2,))


def make_video(rng, n=12, h8=8, w8=16):
    cfg = DBAFusionConfig(
        image_size=(8 * h8, 8 * w8), buffer=32,
        graph=GraphConfig(max_factors=24, edge_capacity=64,
                          inactive_capacity=64),
    )
    video = DepthVideo(cfg)
    pose = np.asarray(lie.se3_identity())
    for k in range(n):
        xi = np.concatenate([rng.normal(size=3) * 0.12, rng.normal(size=3) * 0.04])
        pose = np.asarray(
            lie.se3_mul(lie.se3_exp(jnp.asarray(xi, jnp.float32)), jnp.asarray(pose))
        )
        video.append(
            float(k), None, jnp.asarray(pose), float(rng.uniform(0.5, 1.0)),
            None, jnp.asarray([2.0 * w8, 2.0 * w8, w8 / 2, h8 / 2], jnp.float32),
            jnp.zeros((h8, w8, 128), jnp.bfloat16),
            jnp.zeros((h8, w8, 128), jnp.bfloat16),
            jnp.zeros((h8, w8, 128), jnp.bfloat16),
        )
    return cfg, video


def test_native_library_builds():
    assert native.get_lib() is not None, "g++ build of graphops failed"


def test_native_matches_python_selection(rng, monkeypatch):
    cfg, video = make_video(rng)

    g_native = CovisibleGraph(video, _noop_update, cfg)
    g_native.add_proximity_factors(0, 0, rad=2, nms=2, thresh=16.0)
    native_edges = set(zip(g_native.ii.tolist(), g_native.jj.tolist()))
    assert native.get_lib() is not None

    g_py = CovisibleGraph(video, _noop_update, cfg)
    monkeypatch.setattr(native, "select_proximity_edges",
                        lambda *a, **k: None)
    g_py.add_proximity_factors(0, 0, rad=2, nms=2, thresh=16.0)
    py_edges = set(zip(g_py.ii.tolist(), g_py.jj.tolist()))

    assert native_edges == py_edges


def test_dedup_edges(rng):
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native lib")
    import ctypes

    ii = np.array([1, 2, 2, 3, 4], dtype=np.int64)
    jj = np.array([0, 1, 1, 2, 3], dtype=np.int64)
    ex_i = np.array([3], dtype=np.int64)
    ex_j = np.array([2], dtype=np.int64)
    out = np.empty(5, dtype=np.int32)
    n = lib.dedup_edges(
        ii.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        jj.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        5,
        ex_i.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ex_j.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    # (2,1) duplicate dropped, (3,2) exists -> keep indices 0, 1, 4
    assert n == 3
    assert out[:n].tolist() == [0, 1, 4]
