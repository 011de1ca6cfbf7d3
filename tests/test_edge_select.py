"""Device edge selection must bit-match the host scheduler.

The async frontend computes the next keyframe's edge set on device
(slam/edge_select.py) while the host replays the same selection from the
pulled distance pack; any divergence desynchronizes the host mirrors, so
the sequences must match exactly (order included -- downstream dedup and
budget truncation are order-sensitive).
"""

import numpy as np
import pytest

from dbaf_tpu.slam.edge_select import select_proximity_edges
from dbaf_tpu.utils import native


def host_reference(d, ii, jj, cc, exist_ii, exist_jj, t0, t1, t, rad, nms,
                   thresh, max_factors):
    res = native.select_proximity_edges(
        d.copy(), ii.astype(np.int64), jj.astype(np.int64), cc,
        exist_ii.astype(np.int64), exist_jj.astype(np.int64),
        t0, t1, t, rad, nms, thresh, max_factors,
    )
    if res is None:
        pytest.skip("native scheduler unavailable")
    return res


def make_case(rng, src=5, win=5, n_skip=3, t=20, rad=2, nms=1):
    t0, t1 = t - src, t - win
    ii, jj = np.meshgrid(
        np.arange(t0, t), np.arange(t1, t), indexing="ij"
    )
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    cc = len(ii)
    # skip-edge candidates: (t-1, t0 + skip offsets)
    jj_add = np.clip(t0 + np.arange(-4, -4 + n_skip), 1, t - 1)
    ii_add = np.full_like(jj_add, t - 1)
    ii = np.concatenate([ii, ii_add])
    jj = np.concatenate([jj, jj_add])
    d = rng.uniform(0, 30, size=len(ii))
    d[rng.random(len(d)) < 0.1] = 150.0  # some too-far entries
    ne = 24
    exist_ii = rng.integers(0, t, size=ne)
    exist_jj = rng.integers(0, t, size=ne)
    n_valid = int(rng.integers(0, ne))
    return dict(
        d=d, ii=ii, jj=jj, cc=cc, exist_ii=exist_ii, exist_jj=exist_jj,
        n_valid=n_valid, t0=t0, t1=t1, t=t, rad=rad, nms=nms,
    )


@pytest.mark.parametrize("seed", range(8))
def test_matches_native_scheduler(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    nms = int(rng.integers(0, 3))
    case = make_case(rng, nms=nms)
    thresh, max_factors = 16.0, 48
    nv = case["n_valid"]

    ref_ii, ref_jj = host_reference(
        case["d"], case["ii"], case["jj"], case["cc"],
        case["exist_ii"][:nv], case["exist_jj"][:nv],
        case["t0"], case["t1"], case["t"], case["rad"], case["nms"],
        thresh, max_factors,
    )

    mask = np.arange(len(case["exist_ii"])) < nv
    out_ii, out_jj, out_mask = select_proximity_edges(
        jnp.asarray(case["d"], jnp.float32),
        jnp.asarray(case["ii"], jnp.int32),
        jnp.asarray(case["jj"], jnp.int32),
        jnp.asarray(case["exist_ii"], jnp.int32),
        jnp.asarray(case["exist_jj"], jnp.int32),
        jnp.asarray(mask),
        jnp.asarray(case["t0"], jnp.int32),
        jnp.asarray(case["t1"], jnp.int32),
        jnp.asarray(case["t"], jnp.int32),
        thresh,
        src=5, win=5, n_skip=3, rad=case["rad"], nms=case["nms"],
        max_factors=max_factors, max_out=160,
    )
    got_ii = np.asarray(out_ii)[np.asarray(out_mask)]
    got_jj = np.asarray(out_jj)[np.asarray(out_mask)]
    np.testing.assert_array_equal(got_ii, ref_ii, err_msg=f"seed {seed}")
    np.testing.assert_array_equal(got_jj, ref_jj, err_msg=f"seed {seed}")


# ---------------------------------------------------------------------------
# edge_transition vs the real host graph machinery


def _mk_graph(cfg, rng, t, n_edges, n_inac, n_aged):
    import jax.numpy as jnp

    from dbaf_tpu.slam.graph import CovisibleGraph
    from dbaf_tpu.slam.video import DepthVideo
    from dbaf_tpu.ops import lie

    video = DepthVideo(cfg)
    video.counter = t
    B = cfg.buffer
    h8, w8 = video.h8, video.w8
    poses = np.concatenate(
        [rng.normal(size=(B, 3)) * 0.05, np.tile([0, 0, 0, 1.0], (B, 1))],
        axis=1,
    ).astype(np.float32)
    video.poses = jnp.asarray(poses)
    video.disps = jnp.asarray(
        rng.uniform(0.5, 2.0, (B, h8, w8)).astype(np.float32)
    )
    video.nets = jnp.asarray(
        rng.normal(size=(B, h8, w8, 128)).astype(np.float32), jnp.bfloat16
    )
    video.intrinsics = jnp.asarray(
        [2.0 * w8, 2.0 * w8, w8 / 2, h8 / 2], jnp.float32
    )

    def dummy_update(net, inp, corr, motn, ii, jj, aux):
        return net, jnp.zeros(net.shape[:-1] + (2,)), jnp.zeros(
            net.shape[:-1] + (2,)
        )

    g = CovisibleGraph(video, dummy_update, cfg)
    # random initial edges
    pairs = set()
    while len(pairs) < n_edges + n_inac:
        a, b = rng.integers(0, t, size=2)
        if a != b:
            pairs.add((int(a), int(b)))
    pairs = sorted(pairs)
    ii = np.asarray([p[0] for p in pairs])
    jj = np.asarray([p[1] for p in pairs])
    g.add_factors(ii, jj)
    g._flush()
    g.age = rng.integers(0, 10, size=g.n).astype(np.int64)
    # retire a few to the inactive store
    if n_inac:
        m = np.zeros(g.n, dtype=bool)
        m[rng.choice(g.n, size=n_inac, replace=False)] = True
        g.rm_factors(m, store=True)
        g._flush()
    # age some beyond max_age so stale retirement triggers
    if n_aged and g.n:
        idx = rng.choice(g.n, size=min(n_aged, g.n), replace=False)
        g.age[idx] = cfg.graph.max_age + 5
    return video, g


@pytest.mark.parametrize("seed", range(4))
def test_edge_transition_matches_host(seed):
    import jax.numpy as jnp

    from dbaf_tpu.slam.edge_select import edge_transition
    from dbaf_tpu.slam.graph import _rebuild_edges, _rebuild_inactive
    from dbaf_tpu.utils.config import DBAFusionConfig, GraphConfig

    rng = np.random.default_rng(100 + seed)
    wf, src, rad, nms = 5, 5, 2, 1
    skip = (-4, -5, -6)
    cfg = DBAFusionConfig(
        image_size=(64, 128),
        buffer=24,
        graph=GraphConfig(
            max_factors=12, edge_capacity=16, inactive_capacity=12,
            frontend_window=wf, frontend_radius=rad, frontend_nms=nms,
            frontend_thresh=16.0, max_age=8, skip_edge=skip,
        ),
    )
    t1 = 14
    video, g = _mk_graph(cfg, rng, t1, n_edges=10, n_inac=3, n_aged=3)
    aw = 10

    n_skip = len(skip)
    d_syn = rng.uniform(0, 30, size=src * wf + n_skip)
    d_syn[rng.random(len(d_syn)) < 0.15] = 150.0

    # snapshot pre-state for the device transition
    E, I = g.e_cap, g.i_cap
    pre = dict(
        ii=np.zeros(E, np.int32), jj=np.zeros(E, np.int32),
        age=np.zeros(E, np.int32), valid=np.zeros(E, bool),
        ii_i=np.zeros(I, np.int32), jj_i=np.zeros(I, np.int32),
        i_valid=np.zeros(I, bool),
    )
    pre["ii"][: g.n] = g.ii
    pre["jj"][: g.n] = g.jj
    pre["age"][: g.n] = g.age
    pre["valid"][: g.n] = True
    ni = len(g.ii_inac)
    pre["ii_i"][:ni] = g.ii_inac
    pre["jj_i"][:ni] = g.jj_inac
    pre["i_valid"][:ni] = True
    # deep copies: the host path donates these buffers.  np.array (not
    # asarray) is load-bearing -- on CPU jnp.asarray(np.asarray(x)) aliases
    # x's device buffer, so donation would corrupt the snapshot.
    from dbaf_tpu.slam.graph import EdgeArrays

    pre_edges = EdgeArrays(
        jnp.asarray(np.array(g.edges.net.astype(jnp.float32))).astype(
            g.edges.net.dtype
        ),
        jnp.asarray(np.array(g.edges.target)),
        jnp.asarray(np.array(g.edges.weight)),
    )
    pre_tinac = jnp.asarray(np.array(g.t_inac))
    pre_winac = jnp.asarray(np.array(g.w_inac))
    pre_target_np = np.array(pre_edges.target)
    pre_weight_np = np.array(pre_edges.weight)

    # ---- host path (frontend.py:255-276 visual)
    stale = (g.age > cfg.graph.max_age) & (
        (g.ii < t1 - aw) | (g.jj < t1 - aw)
    )
    g.rm_factors(stale, store=True)
    g._candidate_distances = lambda *a, **k: d_syn.copy()
    g.add_proximity_factors(
        t1 - src, max(t1 - wf, 0), rad=rad, nms=nms,
        thresh=cfg.graph.frontend_thresh, remove=True,
    )
    g._flush()

    # ---- device path
    out = edge_transition(
        jnp.asarray(pre["ii"]), jnp.asarray(pre["jj"]),
        jnp.asarray(pre["age"]), jnp.asarray(pre["valid"]),
        jnp.asarray(pre["ii_i"]), jnp.asarray(pre["jj_i"]),
        jnp.asarray(pre["i_valid"]),
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.zeros(4, bool),
        jnp.asarray(d_syn, jnp.float32),
        jnp.asarray(t1, jnp.int32),
        cfg.graph.frontend_thresh,
        src=src, wf=wf, n_skip=n_skip, skip_offsets=skip, rad=rad, nms=nms,
        max_factors=cfg.graph.max_factors, max_age=cfg.graph.max_age,
        active_window=aw, visual_only=True, max_out=160,
    )

    n = int(np.sum(np.asarray(out["valid"])))
    assert n == g.n, (n, g.n)
    np.testing.assert_array_equal(np.asarray(out["ii"])[:n], g.ii)
    np.testing.assert_array_equal(np.asarray(out["jj"])[:n], g.jj)
    np.testing.assert_array_equal(np.asarray(out["age"])[:n], g.age)
    ni2 = int(np.sum(np.asarray(out["i_valid"])))
    assert ni2 == len(g.ii_inac)
    np.testing.assert_array_equal(np.asarray(out["ii_i"])[:ni2], g.ii_inac)
    np.testing.assert_array_equal(np.asarray(out["jj_i"])[:ni2], g.jj_inac)

    # rebuilt edge arrays must match the host _flush result
    edges2 = _rebuild_edges(
        pre_edges.net, pre_edges.target, pre_edges.weight,
        out["perm"], out["is_new"],
        jnp.asarray(out["ii"]), jnp.asarray(out["jj"]),
        video.poses, video.disps, video.intrinsics,
        video.nets.astype(jnp.bfloat16),
    )
    np.testing.assert_allclose(
        np.asarray(edges2.target[:n], np.float32),
        np.asarray(g.edges.target[:n], np.float32), atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(edges2.net[:n], np.float32),
        np.asarray(g.edges.net[:n], np.float32),
    )
    t2, w2 = _rebuild_inactive(
        pre_tinac, pre_winac, out["inact_perm_old"],
        out["inact_from_act"], out["inact_act_idx"],
        jnp.asarray(pre_target_np), jnp.asarray(pre_weight_np),
    )
    np.testing.assert_allclose(
        np.asarray(t2[:ni2], np.float32),
        np.asarray(g.t_inac[:ni2], np.float32), atol=1e-6,
    )


@pytest.mark.parametrize("seed", range(4))
def test_cull_transition_matches_host(seed):
    """cull_transition must bit-match graph.rm_keyframe's edge re-indexing
    (drop edges touching ix, decrement above, stable compact, both stores)."""
    import jax.numpy as jnp

    from dbaf_tpu.slam.edge_select import cull_transition
    from dbaf_tpu.slam.graph import EdgeArrays, _rebuild_edges, \
        _rebuild_inactive
    from dbaf_tpu.utils.config import DBAFusionConfig, GraphConfig

    rng = np.random.default_rng(300 + seed)
    cfg = DBAFusionConfig(
        image_size=(64, 128),
        buffer=24,
        graph=GraphConfig(
            max_factors=12, edge_capacity=16, inactive_capacity=12,
            frontend_window=5, frontend_radius=2, frontend_nms=1,
            frontend_thresh=16.0, max_age=8, skip_edge=(-4, -5, -6),
        ),
    )
    t1 = 14
    video, g = _mk_graph(cfg, rng, t1, n_edges=10, n_inac=3, n_aged=0)
    # pick ix so at least some seeds drop edges from each store
    ix = int(rng.integers(1, t1 - 1))

    E, I = g.e_cap, g.i_cap
    pre = dict(
        ii=np.zeros(E, np.int32), jj=np.zeros(E, np.int32),
        age=np.zeros(E, np.int32), valid=np.zeros(E, bool),
        ii_i=np.zeros(I, np.int32), jj_i=np.zeros(I, np.int32),
        i_valid=np.zeros(I, bool),
    )
    pre["ii"][: g.n] = g.ii
    pre["jj"][: g.n] = g.jj
    pre["age"][: g.n] = g.age
    pre["valid"][: g.n] = True
    ni = len(g.ii_inac)
    pre["ii_i"][:ni] = g.ii_inac
    pre["jj_i"][:ni] = g.jj_inac
    pre["i_valid"][:ni] = True
    pre_edges = EdgeArrays(
        jnp.asarray(np.array(g.edges.net.astype(jnp.float32))).astype(
            g.edges.net.dtype
        ),
        jnp.asarray(np.array(g.edges.target)),
        jnp.asarray(np.array(g.edges.weight)),
    )
    pre_tinac = jnp.asarray(np.array(g.t_inac))
    pre_winac = jnp.asarray(np.array(g.w_inac))
    pre_target_np = np.array(pre_edges.target)
    pre_weight_np = np.array(pre_edges.weight)

    # ---- host path
    g.rm_keyframe(ix)
    g._flush()

    # ---- device path
    ct = cull_transition(
        jnp.asarray(pre["ii"]), jnp.asarray(pre["jj"]),
        jnp.asarray(pre["age"]), jnp.asarray(pre["valid"]),
        jnp.asarray(pre["ii_i"]), jnp.asarray(pre["jj_i"]),
        jnp.asarray(pre["i_valid"]), jnp.asarray(ix, jnp.int32),
    )

    n = int(np.sum(np.asarray(ct["valid"])))
    assert n == g.n, (n, g.n)
    np.testing.assert_array_equal(np.asarray(ct["ii"])[:n], g.ii)
    np.testing.assert_array_equal(np.asarray(ct["jj"])[:n], g.jj)
    np.testing.assert_array_equal(np.asarray(ct["age"])[:n], g.age)
    ni2 = int(np.sum(np.asarray(ct["i_valid"])))
    assert ni2 == len(g.ii_inac)
    np.testing.assert_array_equal(np.asarray(ct["ii_i"])[:ni2], g.ii_inac)
    np.testing.assert_array_equal(np.asarray(ct["jj_i"])[:ni2], g.jj_inac)

    edges2 = _rebuild_edges(
        pre_edges.net, pre_edges.target, pre_edges.weight,
        ct["perm"], jnp.zeros((E,), bool),
        jnp.asarray(ct["ii"]), jnp.asarray(ct["jj"]),
        video.poses, video.disps, video.intrinsics,
        video.nets.astype(jnp.bfloat16),
    )
    np.testing.assert_array_equal(
        np.asarray(edges2.target[:n], np.float32),
        np.asarray(g.edges.target[:n], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(edges2.net[:n], np.float32),
        np.asarray(g.edges.net[:n], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(edges2.weight[:n], np.float32),
        np.asarray(g.edges.weight[:n], np.float32),
    )
    t2, w2 = _rebuild_inactive(
        pre_tinac, pre_winac, ct["inact_perm_old"],
        jnp.zeros((I,), bool), jnp.zeros((I,), jnp.int32),
        jnp.asarray(pre_target_np), jnp.asarray(pre_weight_np),
    )
    np.testing.assert_array_equal(
        np.asarray(t2[:ni2], np.float32),
        np.asarray(g.t_inac[:ni2], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(w2[:ni2], np.float32),
        np.asarray(g.w_inac[:ni2], np.float32),
    )
