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
