"""Multi-device tests on the 8-device virtual CPU mesh: the explicit
shard_map edge-parallel BA must match the single-device solver exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbaf_tpu.ops import dba, lie
from dbaf_tpu.parallel import make_mesh, sharded_ba_step
from dbaf_tpu.parallel.shard_ba import make_sharded_ba_iteration
from tests.test_dba import make_problem


def pad_to(x, n, fill=0):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    shape = (pad,) + x.shape[1:]
    return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])


@pytest.mark.slow
def test_shard_map_ba_matches_single_device(rng):
    assert jax.device_count() >= 8, jax.devices()
    mesh = make_mesh(8)

    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(
        rng, P=6, ht=8, wd=16
    )
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]
    xi = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, jnp.float32)
    poses = lie.se3_retr(poses_gt, xi)
    disps = disps_gt
    eta = jnp.full((P, ht * wd), 1e-4, jnp.float32)

    # pad edges to a multiple of 8 for the shard
    E = ii.shape[0]
    E_pad = ((E + 7) // 8) * 8
    ii_p = pad_to(ii, E_pad)
    jj_p = pad_to(jj, E_pad)
    t_p = pad_to(targets, E_pad)
    w_p = pad_to(weights, E_pad)
    mask = pad_to(jnp.ones(E, bool), E_pad, fill=False)

    step = make_sharded_ba_iteration(mesh, P)
    out_p, out_d = step(
        poses, disps, intr, t_p, w_p, eta, ii_p, jj_p, mask,
        jnp.asarray(1), jnp.asarray(P),
    )

    ref = dba.ba(
        poses, disps, intr, t_p, w_p, eta, ii_p, jj_p, mask,
        jnp.asarray(1), jnp.asarray(P), iterations=1,
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref.poses), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref.disps), atol=2e-4)


@pytest.mark.slow
def test_shard_map_ba_scaled_two_iterations(rng):
    """Production-scale shard_map parity: window 24, 132 edges, 2 GN
    iterations across the 8-device mesh bit-match the single-device
    solver."""
    assert jax.device_count() >= 8, jax.devices()
    mesh = make_mesh(8)

    poses_gt, disps_gt, intr, _, _, _, _ = make_problem(rng, P=24, ht=8, wd=16)
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]

    # denser graph than make_problem's: |i-j| in 1..3 -> 132 edges
    ai, aj = np.meshgrid(np.arange(P), np.arange(P), indexing="ij")
    keep = (np.abs(ai - aj) >= 1) & (np.abs(ai - aj) <= 3)
    ii = jnp.asarray(ai[keep])
    jj = jnp.asarray(aj[keep])
    assert ii.shape[0] >= 128, ii.shape

    import dbaf_tpu.ops.projective as pj

    targets, _valid = pj.projective_transform(
        poses_gt, disps_gt, intr, ii, jj
    )
    weights = jnp.ones(targets.shape, dtype=jnp.float32)

    xi = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, jnp.float32)
    poses = lie.se3_retr(poses_gt, xi)
    disps = disps_gt
    eta = jnp.full((P, ht * wd), 1e-4, jnp.float32)

    E = ii.shape[0]
    E_pad = ((E + 7) // 8) * 8
    ii_p, jj_p = pad_to(ii, E_pad), pad_to(jj, E_pad)
    t_p, w_p = pad_to(targets, E_pad), pad_to(weights, E_pad)
    mask = pad_to(jnp.ones(E, bool), E_pad, fill=False)
    nfixed, nactive = jnp.asarray(1), jnp.asarray(P)

    step = make_sharded_ba_iteration(mesh, P)
    out_p, out_d = poses, disps
    for _ in range(2):
        out_p, out_d = step(
            out_p, out_d, intr, t_p, w_p, eta, ii_p, jj_p, mask,
            nfixed, nactive,
        )

    ref = dba.ba(
        poses, disps, intr, t_p, w_p, eta, ii_p, jj_p, mask,
        nfixed, nactive, iterations=2,
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref.poses),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref.disps),
                               atol=5e-4)


@pytest.mark.slow
def test_autosharded_ba_runs_on_mesh(rng):
    mesh = make_mesh(8)
    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(
        rng, P=6, ht=8, wd=16
    )
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]
    eta = jnp.full((P, ht * wd), 1e-4, jnp.float32)
    E = ii.shape[0]
    E_pad = ((E + 7) // 8) * 8
    step = sharded_ba_step(mesh)
    out = step(
        poses_gt, disps_gt, intr,
        pad_to(targets, E_pad), pad_to(weights, E_pad), eta,
        pad_to(ii, E_pad), pad_to(jj, E_pad),
        pad_to(jnp.ones(E, bool), E_pad, fill=False),
        jnp.asarray(1), jnp.asarray(P),
    )
    assert np.all(np.isfinite(np.asarray(out.poses)))
