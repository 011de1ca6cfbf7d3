"""Projective-ops tests: analytic Jacobians vs jax.jacfwd, flow semantics.

The analytic Jacobian formulas replicate the reference DBA hot kernel
(/root/reference/src/droid_kernels.cu:325-419); here they are validated
against automatic differentiation of the forward reprojection.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dbaf_tpu.ops import lie, projective as pj


def make_scene(rng, n_frames=4, ht=12, wd=16):
    poses = []
    for k in range(n_frames):
        xi = rng.normal(size=(6,)) * 0.1
        poses.append(np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float64))))
    poses = jnp.asarray(np.stack(poses), dtype=jnp.float32)
    disps = jnp.asarray(
        0.5 + 0.3 * rng.random((n_frames, ht, wd)), dtype=jnp.float32
    )
    intr = jnp.asarray([24.0, 24.0, wd / 2, ht / 2], dtype=jnp.float32)
    return poses, disps, intr


def test_iproj_proj_inverse(rng):
    poses, disps, intr = make_scene(rng)
    X = pj.iproj(disps, jnp.broadcast_to(intr, (4, 4)))
    coords = pj.proj(X, jnp.broadcast_to(intr, (4, 4)))
    grid = pj.coords_grid(12, 16)
    np.testing.assert_allclose(
        np.asarray(coords), np.broadcast_to(np.asarray(grid), (4, 12, 16, 2)), atol=1e-4
    )


def test_identity_transform_is_grid(rng):
    poses, disps, intr = make_scene(rng)
    ident = jnp.broadcast_to(lie.se3_identity(), (4, 7))
    ii = jnp.asarray([0, 1])
    jj = jnp.asarray([0, 1])
    # ii == jj triggers the stereo baseline; use distinct frames w/ equal pose
    ident2 = jnp.tile(lie.se3_identity()[None], (4, 1))
    coords, valid = pj.projective_transform(ident2, disps, intr, jnp.asarray([0]), jnp.asarray([1]))
    grid = pj.coords_grid(12, 16)
    np.testing.assert_allclose(np.asarray(coords[0]), np.asarray(grid), atol=1e-4)
    assert np.all(np.asarray(valid) == 1.0)


@pytest.mark.slow
def test_jacobians_match_autodiff(rng):
    poses, disps, intr = make_scene(rng)
    ii = jnp.asarray([0, 2, 1])
    jj = jnp.asarray([1, 3, 2])

    J = pj.projection_jacobians(poses, disps, intr, ii, jj)

    # autodiff oracle: perturb pose i, pose j, and disparity via retraction
    def reproject(xi_i, xi_j, ddisp, e):
        p = poses.at[ii[e]].set(lie.se3_retr(poses[ii[e]], xi_i))
        p = p.at[jj[e]].set(lie.se3_retr(p[jj[e]], xi_j))
        d = disps.at[ii[e]].add(ddisp)
        c, _ = pj.projective_transform(p, d, intr, ii[e : e + 1], jj[e : e + 1])
        return c[0]

    zero6 = jnp.zeros(6)
    zerod = jnp.zeros(disps.shape[-2:])
    for e in range(3):
        Ji_ad = jax.jacfwd(lambda x: reproject(x, zero6, zerod, e))(zero6)
        Jj_ad = jax.jacfwd(lambda x: reproject(zero6, x, zerod, e))(zero6)
        valid = np.asarray(J.valid[e])
        np.testing.assert_allclose(
            np.asarray(J.Ji[e])[valid], np.asarray(Ji_ad)[valid], atol=2e-3, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(J.Jj[e])[valid], np.asarray(Jj_ad)[valid], atol=2e-3, rtol=1e-3
        )

    # depth jacobian: diagonal of d(coords)/d(disps) per pixel
    e = 0
    Jz_ad = jax.jacfwd(lambda x: reproject(zero6, zero6, x, e))(zerod)
    # extract diagonal entries Jz_ad[h, w, :, h, w]
    ht, wd = disps.shape[-2:]
    diag = np.zeros((ht, wd, 2))
    Jz_ad = np.asarray(Jz_ad)
    for h in range(ht):
        for w in range(wd):
            diag[h, w] = Jz_ad[h, w, :, h, w]
    valid = np.asarray(J.valid[e])
    np.testing.assert_allclose(np.asarray(J.Jz[e])[valid], diag[valid], atol=2e-3, rtol=1e-3)


def test_stereo_edge_uses_baseline(rng):
    poses, disps, intr = make_scene(rng)
    ii = jnp.asarray([1])
    jj = jnp.asarray([1])
    coords, _ = pj.projective_transform(poses, disps, intr, ii, jj)
    # equivalent manual computation with the fixed baseline pose
    X0 = pj.iproj(disps[1:2], jnp.broadcast_to(intr, (1, 4)))
    X1 = lie.se3_act4(pj.STEREO_POSE[None, None, None], X0)
    ref = pj.proj(X1, jnp.broadcast_to(intr, (1, 4)))
    np.testing.assert_allclose(np.asarray(coords), np.asarray(ref), atol=1e-5)


def test_frame_distance_properties(rng):
    poses, disps, intr = make_scene(rng)
    ii = jnp.asarray([0, 0])
    jj = jnp.asarray([0, 1])
    d = pj.frame_distance(poses, disps, intr, ii, jj)
    # same-frame distance should be ~0 (no stereo override in distance)
    assert float(d[0]) < 1e-3
    assert float(d[1]) > float(d[0])

    db = pj.frame_distance_bidirectional(poses, disps, intr, ii[1:], jj[1:])
    d12 = pj.frame_distance(poses, disps, intr, ii[1:], jj[1:])
    d21 = pj.frame_distance(poses, disps, intr, jj[1:], ii[1:])
    np.testing.assert_allclose(np.asarray(db), 0.5 * (np.asarray(d12) + np.asarray(d21)), atol=1e-6)


def test_induced_flow_zero_for_identity(rng):
    _, disps, intr = make_scene(rng)
    ident = jnp.tile(lie.se3_identity()[None], (4, 1))
    flow, valid = pj.induced_flow(ident, disps, intr, jnp.asarray([0]), jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)


def test_depth_consistency_count_selfconsistent(rng):
    # identical poses & disparities -> every in-bounds pixel agrees with all
    # in-range neighbors
    ht, wd = 12, 16
    n = 10
    poses = jnp.tile(lie.se3_identity()[None], (n, 1))
    disps = jnp.ones((n, ht, wd), dtype=jnp.float32) * 0.7
    intr = jnp.asarray([24.0, 24.0, wd / 2, ht / 2], dtype=jnp.float32)
    ix = jnp.asarray([4])
    count = pj.depth_consistency_count(poses, disps, intr, ix, jnp.asarray([0.1]))
    c = np.asarray(count[0])
    # interior pixels see all 6 neighbors agree
    assert c[5, 8] == 6.0
