"""Sim(3) group + 7-dof projective branch (reference parity surface:
/root/reference/dbaf/geom/projective_ops.py:84-94, geom/losses.py:9-27,
there served by lietorch.Sim3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbaf_tpu.ops import lie, projective as pj, sim3


def _rand_sim3(rng, n=8, max_angle=2.5):
    xi = rng.normal(size=(n, 7)).astype(np.float64)
    xi[:, 3:6] *= max_angle / 2.5
    xi[:, 6] *= 0.4  # scales in ~[0.3, 3]
    return sim3.exp(jnp.asarray(xi, jnp.float32))


def test_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 7)).astype(np.float32)
    # cover the Taylor guards: tiny angles, tiny scales, both
    xi[:16, 3:6] *= 1e-6
    xi[16:32, 6] *= 1e-7
    xi[32:40, 3:6] *= 1e-6
    xi[32:40, 6] *= 1e-7
    g = sim3.exp(jnp.asarray(xi))
    xi2 = np.asarray(sim3.log(g))
    np.testing.assert_allclose(xi2, xi, atol=3e-5)


def test_group_axioms(rng):
    a = _rand_sim3(rng)
    b = _rand_sim3(rng)
    ident = sim3.identity((8,))
    np.testing.assert_allclose(
        np.asarray(sim3.mul(a, sim3.inv(a))), np.asarray(ident), atol=1e-5
    )
    # associativity via matrix representation
    def mat(g):
        g = np.asarray(g, np.float64)
        R = np.asarray(lie.quat_to_matrix(jnp.asarray(g[..., 3:7], jnp.float32)))
        T = np.zeros(g.shape[:-1] + (4, 4))
        T[..., :3, :3] = g[..., 7:8, None] * R
        T[..., :3, 3] = g[..., :3]
        T[..., 3, 3] = 1.0
        return T

    np.testing.assert_allclose(
        mat(sim3.mul(a, b)), mat(a) @ mat(b), atol=1e-4
    )


def test_act_matches_matrix(rng):
    g = _rand_sim3(rng, 4)
    x = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    out = np.asarray(sim3.act(g, x))
    for k in range(4):
        gk = np.asarray(g[k], np.float64)
        R = np.asarray(lie.quat_to_matrix(g[k, 3:7]))
        ref = gk[7] * R @ np.asarray(x[k], np.float64) + gk[:3]
        np.testing.assert_allclose(out[k], ref, atol=1e-5)


def test_unit_scale_reduces_to_se3(rng):
    g7 = lie.se3_exp(jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32)))
    g8 = sim3.from_se3(g7)
    X = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sim3.act4(g8, X)), np.asarray(lie.se3_act4(g7, X)),
        atol=1e-6,
    )
    a = jnp.asarray(rng.normal(size=(6, 7)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sim3.adjT(g8, a))[:, :6],
        np.asarray(lie.se3_adjT(g7, a[:, :6])), atol=1e-5,
    )
    # se3_log through the sim3 log (sigma = 0)
    l8 = np.asarray(sim3.log(g8))
    l7 = np.asarray(lie.se3_log(g7))
    np.testing.assert_allclose(l8[:, :6], l7, atol=2e-5)
    np.testing.assert_allclose(l8[:, 6], 0.0, atol=1e-6)


def test_adjoint_identity(rng):
    """Ad_g xi = log(g exp(xi) g^-1); adjT is its transpose."""
    g = _rand_sim3(rng, 1)[0]

    def conj(xi):
        return sim3.log(sim3.mul(sim3.mul(g, sim3.exp(xi)), sim3.inv(g)))

    Ad = np.asarray(jax.jacfwd(conj)(jnp.zeros(7)))
    a = rng.normal(size=(7,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sim3.adjT(g, jnp.asarray(a))), Ad.T @ a, atol=1e-4
    )


def test_projective_transform_sim3(rng):
    """8-wide poses flow through projective_transform; s=1 matches SE3 and
    s != 1 matches a numpy brute-force reprojection."""
    N, H, W = 4, 6, 8
    intr = jnp.asarray([10.0, 10.0, W / 2, H / 2], jnp.float32)
    poses7 = lie.se3_exp(
        jnp.asarray(0.1 * rng.normal(size=(N, 6)).astype(np.float32))
    )
    disps = jnp.asarray(
        (0.5 + 0.1 * rng.random((N, H, W))).astype(np.float32)
    )
    ii = jnp.asarray([0, 1, 2])
    jj = jnp.asarray([1, 2, 3])

    c7, v7 = pj.projective_transform(poses7, disps, intr, ii, jj)
    c8, v8 = pj.projective_transform(
        sim3.from_se3(poses7), disps, intr, ii, jj
    )
    np.testing.assert_allclose(np.asarray(c8), np.asarray(c7), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(v8), np.asarray(v7))

    # non-unit scales: brute-force numpy oracle
    scales = jnp.asarray([1.0, 1.3, 0.8, 1.1], jnp.float32)
    poses8 = jnp.concatenate([poses7, scales[:, None]], axis=-1)
    c, v = pj.projective_transform(poses8, disps, intr, ii, jj)
    fx, fy, cx, cy = np.asarray(intr)
    for e, (i, j) in enumerate(zip([0, 1, 2], [1, 2, 3])):
        gij = np.asarray(sim3.rel(poses8[i], poses8[j]), np.float64)
        R = np.asarray(lie.quat_to_matrix(jnp.asarray(gij[3:7], jnp.float32)))
        for y in range(H):
            for x in range(W):
                d0 = float(disps[i, y, x])
                p = np.array([(x - cx) / fx, (y - cy) / fy, 1.0])
                p1 = gij[7] * R @ p + d0 * gij[:3]
                if p1[2] <= 0.2:
                    continue
                u = fx * p1[0] / p1[2] + cx
                vv = fy * p1[1] / p1[2] + cy
                np.testing.assert_allclose(
                    np.asarray(c[e, y, x]), [u, vv], atol=1e-3
                )


@pytest.mark.slow
def test_projection_jacobians_sim3_vs_autodiff(rng):
    """Ji/Jj/Jz columns == jacfwd of the reprojection under the kernel's
    left-perturbation convention (pose_j <- exp(xi) pose_j etc.)."""
    N, H, W = 3, 4, 6
    intr = jnp.asarray([8.0, 8.0, W / 2, H / 2], jnp.float32)
    poses8 = _rand_sim3(rng, N, max_angle=0.3)
    poses8 = jnp.concatenate(
        [0.2 * poses8[:, :3], poses8[:, 3:7],
         jnp.clip(poses8[:, 7:], 0.7, 1.4)], axis=-1,
    )
    disps = jnp.asarray((0.6 + 0.1 * rng.random((N, H, W))).astype(np.float32))
    ii = jnp.asarray([0, 1])
    jj = jnp.asarray([1, 2])

    J = pj.projection_jacobians_sim3(poses8, disps, intr, ii, jj)

    def coords_fn(xi_j, xi_i, dd):
        pj8 = poses8
        pj8 = pj8.at[jj[0]].set(sim3.retr(pj8[jj[0]], xi_j))
        pj8 = pj8.at[ii[0]].set(sim3.retr(pj8[ii[0]], xi_i))
        dsp = disps.at[ii[0]].add(dd)
        c, _ = pj.projective_transform(pj8, dsp, intr, ii, jj)
        return c[0]

    z7 = jnp.zeros(7)
    Jj_num = np.asarray(jax.jacfwd(coords_fn, 0)(z7, z7, 0.0))  # (H,W,2,7)
    Ji_num = np.asarray(jax.jacfwd(coords_fn, 1)(z7, z7, 0.0))
    Jz_num = np.asarray(
        jax.jacfwd(coords_fn, 2)(z7, z7, jnp.zeros((H, W)))
    )  # (H,W,2,H,W)

    valid = np.asarray(J.valid[0])
    m = valid[..., None, None]
    np.testing.assert_allclose(
        np.asarray(J.Jj[0]) * m, Jj_num * m, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(J.Ji[0]) * m, Ji_num * m, atol=2e-3
    )
    Jz_diag = np.zeros((H, W, 2))
    for y in range(H):
        for x in range(W):
            Jz_diag[y, x] = Jz_num[y, x, :, y, x]
    np.testing.assert_allclose(
        np.asarray(J.Jz[0]) * valid[..., None], Jz_diag * valid[..., None],
        atol=2e-3,
    )


def test_geodesic_loss_sim3(rng):
    from dbaf_tpu.train.losses import geodesic_loss, pose_metrics

    N = 6
    Ps = lie.se3_exp(
        jnp.asarray(0.3 * rng.normal(size=(N, 6)).astype(np.float32))
    )
    ii = jnp.asarray([0, 1, 2, 3, 4])
    jj = jnp.asarray([1, 2, 3, 4, 5])

    # exact Sim3 lift of GT -> ~zero loss, unit-scale metrics
    loss0, m0 = geodesic_loss(
        Ps, [sim3.from_se3(Ps)], ii, jj, do_scale=False
    )
    assert float(loss0) < 1e-4
    assert float(m0["scale_error"]) < 1e-5

    # uniform per-frame scale drift is detected in sigma, and the
    # 0.05-weighted term makes the loss nonzero
    drift = jnp.concatenate(
        [Ps, jnp.full((N, 1), 1.2, jnp.float32)], axis=-1
    )
    loss1, m1 = geodesic_loss(Ps, [drift], ii, jj, do_scale=False)
    assert float(m1["scale_error"]) < 1e-5  # relative scales cancel
    # non-uniform drift does not cancel
    s = jnp.asarray([1.0, 1.1, 1.2, 1.3, 1.4, 1.5], jnp.float32)
    drift2 = jnp.concatenate([Ps, s[:, None]], axis=-1)
    loss2, m2 = geodesic_loss(Ps, [drift2], ii, jj, do_scale=False)
    assert float(m2["scale_error"]) > 0.05
    assert float(loss2) > float(loss0)

    # SE3 path still reports the Sim3-lifted metrics dict
    _, m3 = geodesic_loss(Ps, [Ps], ii, jj, do_scale=True)
    assert float(m3["rot_error"]) < 1e-3
