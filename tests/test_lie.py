"""Golden tests for SE(3) quaternion math vs closed forms.

Validates the exact algebra the reference implements on-device
(/root/reference/src/droid_kernels.cu:61-178) using scipy rotations and
matrix composition as independent oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from dbaf_tpu.ops import lie


def random_pose(rng, n=()):
    q = Rotation.random(int(np.prod(n)) if n else 1, random_state=rng.integers(2**31)).as_quat()
    t = rng.normal(size=(q.shape[0], 3))
    g = np.concatenate([t, q], axis=-1).astype(np.float64)
    return g.reshape(tuple(n) + (7,)) if n else g[0]


def as_mat(g):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_quat(g[3:]).as_matrix()
    T[:3, 3] = g[:3]
    return T


def test_quat_act_matches_matrix(rng):
    g = random_pose(rng, (16,))
    v = rng.normal(size=(16, 3))
    out = np.asarray(lie.quat_act(jnp.asarray(g[:, 3:]), jnp.asarray(v)))
    ref = np.einsum("nij,nj->ni", Rotation.from_quat(g[:, 3:]).as_matrix(), v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_se3_mul_inv(rng):
    a, b = random_pose(rng), random_pose(rng)
    ab = np.asarray(lie.se3_mul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(as_mat(ab), as_mat(a) @ as_mat(b), atol=1e-5)
    ainv = np.asarray(lie.se3_inv(jnp.asarray(a)))
    np.testing.assert_allclose(as_mat(ainv), np.linalg.inv(as_mat(a)), atol=1e-5)


def test_se3_rel(rng):
    gi, gj = random_pose(rng), random_pose(rng)
    gij = np.asarray(lie.se3_rel(jnp.asarray(gi), jnp.asarray(gj)))
    ref = as_mat(gj) @ np.linalg.inv(as_mat(gi))
    # compare action on points (quaternion sign ambiguity)
    np.testing.assert_allclose(as_mat(gij)[:3], ref[:3], atol=1e-5)


def test_se3_act4_projective(rng):
    g = random_pose(rng)
    X = rng.normal(size=(8, 4))
    Y = np.asarray(lie.se3_act4(jnp.asarray(g), jnp.asarray(X)))
    R = Rotation.from_quat(g[3:]).as_matrix()
    ref3 = X[:, :3] @ R.T + X[:, 3:4] * g[:3]
    np.testing.assert_allclose(Y[:, :3], ref3, atol=1e-5)
    np.testing.assert_allclose(Y[:, 3], X[:, 3], atol=1e-7)


def test_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6)) * 0.7
    g = lie.se3_exp(jnp.asarray(xi))
    back = np.asarray(lie.se3_log(g))
    np.testing.assert_allclose(back, xi, atol=1e-4)


def test_exp_small_angle(rng):
    xi = rng.normal(size=(8, 6)) * 1e-6
    g = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    # small angle: t ~ tau, q ~ [phi/2, 1]
    np.testing.assert_allclose(g[:, :3], xi[:, :3], atol=1e-9)
    np.testing.assert_allclose(g[:, 3:6], xi[:, 3:] / 2, atol=1e-9)
    np.testing.assert_allclose(g[:, 6], 1.0, atol=1e-9)


def test_exp_matches_scipy(rng):
    phi = rng.normal(size=(16, 3))
    q = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    ref = Rotation.from_rotvec(phi).as_quat()
    # sign ambiguity
    flip = np.sign(np.sum(q * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * flip, ref, atol=1e-5)


def test_adjT_matches_adjoint_matrix(rng):
    g = random_pose(rng)
    a = rng.normal(size=(6,))
    R = Rotation.from_quat(g[3:]).as_matrix()
    t = g[:3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    Ad = np.block([[R, tx @ R], [np.zeros((3, 3)), R]])
    ref = Ad.T @ a
    out = np.asarray(lie.se3_adjT(jnp.asarray(g), jnp.asarray(a)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_retr_left_multiplies(rng):
    g = random_pose(rng)
    xi = rng.normal(size=(6,)) * 0.1
    out = np.asarray(lie.se3_retr(jnp.asarray(g), jnp.asarray(xi)))
    ref = np.asarray(lie.se3_mul(lie.se3_exp(jnp.asarray(xi)), jnp.asarray(g)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_matrix_roundtrip(rng):
    g = random_pose(rng, (12,))
    T = lie.se3_matrix(jnp.asarray(g))
    back = np.asarray(lie.se3_from_matrix(T))
    for k in range(12):
        np.testing.assert_allclose(as_mat(back[k]), as_mat(g[k]), atol=1e-5)


def test_vmap_jit_compat(rng):
    g = jnp.asarray(random_pose(rng, (4,)), dtype=jnp.float32)
    xi = jnp.asarray(rng.normal(size=(4, 6)), dtype=jnp.float32)
    f = jax.jit(jax.vmap(lie.se3_retr))
    out = f(g, xi)
    assert out.shape == (4, 7)
    assert np.all(np.isfinite(np.asarray(out)))


def test_lie_np_twin_parity(rng):
    """The numpy twin (ops/lie_np.py, host bookkeeping) matches the jax
    module exactly on every exported function we use host-side."""
    from dbaf_tpu.ops import lie_np

    g = random_pose(rng, (8,)).astype(np.float64)
    h = random_pose(rng, (8,)).astype(np.float64)
    xi = rng.normal(size=(8, 6)) * 0.3

    pairs = [
        ("se3_mul", (g, h)), ("se3_inv", (g,)), ("se3_matrix", (g,)),
        ("se3_log", (g,)), ("se3_exp", (xi,)), ("se3_retr", (g, xi)),
        ("quat_to_matrix", (g[:, 3:],)),
    ]
    for name, args in pairs:
        a = np.asarray(getattr(lie_np, name)(*args))
        b = np.asarray(getattr(lie, name)(*[jnp.asarray(x) for x in args]))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)

    # matrix -> 7-vec roundtrip through the twin
    back = lie_np.se3_from_matrix(lie_np.se3_matrix(g))
    for k in range(8):
        np.testing.assert_allclose(as_mat(back[k]), as_mat(g[k]), atol=1e-9)
