"""Device preintegration chunks: composition must reproduce sequential
host integration (fusion/preintegration.py), since the async coupled
pipeline closes keyframe intervals and merges culled keyframes by
composing per-frame chunks on device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dbaf_tpu.fusion import preint_device as pd
from dbaf_tpu.fusion.preintegration import ImuParams, PreintegratedImu

compose_j = jax.jit(pd.compose)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def make_meas(rng, n, dt=0.005):
    acc = rng.normal(size=(n, 3)) * 0.6 + np.asarray([0.1, -0.2, 9.807])
    gyro = rng.normal(size=(n, 3)) * 0.3
    return acc, gyro, np.full(n, dt)


def integrate_host(acc, gyro, dts, bias, params=None):
    pim = PreintegratedImu(params or ImuParams(), bias)
    for a, g, d in zip(acc, gyro, dts):
        pim.integrate(a, g, d)
    return pim


def chunk_of(pim):
    return pd.unpack_chunk(jnp.asarray(pack := pd.pack_chunk_np(pim))), pack


def assert_chunk_close(c, pim, tol=2e-5):
    """Relative comparison per field; covariance compared in Jacobi-scaled
    space (entries span ~8 decades)."""
    np.testing.assert_allclose(np.asarray(c.dR), pim.dR, atol=tol)
    sv = max(np.abs(pim.dv).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(c.dv), pim.dv, atol=tol * sv)
    sp = max(np.abs(pim.dp).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(c.dp), pim.dp, atol=tol * sp)
    np.testing.assert_allclose(float(c.dt), pim.dt, atol=1e-6)
    for name in ("dRg", "dvg", "dva", "dpg", "dpa"):
        h = getattr(pim, name)
        s = max(np.abs(h).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(getattr(c, name)), h,
                                   atol=tol * s, err_msg=name)
    d = np.sqrt(np.abs(np.diagonal(pim.cov)))
    d = np.maximum(d, 1e-12)
    scale = np.outer(d, d)
    np.testing.assert_allclose(
        np.asarray(c.cov) / scale, pim.cov / scale, atol=5e-4,
        err_msg="cov")


def test_compose_matches_sequential_integration(rng):
    """chunk(0..k) o chunk(k..n) == integrate(0..n), same bias lin."""
    bias = np.asarray([0.02, -0.01, 0.03, 0.002, -0.001, 0.004])
    acc, gyro, dts = make_meas(rng, 60)
    full = integrate_host(acc, gyro, dts, bias)
    for k in (1, 17, 30, 59):
        A = integrate_host(acc[:k], gyro[:k], dts[:k], bias)
        B = integrate_host(acc[k:], gyro[k:], dts[k:], bias)
        cA, _ = chunk_of(A)
        cB, _ = chunk_of(B)
        assert_chunk_close(compose_j(cA, cB), full)


def test_compose_associative_three_way(rng):
    bias = np.zeros(6)
    acc, gyro, dts = make_meas(rng, 45)
    full = integrate_host(acc, gyro, dts, bias)
    cs = [chunk_of(integrate_host(acc[a:b], gyro[a:b], dts[a:b], bias))[0]
          for a, b in ((0, 15), (15, 30), (30, 45))]
    left = compose_j(compose_j(cs[0], cs[1]), cs[2])
    right = compose_j(cs[0], compose_j(cs[1], cs[2]))
    assert_chunk_close(left, full)
    assert_chunk_close(right, full)


def test_compose_identity(rng):
    bias = np.asarray([0.01, 0.0, -0.02, 0.001, 0.002, 0.0])
    acc, gyro, dts = make_meas(rng, 20)
    pim = integrate_host(acc, gyro, dts, bias)
    c, _ = chunk_of(pim)
    eye = pd.identity_chunk(bias)
    assert_chunk_close(compose_j(eye, c), pim)
    assert_chunk_close(compose_j(c, pd.identity_chunk(bias)), pim)


def test_compose_mixed_bias_first_order(rng):
    """Chunks at slightly different lin points: the composed chunk must
    match host re-integration at A's bias to first order in the bias
    delta (the CombinedImuFactor's own bias treatment)."""
    biasA = np.asarray([0.02, -0.01, 0.03, 0.002, -0.001, 0.004])
    db = 1e-3 * np.asarray([1.0, -2.0, 0.5, 0.8, -0.3, 1.2])
    acc, gyro, dts = make_meas(rng, 40)
    full = integrate_host(acc, gyro, dts, biasA)
    A = integrate_host(acc[:20], gyro[:20], dts[:20], biasA)
    B = integrate_host(acc[20:], gyro[20:], dts[20:], biasA + db)
    cA, _ = chunk_of(A)
    cB, _ = chunk_of(B)
    c = compose_j(cA, cB)
    # first-order residual ~ |db|^2 * Jacobian curvature << 1e-4
    assert_chunk_close(c, full, tol=5e-4)


def test_pack_unpack_roundtrip(rng):
    acc, gyro, dts = make_meas(rng, 25)
    pim = integrate_host(acc, gyro, dts, np.asarray([0.1] * 6))
    row = pd.pack_chunk_np(pim)
    assert row.shape == (pd.CHUNK_FLAT,)
    c = pd.unpack_chunk(jnp.asarray(row))
    back = np.asarray(pd.flatten_chunk(c))
    np.testing.assert_array_equal(back, row)


def test_predict_matches_host(rng):
    from dbaf_tpu.fusion.preintegration import NavState
    from dbaf_tpu.fusion.se3np import Pose, so3_exp

    bias_lin = np.asarray([0.02, -0.01, 0.03, 0.002, -0.001, 0.004])
    bias_now = bias_lin + 5e-3
    acc, gyro, dts = make_meas(rng, 30)
    pim = integrate_host(acc, gyro, dts, bias_lin)
    R0 = so3_exp(np.asarray([0.2, -0.1, 0.4]))
    t0 = np.asarray([1.0, -2.0, 0.5])
    v0 = np.asarray([0.3, 0.1, -0.2])
    ref = pim.predict(NavState(Pose(R0, t0), v0), bias_now)

    c, _ = chunk_of(pim)
    Rj, tj, vj = jax.jit(pd.predict)(
        c, jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(v0, jnp.float32), jnp.asarray(bias_now, jnp.float32),
        jnp.asarray(ImuParams().g_vec, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(Rj), ref.pose.R, atol=2e-5)
    np.testing.assert_allclose(np.asarray(tj), ref.pose.t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vj), ref.vel, atol=2e-5)


def test_noise_information_matches_host(rng):
    acc, gyro, dts = make_meas(rng, 50)
    pim = integrate_host(acc, gyro, dts, np.zeros(6))
    ref = pim.noise_information()
    c, _ = chunk_of(pim)
    info = np.asarray(jax.jit(pd.noise_information)(c.cov), np.float64)
    d = np.sqrt(np.abs(np.diagonal(ref)))
    scale = np.outer(d, d)
    np.testing.assert_allclose(info / scale, ref / scale, atol=2e-3)
