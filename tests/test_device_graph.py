"""Parity of the device factor-graph solve vs the host f64 path.

Builds one representative coupled window (IMU chain + priors + GNSS +
odometry + marginal prior + visual hessian), then checks (1) the dense
normal equations match the host FactorGraph.linearize up to state
reordering, and (2) device LM converges to the host LM optimum.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbaf_tpu.fusion import device_graph as dg
from dbaf_tpu.fusion.coupling import convert_hessian, hessian_factor
from dbaf_tpu.fusion.factors import (
    B, V, X, CombinedImuFactor, GPSFactor, Noise, PriorPose, PriorVec,
    VelFactor,
)
from dbaf_tpu.fusion.graph import (
    FactorGraph, LevenbergMarquardt, Values, marginalize_out,
)
from dbaf_tpu.fusion.preintegration import ImuParams, PreintegratedImu
from dbaf_tpu.fusion.se3np import Pose, so3_exp
from dbaf_tpu.slam.coupled import GNSS_NOISE, ODO_NOISE


class FakeMsba:
    """Duck-typed stand-in for MultiSensorBA carrying just the fields
    pack_graph/pack_state read."""

    def __init__(self):
        self.ignore_imu = False
        self.prior_factor_map = {}
        self.marg_factor = None
        self.gnss_init_t1 = -1
        self.ten0 = None
        self.tbg = np.zeros(3)

        class S:
            pass

        self.state = S()
        self.state.preintegrations = {}
        self.state.wTbs = {}
        self.state.vs = {}
        self.state.bs = {}
        self.state.gnss_valid = {}
        self.state.gnss_position = {}
        self.state.odo_valid = {}
        self.state.odo_vel = {}


def build_window(rng, n=5, with_marg=True, with_odo=True):
    msba = FakeMsba()
    params = ImuParams(accel_noise=0.1, gyro_noise=0.01)
    g = params.g_vec

    # ground-truth-ish smooth trajectory
    for i in range(n):
        t = i * 0.1
        R = so3_exp(np.array([0.05 * t, -0.03 * t, 0.1 * t]))
        p = np.array([0.5 * t, 0.2 * np.sin(t), 0.1 * t])
        msba.state.wTbs[i] = Pose(R, p)
        msba.state.vs[i] = np.array([0.5, 0.2 * np.cos(t), 0.1])
        msba.state.bs[i] = np.array([0.01, -0.02, 0.015, 0.001, -0.002, 0.0005])
        msba.state.gnss_valid[i] = False
        msba.state.odo_valid[i] = with_odo and (i % 2 == 0)
        msba.state.odo_vel[i] = msba.state.wTbs[i].R.T @ msba.state.vs[i] + \
            0.01 * rng.standard_normal(3)

    # preintegrations between consecutive frames (noisy IMU)
    for i in range(n - 1):
        pim = PreintegratedImu(params, bias=msba.state.bs[i])
        for _ in range(20):
            acc = msba.state.wTbs[i].R.T @ (-g) + 0.05 * rng.standard_normal(3)
            gyro = np.array([0.05, -0.03, 0.1]) + 0.01 * rng.standard_normal(3)
            pim.integrate(acc, gyro, 0.005)
        msba.state.preintegrations[i] = pim

    msba.prior_factor_map[0] = [
        PriorPose(X(0), msba.state.wTbs[0],
                  Noise.sigmas([0.1, 0.1, 1e-3, 1e-3, 1e-3, 1e-3])),
        PriorVec(B(0), msba.state.bs[0], Noise.sigmas([1, 1, 1, .1, .1, .1])),
    ]

    if with_marg:
        # genuine marginal: eliminate a fictitious frame "-1"
        gm = FactorGraph()
        vm = Values()
        vm["x99"] = msba.state.wTbs[0].retract(0.01 * rng.standard_normal(6))
        vm[X(0)] = msba.state.wTbs[0]
        vm[V(0)] = msba.state.vs[0]
        vm[B(0)] = msba.state.bs[0]
        gm.add(PriorPose("x99", vm["x99"], Noise.sigmas([0.1] * 6)))
        pim0 = PreintegratedImu(params, bias=msba.state.bs[0])
        for _ in range(10):
            pim0.integrate(-g + 0.05 * rng.standard_normal(3),
                           0.01 * rng.standard_normal(3), 0.005)
        gm.add(CombinedImuFactor("x99", V(0), X(0), V(0), B(0), B(0), pim0))
        gm.add(PriorVec(V(0), msba.state.vs[0], Noise.sigmas([1.0] * 3)))
        msba.marg_factor = marginalize_out(gm, vm, ["x99"])

    return msba


def host_graph(msba, n, vis_lcf):
    g = FactorGraph()
    for i in range(1, n):
        g.add(CombinedImuFactor(X(i - 1), V(i - 1), X(i), V(i), B(i - 1),
                                B(i), msba.state.preintegrations[i - 1]))
    for fs in msba.prior_factor_map.values():
        for f in fs:
            g.add(f)
    if msba.marg_factor is not None:
        g.add(msba.marg_factor)
    for i in range(n):
        if msba.state.odo_valid[i]:
            g.add(VelFactor(X(i), V(i), msba.state.odo_vel[i], ODO_NOISE))
    g.add(vis_lcf)
    return g


def host_values(msba, n):
    v = Values()
    for i in range(n):
        v[X(i)] = msba.state.wTbs[i]
        v[V(i)] = msba.state.vs[i]
        v[B(i)] = msba.state.bs[i]
    return v


def perm_to_device(keys, slices, n, NW):
    """Map host state-vector indices to the device per-frame-15 layout."""
    p = np.full(NW * 15, -1, int)
    for k in keys:
        i = int(k[1:])
        base = {"x": 15 * i, "v": 15 * i + 6, "b": 15 * i + 9}[k[0]]
        sl = slices[k]
        p[base: base + (sl.stop - sl.start)] = np.arange(sl.start, sl.stop)
    return p


def make_vis(rng, msba, n, NW):
    m = n * 6
    A = rng.standard_normal((m, m * 2)) * 0.3
    Hc = (A @ A.T).astype(np.float64)
    vc = rng.standard_normal(m) * 0.1
    Tbc = Pose()  # identity: convert_hessian still applies the reordering
    Hb, vb = convert_hessian(Hc, vc, Tbc)
    frames = list(range(n))
    vals = host_values(msba, n)
    lcf = hessian_factor(frames, vals, Hb, vb)
    # padded device copies
    Hp = np.zeros((NW * 6, NW * 6), np.float32)
    vp = np.zeros(NW * 6, np.float32)
    Hp[:m, :m] = Hb
    vp[:m] = vb
    linR = np.tile(np.eye(3, dtype=np.float32), (NW, 1, 1))
    lint = np.zeros((NW, 3), np.float32)
    for i in range(n):
        linR[i] = msba.state.wTbs[i].R
        lint[i] = msba.state.wTbs[i].t
    return lcf, jnp.asarray(Hp), jnp.asarray(vp), jnp.asarray(linR), \
        jnp.asarray(lint)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.slow
def test_linearize_matches_host(rng):
    n, NW = 5, 8
    msba = build_window(rng)
    vis_lcf, Hp, vp, linR, lint = make_vis(rng, msba, n, NW)

    # perturb the states so residuals/Jacobians are non-trivial
    vals = host_values(msba, n)
    for i in range(n):
        xi = 0.02 * rng.standard_normal(6)
        msba.state.wTbs[i] = msba.state.wTbs[i].retract(xi)
        msba.state.vs[i] = msba.state.vs[i] + 0.02 * rng.standard_normal(3)
        msba.state.bs[i] = msba.state.bs[i] + 0.002 * rng.standard_normal(6)
        vals[X(i)] = msba.state.wTbs[i]
        vals[V(i)] = msba.state.vs[i]
        vals[B(i)] = msba.state.bs[i]

    g = host_graph(msba, n, vis_lcf)
    keys, slices, Hh, bh, errh = g.linearize(vals)

    pg = dg.pack_graph(msba, 0, n, NW)
    assert pg is not None
    mgd = jax.tree.map(jnp.asarray,
                       dg.marg_dense_np(msba.marg_factor, 0, n, NW))
    st = dg.pack_state(msba, 0, n, NW)
    sel = dg.make_sel_pose(NW)
    Hd, bd, errd = dg.linearize(st, pg, Hp, vp, linR, lint, sel, mgd)
    Hd, bd, errd = np.asarray(Hd), np.asarray(bd), float(errd)

    p = perm_to_device(keys, slices, n, NW)
    live = p >= 0
    Hh_d = np.zeros_like(Hd)
    bh_d = np.zeros_like(bd)
    Hh_d[np.ix_(live, live)] = Hh[np.ix_(p[live], p[live])]
    bh_d[live] = bh[p[live]]

    scale = np.abs(Hh_d).max()
    assert np.abs(Hd[np.ix_(live, live)] - Hh_d[np.ix_(live, live)]).max() \
        < 2e-4 * scale
    bscale = max(np.abs(bh_d).max(), 1.0)
    assert np.abs(bd[live] - bh_d[live]).max() < 2e-4 * bscale
    assert abs(errd - errh) < 2e-4 * max(abs(errh), 1.0)


def test_lm_matches_host(rng):
    n, NW = 5, 8
    msba = build_window(rng)
    vis_lcf, Hp, vp, linR, lint = make_vis(rng, msba, n, NW)
    vals = host_values(msba, n)
    # perturb away from the optimum; keep lin points anchored
    for i in range(1, n):
        vals[X(i)] = vals[X(i)].retract(0.03 * rng.standard_normal(6))
        vals[V(i)] = vals[V(i)] + 0.05 * rng.standard_normal(3)
        msba.state.wTbs[i] = vals[X(i)]
        msba.state.vs[i] = vals[V(i)]

    g = host_graph(msba, n, vis_lcf)
    res = LevenbergMarquardt(g, vals).optimize()

    pg = dg.pack_graph(msba, 0, n, NW)
    mgd = jax.tree.map(jnp.asarray,
                       dg.marg_dense_np(msba.marg_factor, 0, n, NW))
    st = dg.pack_state(msba, 0, n, NW)
    sel = dg.make_sel_pose(NW)
    st2, (err, _) = jax.jit(dg.lm_optimize, static_argnames=())(
        st, pg, Hp, vp, linR, lint, sel, mgd)

    for i in range(n):
        Th = res[X(i)]
        assert np.abs(np.asarray(st2.t[i]) - Th.t).max() < 5e-3
        assert np.abs(np.asarray(st2.R[i]) - Th.R).max() < 5e-3
        assert np.abs(np.asarray(st2.vel[i]) - res[V(i)]).max() < 5e-3
        assert np.abs(np.asarray(st2.bias[i]) - res[B(i)]).max() < 5e-3


def test_device_marginalization_matches_marginalize_out(rng):
    """marginalize_window_device (no visual edges) must reproduce the host
    marginalize_out Schur complement: eliminate the first m frames of the
    window graph (IMU + priors + old marginal), compare the dense forms."""
    n, NW, m = 6, 8, 2
    P_buf = 12
    msba = build_window(rng, n=n)
    vals = host_values(msba, n)

    # ---- host: the graph coupled._marginalize builds (frames < m only)
    g = FactorGraph()
    marg_paras = []
    for i in range(m):
        marg_paras += [X(i), V(i), B(i)]
        g.add(CombinedImuFactor(X(i), V(i), X(i + 1), V(i + 1),
                                B(i), B(i + 1),
                                msba.state.preintegrations[i]))
        if msba.state.odo_valid[i]:
            g.add(VelFactor(X(i), V(i), msba.state.odo_vel[i], ODO_NOISE))
    for i in list(msba.prior_factor_map.keys()):
        if i < m:
            for f in msba.prior_factor_map[i]:
                g.add(f)
    g.add(msba.marg_factor)
    mf_host = marginalize_out(g, vals, marg_paras)
    md_host = dg.marg_dense_np(mf_host, m, n, NW)

    # ---- device kernel (empty visual system)
    pgf = dg.pack_graph_flat(msba, 0, n, NW)
    fgf = dg.pack_state_flat(msba, 0, n, NW)
    mgd_old = jax.tree.map(jnp.asarray, dg.marg_dense_np(
        msba.marg_factor, 0, n, NW))
    h8, w8 = 4, 6
    zt = jnp.zeros((1, h8, w8, 2), jnp.float32)
    poses_buf = jnp.tile(
        jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32)[None], (P_buf, 1))
    disps_buf = jnp.ones((P_buf, h8, w8), jnp.float32)
    damp_buf = jnp.full((P_buf, h8, w8), 1e-4, jnp.float32)
    intr = jnp.asarray([8.0, 8.0, w8 / 2, h8 / 2], jnp.float32)
    md_dev = dg.marginalize_window_device(
        poses_buf, disps_buf, damp_buf, intr,
        zt, zt, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
        jnp.zeros(1, bool), jnp.asarray(0, jnp.int32),
        jnp.asarray(fgf), jnp.asarray(pgf), mgd_old,
        jnp.eye(6, dtype=jnp.float32),
        jnp.asarray(m, jnp.int32), jnp.asarray(n, jnp.int32),
        jnp.asarray(n, jnp.int32), P=P_buf, NW=NW,
    )
    md_dev = jax.tree.map(np.asarray, md_dev)

    # the kernel keeps zero-information frames in its mask; compare the
    # informative region (host keys' frames) numerically
    scale = np.abs(md_host.H).max()
    assert scale > 0
    np.testing.assert_allclose(md_dev.H, md_host.H, atol=5e-4 * scale)
    vscale = max(np.abs(md_host.v).max(), 1.0)
    np.testing.assert_allclose(md_dev.v, md_host.v, atol=5e-4 * vscale)
    live = md_host.mask
    np.testing.assert_allclose(md_dev.lin[live], md_host.lin[live],
                               atol=1e-5)
