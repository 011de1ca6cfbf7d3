"""Device-side IMU preintegration chunks: compose, correct, predict.

The async coupled pipeline (slam/async_pipeline.py) cannot wait for the
host to learn admission/cull decisions before closing a preintegration
interval: the decisions are taken ON DEVICE, several frames before the
host sees them.  Instead the host integrates one small chunk per FRAME
interval [t_{k-1}, t_k] (independent of any admission decision) and
uploads its packed summary with the frame; the device then composes
chunks into keyframe intervals as its own admission/cull decisions
demand.

Composition of two preintegrated chunks is closed-form and exact for the
discrete model of fusion/preintegration.py::integrate: the per-step error
-state transition matrices multiply into a macro-step transition whose
blocks are exactly the accumulated deltas/Jacobians each chunk already
stores (the one-step case reproduces `A` of preintegration.py:101-108
verbatim; induction gives the rest).  Mixed bias linearization points are
handled by first-order re-correction of the right chunk, matching the
CombinedImuFactor's own first-order bias treatment (factors.py).

Reference semantics covered: multi_sensor.py:75-101 (per-keyframe
integration), multi_sensor.py:125-140 / dbaf_frontend.py:328-353
(keyframe-cull merge == sequential integration == composition), and
PreintegratedCombinedMeasurements::predict (pose seeding,
dbaf_frontend.py:222-228).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .device_graph import _hat, _orthonormalize, _so3_exp


class Chunk(NamedTuple):
    """Preintegrated IMU summary over one interval (device arrays).

    Mirrors the accumulated state of fusion/preintegration.py
    (PreintegratedImu) -- deltas, bias Jacobians, covariance -- plus the
    bias linearization point.  Any leading batch dims broadcast.
    """
    dR: jnp.ndarray      # (3, 3)
    dv: jnp.ndarray      # (3,)
    dp: jnp.ndarray      # (3,)
    dt: jnp.ndarray      # ()
    dRg: jnp.ndarray     # (3, 3) dLog(dR)/dbg
    dvg: jnp.ndarray     # (3, 3)
    dva: jnp.ndarray     # (3, 3)
    dpg: jnp.ndarray     # (3, 3)
    dpa: jnp.ndarray     # (3, 3)
    bias0: jnp.ndarray   # (6,) [ba, bg] linearization point
    cov: jnp.ndarray     # (15, 15) over [theta, v, p, ba, bg]


CHUNK_FLAT = 9 * 6 + 3 + 3 + 1 + 6 + 225  # = 292


def identity_chunk(bias0=None, dtype=jnp.float32) -> Chunk:
    """Zero-length interval (the state of a fresh PreintegratedImu)."""
    z3 = jnp.zeros((3, 3), dtype)
    b = jnp.zeros(6, dtype) if bias0 is None else jnp.asarray(bias0, dtype)
    return Chunk(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype),
                 jnp.zeros(3, dtype), jnp.zeros((), dtype),
                 z3, z3, z3, z3, z3, b, jnp.zeros((15, 15), dtype))


def pack_chunk_np(pim) -> np.ndarray:
    """Host PreintegratedImu -> flat f32 row (one small per-frame H2D)."""
    return np.concatenate([
        np.asarray(pim.dR, np.float32).reshape(-1),
        np.asarray(pim.dv, np.float32), np.asarray(pim.dp, np.float32),
        np.asarray([pim.dt], np.float32),
        np.asarray(pim.dRg, np.float32).reshape(-1),
        np.asarray(pim.dvg, np.float32).reshape(-1),
        np.asarray(pim.dva, np.float32).reshape(-1),
        np.asarray(pim.dpg, np.float32).reshape(-1),
        np.asarray(pim.dpa, np.float32).reshape(-1),
        np.asarray(pim.bias, np.float32),
        np.asarray(pim.cov, np.float32).reshape(-1),
    ])


def unpack_chunk(row) -> Chunk:
    """Flat (292,) row -> Chunk (static slices; call inside jit)."""
    m = lambda a, b: row[a:b].reshape(3, 3)
    return Chunk(
        dR=m(0, 9), dv=row[9:12], dp=row[12:15], dt=row[15],
        dRg=m(16, 25), dvg=m(25, 34), dva=m(34, 43), dpg=m(43, 52),
        dpa=m(52, 61), bias0=row[61:67],
        cov=row[67:292].reshape(15, 15),
    )


def flatten_chunk(c: Chunk):
    """Chunk -> flat (..., 292) rows (inverse of unpack_chunk); supports a
    leading batch dim on every field."""
    lead = c.dv.shape[:-1]
    f = lambda a: a.reshape(lead + (-1,))
    return jnp.concatenate([
        f(c.dR), c.dv, c.dp, c.dt[..., None], f(c.dRg), f(c.dvg),
        f(c.dva), f(c.dpg), f(c.dpa), c.bias0, f(c.cov),
    ], axis=-1)


def corrected_deltas(c: Chunk, bias):
    """First-order bias-corrected deltas at a new bias estimate
    (preintegration.py:136-143)."""
    db_a = bias[:3] - c.bias0[:3]
    db_g = bias[3:] - c.bias0[3:]
    dR = c.dR @ _so3_exp(c.dRg @ db_g)
    dv = c.dv + c.dva @ db_a + c.dvg @ db_g
    dp = c.dp + c.dpa @ db_a + c.dpg @ db_g
    return dR, dv, dp


def rebias(c: Chunk, bias0) -> Chunk:
    """Move the linearization point (first-order: Jacobians and covariance
    are derivatives, unchanged to this order)."""
    dR, dv, dp = corrected_deltas(c, bias0)
    return c._replace(dR=_orthonormalize(dR), dv=dv, dp=dp,
                      bias0=jnp.asarray(bias0, c.dv.dtype))


def compose(A: Chunk, B: Chunk) -> Chunk:
    """Preintegration over [a,b] ++ [b,c] -> [a,c], at A's linearization
    point.  Exact (per-step transition product) when bias0 match;
    first-order in |bias0_A - bias0_B| otherwise.

    Derivation: with the right-perturbation error convention of
    preintegration.py:100-120 (dR_true = dR Exp(theta)), the composed
    errors are
        theta_AB = dR_B^T theta_A + dRg_B dbg_A + theta_B
        dv_AB    = dv_A - dR_A [dv_B]x theta_A
                   + dR_A (dva_B dba_A + dvg_B dbg_A) + dR_A dv_B
        dp_AB    = dp_A + dv_A dt_B - dR_A [dp_B]x theta_A
                   + dR_A (dpa_B dba_A + dpg_B dbg_A) + dR_A dp_B
    giving Sigma_AB = F Sigma_A F^T + D Sigma_B D^T with
    D = blkdiag(I3, dR_A, dR_A, I6).  The one-chunk-one-step case
    reproduces preintegration.py's per-step `A` matrix exactly.
    """
    dtype = A.dv.dtype
    Bc = rebias(B, A.bias0)

    dR = A.dR @ Bc.dR
    dv = A.dv + A.dR @ Bc.dv
    dp = A.dp + A.dv * Bc.dt + A.dR @ Bc.dp
    dt = A.dt + Bc.dt

    # bias-correction Jacobians of the composed deltas (Forster eq. 44
    # telescoped over a macro step)
    dRg = Bc.dR.T @ A.dRg + Bc.dRg
    dva = A.dva + A.dR @ Bc.dva
    dvg = A.dvg + A.dR @ Bc.dvg - A.dR @ _hat(Bc.dv) @ A.dRg
    dpa = A.dpa + A.dva * Bc.dt + A.dR @ Bc.dpa
    dpg = (A.dpg + A.dvg * Bc.dt + A.dR @ Bc.dpg
           - A.dR @ _hat(Bc.dp) @ A.dRg)

    eye3 = jnp.eye(3, dtype=dtype)
    F = jnp.zeros((15, 15), dtype)
    F = F.at[0:3, 0:3].set(Bc.dR.T)
    F = F.at[0:3, 12:15].set(Bc.dRg)
    F = F.at[3:6, 0:3].set(-A.dR @ _hat(Bc.dv))
    F = F.at[3:6, 3:6].set(eye3)
    F = F.at[3:6, 9:12].set(A.dR @ Bc.dva)
    F = F.at[3:6, 12:15].set(A.dR @ Bc.dvg)
    F = F.at[6:9, 0:3].set(-A.dR @ _hat(Bc.dp))
    F = F.at[6:9, 3:6].set(eye3 * Bc.dt)
    F = F.at[6:9, 6:9].set(eye3)
    F = F.at[6:9, 9:12].set(A.dR @ Bc.dpa)
    F = F.at[6:9, 12:15].set(A.dR @ Bc.dpg)
    F = F.at[9:15, 9:15].set(jnp.eye(6, dtype=dtype))

    D = jnp.zeros((15, 15), dtype)
    D = D.at[0:3, 0:3].set(eye3)
    D = D.at[3:6, 3:6].set(A.dR)
    D = D.at[6:9, 6:9].set(A.dR)
    D = D.at[9:15, 9:15].set(jnp.eye(6, dtype=dtype))

    cov = F @ A.cov @ F.T + D @ Bc.cov @ D.T
    return Chunk(_orthonormalize(dR), dv, dp, dt, dRg, dvg, dva, dpg, dpa,
                 A.bias0, cov)


def predict(c: Chunk, R, t, vel, bias, g_vec):
    """NavState propagation under gravity (preintegration.py:145-153):
    the IMU-predicted seed for a newly admitted keyframe."""
    dR, dv, dp = corrected_deltas(c, bias)
    Rj = _orthonormalize(R @ dR)
    tj = t + vel * c.dt + 0.5 * g_vec * c.dt * c.dt + R @ dp
    vj = vel + g_vec * c.dt + R @ dv
    return Rj, tj, vj


def noise_information(cov):
    """Jacobi-scaled 15x15 inverse: the information matrix the factor
    linearization consumes (preintegration.py:165-169).  The covariance
    spans ~8 decades across [theta, v, p, ba, bg]; f32 inversion must
    happen at O(1) scales (same treatment as the device marginalization,
    device_graph.py:marginalize_window_device)."""
    cov = cov + jnp.eye(15, dtype=cov.dtype) * 1e-12  # host's exact ridge
    d = jnp.sqrt(jnp.abs(jnp.diagonal(cov)))
    live = d > 1e-30
    dinv = jnp.where(live, 1.0 / jnp.where(live, d, 1.0), 1.0)
    Cn = cov * dinv[:, None] * dinv[None, :]
    In = jnp.linalg.inv(Cn)
    return In * dinv[:, None] * dinv[None, :]
