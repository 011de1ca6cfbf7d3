"""Sim(3) group on 8-vectors ``(tx,ty,tz, qx,qy,qz,qw, s)``.

Covers the reference's training-time Sim3 surface (the 7-dof branch of
``projective_transform``, /root/reference/dbaf/geom/projective_ops.py:84-94,
and the Sim3 pose metrics in geom/losses.py:9-27, both served there by the
external ``lietorch.Sim3``).  Same memory layout as lietorch (data split
[3, 4, 1]); tangent vectors are ``[tau(3), phi(3), sigma(1)]``.

All ops broadcast over leading axes and are jit/vmap-safe (Taylor-guarded
``where`` branches, no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie

_EPS = 1e-12


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    g = jnp.zeros(shape + (8,), dtype)
    return g.at[..., 6].set(1.0).at[..., 7].set(1.0)


def from_se3(g7: jnp.ndarray) -> jnp.ndarray:
    """Lift SE3 7-vectors to Sim3 with unit scale (lietorch ``Sim3(SE3)``)."""
    return jnp.concatenate([g7, jnp.ones_like(g7[..., :1])], axis=-1)


def to_se3(g: jnp.ndarray) -> jnp.ndarray:
    """Drop the scale row (caller asserts s == 1 semantics)."""
    return g[..., :7]


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(t1,R1,s1)·(t2,R2,s2) = (t1 + s1 R1 t2, R1 R2, s1 s2)."""
    t = a[..., :3] + a[..., 7:8] * lie.quat_act(a[..., 3:7], b[..., :3])
    q = lie.quat_mul(a[..., 3:7], b[..., 3:7])
    s = a[..., 7:8] * b[..., 7:8]
    return jnp.concatenate([t, q, s], axis=-1)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    qc = lie.quat_conj(g[..., 3:7])
    s_inv = 1.0 / g[..., 7:8]
    t = -s_inv * lie.quat_act(qc, g[..., :3])
    return jnp.concatenate([t, qc, s_inv], axis=-1)


def rel(gi: jnp.ndarray, gj: jnp.ndarray) -> jnp.ndarray:
    """G_ij = gj · gi^-1 (same convention as lie.se3_rel)."""
    return mul(gj, inv(gi))


def act(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Point action s R x + t."""
    return g[..., 7:8] * lie.quat_act(g[..., 3:7], x) + g[..., :3]


def act4(g: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous-depth action: (p, d) -> (s R p + d t, d).

    Matches lietorch Sim3.act4 / the reference's ``actp`` on Sim3
    (projective_ops.py:69-90): with p = P/Z and d = 1/Z the transformed
    pixel ray scales linearly in the disparity.
    """
    p = X[..., :3]
    d = X[..., 3:4]
    p1 = g[..., 7:8] * lie.quat_act(g[..., 3:7], p) + d * g[..., :3]
    return jnp.concatenate([p1, d], axis=-1)


def scale(g: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Scale the translation (lietorch ``.scale`` used by fit_scale)."""
    s = jnp.asarray(s)[..., None] if jnp.ndim(s) == g.ndim - 1 else s
    return jnp.concatenate([g[..., :3] * s, g[..., 3:]], axis=-1)


def _calc_W_coeffs(theta_sq, sigma):
    """Coefficients (A, B, C) of W = C I + A Phi + B Phi^2 where
    W = ∫_0^1 e^{sigma u} R(u phi) du (Strasdat's Sim3 exp; same algebra
    as Sophus calcW).  Shapes broadcast; all inputs (..., 1)."""
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    es = jnp.exp(sigma)
    small_t = theta_sq < 1e-8
    small_s = jnp.abs(sigma) < 1e-5

    sig_safe = jnp.where(small_s, 1.0, sigma)
    th_safe = jnp.where(small_t, 1.0, theta)
    c = sigma * sigma + theta_sq

    # C = (e^s - 1)/s ;  s->0: 1 + s/2 + s^2/6
    C = jnp.where(
        small_s,
        1.0 + sigma / 2.0 + sigma * sigma / 6.0,
        (es - 1.0) / sig_safe,
    )

    a = es * jnp.sin(theta)
    b = es * jnp.cos(theta)
    c_safe = jnp.where(c < _EPS, 1.0, c)

    # A = ∫ e^{su} sin(u t)/t du ; exact form, then the two Taylor limits
    A_exact = (a * sigma + (1.0 - b) * theta) / (th_safe * c_safe)
    A_sig = (es * (sigma - 1.0) + 1.0) / (sig_safe * sig_safe)  # t->0
    A_both = 0.5 + sigma / 3.0  # t->0, s->0 (first order in s)
    A = jnp.where(small_t, jnp.where(small_s, A_both, A_sig), A_exact)

    # B = (C - ((b-1) s + a t)/c) / t^2 ; limits likewise
    B_exact = (C - ((b - 1.0) * sigma + a * theta) / c_safe) / jnp.where(
        small_t, 1.0, theta_sq
    )
    B_sig = (es * (sigma * sigma - 2.0 * sigma + 2.0) - 2.0) / (
        2.0 * sig_safe ** 3
    )  # t->0
    B_both = 1.0 / 6.0 + sigma / 8.0  # t->0, s->0
    B = jnp.where(small_t, jnp.where(small_s, B_both, B_sig), B_exact)
    return A, B, C


def _apply_W(tau, phi, theta_sq, sigma, inverse=False):
    """W tau (or W^-1 tau) without materializing the 3x3: W tau =
    C tau + A (phi x tau) + B (phi x (phi x tau)).  The inverse solves the
    3x3 system explicitly (log is training-time only)."""
    A, B, C = _calc_W_coeffs(theta_sq, sigma)
    if not inverse:
        c1 = jnp.cross(phi, tau)
        c2 = jnp.cross(phi, c1)
        return C * tau + A * c1 + B * c2
    # build W and solve
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    o = jnp.zeros_like(x)
    Phi = jnp.stack(
        [o, -z, y, z, o, -x, -y, x, o], axis=-1
    ).reshape(phi.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=tau.dtype)
    W = C[..., None] * eye + A[..., None] * Phi + B[..., None] * (Phi @ Phi)
    return jnp.linalg.solve(W, tau[..., None])[..., 0]


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) exponential: [tau, phi, sigma] -> 8-vector."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = lie.so3_exp(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    t = _apply_W(tau, phi, theta_sq, sigma)
    return jnp.concatenate([t, q, jnp.exp(sigma)], axis=-1)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) log: 8-vector -> [tau, phi, sigma]."""
    phi = lie.so3_log(g[..., 3:7])
    sigma = jnp.log(g[..., 7:8])
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    tau = _apply_W(g[..., :3], phi, theta_sq, sigma, inverse=True)
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left retraction exp(xi) · g (matches lie.se3_retr convention)."""
    return mul(exp(xi), g)


def adjT(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Transpose (dual) adjoint ``Ad_g^T a`` for 7-tangents ``a=[v,w,l]``.

    Sim3 adjoint (Strasdat): Ad = [[s R, [t]x R, -t], [0, R, 0], [0, 0, 1]]
    so Ad^T a = [s R^T v, R^T (w - t x v), l - t·v].  Reduces to
    lie.se3_adjT on the first 6 rows when s == 1.
    """
    qinv = lie.quat_conj(g[..., 3:7])
    t = g[..., :3]
    s = g[..., 7:8]
    v, w, lam = a[..., :3], a[..., 3:6], a[..., 6:7]
    top = s * lie.quat_act(qinv, v)
    mid = lie.quat_act(qinv, w - jnp.cross(t, v))
    bot = lam - jnp.sum(t * v, axis=-1, keepdims=True)
    return jnp.concatenate([top, mid, bot], axis=-1)
