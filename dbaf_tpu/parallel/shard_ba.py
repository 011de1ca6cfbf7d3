"""Explicit shard_map edge-parallel DBA with hand-placed collectives.

The distributed decomposition (SURVEY.md 2.9 / 5.8):

* **sharded**: the expensive per-edge linearization (projective Jacobians
  over all pixels, per-edge Hessian blocks and depth couplings) -- each
  device handles its shard of covisibility edges;
* **psum over ICI**: the segment-sum assembly of the depth diagonal (C, w)
  and the pose system (A, b) onto the replicated window state;
* **all_gather**: the per-edge pose-depth couplings (a few MB) so every
  device forms the same Schur complement -- the pose window is tiny, so the
  reduced solve is replicated and deterministic instead of distributed.

This mirrors ``jax.jit`` + sharding annotations (parallel/mesh.py) but makes
the communication pattern explicit and testable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import dba


def make_sharded_ba_iteration(mesh: Mesh, P_win: int, axis: str = "edge"):
    """One edge-sharded GN iteration; same math as dba.ba's body."""

    rep = P()
    esh = P(axis)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, esh, esh, rep, esh, esh, esh, rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    def iteration(poses, disps, intrinsics, targets, weights, eta, ii, jj,
                  mask, nfixed, nactive):
        # ---- sharded: per-edge linearization on the local edge shard
        es = dba.build_edge_system(
            poses, disps, intrinsics, targets, weights, ii, jj, mask
        )

        li, lj = dba._edge_pose_indices(ii, jj, nfixed, nactive)
        ki = jnp.clip(ii, 0, P_win - 1)

        # ---- psum: depth diagonal + pose system assembled across shards
        C_part, w_part = dba._accumulate_depth_diag(es, ki, P_win)
        C = jax.lax.psum(C_part, axis)
        w = jax.lax.psum(w_part, axis)

        slot = jnp.arange(P_win)
        depth_active = slot < nactive
        C, w = dba._finish_depth_diag(
            C, w, eta, depth_active, None, None, 0.05
        )
        Q = 1.0 / C

        A_part, b_part = dba._accumulate_pose_system(es, li, lj, P_win)
        A = jax.lax.psum(A_part, axis)
        b = jax.lax.psum(b_part, axis)

        # ---- all_gather: per-edge couplings for the replicated Schur
        Ei = es.Ei * (li >= 0)[:, None, None]
        Ej = es.Ej * (lj >= 0)[:, None, None]
        Exy_l = jnp.concatenate([Ei, Ej], axis=1)  # (E_local, 12, D)
        Exy = jax.lax.all_gather(Exy_l, axis, tiled=True)
        ii_g = jax.lax.all_gather(ii, axis, tiled=True)
        li_g = jax.lax.all_gather(li, axis, tiled=True)
        lj_g = jax.lax.all_gather(lj, axis, tiled=True)

        E_tot, _, D = Exy.shape
        ki_g = jnp.clip(ii_g, 0, P_win - 1)
        ExyQ = Exy * Q[ki_g][:, None, :]
        T = jnp.matmul(
            ExyQ.reshape(E_tot * 12, D), Exy.reshape(E_tot * 12, D).T,
            precision=dba.HIGH,
        ).reshape(E_tot, 12, E_tot, 12)
        pair = (ii_g[:, None] == ii_g[None, :]).astype(T.dtype)
        T = T * pair[:, None, :, None]

        roles = (li_g, lj_g)
        EQEt = jnp.zeros((P_win, P_win, 6, 6), dtype=T.dtype)
        for a in range(2):
            for c in range(2):
                blk = T[:, 6 * a : 6 * a + 6, :, 6 * c : 6 * c + 6]
                blk = blk.transpose(0, 2, 1, 3).reshape(E_tot * E_tot, 6, 6)
                rows = jnp.broadcast_to(roles[a][:, None], (E_tot, E_tot)).reshape(-1)
                cols = jnp.broadcast_to(roles[c][None, :], (E_tot, E_tot)).reshape(-1)
                EQEt = EQEt + dba._segment_matrix(blk, rows, cols, P_win)

        Qw = Q * w
        Ev = jnp.einsum("ecd,ed->ec", Exy, Qw[ki_g], precision=dba.HIGH)
        EQw = dba._segment_vector(Ev[:, :6], li_g, P_win) + \
            dba._segment_vector(Ev[:, 6:], lj_g, P_win)

        pose_active = (slot >= nfixed) & (slot < nactive)
        pa6 = jnp.repeat(pose_active, 6)
        A2 = A.transpose(0, 2, 1, 3).reshape(P_win * 6, P_win * 6)
        A2 = jnp.where(pa6[:, None] & pa6[None, :], A2, 0.0)
        S = A2 - EQEt.transpose(0, 2, 1, 3).reshape(P_win * 6, P_win * 6)
        v_r = jnp.where(pa6, (b.reshape(P_win * 6) - EQw.reshape(P_win * 6)), 0.0)

        # ---- replicated solve + depth back-substitution on local edges
        dx = dba.damped_solve(S, v_r, pose_active, 1e-4, 0.1)
        dxm = dx.reshape(P_win, 6)
        dxm = jnp.where((slot == nfixed)[:, None], 0.0, dxm)
        dxi = jnp.where((li >= 0)[:, None], dxm[jnp.clip(li, 0, P_win - 1)], 0.0)
        dxj = jnp.where((lj >= 0)[:, None], dxm[jnp.clip(lj, 0, P_win - 1)], 0.0)
        dw_l = jnp.einsum("ecd,ec->ed", es.Ei, dxi, precision=dba.HIGH) + \
            jnp.einsum("ecd,ec->ed", es.Ej, dxj, precision=dba.HIGH)
        acc = jax.lax.psum(
            jax.ops.segment_sum(dw_l, ki, num_segments=P_win), axis
        )
        dz = Q * (w - acc)

        new_poses, new_disps = dba.retract(
            poses, disps, dx, dz, pose_active, depth_active
        )
        return new_poses, jnp.clip(new_disps, 0.001, None)

    return jax.jit(iteration)
