"""DBA solver tests: assembly vs a python-loop oracle, and GN convergence on
a synthetic scene (the 'fake backend' strategy from SURVEY.md section 4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dbaf_tpu.ops import dba, lie, projective as pj


def make_problem(rng, P=4, ht=8, wd=10, n_edges=None):
    poses_gt = [np.asarray(lie.se3_identity())]
    for _ in range(P - 1):
        xi = np.concatenate([rng.normal(size=3) * 0.15, rng.normal(size=3) * 0.05])
        poses_gt.append(
            np.asarray(lie.se3_mul(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float32)),
                                   jnp.asarray(poses_gt[-1])))
        )
    poses_gt = jnp.asarray(np.stack(poses_gt), dtype=jnp.float32)
    disps_gt = jnp.asarray(0.6 + 0.2 * rng.random((P, ht, wd)), dtype=jnp.float32)
    intr = jnp.asarray([20.0, 20.0, wd / 2, ht / 2], dtype=jnp.float32)

    ii, jj = np.meshgrid(np.arange(P), np.arange(P), indexing="ij")
    keep = (np.abs(ii - jj) >= 1) & (np.abs(ii - jj) <= 2)
    ii = jnp.asarray(ii[keep])
    jj = jnp.asarray(jj[keep])
    targets, valid = pj.projective_transform(poses_gt, disps_gt, intr, ii, jj)
    weights = jnp.ones(targets.shape, dtype=jnp.float32)
    return poses_gt, disps_gt, intr, ii, jj, targets, weights


def dense_oracle_step(poses, disps, intr, targets, weights, ii, jj, nfixed, eta,
                      lm=1e-4, ep=0.1):
    """One GN step via explicit dense assembly in numpy (python loops)."""
    P = poses.shape[0]
    ht, wd = disps.shape[-2:]
    D = ht * wd
    E = len(ii)

    J = pj.projection_jacobians(poses, disps, intr, ii, jj)
    r = np.asarray(targets - J.coords).reshape(E, D, 2)
    w = 0.001 * np.asarray(weights).reshape(E, D, 2) * np.asarray(J.valid).reshape(E, D, 1)

    Ji = np.asarray(J.Ji).reshape(E, D, 2, 6)
    Jj = np.asarray(J.Jj).reshape(E, D, 2, 6)
    Jz = np.asarray(J.Jz).reshape(E, D, 2)

    A = np.zeros((P, 6, P, 6))
    b = np.zeros((P, 6))
    Emat = np.zeros((P, 6, P, D))
    C = np.zeros((P, D))
    wz = np.zeros((P, D))

    iin = np.asarray(ii)
    jjn = np.asarray(jj)
    active = lambda a: a >= nfixed

    for e in range(E):
        i, j = iin[e], jjn[e]
        Jx = np.concatenate([Ji[e], Jj[e]], axis=-1)  # (D,2,12)
        wJx = w[e][..., None] * Jx
        H = np.einsum("dkc,dkf->cf", wJx, Jx)
        v = np.einsum("dkc,dk->c", wJx, r[e])
        if active(i):
            A[i, :, i, :] += H[:6, :6]
            b[i] += v[:6]
        if active(j):
            A[j, :, j, :] += H[6:, 6:]
            b[j] += v[6:]
        if active(i) and active(j):
            A[i, :, j, :] += H[:6, 6:]
            A[j, :, i, :] += H[6:, :6]
        wJz = w[e] * Jz[e]  # (D,2)
        Ei = np.einsum("dk,dkc->cd", wJz, Ji[e])
        Ej = np.einsum("dk,dkc->cd", wJz, Jj[e])
        if active(i):
            Emat[i, :, i, :] += Ei
        if active(j):
            Emat[j, :, i, :] += Ej
        C[i] += np.sum(w[e] * Jz[e] ** 2, axis=-1)
        wz[i] += np.sum(w[e] * r[e] * Jz[e], axis=-1)

    C = C + np.asarray(eta).reshape(P, D)
    Q = 1.0 / C

    A = A.reshape(P * 6, P * 6)
    b = b.reshape(P * 6)
    Emat = Emat.reshape(P * 6, P * D)
    S = A - Emat @ (Q.reshape(-1)[:, None] * Emat.T)
    v_r = b - Emat @ (Q.reshape(-1) * wz.reshape(-1))

    # damping + identity rows for fixed poses
    S = S + np.diag(ep + lm * np.diag(S))
    act6 = np.repeat(np.arange(P) >= nfixed, 6)
    S[~act6] = 0.0
    S[:, ~act6] = 0.0
    S[np.ix_(~act6, ~act6)] = np.eye((~act6).sum())
    v_r[~act6] = 0.0

    dx = np.linalg.solve(S, v_r)
    dx_m = dx.copy()
    dx_m[nfixed * 6 : (nfixed + 1) * 6] = 0.0  # EvT ix<=0 quirk
    dz = Q.reshape(-1) * (wz.reshape(-1) - Emat.T @ dx_m)
    return dx.reshape(P, 6), dz.reshape(P, D)


def test_single_iteration_matches_oracle(rng):
    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(rng)
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]

    # perturb
    xi = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, dtype=jnp.float32)
    poses = lie.se3_retr(poses_gt, xi)
    disps = disps_gt * jnp.asarray(1 + 0.05 * rng.normal(size=disps_gt.shape), dtype=jnp.float32)

    nfixed = 1
    eta = jnp.full((P, ht * wd), 1e-4, dtype=jnp.float32)
    edge_mask = jnp.ones(ii.shape, dtype=bool)

    out = dba.ba(
        poses, disps, intr, targets, weights, eta, ii, jj, edge_mask,
        jnp.asarray(nfixed), jnp.asarray(P), iterations=1,
    )

    dx_ref, dz_ref = dense_oracle_step(
        poses, disps, intr, targets, weights, ii, jj, nfixed, eta
    )
    poses_ref = np.array(lie.se3_retr(poses, jnp.asarray(dx_ref, dtype=jnp.float32)))
    poses_ref[:nfixed] = np.asarray(poses[:nfixed])
    disps_ref = np.clip(np.asarray(disps) + dz_ref.reshape(P, ht, wd), 0.001, None)

    np.testing.assert_allclose(np.asarray(out.poses), poses_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.disps), disps_ref, atol=1e-4)


def residual_norm(poses, disps, intr, targets, weights, ii, jj):
    coords, valid = pj.projective_transform(poses, disps, intr, ii, jj)
    r = (targets - coords) * valid * weights
    return float(jnp.sqrt(jnp.mean(r**2)))


def test_gn_converges_on_synthetic_scene(rng):
    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(rng)
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]

    xi = jnp.asarray(rng.normal(size=(P, 6)) * 0.03, dtype=jnp.float32)
    xi = xi.at[:2].set(0.0)  # keep both anchors at ground truth (fixes gauge)
    poses = lie.se3_retr(poses_gt, xi)
    disps = disps_gt * jnp.asarray(1 + 0.1 * rng.normal(size=disps_gt.shape), dtype=jnp.float32)

    r0 = residual_norm(poses, disps, intr, targets, weights, ii, jj)

    eta = jnp.full((P, ht * wd), 1e-7, dtype=jnp.float32)
    edge_mask = jnp.ones(ii.shape, dtype=bool)
    out = dba.ba(
        poses, disps, intr, targets, weights, eta, ii, jj, edge_mask,
        jnp.asarray(2), jnp.asarray(P), iterations=8,
    )
    r1 = residual_norm(out.poses, out.disps, intr, targets, weights, ii, jj)
    assert r1 < 0.2 * r0, (r0, r1)


def test_padded_edges_are_inert(rng):
    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(rng)
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]
    eta = jnp.full((P, ht * wd), 1e-4, dtype=jnp.float32)

    xi = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, dtype=jnp.float32)
    poses = lie.se3_retr(poses_gt, xi)
    disps = disps_gt

    mask = jnp.ones(ii.shape, dtype=bool)
    out1 = dba.ba(poses, disps, intr, targets, weights, eta, ii, jj, mask,
                  jnp.asarray(1), jnp.asarray(P), iterations=1)

    # append garbage padded edges with mask=0
    pad = 5
    ii2 = jnp.concatenate([ii, jnp.zeros(pad, dtype=ii.dtype)])
    jj2 = jnp.concatenate([jj, jnp.zeros(pad, dtype=jj.dtype)])
    t2 = jnp.concatenate([targets, 1e3 * jnp.ones((pad,) + targets.shape[1:])], axis=0)
    w2 = jnp.concatenate([weights, jnp.ones((pad,) + weights.shape[1:])], axis=0)
    mask2 = jnp.concatenate([mask, jnp.zeros(pad, dtype=bool)])
    out2 = dba.ba(poses, disps, intr, t2, w2, eta, ii2, jj2, mask2,
                  jnp.asarray(1), jnp.asarray(P), iterations=1)

    np.testing.assert_allclose(np.asarray(out1.poses), np.asarray(out2.poses), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.disps), np.asarray(out2.disps), atol=1e-5)


def test_motion_only_keeps_disps(rng):
    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(rng)
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]
    eta = jnp.full((P, ht * wd), 1e-4, dtype=jnp.float32)
    xi = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, dtype=jnp.float32)
    poses = lie.se3_retr(poses_gt, xi)
    out = dba.ba(poses, disps_gt, intr, targets, weights, eta, ii, jj,
                 jnp.ones(ii.shape, dtype=bool), jnp.asarray(1), jnp.asarray(P),
                 iterations=2, motion_only=True)
    np.testing.assert_allclose(np.asarray(out.disps), np.asarray(disps_gt), atol=1e-6)
    # residual should still drop
    r0 = residual_norm(poses, disps_gt, intr, targets, weights, ii, jj)
    r1 = residual_norm(out.poses, out.disps, intr, targets, weights, ii, jj)
    assert r1 < r0


def test_pairwise_schur_matches_dense(rng):
    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(rng)
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]
    xi = jnp.asarray(rng.normal(size=(P, 6)) * 0.02, dtype=jnp.float32)
    poses = lie.se3_retr(poses_gt, xi)
    disps = disps_gt * jnp.asarray(
        1 + 0.05 * rng.normal(size=disps_gt.shape), dtype=jnp.float32
    )
    eta = jnp.full((P, ht * wd), 1e-4, dtype=jnp.float32)
    mask = jnp.ones(ii.shape, dtype=bool)
    args = (poses, disps, intr, targets, weights, eta, ii, jj, mask,
            jnp.asarray(1), jnp.asarray(P))
    out_d = dba.ba(*args, iterations=2, schur="dense")
    out_p = dba.ba(*args, iterations=2, schur="pairwise")
    np.testing.assert_allclose(
        np.asarray(out_d.poses), np.asarray(out_p.poses), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_d.disps), np.asarray(out_p.disps), atol=2e-4
    )


def test_reduced_system_is_symmetric(rng):
    poses_gt, disps_gt, intr, ii, jj, targets, weights = make_problem(rng)
    P = poses_gt.shape[0]
    ht, wd = disps_gt.shape[-2:]
    es = dba.build_edge_system(
        poses_gt, disps_gt, intr, targets, weights, ii, jj,
        jnp.ones(ii.shape, dtype=bool),
    )
    ws = dba.assemble_window_system(
        es, ii, jj, P, jnp.asarray(1), jnp.asarray(P),
        jnp.full((P, ht * wd), 1e-4, dtype=jnp.float32),
    )
    S, v = dba.reduced_camera_system(ws)
    np.testing.assert_allclose(np.asarray(S), np.asarray(S).T, atol=1e-4)
