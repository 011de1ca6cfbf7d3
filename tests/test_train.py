"""Training-path tests: convex upsampling, unrolled forward, gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dbaf_tpu.models import DroidNet
from dbaf_tpu.ops import lie
from dbaf_tpu.train import losses
from dbaf_tpu.train.unroll import cvx_upsample, forward, upsample_disp


def test_cvx_upsample_center_mask(rng):
    N, H, W, C = 1, 3, 4, 2
    data = jnp.asarray(rng.normal(size=(N, H, W, C)), jnp.float32)
    # mask heavily favoring the center tap (index 4 of the 3x3, row-major)
    m = np.full((N, H, W, 9, 8, 8), -50.0, np.float32)
    m[:, :, :, 4] = 50.0
    up = cvx_upsample(data, jnp.asarray(m.reshape(N, H, W, 9 * 64)))
    assert up.shape == (N, 8 * H, 8 * W, C)
    # each 8x8 block equals the center pixel value
    np.testing.assert_allclose(
        np.asarray(up[0, 8 : 16, 16 : 24, 0]),
        float(data[0, 1, 2, 0]) * np.ones((8, 8)),
        atol=1e-4,
    )


def _tiny_problem(rng, n_frames=4, h8=6, w8=8):
    poses = [np.asarray(lie.se3_identity())]
    for _ in range(n_frames - 1):
        xi = np.concatenate([rng.normal(size=3) * 0.1, rng.normal(size=3) * 0.03])
        poses.append(
            np.asarray(
                lie.se3_mul(
                    lie.se3_exp(jnp.asarray(xi, jnp.float32)),
                    jnp.asarray(poses[-1]),
                )
            )
        )
    poses = jnp.asarray(np.stack(poses), jnp.float32)
    disps = jnp.asarray(0.5 + 0.3 * rng.random((n_frames, h8, w8)), jnp.float32)
    intr = jnp.asarray([2.0 * w8, 2.0 * w8, w8 / 2, h8 / 2], jnp.float32)
    ii, jj = np.meshgrid(np.arange(n_frames), np.arange(n_frames), indexing="ij")
    keep = np.abs(ii - jj) == 1
    return poses, disps, intr, jnp.asarray(ii[keep]), jnp.asarray(jj[keep])


@pytest.mark.slow
def test_unrolled_forward_shapes_and_grad(rng):
    n_frames, h8, w8 = 4, 6, 8
    poses_gt, disps_gt, intr, ii, jj = _tiny_problem(rng, n_frames, h8, w8)
    images = jnp.asarray(
        rng.integers(0, 255, size=(n_frames, 8 * h8, 8 * w8, 3)), jnp.float32
    )

    model = DroidNet(dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), images[:1], method=model.extract_features
    )["params"]
    uparams = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((2, h8, w8, 128)), jnp.zeros((2, h8, w8, 128)),
        jnp.zeros((2, h8, w8, 196)), jnp.zeros((2, h8, w8, 4)),
        jnp.asarray([0, 1]), 2,
        method=model.update_with_agg,
    )["params"]
    params = {**params, **uparams}

    poses0 = jnp.tile(lie.se3_identity()[None], (n_frames, 1))
    disps0 = jnp.ones((n_frames, h8, w8), jnp.float32)

    def loss_fn(p):
        poses_list, disps_list, residuals = forward(
            model, p, images, poses0, disps0, intr, ii, jj, num_steps=2
        )
        lg, _ = losses.geodesic_loss(poses_gt, poses_list, ii, jj)
        lr, _ = losses.residual_loss(residuals)
        lf, _ = losses.flow_loss(
            poses_gt, disps_gt, poses_list,
            [d[:, 3::8, 3::8] for d in disps_list], intr, gamma=0.9,
        )
        return lg + lr + 0.1 * lf

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0


def test_loss_zero_at_truth(rng):
    poses_gt, disps_gt, intr, ii, jj = _tiny_problem(rng)
    lg, _ = losses.geodesic_loss(poses_gt, [poses_gt], ii, jj)
    assert float(lg) < 1e-4
    lf, m = losses.flow_loss(
        poses_gt, disps_gt, [poses_gt], [disps_gt], intr
    )
    assert float(lf) < 1e-3


@pytest.mark.slow
def test_full_train_step_sharded_matches_single(rng):
    """One full training step (unrolled forward + losses + adamw update)
    jitted over a (dp=2, edge=4) mesh must run with sharded batch inputs
    and agree with the unsharded step."""
    import optax

    from dbaf_tpu.parallel import make_mesh_2d
    from dbaf_tpu.train.trainer import (
        make_optimizer, make_train_step, shard_batch,
    )

    assert jax.device_count() >= 8, jax.devices()
    B, n_frames, h8, w8 = 2, 4, 6, 8

    model = DroidNet(dtype=jnp.float32)
    probe = jnp.zeros((1, 8 * h8, 8 * w8, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), probe, method=model.extract_features
    )["params"]
    uparams = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((2, h8, w8, 128)), jnp.zeros((2, h8, w8, 128)),
        jnp.zeros((2, h8, w8, 196)), jnp.zeros((2, h8, w8, 4)),
        jnp.asarray([0, 1]), 2,
        method=model.update_with_agg,
    )["params"]
    params = {**params, **uparams}

    samples = []
    for b in range(B):
        poses_gt, disps_gt, intr, ii, jj = _tiny_problem(rng, n_frames, h8, w8)
        keep = np.arange(8)  # 8 edges, divisible by the edge axis
        samples.append(dict(
            images=jnp.asarray(
                rng.integers(0, 255, size=(n_frames, 8 * h8, 8 * w8, 3)),
                jnp.float32),
            poses0=jnp.tile(lie.se3_identity()[None], (n_frames, 1)),
            disps0=jnp.ones((n_frames, h8, w8), jnp.float32),
            poses_gt=poses_gt, disps_gt=disps_gt, intrinsics=intr,
            ii=ii[keep], jj=jj[keep],
        ))
    batch = {k: jnp.stack([s[k] for s in samples]) for k in samples[0]}

    tx = make_optimizer(lr=1e-4, total_steps=100)
    opt_state = tx.init(params)

    # unsharded reference
    step0 = make_train_step(model, tx, num_steps=1)
    p0, _, m0 = step0(params, opt_state, batch)

    # sharded
    mesh = make_mesh_2d(2, 4)
    stepS = make_train_step(model, tx, num_steps=1, mesh=mesh)
    pS, _, mS = stepS(params, opt_state, shard_batch(batch, mesh))

    assert np.isfinite(float(m0["loss"]))
    np.testing.assert_allclose(
        float(m0["loss"]), float(mS["loss"]), rtol=1e-4)
    # parameters updated and equal across layouts
    d0 = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, pS)
    assert max(jax.tree_util.tree_leaves(d0)) < 1e-4
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


@pytest.mark.slow
def test_training_objective_decreases(rng):
    """Optimizing the unrolled objective on a fixed tiny batch must make
    real progress (not just produce one finite forward/backward): 8 adamw
    steps on the same covisible tuple cut the loss by >15%."""
    from dbaf_tpu.train.trainer import make_optimizer, make_train_step

    n_frames, h8, w8 = 4, 6, 8
    model = DroidNet(dtype=jnp.float32)
    probe = jnp.zeros((1, 8 * h8, 8 * w8, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), probe, method=model.extract_features
    )["params"]
    uparams = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((2, h8, w8, 128)), jnp.zeros((2, h8, w8, 128)),
        jnp.zeros((2, h8, w8, 196)), jnp.zeros((2, h8, w8, 4)),
        jnp.asarray([0, 1]), 2,
        method=model.update_with_agg,
    )["params"]
    params = {**params, **uparams}

    poses_gt, disps_gt, intr, ii, jj = _tiny_problem(rng, n_frames, h8, w8)
    sample = dict(
        images=jnp.asarray(
            rng.integers(0, 255, size=(n_frames, 8 * h8, 8 * w8, 3)),
            jnp.float32),
        poses0=jnp.tile(lie.se3_identity()[None], (n_frames, 1)),
        disps0=jnp.ones((n_frames, h8, w8), jnp.float32),
        poses_gt=poses_gt, disps_gt=disps_gt, intrinsics=intr,
        ii=ii, jj=jj,
    )
    batch = {k: v[None] for k, v in sample.items()}

    # total_steps must keep pct_start*total >= 1 (a sub-step warmup
    # segment makes linear_onecycle interpolate over a zero interval ->
    # NaN lr); 400 puts 8 steps inside a sane ramp
    tx = make_optimizer(lr=2e-3, total_steps=400)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, num_steps=1)

    hist = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, batch)
        hist.append(float(metrics["loss"]))
    assert all(np.isfinite(hist)), hist
    assert min(hist[4:]) < 0.85 * hist[0], hist
