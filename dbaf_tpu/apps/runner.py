"""Shared streaming runner for the dataset demos."""

from __future__ import annotations

import json
from typing import Iterable, Optional

from ..eval.ate import evaluate_trajectory
from ..eval.traj_io import write_tum
from ..slam.system import DBAFusion
from ..utils.jax_setup import setup as _jax_setup

_jax_setup()


def weights_selftest(weights_path: str) -> dict:
    """Checkpoint conversion self-test (reference surgery dbaf.py:38-48).

    Loads + validates the .pth (raises ConversionError with the offending
    parameter path on mismatch), then runs one f32 update step on the CPU
    backend and sanity-checks the outputs.  Wired as ``--selftest`` in the
    dataset demos."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import DroidNet
    from ..models.convert import load_droid_weights

    params = load_droid_weights(weights_path)  # validates
    model = DroidNet(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        imgs = jnp.asarray(
            rng.integers(0, 255, size=(1, 64, 80, 3)), jnp.float32
        )
        fmaps, net, inp = model.apply(
            {"params": params}, imgs, method=model.extract_features
        )
        corr = jnp.asarray(rng.normal(size=(1, 8, 10, 196)), jnp.float32)
        net2, delta, weight, _, _ = model.apply(
            {"params": params}, net, inp, corr, None,
            method=model.update_step,
        )
    ok = (
        np.all(np.isfinite(np.asarray(delta)))
        and np.all(np.isfinite(np.asarray(weight)))
        and float(jnp.min(weight)) >= 0.0
        and float(jnp.max(weight)) <= 1.0
    )
    if not ok:
        raise RuntimeError(
            "weights self-test: update op produced non-finite or "
            "out-of-range outputs from " + weights_path
        )
    out = {"selftest": "ok", "weights": weights_path,
           "fmap_shape": list(fmaps.shape), "delta_ch": delta.shape[-1]}
    print(_json.dumps(out))
    return out


def run(
    system: DBAFusion,
    stream: Iterable,
    result_path: Optional[str] = None,
    pkl_path: Optional[str] = None,
    gt_path: Optional[str] = None,
    max_frames: Optional[int] = None,
) -> dict:
    """Track a stream; write the TUM trajectory, optional reconstruction,
    optional ATE vs ground truth."""
    n = 0
    try:
        for t, image, intrinsics in stream:
            system.track(t, image, intrinsics=intrinsics)
            n += 1
            if max_frames is not None and n >= max_frames:
                break
    except KeyboardInterrupt:
        pass
    finally:
        traj = system.terminate()
        if result_path:
            ecef = system.trajectory_ecef
            if ecef:
                # reference row format once georeferenced: the 8 TUM fields
                # + 3 ECEF fields (dbaf_frontend.py:270-272)
                rows = [
                    list(r) + list(ecef[k]) if k in ecef else list(r)
                    for k, r in enumerate(traj)
                ]
                write_tum(result_path, rows)
            else:
                write_tum(result_path, traj)
        if pkl_path and system.cfg.save_pkl:
            from ..eval.export import save_reconstruction

            save_reconstruction(system, pkl_path)

    out = {"frames": n, "keyframes": int(len(traj))}
    if gt_path and len(traj) > 3:
        from ..eval.traj_io import read_tum

        ref = read_tum(gt_path)
        out.update(evaluate_trajectory(traj, ref, align="se3"))
    print(json.dumps(out))
    return out
