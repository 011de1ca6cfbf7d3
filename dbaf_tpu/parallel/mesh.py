"""Device-mesh scale-out: edge-parallel DBA via sharding annotations.

The reference is single-GPU (SURVEY.md 2.9); this module introduces the
multi-chip capability the TPU build adds.  Parallelism model:

* **edge parallelism** (the real data parallelism of DBA): covisibility
  edges shard across devices; each device linearizes its edge shard
  (projective Jacobians + per-edge Hessian blocks) locally, and the
  ``segment_sum`` assembly onto the (replicated, tiny) window pose system
  lowers to an XLA ``psum`` over the mesh -- the collective-based Schur
  reduction that replaces the reference's CPU accumulation loops
  (/root/reference/src/droid_kernels.cu:993-1043, 1297-1391);
* **frame parallelism** for batched feature extraction (plain data
  parallel over the frame axis);
* poses/depth-window state is replicated (it is small), so the dense solve
  runs redundantly on every device -- deterministic and communication-free.

Sharding is expressed with ``jax.sharding.NamedSharding`` + ``jit``; XLA
inserts the collectives.  An explicit ``shard_map`` variant with hand-placed
``psum`` is planned for the multi-host pipeline once profiling motivates it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import dba


def make_mesh(n_devices: Optional[int] = None, axis: str = "edge") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(dp: int, edge: int, dp_axis: str = "dp",
                 edge_axis: str = "edge") -> Mesh:
    """(dp x edge) mesh for the full training step: data-parallel tuple
    batch on the first axis, edge-parallel correlation/BA on the second
    (ICI-major so the edge collectives ride the faster links)."""
    devs = np.asarray(jax.devices()[: dp * edge]).reshape(dp, edge)
    return Mesh(devs, (dp_axis, edge_axis))


def sharded_ba_step(mesh: Mesh, axis: str = "edge"):
    """Build a jitted BA step with edges sharded across ``mesh``.

    Returns f(poses, disps, intrinsics, targets, weights, eta, ii, jj,
    mask, nfixed, nactive) -> BAState with edge-axis inputs sharded and
    window state replicated.
    """
    edge_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(
            rep, rep, rep,              # poses, disps, intrinsics
            edge_sh, edge_sh, rep,      # targets, weights, eta
            edge_sh, edge_sh, edge_sh,  # ii, jj, mask
            rep, rep,                   # nfixed, nactive
        ),
        out_shardings=rep,
    )
    def step(poses, disps, intrinsics, targets, weights, eta, ii, jj, mask,
             nfixed, nactive):
        return dba.ba(
            poses, disps, intrinsics, targets, weights, eta, ii, jj, mask,
            nfixed, nactive, iterations=2,
        )

    return step


def sharded_feature_step(mesh: Mesh, model, axis: str = "edge"):
    """Data-parallel feature extraction over the frame axis."""
    frame_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(rep, frame_sh),
        out_shardings=frame_sh,
    )
    def step(params, images):
        return model.apply({"params": params}, images, method=model.extract_features)

    return step
