"""Multi-host distributed execution: process init, DCN/ICI meshes, data
placement.

The reference is strictly single-machine (SURVEY.md 2.9: one ``cuda:0``,
shared-memory tensors, no NCCL/MPI); this module is the net-new scale-out
layer the TPU build adds (SURVEY.md 2.9 first bullet, 5.8).  Design:

* ``initialize()`` wraps :func:`jax.distributed.initialize` (idempotent,
  env-var driven) so every entry point -- demos, bench_scaling, tests --
  can join a multi-process run with one call.
* Meshes are **host-major**: the covisibility-edge axis is laid out so
  that consecutive devices within a host are adjacent.  XLA then builds
  hierarchical reductions whose heavy legs ride ICI and only the final
  per-host partials cross DCN.  ``hybrid_mesh`` exposes the explicit
  (dcn x ici) factorization via ``mesh_utils.create_hybrid_device_mesh``
  for programs that want distinct axes per fabric.
* Data placement: each process materializes only its local shard of the
  edge arrays (``global_edge_arrays``); window state (poses/disps) is
  tiny and fully replicated, so the Schur solve stays deterministic
  across hosts (parallel/shard_ba.py).

Emulation: multi-process CPU jax (Gloo collectives) validates the whole
path without a pod -- see tests/test_multihost.py (2 processes x 2
virtual devices, edge-sharded BA bit-matching single-process) and
``python -m dbaf_tpu.parallel.dist_worker``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> int:
    """Join (or create) the multi-process runtime; returns process count.

    No-op for single-process runs: when neither arguments nor the standard
    environment (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``, or a cloud-TPU metadata server) describe a
    multi-process job, nothing is initialized and 1 is returned.
    Idempotent across repeated calls.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count()

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return 1  # single process; jax.distributed not needed

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return jax.process_count()


def global_edge_mesh(axis: str = "edge") -> Mesh:
    """1-D mesh over ALL devices of ALL processes, host-major order.

    ``jax.devices()`` already enumerates devices grouped by process; the
    flat edge axis therefore keeps each host's shard contiguous, and the
    psum/all_gather in the edge-sharded BA reduce over ICI first and DCN
    last (XLA's hierarchical collectives).
    """
    return Mesh(np.asarray(jax.devices()), (axis,))


def hybrid_mesh(
    ici_shape: Optional[Sequence[int]] = None,
    dcn_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("host", "edge"),
) -> Mesh:
    """Explicit (dcn x ici) mesh: outer axes cross hosts (DCN), inner axes
    stay within a host/slice (ICI).  Defaults to (n_processes,
    devices_per_process)."""
    from jax.experimental import mesh_utils

    n_proc = jax.process_count()
    per_proc = len(jax.devices()) // max(n_proc, 1)
    if dcn_shape is None:
        dcn_shape = (n_proc, 1)
    if ici_shape is None:
        ici_shape = (1, per_proc)
    if n_proc == 1:
        devs = mesh_utils.create_device_mesh(
            tuple(a * b for a, b in zip(dcn_shape, ici_shape))
        )
    else:
        devs = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), tuple(dcn_shape)
        )
    return Mesh(devs, tuple(axis_names))


def process_edge_slice(E: int, axis_size: Optional[int] = None) -> slice:
    """This process's contiguous slice of a length-E edge axis sharded
    over the global device order."""
    n_proc = jax.process_count()
    assert E % max(axis_size or len(jax.devices()), 1) == 0, (
        f"edge count {E} must divide the mesh axis")
    per = E // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_edge_arrays(mesh: Mesh, axis: str, *host_arrays):
    """Build globally edge-sharded jax Arrays from per-process host data.

    Each process passes only ITS slice (``process_edge_slice``) of every
    edge-axis array; the returned Arrays are addressable-shard-local but
    participate in global collectives.  Single-process runs shard the full
    arrays directly.
    """
    sh = NamedSharding(mesh, P(axis))
    out = []
    for a in host_arrays:
        a = np.asarray(a)
        out.append(jax.make_array_from_process_local_data(sh, a))
    return tuple(out)


def replicated(mesh: Mesh, *host_arrays):
    """Fully replicated global Arrays (every process passes the same
    values -- window poses/disparities/intrinsics)."""
    sh = NamedSharding(mesh, P())
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in host_arrays
    )
