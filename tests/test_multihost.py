"""Multi-host (multi-process) distributed layer tests.

Emulates a 2-host run with two OS processes of 2 virtual CPU devices each
(jax.distributed + Gloo collectives), runs the edge-sharded DBA iteration
over the global 4-device mesh, and checks the result against the same
problem solved single-process.  This validates the entire multi-host
path -- process init, host-major global mesh, per-process shard
placement, cross-process psum/all_gather -- without TPU pod hardware
(SURVEY.md 2.9 / 5.8; the reference has no multi-machine capability).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    env["XLA_FLAGS"] = flags.strip()
    env["JAX_PLATFORMS"] = ""
    return env


def _run_workers(n_proc, n_dev_each, outdir, extra=()):
    port = _free_port()
    procs = []
    outs = []
    for pid in range(n_proc):
        out = os.path.join(outdir, f"p{pid}.npz")
        outs.append(out)
        cmd = [
            sys.executable, "-m", "dbaf_tpu.parallel.dist_worker",
            "--process-id", str(pid), "--num-processes", str(n_proc),
            "--coordinator", f"localhost:{port}",
            "--cpu-devices", str(n_dev_each),
            "--out", out, *extra,
        ]
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=_clean_env(),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    rc = [p.wait(timeout=600) for p in procs]
    for p, code in zip(procs, rc):
        if code != 0:
            err = p.stderr.read().decode()
            raise AssertionError(f"worker failed rc={code}:\n{err[-3000:]}")
    return outs


@pytest.mark.slow
def test_two_process_edge_sharded_ba_matches_single(tmp_path):
    outs2 = _run_workers(2, 2, str(tmp_path))
    # single-process reference on the same total device count
    out1 = os.path.join(str(tmp_path), "single")
    os.makedirs(out1)
    outs1 = _run_workers(1, 4, out1)

    two = np.load(outs2[0])
    one = np.load(outs1[0])
    np.testing.assert_allclose(two["poses"], one["poses"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(two["disps"], one["disps"],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_timing_mode(tmp_path):
    """The scaling-harness mode (--time) runs and reports a finite
    per-iteration latency across 2 processes."""
    outs = _run_workers(2, 2, str(tmp_path), extra=("--time", "2"))
    dat = np.load(outs[0])
    assert float(dat["iter_ms"]) > 0.0


def test_single_process_initialize_noop():
    """dist.initialize is a no-op without multi-process env/args."""
    from dbaf_tpu.parallel import dist

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        assert var not in os.environ, f"leaked {var}"
    assert dist.initialize() == 1
    mesh = dist.global_edge_mesh()
    assert mesh.devices.size == len(__import__("jax").devices())


def test_hybrid_mesh_single_process_shape():
    from dbaf_tpu.parallel import dist

    mesh = dist.hybrid_mesh(ici_shape=(1, 4), dcn_shape=(2, 1),
                            axis_names=("host", "edge"))
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("host", "edge")
