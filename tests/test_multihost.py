"""Multi-process (multi-host) distributed correctness.

BASELINE.md config[4] / SURVEY.md §2.3 (end): the distributed backend
must run across processes with jax.distributed + a 2-D (dcn, ici) mesh
— processes on the DCN axis, local devices on ICI.  Real multi-host
hardware is not available here, so this launches TWO OS processes, each
with 4 virtual CPU devices, bootstraps jax.distributed over a local
coordinator, runs the edge-sharded dense and sparse-direct solvers over
the full 2x4 global mesh, and compares rank-0's result against the
single-process solvers computed in this test process (8 virtual
devices).  Same math, different reduction placement — agreement is at
float tolerance.
"""

import importlib.util
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "examples" / "multihost_worker.py"


def _load_worker_module():
    spec = importlib.util.spec_from_file_location(
        "multihost_worker", WORKER
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "rank0.npz"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(REPO)
    procs = []
    for rank in range(2):
        cmd = [
            sys.executable, str(WORKER), "--rank", str(rank),
            "--nprocs", "2", "--port", str(port),
        ]
        if rank == 0:
            cmd += ["--out", str(out)]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log}"
    data = np.load(out)

    # Single-process reference on this process's 8-device mesh.
    from ndt_feature_graph_tpu.graph import optimize as opt
    from ndt_feature_graph_tpu.graph import sparse_direct as sd

    worker = _load_worker_module()
    poses, edges = worker.build_graph()
    dense_ref, _ = opt.optimize(poses, edges, iterations=10)
    part = sd.make_segments(poses.shape[0], edges, max_seg_len=8)
    direct_ref, _ = sd.optimize_direct(
        poses, edges, part, iterations=10
    )

    np.testing.assert_allclose(
        data["dense"], np.asarray(dense_ref), atol=5e-4
    )
    np.testing.assert_allclose(
        data["direct"], np.asarray(direct_ref), atol=5e-4
    )
    # Both paths converge to the same optimum.
    np.testing.assert_allclose(
        data["dense"], data["direct"], atol=5e-3
    )
