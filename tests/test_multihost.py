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


def _build_link_graph(worker, path):
    """Build the tiny node graph ONCE in this process and checkpoint it
    for both workers (building it per rank would double the runtime)."""
    import jax
    import jax.numpy as jnp

    from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
    from ndt_feature_graph_tpu.io import dataset

    lp = worker.link_params()
    traj = dataset.loop_trajectory(20, radius=4.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(7), traj, num_beams=180, max_range=8.0
    )
    slam = NDTFeatureGraphSLAM(lp, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    slam.run_sequence_chunked(seq.odom, seq.ranges, seq.hit, chunk=10)
    slam.finalize_current_node()
    slam.save(path)
    return slam


def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "rank0.npz"
    graph_path = tmp_path / "graph.npz"
    worker = _load_worker_module()
    slam = _build_link_graph(worker, str(graph_path))

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(REPO)
    procs = []
    for rank in range(2):
        cmd = [
            sys.executable, str(WORKER), "--rank", str(rank),
            "--nprocs", "2", "--port", str(port),
            "--graph", str(graph_path),
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
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log}"
    data = np.load(out)

    # Single-process references computed in this test process.
    from ndt_feature_graph_tpu.graph import optimize as opt
    from ndt_feature_graph_tpu.graph import sparse_direct as sd

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

    # Data-parallel fused scan step across the process boundary: the
    # trajectories must match the single-process fleet driver.
    from ndt_feature_graph_tpu.fusion import scan_driver

    fp = worker.fleet_params()
    states, odom, pts, mask = worker.build_fleet_case()
    _f, trajs_ref, scores_ref = scan_driver.run_sequence_batch(
        fp, states, odom, pts, mask
    )
    np.testing.assert_allclose(
        data["fleet_trajs"], np.asarray(trajs_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        data["fleet_scores"], np.asarray(scores_ref), rtol=1e-4,
        atol=1e-3,
    )

    # Sharded link proposal across the process boundary vs the
    # single-process batch (same pair list, same per-pair PRNG keys).
    import jax
    from ndt_feature_graph_tpu.graph import links as links_mod
    from ndt_feature_graph_tpu.graph import node as node_mod

    lp = worker.link_params()
    stacked = node_mod.stack_nodes(slam.nodes)
    ref_i, mov_i, pmask = worker.link_pair_case(slam)
    single = links_mod.compute_links_batch(
        lp.fuser.features, lp.fuser.ndt.resolution, stacked,
        ref_i, mov_i, pmask, jax.random.PRNGKey(3),
    )
    np.testing.assert_array_equal(
        data["link_mask"], np.asarray(single.mask)
    )
    keep = np.asarray(single.mask)
    assert keep.any(), "links leg produced no valid pairs to compare"
    np.testing.assert_allclose(
        data["link_T"][keep], np.asarray(single.T)[keep], atol=1e-4
    )
    np.testing.assert_allclose(
        data["link_score"][keep], np.asarray(single.score)[keep],
        rtol=1e-4, atol=1e-5,
    )
