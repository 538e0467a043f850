"""Distributed segment-Schur solver: exactness vs the single-device
sparse-direct solver on the 8-device virtual CPU mesh (the
distributed-correctness story, SURVEY.md §7 hard parts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_feature_graph_tpu.graph import optimize as opt
from ndt_feature_graph_tpu.graph import sparse_direct as sd
from ndt_feature_graph_tpu.parallel import mesh as mesh_mod
from ndt_feature_graph_tpu.parallel import sparse_direct_sharded as sds

import sys

sys.path.insert(0, "tests")
from test_parallel import random_graph, require_devices  # noqa: E402
from test_sparse_solver import (  # noqa: E402
    _two_lap_slam_problem,
    ate_aligned,
)


def test_sharded_direct_matches_single_device():
    require_devices(8)
    mesh = mesh_mod.make_mesh(8)
    gt, init, edges = random_graph(jax.random.PRNGKey(0), n_nodes=48,
                                   n_loop=16)
    part = sd.make_segments(48, edges, max_seg_len=8)
    ref, chi_ref = sd.optimize_direct(init, edges, part, iterations=25)
    out, chi = sds.optimize_direct_sharded(mesh, init, edges, part,
                                           iterations=25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4)
    np.testing.assert_allclose(float(chi), float(chi_ref), rtol=0.05,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gt),
                               atol=0.05)


def test_sharded_direct_two_lap():
    require_devices(8)
    mesh = mesh_mod.make_mesh(8)
    n = 400
    gt, init, edges = _two_lap_slam_problem(n)
    part = sd.make_segments(n, edges, max_seg_len=32)
    out, chi = sds.optimize_direct_sharded(mesh, init, edges, part,
                                           iterations=20)
    assert ate_aligned(out, gt) < 0.6 * ate_aligned(init, gt)
    assert np.isfinite(float(chi))
