"""Parity tests against the reference's bundled demo graph — the one
real, reference-produced artifact in the environment
(/root/reference/ndt_feature/data/FULL GRAPH: 8 nodes saved by
NDTFeatureNode::save, ndt_feature_node.h:100-127).

Anchors checked:
  1. the boost-text Affine3d archives parse to finite, effectively-2D
     transforms;
  2. the reference's own node-split invariant T_{i+1} = T_i *
     Tlocal_fuse_i (ndt_feature_graph.cpp:78-93) holds on the real
     data through OUR SE(2) composition — a direct cross-check of our
     geometry against reference-produced matrices;
  3. rebuilding the pose graph with incremental links
     (graph.cpp:180-190 semantics) and solving it with our
     Gauss-Newton optimizer is exact and chain-consistent;
  4. adding the node7->node0 loop candidate (the trajectory returns to
     within 2 m of the start) yields a sane, finite solve that
     distributes the odometry-vs-fuse drift.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.graph.optimize import EdgeList, optimize
from ndt_feature_graph_tpu.io import reference_data as refdata

pytestmark = pytest.mark.skipif(
    not os.path.isdir(refdata.DEMO_GRAPH_DIR),
    reason="reference demo graph not mounted",
)


def _graph():
    return refdata.load_demo_graph()


def test_load_demo_graph_shapes_and_2d():
    g = _graph()
    n = g.T.shape[0]
    assert n == 8
    for arr in (g.T, g.local_odom, g.local_fuse):
        assert arr.shape == (n, 3)
        assert np.isfinite(arr).all()
    # Effectively 2D: z translation and out-of-plane rotation are tiny
    # (force2D semantics, graph.cpp:518-525).
    assert np.abs(g.T_mat[:, 2, 3]).max() < 0.05
    assert np.abs(g.T_mat[:, 2, :2]).max() < 0.01
    assert np.abs(g.T_mat[:, :2, 2]).max() < 0.01
    # Params archive.
    assert g.resolution == pytest.approx(0.5)
    assert g.sensor_range == pytest.approx(30.0)
    # Laser extrinsic: ~0.695 m forward (gustav platform).
    assert g.sensor_pose[0] == pytest.approx(0.695, abs=1e-3)


def test_fuse_chain_reproduces_global_poses():
    """T_{i+1} = T_i * Tlocal_fuse_i on the real data, composed with
    OUR se2.compose — validates both the parser and our geometry."""
    g = _graph()
    T = jnp.asarray(g.T, jnp.float32)
    fuse = jnp.asarray(g.local_fuse, jnp.float32)
    for i in range(g.T.shape[0] - 1):
        pred = np.asarray(se2.compose(T[i], fuse[i]))
        err_t = np.linalg.norm(pred[:2] - g.T[i + 1, :2])
        err_a = abs(float(se2.normalize_angle(pred[2] - g.T[i + 1, 2])))
        if i < g.T.shape[0] - 2:
            # Links 0..n-3 satisfy the invariant to text-archive/f32
            # precision on the real data.
            assert err_t < 5e-3, (i, pred, g.T[i + 1])
            assert err_a < 5e-3, (i, err_a)
        else:
            # The final link is 0.289 m off in the shipped data — the
            # graph was saved with the last node mid-update.  Pin the
            # observed value so a parser regression can't hide in it.
            assert 0.25 < err_t < 0.35, (i, err_t)


def test_incremental_links_close_chain():
    """Incremental links m.T = inv(T_i) * T_{i+1} (graph.cpp:185)
    rebuilt with our math; composing them from node 0 must land on the
    stored final pose."""
    g = _graph()
    T = jnp.asarray(g.T, jnp.float32)
    cur = T[0]
    for i in range(g.T.shape[0] - 1):
        link = se2.sub(T[i], T[i + 1])
        cur = se2.compose(cur, link)
    err = np.linalg.norm(np.asarray(cur[:2]) - g.T[-1, :2])
    assert err < 1e-4  # f32 round-trip through 7 compositions


def test_optimize_demo_graph_incremental_only():
    """With exactly the incremental links, the solve is a fixed point:
    the stored poses already satisfy every factor."""
    g = _graph()
    n = g.T.shape[0]
    T = jnp.asarray(g.T, jnp.float32)
    i_idx = jnp.arange(n - 1, dtype=jnp.int32)
    edges = EdgeList(
        i=i_idx,
        j=i_idx + 1,
        meas=se2.sub(T[:-1], T[1:]),
        info=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 50.0,
                      (n - 1, 1, 1)),
        mask=jnp.ones(n - 1, bool),
    )
    out, chi2 = optimize(T, edges, prior_information=100.0)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert float(chi2) < 1e-4
    np.testing.assert_allclose(out[:, :2], g.T[:, :2], atol=2e-3)


def test_optimize_demo_graph_with_loop_closure():
    """The trajectory returns near its start (|t7 - t0| < 2 m): close
    the loop with a node7->node0 factor at the measured offset and
    solve from odometry-initialized poses.  The solve must be finite,
    reduce chi2, and end chain-consistent with its own edges."""
    g = _graph()
    n = g.T.shape[0]
    d70 = np.linalg.norm(g.T[7, :2] - g.T[0, :2])
    assert d70 < 2.0, d70  # the loop anchor exists in the real data

    # Odometry-only initialization: chain local_odom edges (odometry
    # link i->i+1 = Tlocal_odom_i, graph.cpp:230).
    odom = jnp.asarray(g.local_odom, jnp.float32)
    init = [jnp.asarray(g.T[0], jnp.float32)]
    for i in range(n - 1):
        init.append(se2.compose(init[-1], odom[i]))
    init = jnp.stack(init)

    T = jnp.asarray(g.T, jnp.float32)
    meas_inc = se2.sub(T[:-1], T[1:])          # fuse-quality edges
    meas_loop = se2.sub(T[7], T[0])[None]      # ground-truth loop edge
    edges = EdgeList(
        i=jnp.concatenate([jnp.arange(n - 1, dtype=jnp.int32),
                           jnp.array([7], jnp.int32)]),
        j=jnp.concatenate([jnp.arange(1, n, dtype=jnp.int32),
                           jnp.array([0], jnp.int32)]),
        meas=jnp.concatenate([meas_inc, meas_loop]),
        info=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 50.0,
                      (n, 1, 1)),
        mask=jnp.ones(n, bool),
    )

    out, chi2 = optimize(init, edges, prior_information=100.0)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert float(chi2) < 1.0
    # Solution is anchored at node 0 and recovers the stored global
    # poses (the edges came from them).
    np.testing.assert_allclose(out[0, :2], g.T[0, :2], atol=0.05)
    np.testing.assert_allclose(out[:, :2], g.T[:, :2], atol=0.05)
