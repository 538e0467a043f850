"""Pose-graph solver tests vs closed forms (mapBuilderISAMTest shape,
ndt_offline_mapper.h:190-247) + loop-closure recovery on synthetic
drift."""

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.graph import optimize as opt


def make_edges(i, j, meas, info):
    e = len(i)
    return opt.EdgeList(
        i=jnp.asarray(i, jnp.int32),
        j=jnp.asarray(j, jnp.int32),
        meas=jnp.asarray(meas, jnp.float32),
        info=jnp.asarray(info, jnp.float32),
        mask=jnp.ones(e, bool),
    )


def test_chain_exact_recovery():
    """4-pose chain with exact measurements: solution = chained
    composition."""
    rels = np.array(
        [[1.0, 0.0, 0.1], [1.0, 0.2, 0.3], [0.8, -0.1, -0.2]],
        np.float32,
    )
    gt = [np.zeros(3, np.float32)]
    for r in rels:
        gt.append(np.asarray(se2.compose(jnp.asarray(gt[-1]), jnp.asarray(r))))
    gt = np.stack(gt)

    info = np.tile(np.eye(3, dtype=np.float32)[None] * 100, (3, 1, 1))
    edges = make_edges([0, 1, 2], [1, 2, 3], rels, info)

    init = gt + np.array([[0, 0, 0], [0.3, -0.2, 0.1], [0.5, 0.4, -0.2],
                          [-0.3, 0.2, 0.15]], np.float32)
    out, chi2 = opt.optimize(jnp.asarray(init), edges)
    np.testing.assert_allclose(np.asarray(out), gt, atol=1e-3)
    assert float(chi2) < 1e-4


def test_loop_closure_corrects_drift():
    """Square loop with drifting odometry + one loop-closure edge: the
    optimizer must bend the trajectory to close the loop."""
    # GT: square 0->1->2->3->0' with 90 deg turns.
    side = 4.0
    rel_gt = np.array(
        [
            [side, 0.0, np.pi / 2],
            [side, 0.0, np.pi / 2],
            [side, 0.0, np.pi / 2],
            [side, 0.0, np.pi / 2],
        ],
        np.float32,
    )
    gt = [np.zeros(3, np.float32)]
    for r in rel_gt:
        gt.append(np.asarray(se2.compose(jnp.asarray(gt[-1]), jnp.asarray(r))))
    gt = np.stack(gt)  # pose 4 == pose 0

    # Drifting odometry (bias in rotation).
    rel_od = rel_gt + np.array([0.1, 0.05, 0.03], np.float32)
    init = [np.zeros(3, np.float32)]
    for r in rel_od:
        init.append(
            np.asarray(se2.compose(jnp.asarray(init[-1]), jnp.asarray(r)))
        )
    init = np.stack(init)
    drift_before = np.linalg.norm(init[4][:2] - gt[4][:2])
    assert drift_before > 0.3

    info_od = np.tile(np.eye(3, dtype=np.float32)[None] * 10, (4, 1, 1))
    # Loop closure: node 4 observed at node 0's pose (identity rel).
    edges = make_edges(
        [0, 1, 2, 3, 0],
        [1, 2, 3, 4, 4],
        np.concatenate([rel_od, np.zeros((1, 3), np.float32)]),
        np.concatenate(
            [info_od, np.eye(3, dtype=np.float32)[None] * 1000]
        ),
    )
    out, chi2 = opt.optimize(jnp.asarray(init), edges, iterations=50)
    out = np.asarray(out)
    # Loop closed: final pose back at origin.
    assert np.linalg.norm(out[4][:2]) < 0.05, out[4]
    # Drift redistributed: intermediate poses closer to a square.
    assert np.linalg.norm(out[4][:2]) < drift_before / 10


def test_prior_pins_gauge():
    """Without measurements, poses stay at the prior."""
    edges = make_edges(
        [0], [1], np.array([[1.0, 0.0, 0.0]], np.float32),
        np.eye(3, dtype=np.float32)[None] * 10,
    )
    init = jnp.asarray(
        np.array([[5.0, 5.0, 0.5], [6.0, 5.0, 0.5]], np.float32)
    )
    out, _ = opt.optimize(init, edges, iterations=30)
    out = np.asarray(out)
    # Node 0 pinned at its initial value by the prior.
    np.testing.assert_allclose(out[0], [5.0, 5.0, 0.5], atol=1e-3)
    expect1 = np.asarray(
        se2.compose(jnp.asarray(out[0]), jnp.array([1.0, 0.0, 0.0]))
    )
    np.testing.assert_allclose(out[1], expect1, atol=1e-3)


def test_masked_edges_ignored():
    edges = opt.EdgeList(
        i=jnp.asarray([0, 0], jnp.int32),
        j=jnp.asarray([1, 1], jnp.int32),
        meas=jnp.asarray([[1.0, 0, 0], [9.0, 9.0, 1.0]], jnp.float32),
        info=jnp.tile(jnp.eye(3)[None] * 10, (2, 1, 1)),
        mask=jnp.asarray([True, False]),
    )
    init = jnp.zeros((2, 3))
    out, _ = opt.optimize(init, edges, iterations=30)
    np.testing.assert_allclose(
        np.asarray(out[1]), [1.0, 0.0, 0.0], atol=1e-3
    )
