"""Sparse pose-graph solvers (ROADMAP item 2 — the replacement for
iSAM's cholmod backend, ndt_offline_mapper.h:40-107): matrix-free PCG
(graph/sparse.py) and the exact segment-Schur direct solve
(graph/sparse_direct.py), both O(E) memory, checked against the dense
solver and at scales beyond its reach."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.graph import optimize as opt
from ndt_feature_graph_tpu.graph import sparse
from ndt_feature_graph_tpu.graph import sparse_direct

import sys

sys.path.insert(0, "tests")
from test_parallel import random_graph  # noqa: E402


def ate_aligned(p, gt):
    """RMSE after SE(2) (Umeyama, no scale) alignment — the standard
    trajectory metric; removes the gauge mode a single-anchor pose
    graph only weakly observes."""
    P = np.asarray(p[:, :2])
    G = np.asarray(gt[:, :2])
    mp, mg = P.mean(0), G.mean(0)
    A = (P - mp).T @ (G - mg)
    U, _, Vt = np.linalg.svd(A)
    R = Vt.T @ np.diag(
        [1, np.sign(np.linalg.det(Vt.T @ U.T))]
    ) @ U.T
    Pa = (P - mp) @ R.T + mg
    return float(np.sqrt(np.mean(np.sum((Pa - G) ** 2, -1))))


def test_pcg_matches_dense():
    gt, init, edges = random_graph(jax.random.PRNGKey(0), n_nodes=32,
                                   n_loop=12)
    ref, chi_ref = opt.optimize(init, edges, iterations=15)
    out, chi = sparse.optimize_pcg(init, edges, iterations=15,
                                   cg_iterations=150)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4)
    np.testing.assert_allclose(float(chi), float(chi_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gt),
                               atol=0.05)


def test_pcg_chain_only():
    n = 16
    rels = jnp.tile(jnp.asarray([1.0, 0.0, 0.1]), (n - 1, 1))
    gt = [jnp.zeros(3)]
    for r in rels:
        gt.append(se2.compose(gt[-1], r))
    gt = jnp.stack(gt)
    edges = opt.EdgeList(
        i=jnp.arange(n - 1, dtype=jnp.int32),
        j=jnp.arange(1, n, dtype=jnp.int32),
        meas=rels,
        info=jnp.tile(jnp.eye(3)[None] * 30.0, (n - 1, 1, 1)),
        mask=jnp.ones(n - 1, bool),
    )
    init = gt + 0.1 * jax.random.normal(jax.random.PRNGKey(2), gt.shape)
    init = init.at[0].set(gt[0])
    ref, _ = opt.optimize(init, edges, iterations=15)
    out, _ = sparse.optimize_pcg(init, edges, iterations=15,
                                 cg_iterations=100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4)


def test_pcg_respects_edge_mask():
    """Masked edges and the nodes only they touch must not move."""
    gt, init, edges = random_graph(jax.random.PRNGKey(3), n_nodes=16,
                                   n_loop=4)
    # Append garbage padded edges touching a phantom extra node.
    n_pad = 5
    n = 18
    init_pad = jnp.concatenate(
        [init, jnp.asarray([[7.0, -3.0, 0.5], [1.0, 2.0, 3.0]])]
    )
    edges_pad = opt.EdgeList(
        i=jnp.concatenate([edges.i,
                           jnp.full((n_pad,), 16, jnp.int32)]),
        j=jnp.concatenate([edges.j,
                           jnp.full((n_pad,), 17, jnp.int32)]),
        meas=jnp.concatenate([edges.meas,
                              jnp.full((n_pad, 3), 99.0)]),
        info=jnp.concatenate(
            [edges.info, jnp.tile(jnp.eye(3)[None], (n_pad, 1, 1))]
        ),
        mask=jnp.concatenate([edges.mask, jnp.zeros(n_pad, bool)]),
    )
    ref, _ = opt.optimize(init, edges, iterations=15)
    out, _ = sparse.optimize_pcg(init_pad, edges_pad, iterations=15,
                                 cg_iterations=150)
    np.testing.assert_allclose(np.asarray(out)[:16], np.asarray(ref),
                               atol=5e-4)
    # Phantom nodes untouched.
    np.testing.assert_allclose(np.asarray(out)[16:],
                               np.asarray(init_pad)[16:], atol=1e-6)
    assert n == out.shape[0]


def test_direct_matches_dense():
    gt, init, edges = random_graph(jax.random.PRNGKey(0), n_nodes=32,
                                   n_loop=12)
    part = sparse_direct.make_segments(32, edges, max_seg_len=8)
    ref, _ = opt.optimize(init, edges, iterations=15)
    out, chi = sparse_direct.optimize_direct(init, edges, part,
                                             iterations=25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gt),
                               atol=0.05)


def test_direct_segment_structure():
    """Every loop-closure endpoint is a separator; interiors are pure
    chain runs bounded by max_seg_len."""
    gt, init, edges = random_graph(jax.random.PRNGKey(1), n_nodes=64,
                                   n_loop=6)
    part = sparse_direct.make_segments(64, edges, max_seg_len=4)
    sep = set(np.asarray(part.sep_ids).tolist())
    ei, ej, em = (np.asarray(edges.i), np.asarray(edges.j),
                  np.asarray(edges.mask))
    for a, b, m in zip(ei, ej, em):
        if m and abs(int(a) - int(b)) != 1:
            assert int(a) in sep and int(b) in sep
    assert 0 in sep
    seg_len = np.asarray(part.seg_len)
    assert seg_len.max() <= 4
    n_int = int(np.asarray(part.imask).sum())
    assert n_int + len(sep) == 64


def test_direct_respects_edge_mask():
    gt, init, edges = random_graph(jax.random.PRNGKey(3), n_nodes=16,
                                   n_loop=4)
    n_pad = 5
    init_pad = jnp.concatenate(
        [init, jnp.asarray([[7.0, -3.0, 0.5], [1.0, 2.0, 3.0]])]
    )
    edges_pad = opt.EdgeList(
        i=jnp.concatenate([edges.i,
                           jnp.full((n_pad,), 16, jnp.int32)]),
        j=jnp.concatenate([edges.j,
                           jnp.full((n_pad,), 17, jnp.int32)]),
        meas=jnp.concatenate([edges.meas,
                              jnp.full((n_pad, 3), 99.0)]),
        info=jnp.concatenate(
            [edges.info, jnp.tile(jnp.eye(3)[None], (n_pad, 1, 1))]
        ),
        mask=jnp.concatenate([edges.mask, jnp.zeros(n_pad, bool)]),
    )
    part = sparse_direct.make_segments(18, edges_pad, max_seg_len=6)
    ref, _ = opt.optimize(init, edges, iterations=15)
    out, _ = sparse_direct.optimize_direct(init_pad, edges_pad, part,
                                           iterations=25)
    np.testing.assert_allclose(np.asarray(out)[:16], np.asarray(ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out)[16:],
                               np.asarray(init_pad)[16:], atol=1e-5)


def _two_lap_slam_problem(n):
    """Two laps of a square, noisy odometry edges, clean lap-to-lap
    loop closures — the canonical revisit pattern."""
    lap = n // 2
    side = lap // 4
    rels = []
    for _ in range(2):
        for _ in range(4):
            rels.extend([[1.0, 0.0, 0.0]] * (side - 1))
            rels.append([1.0, 0.0, np.pi / 2])
    rels = jnp.asarray(rels[: n - 1])
    gt = [jnp.zeros(3)]
    for r in rels:
        gt.append(se2.compose(gt[-1], r))
    gt = jnp.stack(gt)

    noise = jax.random.normal(jax.random.PRNGKey(7), rels.shape) \
        * jnp.asarray([0.005, 0.005, 0.0005])
    odo = rels + noise
    li = jnp.arange(0, lap, 20, dtype=jnp.int32)
    lj = li + lap
    lmeas = se2.sub(gt[li], gt[lj])
    i = jnp.concatenate([jnp.arange(n - 1, dtype=jnp.int32), li])
    j = jnp.concatenate([jnp.arange(1, n, dtype=jnp.int32), lj])
    meas = jnp.concatenate([odo, lmeas])
    info = jnp.concatenate(
        [jnp.tile(jnp.eye(3)[None] * 50.0, (n - 1, 1, 1)),
         jnp.tile(jnp.eye(3)[None] * 200.0, (li.shape[0], 1, 1))]
    )
    edges = opt.EdgeList(i=i, j=j, meas=meas, info=info,
                         mask=jnp.ones(i.shape[0], bool))
    drifted = [jnp.zeros(3)]
    for r in np.asarray(odo):
        drifted.append(se2.compose(jnp.asarray(drifted[-1]),
                                   jnp.asarray(r)))
    return gt, jnp.stack(drifted), edges


def test_direct_large_graph():
    """4k nodes: far beyond comfortable dense territory ((12k)^2 dense
    H); the direct solve runs in O(N + S^2) memory and pulls the
    drifted trajectory back toward ground truth."""
    n = 4000
    gt, init, edges = _two_lap_slam_problem(n)
    part = sparse_direct.make_segments(n, edges, max_seg_len=128)
    out, chi = sparse_direct.optimize_direct(init, edges, part,
                                             iterations=25)
    before = ate_aligned(init, gt)
    after = ate_aligned(out, gt)
    assert after < 0.6 * before
    assert float(chi) < 1.0
    assert np.isfinite(after)
