"""Blocked Schur-complement solver: exactness vs the dense solver (the
distributed-correctness test SURVEY.md §7 calls essential)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_feature_graph_tpu.graph import optimize as opt
from ndt_feature_graph_tpu.graph import schur

import sys

sys.path.insert(0, "tests")
from test_parallel import random_graph  # noqa: E402


@pytest.mark.parametrize("n_blocks", [2, 4])
def test_schur_matches_dense(n_blocks):
    gt, init, edges = random_graph(jax.random.PRNGKey(0), n_nodes=32,
                                   n_loop=12)
    part = schur.make_partition(32, edges, n_blocks)
    ref, _ = opt.optimize(init, edges, iterations=15)
    out = schur.optimize_schur(init, edges, part, iterations=15)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(gt),
                               atol=0.05)


def test_schur_separator_structure():
    gt, init, edges = random_graph(jax.random.PRNGKey(1), n_nodes=24,
                                   n_loop=8)
    part = schur.make_partition(24, edges, 4)
    n_sep = int(np.asarray(part.sep_mask).sum())
    n_int = int(np.asarray(part.int_mask).sum())
    assert n_sep + n_int == 24
    # Separator is a strict subset (interiors exist).
    assert 0 < n_sep < 24
    # No interior node of one block shares an edge with an interior of
    # another block.
    assign = np.asarray(part.assign)
    sep = np.zeros(24, bool)
    sep[np.asarray(part.sep_idx)[np.asarray(part.sep_mask)]] = True
    ei, ej = np.asarray(edges.i), np.asarray(edges.j)
    for a, b in zip(ei, ej):
        if not sep[a] and not sep[b]:
            assert assign[a] == assign[b]


def test_schur_chain_only():
    """No loop closures: separator = block boundaries + anchor only."""
    n = 16
    rels = jnp.tile(jnp.asarray([1.0, 0.0, 0.1]), (n - 1, 1))
    from ndt_feature_graph_tpu.core import se2

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
    part = schur.make_partition(n, edges, 4)
    init = gt + 0.1 * jax.random.normal(jax.random.PRNGKey(2), gt.shape)
    init = init.at[0].set(gt[0])
    ref, _ = opt.optimize(init, edges, iterations=15)
    out = schur.optimize_schur(init, edges, part, iterations=15)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4)
