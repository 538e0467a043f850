"""Sharded all-pairs loop-closure proposal.

The reference's O(N^2) sequential link loop
(computeAllPossibleLinks, ndt_feature_graph.cpp:395-405) is
embarrassingly parallel: pair chunks shard over the mesh, node data is
replicated, and each device runs the vmapped RANSAC + overlap scoring
on its chunk (SURVEY.md §7.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ndt_feature_graph_tpu.config import FeatureParams
from ndt_feature_graph_tpu.graph import links as links_mod
from ndt_feature_graph_tpu.graph.node import NodeData
from ndt_feature_graph_tpu.parallel import mesh as mesh_mod


def compute_links_sharded(
    mesh,
    fp: FeatureParams,
    resolution: float,
    nodes: NodeData,
    pair_ref,
    pair_mov,
    pair_mask,
    key,
    axis: str = "dp",
) -> links_mod.LinkSet:
    """Same contract as graph.links.compute_links_batch, pair axis
    sharded over the mesh."""
    n_shards = mesh_mod.axis_size(mesh, axis)
    pair_ref = mesh_mod.pad_to_multiple(pair_ref, n_shards)
    pair_mov = mesh_mod.pad_to_multiple(pair_mov, n_shards)
    pair_mask = mesh_mod.pad_to_multiple(pair_mask, n_shards, fill=False)
    p_tot = pair_ref.shape[0]
    keys = jax.random.split(key, p_tot)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def run(nodes_rep, ref, mov, mask, ks):
        def one(i, j, k):
            r = jax.tree.map(lambda x: x[i], nodes_rep)
            m = jax.tree.map(lambda x: x[j], nodes_rep)
            T, score, valid, _ = links_mod.compute_link.__wrapped__(
                fp, resolution, r, m, k
            )
            return T, score, valid

        return jax.vmap(one)(ref, mov, ks)

    # global_put (not device_put): works when the mesh spans processes
    # (the 2-process (dcn, ici) layout of tests/test_multihost.py).
    nodes_rep = jax.tree.map(
        lambda x: mesh_mod.global_put(mesh, x, P()), nodes
    )
    shard = lambda x: mesh_mod.global_put(mesh, x, P(axis))
    T, score, valid = run(
        nodes_rep, shard(pair_ref), shard(pair_mov), shard(pair_mask),
        shard(keys),
    )
    eye = jnp.tile(jnp.eye(3)[None] * 0.05, (p_tot, 1, 1))
    # Combine under jit: eager ops on multi-process global arrays are
    # not allowed; jit handles both the single- and multi-process case.
    mask = jax.jit(jnp.logical_and)(shard(pair_mask), valid)
    return links_mod.LinkSet(
        ref=pair_ref,
        mov=pair_mov,
        T=T,
        cov=eye,
        score=score,
        mask=mask,
    )
