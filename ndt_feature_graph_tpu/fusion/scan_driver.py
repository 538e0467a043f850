"""Device-resident sequence drivers: process whole scan sequences (and
batches of sequences) inside one XLA executable via lax.scan.

The reference processes scans one ROS callback at a time
(publish_graph_message.cpp:1259); on TPU the per-call dispatch would
dominate, so the production path keeps the fuser state resident on
device and scans the sequence in-compiler — one dispatch per sequence
chunk, host sees only the trajectory.  The batched variant vmaps whole
fleets of independent scan streams (multi-robot serving).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndt_feature_graph_tpu.config import FuserParams
from ndt_feature_graph_tpu.fusion import fuser


@functools.partial(jax.jit, static_argnames=("params",))
def run_sequence(params: FuserParams, state, odom, pts, mask):
    """Chain fuser.update over a (T, ...) sequence on device.

    odom: (T, 3); pts: (T, P, 2); mask: (T, P).
    Returns (final_state, trajectory (T, 3), scores (T,)).
    """

    def body(st, x):
        tm, p, m = x
        ns, info = fuser.update.__wrapped__(st, params, tm, p, m)
        return ns, (ns.Tnow, info.score)

    final, (traj, scores) = jax.lax.scan(body, state, (odom, pts, mask))
    return final, traj, scores


@functools.partial(jax.jit, static_argnames=("params",))
def run_sequence_features(params: FuserParams, state, odom, ranges, hit):
    """Device-resident full-pipeline driver: the feature-aware fuser
    (detector + descriptor + RANSAC + joint fusion) chained over a
    (T, ...) sequence in one executable.

    state: FeatureFuserState; odom (T, 3); ranges (T, B); hit (T, B).
    Returns (final_state, trajectory (T, 3), scores (T,)).
    """
    from ndt_feature_graph_tpu.fusion import feature_fuser

    def body(st, x):
        tm, r, h = x
        ns, info, res = feature_fuser.update.__wrapped__(
            st, params, tm, r, h
        )
        return ns, (ns.base.Tnow, info.score)

    final, (traj, scores) = jax.lax.scan(
        body, state, (odom, ranges, hit)
    )
    return final, traj, scores


class GraphChunkResult:
    pass  # (placeholder for docs; results are plain tuples below)


@functools.partial(
    jax.jit, static_argnames=("params", "fm_incr")
)
def run_graph_chunk(
    params: FuserParams,
    state,
    fmap,
    dist_moved,
    update_count,
    odom,
    ranges,
    hit,
    active,
    split_dist,
    fm_incr: int = 4,
):
    """Device-resident GRAPH driver chunk: run up to K gated scans of
    the full feature pipeline (detect + describe + RANSAC + joint
    fusion + map update + feature-map accumulation) inside ONE
    executable, stopping at the first distance-triggered node split.

    This removes the per-scan host dispatch from the graph
    orchestrator's hot path (the reference's whole per-scan online
    pipeline, publish_graph_message.cpp:1259-1628, runs in-process; our
    equivalent must not pay ~0.3 ms dispatch per scan).  The host
    handles only the split *event*: freeze node, re-init, resume from
    the returned index.

    state: FeatureFuserState; fmap: node.FeatureMapBuffer;
    dist_moved: f32 distance accumulated in the active node;
    update_count: i32 updates done in the active node;
    odom (K, 3); ranges (K, B); hit (K, B); active (K,) bool
    (padding flag for the last partial chunk); split_dist: f32.

    Returns (state, fmap, dist_moved, update_count, traj (K, 3),
    scores (K,), processed (K,) bool, split (bool), split_idx (i32)).
    The scan AT split_idx has been fused into the old node (the
    reference fuses the split-triggering scan before opening the new
    node, ndt_feature_graph.cpp:72-93); scans after it are untouched.
    """
    from ndt_feature_graph_tpu.core import se2
    from ndt_feature_graph_tpu.fusion import feature_fuser
    from ndt_feature_graph_tpu.graph import node as node_mod

    k_len = odom.shape[0]

    def body(carry, x):
        st, fm, dist, cnt, done, split_idx = carry
        tm, r, h, act, idx = x
        run_it = (~done) & act

        def do(args):
            st, fm, dist, cnt = args
            ns, info, _res = feature_fuser.update.__wrapped__(
                st, params, tm, r, h
            )
            dist2 = dist + jnp.linalg.norm(tm[:2])
            split_now = dist2 > split_dist
            cnt2 = cnt + 1
            node_pose = se2.compose(ns.base.Tnow, ns.base.sensor_pose)
            fm_ins = node_mod.insert_features.__wrapped__(
                fm, ns.prev_feats, ns.prev_desc, node_pose
            )
            take = ((cnt2 % fm_incr) == 0) & (~split_now)
            fm2 = jax.tree.map(
                lambda a, b: jnp.where(take, a, b), fm_ins, fm
            )
            return ns, fm2, dist2, cnt2, split_now, info.score

        def skip(args):
            st, fm, dist, cnt = args
            return st, fm, dist, cnt, jnp.bool_(False), jnp.float32(0.0)

        st2, fm2, dist2, cnt2, split_now, score = jax.lax.cond(
            run_it, do, skip, (st, fm, dist, cnt)
        )
        new_split = split_now & (~done)
        split_idx2 = jnp.where(new_split, idx, split_idx)
        done2 = done | split_now | (~act)
        out = (st2.base.Tnow, score, run_it)
        return (st2, fm2, dist2, cnt2, done2, split_idx2), out

    idxs = jnp.arange(k_len, dtype=jnp.int32)
    init = (
        state, fmap, jnp.float32(dist_moved),
        jnp.int32(update_count), jnp.bool_(False), jnp.int32(-1),
    )
    (st, fm, dist, cnt, done, split_idx), (traj, scores, processed) = (
        jax.lax.scan(body, init, (odom, ranges, hit, active, idxs))
    )
    return (
        st, fm, dist, cnt, traj, scores, processed,
        split_idx >= 0, split_idx,
    )


@functools.partial(jax.jit, static_argnames=("params",))
def run_sequence_batch(params: FuserParams, states, odom, pts, mask):
    """Fleet variant: B independent streams, each a T-step sequence.

    states: batched FuserState (B, ...); odom: (B, T, 3);
    pts: (B, T, P, 2); mask: (B, T, P).
    Returns (final_states, trajectories (B, T, 3), scores (B, T)).
    """

    def one(state, odom_i, pts_i, mask_i):
        return run_sequence.__wrapped__(
            params, state, odom_i, pts_i, mask_i
        )

    return jax.vmap(one)(states, odom, pts, mask)
