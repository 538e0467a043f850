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
