"""Feature-aware fuser: full joint NDT + FLIRT-feature + odometry
fusion per scan.

Completes the per-scan pipeline of ndt_feature_fuser_hmt.cpp:108-512:
the previous scan's interest points are RANSAC-matched against the
current scan's (fuser_hmt.cpp:251-290, incl. the consistency gate at
max_translation_norm/10 and max_rotation_norm/4), the surviving
correspondences become paired fixed-covariance pseudo-cells
(conversions.h:12-84), and the joint cost is minimized in one damped-
Newton loop (ops/d2d.newton_match) — the explicit-prior redesign of
matchFusion (SURVEY.md §7.6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndt_feature_graph_tpu.config import FuserParams
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.features import descriptor, detector, ransac
from ndt_feature_graph_tpu.fusion import fuser
from ndt_feature_graph_tpu.io import dataset
from ndt_feature_graph_tpu.ops.ndt_map import CellList


class FeatureFuserState(NamedTuple):
    base: fuser.FuserState
    prev_feats: detector.FeatureSet   # sensor frame of previous scan
    prev_desc: jnp.ndarray            # (F, D)
    prev_pose: jnp.ndarray            # (3,) Tnow when prev scan was taken
    key: jnp.ndarray                  # PRNG key for RANSAC


@functools.partial(jax.jit, static_argnames=("params",))
def initialize(
    params: FuserParams, init_pose, sensor_pose, ranges, hit, key
) -> FeatureFuserState:
    pts, mask = dataset.scan_to_points(ranges, hit)
    base = fuser.initialize(params, init_pose, sensor_pose, pts, mask)
    feats = detector.detect(params.features, ranges, hit)
    desc = descriptor.describe(params.features, feats, ranges, hit)
    return FeatureFuserState(
        base=base,
        prev_feats=feats,
        prev_desc=desc,
        prev_pose=jnp.asarray(init_pose, jnp.float32),
        key=key,
    )


def _prepare_features(
    state: FeatureFuserState, params: FuserParams, Tmotion, ranges, hit
):
    """Per-stream feature half of `update` (scan projection + detect +
    describe + RANSAC + odometry-consistency gate + paired
    pseudo-cells).  Pure and vmappable — the batched fleet path runs
    this under vmap (small per-stream arrays, no shared-bank gathers)
    and feeds the pairs to fuser.update_batch.

    Returns (pts, mask, feats, desc, key, feat_src, feat_tgt, res).
    """
    fp = params.features
    pts, mask = dataset.scan_to_points(ranges, hit)

    feats = detector.detect(fp, ranges, hit)
    desc = descriptor.describe(fp, feats, ranges, hit)

    key, sub = jax.random.split(state.key)
    res = ransac.match_sets(
        fp, state.prev_feats, state.prev_desc, feats, desc, sub
    )

    # Feature-consistency gate vs odometry (fuser_hmt.cpp:268-289):
    # RANSAC's T maps current sensor frame -> previous sensor frame; the
    # odometry prediction of that same transform is
    # inv(sensor) ∘ inv(Tmotion)... — compare in the vehicle frame.
    sp = state.base.sensor_pose
    T_feat_vehicle = se2.compose(
        se2.compose(sp, res.T), se2.inverse(sp)
    )  # current vehicle -> previous vehicle
    diff = se2.sub(T_feat_vehicle, Tmotion)
    consistent = (
        (jnp.linalg.norm(diff[:2]) <= params.max_translation_norm / 10.0)
        & (jnp.abs(diff[2]) <= params.max_rotation_norm / 4.0)
    ) | (not params.check_consistency)
    feats_ok = res.valid & consistent

    # Paired pseudo-cells: tgt = previous features lifted into the
    # submap frame; src = current features in the vehicle frame.
    world_prev = se2.compose(state.prev_pose, sp)
    tgt_pts = se2.transform_points(
        world_prev, state.prev_feats.pts[res.corr_ref]
    )
    src_pts = se2.transform_points(sp, feats.pts[res.corr_mov])
    c = res.corr_ref.shape[0]
    eye = jnp.eye(2, dtype=jnp.float32) * params.feature_cov_xy
    covs = jnp.tile(eye[None], (c, 1, 1))
    pair_mask = res.inlier_mask & feats_ok
    feat_tgt = CellList(means=tgt_pts, covs=covs, mask=pair_mask)
    feat_src = CellList(means=src_pts, covs=covs, mask=pair_mask)
    return pts, mask, feats, desc, key, feat_src, feat_tgt, res


@functools.partial(jax.jit, static_argnames=("params", "update_map"))
def update(
    state: FeatureFuserState,
    params: FuserParams,
    Tmotion,
    ranges,
    hit,
    update_map: bool = True,
):
    """One scan update with feature matching.  Returns
    (new_state, UpdateInfo, MatchResult)."""
    pts, mask, feats, desc, key, feat_src, feat_tgt, res = (
        _prepare_features(state, params, Tmotion, ranges, hit)
    )

    base, info = fuser.update(
        state.base,
        params,
        Tmotion,
        pts,
        mask,
        feat_src=feat_src,
        feat_tgt=feat_tgt,
        update_map=update_map,
    )

    new_state = FeatureFuserState(
        base=base,
        prev_feats=feats,
        prev_desc=desc,
        prev_pose=base.Tnow,
        key=key,
    )
    return new_state, info, res


@functools.partial(jax.jit, static_argnames=("params", "update_map"))
def update_batch(
    states: FeatureFuserState,  # batched (B, ...) pytree
    params: FuserParams,
    Tmotion,                    # (B, 3)
    ranges,                     # (B, num_beams)
    hit,                        # (B, num_beams)
    update_map: bool = True,
    occ_on=None,                # occupancy-cadence flag (fuser.update_batch)
):
    """One FULL-pipeline scan update for B independent streams —
    semantically vmap(update): the feature half (detect + describe +
    RANSAC + gate) runs under plain vmap (per-stream small arrays),
    while the joint registration runs through fuser.update_batch's
    flat-bank batch-level Newton with the paired feature term vmapped
    in (the reference's whole per-robot online pipeline,
    publish_graph_message.cpp:1259-1628, served as one batched
    executable).

    Returns (new_states, infos, match results) batched like inputs.
    """
    pts, mask, feats, desc, key, feat_src, feat_tgt, res = jax.vmap(
        lambda st, tm, r, h: _prepare_features(st, params, tm, r, h)
    )(states, Tmotion, ranges, hit)

    base, info = fuser.update_batch.__wrapped__(
        states.base, params, Tmotion, pts, mask,
        feat_src=feat_src, feat_tgt=feat_tgt, update_map=update_map,
        occ_on=occ_on,
    )

    new_states = FeatureFuserState(
        base=base,
        prev_feats=feats,
        prev_desc=desc,
        prev_pose=base.Tnow,
        key=key,
    )
    return new_states, info, res
