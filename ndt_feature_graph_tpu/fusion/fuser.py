"""Scan-to-submap fuser: TPU-native NDTFeatureFuserHMT.

Re-designs the per-scan pipeline of ndt_feature_fuser_hmt.cpp:108-512:
motion-model covariance → local NDT build → joint registration (NDT +
feature correspondences + odometry prior) → consistency gate with
odometry fallback → map update.  The whole update is ONE jitted pure
function over a `FuserState` pytree — no heap cells, no host round
trips.

Differences by design (SURVEY.md §7.6):
  * The 40-copies odometry pseudo-cell hack (fuser_hmt.cpp:312-334) is
    replaced by the explicit Mahalanobis prior term the reference also
    supports (`useSoftConstraints`, fusion.h:875-890), with the motion
    information lifted into the left-increment frame via the SE(2)
    adjoint.
  * Registration estimates the absolute vehicle→submap transform with
    the odometry-predicted pose as the initial guess, rather than
    left-composing a "local" increment onto world-frame cells
    (fuser_hmt.cpp:352-358) — equivalent at the optimum, cleaner frames.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ndt_feature_graph_tpu.config import FuserParams, NDTMapParams
from ndt_feature_graph_tpu.core import motion_model, se2
from ndt_feature_graph_tpu.ops import d2d, d2d_analytic, ndt_map
from ndt_feature_graph_tpu.ops.ndt_map import CellList, NDTGrid


def local_map_params(p: FuserParams) -> NDTMapParams:
    """Static geometry of the per-scan local NDT (the reference's
    `localMapSize = sensor_range + 3*resolution`, fuser_hmt.h:232)."""
    size = 2.0 * (p.ndt.sensor_range + 3.0 * p.ndt.resolution)
    return p.ndt.replace(size_x=size, size_y=size)


class FuserState(NamedTuple):
    """Per-submap fuser state pytree."""

    Tnow: jnp.ndarray        # (3,) vehicle pose in submap/world frame
    Todom: jnp.ndarray       # (3,) dead-reckoning pose (diagnostics)
    Tlast_fuse: jnp.ndarray  # (3,)
    sensor_pose: jnp.ndarray  # (3,) laser in vehicle frame
    grid: NDTGrid            # the submap
    n_updates: jnp.ndarray   # int32


class UpdateInfo(NamedTuple):
    score: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    fallback: jnp.ndarray    # bool — consistency gate rejected the match
    T_est: jnp.ndarray       # (3,) raw registration estimate


def _vehicle_points(sensor_pose, pts):
    return se2.transform_points(sensor_pose, pts)


@functools.partial(jax.jit, static_argnames=("params",))
def initialize(
    params: FuserParams, init_pose, sensor_pose, pts, mask
) -> FuserState:
    """First scan: create the submap grid centred on the initial pose and
    insert the cloud (fuser_hmt.cpp:65-94)."""
    world_T = se2.compose(init_pose, sensor_pose)
    world_pts = se2.transform_points(world_T, pts)
    grid = ndt_map.empty_grid(params.ndt, init_pose[:2])
    grid = ndt_map.add_points(grid, params.ndt, world_pts, mask)
    grid = ndt_map.update_occupancy(
        grid, params.ndt, world_T[:2], world_pts, mask
    )
    return FuserState(
        Tnow=jnp.asarray(init_pose, jnp.float32),
        Todom=jnp.asarray(init_pose, jnp.float32),
        Tlast_fuse=jnp.asarray(init_pose, jnp.float32),
        sensor_pose=jnp.asarray(sensor_pose, jnp.float32),
        grid=grid,
        n_updates=jnp.int32(1),
    )


def _build_local_cells(params: FuserParams, sensor_pose, pts, mask):
    """Scan -> NDT cell list in the vehicle frame."""
    lp = local_map_params(params)
    vpts = _vehicle_points(sensor_pose, pts)
    grid = ndt_map.empty_grid(lp, jnp.zeros(2))
    grid = ndt_map.add_points(grid, lp, vpts, mask)
    return ndt_map.to_cell_list(grid, lp), vpts


def _increment_information(params: FuserParams, Tmotion, T_pred):
    """Motion-model information, lifted from the local (robot) frame into
    the global left-increment frame used by the optimizer:
    for T = exp(d) ∘ T_pred = T_pred ∘ exp(eps):  d = Adj(T_pred) eps,
    so  I_d = Adj^{-T} I_eps Adj^{-1}."""
    I_eps = motion_model.odometry_information(params.motion, Tmotion)
    A = se2.adjoint(T_pred)
    Ainv = jnp.linalg.inv(A)
    return Ainv.T @ I_eps @ Ainv


@functools.partial(
    jax.jit, static_argnames=("params", "update_map")
)
def update(
    state: FuserState,
    params: FuserParams,
    Tmotion,
    pts,
    mask,
    feat_src: Optional[CellList] = None,
    feat_tgt: Optional[CellList] = None,
    update_map: bool = True,
):
    """One scan update.  Returns (new_state, UpdateInfo).

    `feat_src`/`feat_tgt` are optional paired pseudo-cell lists from
    feature correspondences (RANSAC output via
    features.to_paired_cells): src in the *vehicle* frame of the current
    scan, tgt in the submap frame — the clean equivalent of
    convertCorrespondencesToCellvectorsFixedCovWithCorr
    (conversions.h:12-84).
    """
    m = params.matcher
    T_pred = se2.compose(state.Tnow, Tmotion)
    Todom = se2.compose(state.Todom, Tmotion)

    src, _ = _build_local_cells(params, state.sensor_pose, pts, mask)
    nb = params.match_cell_budget
    if nb and nb < src.means.shape[0]:
        # Exact when the scan's valid cells fit the budget (compacted
        # list, valid-first); see config.FuserParams.match_cell_budget.
        src = CellList(
            means=src.means[:nb], covs=src.covs[:nb], mask=src.mask[:nb]
        )
    tgt = d2d.make_dense_target(state.grid, params.ndt)
    lp = local_map_params(params)

    Q = _increment_information(params, Tmotion, T_pred)

    use_feat = (
        m.use_feat and feat_src is not None and feat_tgt is not None
    )

    def score_fn(d):
        s = jnp.float32(0.0)
        if m.use_ndt:
            s = s + d2d.d2d_score_dense(d, T_pred, src, tgt, lp, m)
        if use_feat:
            s = s + d2d.d2d_score_paired(d, T_pred, feat_src, feat_tgt, m)
        if m.use_odom:
            s = s + d2d.mahalanobis_score(d, Q)
        return s

    def fgh_fn(d):
        """Single-pass analytic derivatives (ops/d2d_analytic.py) —
        the `derivativesNDT` fast path; verified against autodiff in
        tests/test_d2d_analytic.py."""
        f = jnp.float32(0.0)
        g = jnp.zeros(3)
        H = jnp.zeros((3, 3))
        if m.use_ndt:
            f1, g1, H1 = d2d_analytic.fgh_dense(
                d, T_pred, src, tgt, lp, m
            )
            f, g, H = f + f1, g + g1, H + H1
        if use_feat:
            f2, g2, H2 = d2d_analytic.fgh_paired(
                d, T_pred, feat_src, feat_tgt, m
            )
            f, g, H = f + f2, g + g2, H + H2
        if m.use_odom:
            f3, g3, H3 = d2d_analytic.fgh_mahalanobis(d, Q)
            f, g, H = f + f3, g + g3, H + H3
        return f, g, H

    d, score, itr, conv = d2d.newton_match(
        score_fn, jnp.zeros(3), m, fgh_fn=fgh_fn
    )
    T_est = se2.compose(
        jnp.stack([d[0], d[1], d[2]]), T_pred
    )

    # Consistency gate (fuser_hmt.cpp:436-441): compare the estimated
    # relative motion against odometry; reject wild matches.
    rel_est = se2.sub(state.Tnow, T_est)
    diff = se2.sub(rel_est, Tmotion)
    bad = (
        jnp.linalg.norm(diff[:2]) > params.max_translation_norm
    ) | (jnp.abs(diff[2]) > params.max_rotation_norm)
    if params.force_odom_as_est:
        use_fallback = jnp.bool_(True)
    elif params.check_consistency and not params.all_matches_valid:
        use_fallback = bad
    else:
        use_fallback = jnp.bool_(False)
    Tnow = jnp.where(use_fallback, T_pred, T_est)

    # Rolling-map recentre (NDTMapHMT window follow): if the vehicle
    # left the margin, slide the window onto it by whole cells.  The
    # shift is zeroed (exact no-op) while inside the margin, so this
    # stays a single traced program.
    grid = state.grid
    if params.rolling_map:
        center = grid.origin + jnp.asarray(
            [params.ndt.size_x / 2.0, params.ndt.size_y / 2.0],
            grid.origin.dtype,
        )
        off = Tnow[:2] - center
        target = jnp.where(
            jnp.linalg.norm(off) > params.roll_margin, Tnow[:2], center
        )
        grid = ndt_map.recenter(grid, params.ndt, target)

    # Map update (fuser_hmt.cpp:482-487).
    if update_map:
        world_T = se2.compose(Tnow, state.sensor_pose)
        world_pts = se2.transform_points(world_T, pts)
        grid = ndt_map.add_points(grid, params.ndt, world_pts, mask)
        grid = ndt_map.update_occupancy(
            grid, params.ndt, world_T[:2], world_pts, mask
        )

    moved = se2.sub(state.Tlast_fuse, Tnow)
    fused = (jnp.linalg.norm(moved[:2]) > 0.05) | (
        jnp.abs(moved[2]) > 0.01
    )
    Tlast_fuse = jnp.where(fused, Tnow, state.Tlast_fuse)

    new_state = FuserState(
        Tnow=Tnow,
        Todom=Todom,
        Tlast_fuse=Tlast_fuse,
        sensor_pose=state.sensor_pose,
        grid=grid,
        n_updates=state.n_updates + 1,
    )
    info = UpdateInfo(
        score=score,
        iterations=itr,
        converged=conv,
        fallback=use_fallback,
        T_est=T_est,
    )
    return new_state, info
