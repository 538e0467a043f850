"""Pairwise scan utilities: frames, closed-form alignment, P2D
registration, extrinsic calibration.

Covers the reference's small-tool surface:
  - NDTFeatureFrame + pairwise FLIRT match (ndt_feature_frame.h:19-52)
  - ICPwithCorrMatch: SVD alignment with known correspondences
    (utils.h:115-165)
  - P2D registration (NDTMatcherP2D role): scan points against an NDT
    map — same D2D kernel with point-cells (SURVEY.md §7.3)
  - laser-to-base extrinsic search (laser2d_extrinsic_calibration.cpp:
    43-449): scoring a sensor-offset grid over scan pairs, vmapped
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndt_feature_graph_tpu.config import FeatureParams, MatcherParams, NDTMapParams
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.features import descriptor, detector, ransac
from ndt_feature_graph_tpu.ops import d2d, ndt_map


class ScanFrame(NamedTuple):
    """One scan bundle (NDTFeatureFrame): cloud + features + poses."""

    pts: jnp.ndarray         # (P, 2) sensor frame
    mask: jnp.ndarray        # (P,)
    feats: detector.FeatureSet
    desc: jnp.ndarray
    odom: jnp.ndarray        # (3,)
    gt: jnp.ndarray          # (3,)


def make_frame(fp: FeatureParams, ranges, hit, odom=None, gt=None):
    from ndt_feature_graph_tpu.io import dataset

    pts, mask = dataset.scan_to_points(ranges, hit)
    feats = detector.detect(fp, ranges, hit)
    desc = descriptor.describe(fp, feats, ranges, hit)
    z = jnp.zeros(3)
    return ScanFrame(
        pts=pts, mask=mask, feats=feats, desc=desc,
        odom=z if odom is None else jnp.asarray(odom, jnp.float32),
        gt=z if gt is None else jnp.asarray(gt, jnp.float32),
    )


def match_frames_flirt(fp: FeatureParams, ref: ScanFrame,
                       mov: ScanFrame, key):
    """Pairwise FLIRT RANSAC (ndtFeatureFrameMatchingFLIRT)."""
    return ransac.match_sets(
        fp, ref.feats, ref.desc, mov.feats, mov.desc, key
    )


def icp_with_corr(a_pts, b_pts, weights):
    """Closed-form SVD/Procrustes alignment with known correspondences
    (ICPwithCorrMatch, utils.h:115-165): argmin_T sum w |a - T(b)|^2."""
    return ransac._procrustes(a_pts, b_pts, weights)


def points_as_cells(pts, mask, point_cov=0.02**2):
    """Scan points -> isotropic pseudo-gaussians for P2D registration
    (the NDTMatcherP2D measurement model)."""
    p = pts.shape[0]
    covs = jnp.tile(
        (jnp.eye(2, dtype=jnp.float32) * point_cov)[None], (p, 1, 1)
    )
    return ndt_map.CellList(means=pts, covs=covs, mask=mask)


@functools.partial(jax.jit, static_argnames=("map_params", "m"))
def match_p2d(
    tgt: d2d.DenseTarget,
    pts,
    mask,
    T_init,
    map_params: NDTMapParams,
    m: MatcherParams,
):
    """Point-to-distribution registration: configs[0] of BASELINE.md."""
    src = points_as_cells(pts, mask)

    def score_fn(dd):
        return d2d.d2d_score_dense(dd, T_init, src, tgt, map_params, m)

    dd, f, itr, conv = d2d.newton_match(score_fn, jnp.zeros(3), m)
    return d2d.NewtonResult(
        d=dd, T=se2.compose(dd, T_init), score=f,
        iterations=itr, converged=conv,
    )


@functools.partial(jax.jit, static_argnames=("n_offsets",))
def extrinsic_calibration_score(
    scan_a_pts, scan_a_mask, scan_b_pts, scan_b_mask,
    rel_base_motion, offsets, n_offsets: int = 0,
):
    """Score candidate laser->base extrinsics over a scan pair.

    For extrinsic E, points of scan b mapped through
    E ∘ (prediction in sensor frame) should align with scan a:
    residual = mean squared nearest-neighbour distance (the ScanPair::
    scoreICP objective, laser2d_extrinsic_calibration.cpp:85-120),
    evaluated for every offset candidate in one vmapped batch.

    offsets: (C, 3) candidate extrinsics.  Returns (C,) scores.
    """

    def score_one(E):
        # b's points into a's sensor frame via the base motion.
        T = se2.compose(
            se2.inverse(E), se2.compose(rel_base_motion, E)
        )
        moved = se2.transform_points(T, scan_b_pts)
        d2_ = jnp.sum(
            (moved[:, None, :] - scan_a_pts[None, :, :]) ** 2, -1
        )
        d2_ = jnp.where(
            scan_a_mask[None, :], d2_, jnp.inf
        )
        nn = jnp.min(d2_, axis=1)
        ok = scan_b_mask & jnp.isfinite(nn)
        return jnp.sum(jnp.where(ok, nn, 0.0)) / jnp.maximum(
            jnp.sum(ok), 1
        )

    return jax.vmap(score_one)(offsets)


def calibrate_extrinsic(
    scan_pairs, rel_motions, search_xy=0.5, search_theta=0.3, n=9
):
    """Grid-search the laser extrinsic over multiple scan pairs (the
    calibration CLI's offset sweep).  scan_pairs: list of
    ((pts_a, mask_a), (pts_b, mask_b)); rel_motions: list of (3,) base
    motions.  Returns (best_offset (3,), scores (C,))."""
    xs = jnp.linspace(-search_xy, search_xy, n)
    ts = jnp.linspace(-search_theta, search_theta, n)
    gx, gy, gt = jnp.meshgrid(xs, xs, ts, indexing="ij")
    cand = jnp.stack([gx.ravel(), gy.ravel(), gt.ravel()], -1)

    total = jnp.zeros(cand.shape[0])
    for ((pa, ma), (pb, mb)), rel in zip(scan_pairs, rel_motions):
        total = total + extrinsic_calibration_score(
            pa, ma, pb, mb, jnp.asarray(rel, jnp.float32), cand
        )
    best = jnp.argmin(total)
    return cand[best], total
