"""Scan-pose quality evaluation + local pose adjustment.

Replaces flirtlib_ros's ScanPoseEvaluator
(localization_monitor.h:41-63, localization_monitor.cpp:41-120):
badness of a pose hypothesis = median distance of the scan's projected
endpoints to the nearest obstacle in a precomputed distance field; the
brute-force local pose adjustment (x, y, theta grid) becomes one
vmapped batch of candidate scores.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.ops import distance_field as df


class DistanceMap(NamedTuple):
    origin: jnp.ndarray   # (2,)
    resolution: jnp.ndarray
    dist: jnp.ndarray     # (H, W) metres to nearest obstacle


def build_distance_map(occ_logodds, origin, resolution,
                       occupied_threshold=0.6) -> DistanceMap:
    occupied = jax.nn.sigmoid(occ_logodds) > occupied_threshold
    d = df.distance_field(occupied) * resolution
    return DistanceMap(
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(resolution, jnp.float32),
        dist=d,
    )


@jax.jit
def badness(dmap: DistanceMap, pose, pts, mask):
    """Median endpoint distance to the nearest obstacle under `pose`
    (ScanPoseEvaluator::operator(), localization_monitor.cpp:87-120).
    Out-of-map endpoints count as far (penalized)."""
    world = se2.transform_points(pose, pts)
    rel = (world - dmap.origin) / dmap.resolution
    h, w = dmap.dist.shape
    ix = jnp.floor(rel[..., 0]).astype(jnp.int32)
    iy = jnp.floor(rel[..., 1]).astype(jnp.int32)
    inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    d = dmap.dist[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
    d = jnp.where(inb & mask, d, jnp.where(mask, 5.0, jnp.nan))
    return jnp.nanmedian(d)


@functools.partial(
    jax.jit, static_argnames=("nx", "ny", "ntheta")
)
def adjust_pose(
    dmap: DistanceMap,
    pose,
    pts,
    mask,
    search_xy: float = 0.3,
    search_theta: float = 0.15,
    nx: int = 7,
    ny: int = 7,
    ntheta: int = 7,
):
    """Brute-force local pose refinement
    (ScanPoseEvaluator::adjustPose): score every (dx, dy, dtheta) grid
    candidate in one vmapped batch, return the best pose + badness."""
    dxs = jnp.linspace(-search_xy, search_xy, nx)
    dys = jnp.linspace(-search_xy, search_xy, ny)
    dts = jnp.linspace(-search_theta, search_theta, ntheta)
    gx, gy, gt = jnp.meshgrid(dxs, dys, dts, indexing="ij")
    cand = jnp.stack(
        [gx.ravel(), gy.ravel(), gt.ravel()], -1
    )  # (C, 3)
    poses = jnp.stack(
        [
            pose[0] + cand[:, 0],
            pose[1] + cand[:, 1],
            se2.normalize_angle(pose[2] + cand[:, 2]),
        ],
        -1,
    )
    scores = jax.vmap(lambda p: badness.__wrapped__(dmap, p, pts, mask))(
        poses
    )
    best = jnp.argmin(scores)
    return poses[best], scores[best]
