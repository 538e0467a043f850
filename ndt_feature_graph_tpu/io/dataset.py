"""Synthetic datasets + sequence plumbing.

Replaces the reference's rosbag/LaserBagReader dataset path
(ndt_offline_ndt_feature/src/ndt_graph_offline.cpp:458-479) — the
bundled rosbags are LFS-missing upstream (.MISSING_LARGE_BLOBS), so the
primary sequences here are simulated 2D worlds with exact ground truth:
segment worlds + raycast lidar (the same role as flirtlib_ros's
simulate_scans.cpp:50-155).

All generators are jittable; sequences are (scans, odometry, gt) array
triples like readMultipleMeasurements + getMotion produce.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.core import se2


class Sequence(NamedTuple):
    """A recorded run: per-step scan + odometry + ground truth."""

    ranges: jnp.ndarray      # (T, B) beam ranges (max_range where no hit)
    hit: jnp.ndarray         # (T, B) bool — beam hit something in range
    odom: jnp.ndarray        # (T, 3) relative motion (noisy), local frame
    gt: jnp.ndarray          # (T, 3) ground-truth absolute poses


def default_world():
    """A ~20x14 m office-like room with interior walls and pillars.
    Segments as (S, 4) [x0, y0, x1, y1]."""
    segs = [
        # Outer walls
        (-10, -7, 10, -7), (10, -7, 10, 7), (10, 7, -10, 7), (-10, 7, -10, -7),
        # Interior partitions
        (-4, -7, -4, -2), (-4, 2, -4, 7), (3, -7, 3, 0), (3, 3, 3, 7),
        (-4, 2, 0, 2), (6, 3, 10, 3),
        # Pillars (small squares)
        (-7, -3, -6, -3), (-6, -3, -6, -2), (-6, -2, -7, -2), (-7, -2, -7, -3),
        (6, -4, 7, -4), (7, -4, 7, -3), (7, -3, 6, -3), (6, -3, 6, -4),
        (0, 5, 1, 5), (1, 5, 1, 6), (1, 6, 0, 6), (0, 6, 0, 5),
    ]
    return jnp.asarray(segs, jnp.float32)


def warehouse_world():
    """A second, sparser world: long corridors + shelving rows —
    geometry-poor along the corridor axis (stresses the odometry prior
    and features)."""
    segs = [
        (-15, -6, 15, -6), (15, -6, 15, 6), (15, 6, -15, 6),
        (-15, 6, -15, -6),
        # shelf rows
        (-10, -3, -2, -3), (-10, -2.4, -2, -2.4),
        (2, -3, 10, -3), (2, -2.4, 10, -2.4),
        (-10, 1, -2, 1), (-10, 1.6, -2, 1.6),
        (2, 1, 10, 1), (2, 1.6, 10, 1.6),
    ]
    return jnp.asarray(segs, jnp.float32)


def raycast(segments, pose, num_beams, max_range, fov=2.0 * np.pi):
    """Cast `num_beams` rays from `pose` against the segment world.
    Returns (ranges (B,), hit (B,)).  Fully vectorized (B x S)."""
    angles = pose[2] + jnp.linspace(
        -fov / 2, fov / 2, num_beams, endpoint=False
    )
    dx, dy = jnp.cos(angles), jnp.sin(angles)          # (B,)
    ox, oy = pose[0], pose[1]
    x0, y0, x1, y1 = (segments[:, i] for i in range(4))  # (S,)
    ex, ey = x1 - x0, y1 - y0

    # Solve o + t*d = p0 + u*e  for t (ray param) and u in [0,1].
    denom = dx[:, None] * (-ey)[None, :] + dy[:, None] * ex[None, :]
    safe = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    rx = x0[None, :] - ox
    ry = y0[None, :] - oy
    t = (rx * (-ey)[None, :] + ry * ex[None, :]) / safe
    u = (dx[:, None] * ry - dy[:, None] * rx) / safe
    valid = (jnp.abs(denom) > 1e-9) & (u >= 0) & (u <= 1) & (t > 1e-6)
    t = jnp.where(valid, t, jnp.inf)
    rng = jnp.min(t, axis=1)
    hit = rng < max_range
    return jnp.where(hit, rng, max_range), hit


def scan_to_points(ranges, hit, fov=2.0 * np.pi):
    """Polar scan -> (B, 2) points in the sensor frame + mask."""
    b = ranges.shape[-1]
    angles = jnp.linspace(-fov / 2, fov / 2, b, endpoint=False)
    pts = jnp.stack(
        [ranges * jnp.cos(angles), ranges * jnp.sin(angles)], -1
    )
    return pts, hit


def simulate_sequence(
    key,
    waypoint_poses,
    num_beams=720,
    max_range=30.0,
    segments=None,
    range_noise=0.01,
    odom_noise=(0.01, 0.01, 0.004),
) -> Sequence:
    """Drive through `waypoint_poses` (T, 3); record noisy scans + noisy
    relative odometry + GT."""
    if segments is None:
        segments = default_world()
    gt = jnp.asarray(waypoint_poses, jnp.float32)
    t_steps = gt.shape[0]

    k1, k2 = jax.random.split(key)

    def scan_at(pose, k):
        rng, hit = raycast(segments, pose, num_beams, max_range)
        rng = rng + range_noise * jax.random.normal(k, rng.shape) * hit
        return rng, hit

    keys = jax.random.split(k1, t_steps)
    ranges, hits = jax.vmap(scan_at)(gt, keys)

    # Relative odometry (local frame) with additive gaussian noise.
    rel = se2.sub(gt[:-1], gt[1:])
    noise = jax.random.normal(k2, rel.shape) * jnp.asarray(odom_noise)
    odom = jnp.concatenate([jnp.zeros((1, 3)), rel + noise], 0)
    return Sequence(ranges=ranges, hit=hits, odom=odom, gt=gt)


def save_sequence(path, seq: Sequence):
    np.savez_compressed(
        path,
        ranges=np.asarray(seq.ranges),
        hit=np.asarray(seq.hit),
        odom=np.asarray(seq.odom),
        gt=np.asarray(seq.gt),
    )


def load_sequence(path) -> Sequence:
    d = np.load(path)
    return Sequence(
        ranges=jnp.asarray(d["ranges"]),
        hit=jnp.asarray(d["hit"]),
        odom=jnp.asarray(d["odom"]),
        gt=jnp.asarray(d["gt"]),
    )


def loop_trajectory(n_steps=120, radius=5.0, center=(0.0, -0.5)):
    """A closed loop around the room (revisits the start — exercises
    loop closure)."""
    a = np.linspace(0, 2 * np.pi, n_steps)
    x = center[0] + radius * np.cos(a)
    y = center[1] + 0.65 * radius * np.sin(a)
    theta = np.unwrap(np.arctan2(np.gradient(y), np.gradient(x)))
    return jnp.asarray(np.stack([x, y, theta], -1), jnp.float32)


def _point_segment_dist(points, seg):
    """Min distance from each point (K, 2) to one segment [x0,y0,x1,y1]."""
    p0 = np.asarray(seg[:2], np.float64)
    e = np.asarray(seg[2:], np.float64) - p0
    ee = float(e @ e)
    d = points - p0
    t = np.clip((d @ e) / max(ee, 1e-12), 0.0, 1.0)
    proj = p0 + t[:, None] * e
    return np.sqrt(((points - proj) ** 2).sum(-1))


def random_world(
    seed,
    half_x=10.0,
    half_y=7.0,
    n_obstacles=12,
    keepout=None,
    clearance=1.0,
):
    """Randomized segment world: outer rectangle + random interior
    stub walls and box pillars (ROADMAP item 7 — randomized world
    generation; same role as the reference's simulated grid maps,
    flirtlib_ros/src/simulate_scans.cpp:50-155, but procedurally
    varied).

    keepout: optional (K, 2) points (e.g. a trajectory) every interior
    obstacle must stay `clearance` away from, so driven paths remain
    collision-free by construction.
    """
    rng = np.random.default_rng(seed)
    hx, hy = float(half_x), float(half_y)
    segs = [
        (-hx, -hy, hx, -hy), (hx, -hy, hx, hy),
        (hx, hy, -hx, hy), (-hx, hy, -hx, -hy),
    ]
    keep = None if keepout is None else np.asarray(keepout, np.float64)

    def admissible(cand):
        if keep is None:
            return True
        return all(
            _point_segment_dist(keep, s).min() > clearance for s in cand
        )

    placed = 0
    for _ in range(n_obstacles * 8):
        if placed >= n_obstacles:
            break
        if rng.random() < 0.4:
            # Stub wall attached to one outer wall, running inward.
            side = rng.integers(4)
            length = rng.uniform(0.15, 0.5) * (hy if side < 2 else hx) * 2
            if side == 0:    # bottom, going up
                x = rng.uniform(-hx * 0.8, hx * 0.8)
                cand = [(x, -hy, x, -hy + length)]
            elif side == 1:  # top, going down
                x = rng.uniform(-hx * 0.8, hx * 0.8)
                cand = [(x, hy, x, hy - length)]
            elif side == 2:  # left, going right
                y = rng.uniform(-hy * 0.8, hy * 0.8)
                cand = [(-hx, y, -hx + length, y)]
            else:            # right, going left
                y = rng.uniform(-hy * 0.8, hy * 0.8)
                cand = [(hx, y, hx - length, y)]
        else:
            # Box pillar.
            w = rng.uniform(0.4, 1.6)
            h = rng.uniform(0.4, 1.6)
            cx = rng.uniform(-hx + 1 + w, hx - 1 - w)
            cy = rng.uniform(-hy + 1 + h, hy - 1 - h)
            x0, x1 = cx - w / 2, cx + w / 2
            y0, y1 = cy - h / 2, cy + h / 2
            cand = [
                (x0, y0, x1, y0), (x1, y0, x1, y1),
                (x1, y1, x0, y1), (x0, y1, x0, y0),
            ]
        if admissible(cand):
            segs.extend(cand)
            placed += 1
    return jnp.asarray(segs, jnp.float32)


def random_loop_scenario(seed, n_steps=80, half_x=10.0, half_y=7.0):
    """A randomized (world, loop-trajectory) pair: ellipse loop with
    randomized radii/center/phase, world obstacles placed clear of it."""
    rng = np.random.default_rng(seed)
    rx = rng.uniform(0.45, 0.65) * half_x
    ry = rng.uniform(0.45, 0.65) * half_y
    cx = rng.uniform(-0.15, 0.15) * half_x
    cy = rng.uniform(-0.15, 0.15) * half_y
    phase = rng.uniform(0, 2 * np.pi)
    a = np.linspace(0, 2 * np.pi, n_steps) + phase
    x = cx + rx * np.cos(a)
    y = cy + ry * np.sin(a)
    theta = np.unwrap(np.arctan2(np.gradient(y), np.gradient(x)))
    traj = jnp.asarray(np.stack([x, y, theta], -1), jnp.float32)
    world = random_world(
        seed, half_x=half_x, half_y=half_y,
        keepout=np.stack([x, y], -1), clearance=1.1,
    )
    return world, traj


def multi_loop_trajectory(
    n_loops=3, steps_per_loop=120, radius=5.0, center=(0.0, -0.5),
    ry_scale=0.65,
):
    """`n_loops` consecutive revolutions of the ellipse loop — long
    trajectories that revisit the same places repeatedly (unbounded-
    trajectory scaling scenarios, SURVEY.md §5: node counts grow with
    path length while the world stays bounded)."""
    n_steps = n_loops * steps_per_loop
    a = np.linspace(0, 2 * np.pi * n_loops, n_steps)
    x = center[0] + radius * np.cos(a)
    y = center[1] + ry_scale * radius * np.sin(a)
    theta = np.unwrap(np.arctan2(np.gradient(y), np.gradient(x)))
    return jnp.asarray(np.stack([x, y, theta], -1), jnp.float32)


def corridor_trajectory(n_steps=60, x0=-8.0, x1=8.0, y=-4.5):
    """Straight drive along the lower corridor."""
    x = np.linspace(x0, x1, n_steps)
    y_arr = np.full(n_steps, y)
    theta = np.zeros(n_steps)
    return jnp.asarray(np.stack([x, y_arr, theta], -1), jnp.float32)
