"""CARMEN log -> Sequence adapter: real-dataset ingestion for the SLAM
pipeline (the LaserBagReader role — readMultipleMeasurements +
getMotion, ndt_graph_offline.cpp:458-633 — for the classic public .clf
datasets, since the reference's rosbags are LFS-missing upstream)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.io.dataset import Sequence
from ndt_feature_graph_tpu.io.native import CarmenLog, read_carmen


def log_to_sequence(log: CarmenLog, max_range: float = 30.0) -> Sequence:
    """Pack a parsed CARMEN log into the Sequence contract:
    hit-mask from range validity, relative odometry from consecutive
    absolute odometry poses (getMotion semantics), odometry chain as the
    (unknown-GT) `gt` field."""
    ranges = np.minimum(log.ranges, max_range)
    t, b = ranges.shape
    beam_idx = np.arange(b)[None, :]
    hit = (beam_idx < log.beam_counts[:, None]) & (
        log.ranges < max_range * 0.999
    )
    odom_abs = jnp.asarray(log.odom_abs)
    rel = se2.sub(odom_abs[:-1], odom_abs[1:])
    odom = jnp.concatenate([jnp.zeros((1, 3)), rel], 0)
    return Sequence(
        ranges=jnp.asarray(ranges, jnp.float32),
        hit=jnp.asarray(hit),
        odom=odom,
        gt=odom_abs,  # no ground truth in CARMEN logs: dead-reckoning
    )


def read_carmen_sequence(path, max_range: float = 30.0) -> Sequence:
    return log_to_sequence(read_carmen(path), max_range=max_range)


def write_carmen(path, seq: Sequence, max_range: float = 30.0):
    """Export a Sequence as CARMEN FLASER records (odometry = the
    composed odometry chain; useful for interop tests and for feeding
    recorded synthetic runs to CARMEN-consuming tools)."""
    import jax.numpy as jnp

    ranges = np.asarray(seq.ranges)
    hit = np.asarray(seq.hit)
    t_steps, b = ranges.shape
    pose = jnp.asarray(seq.gt[0])
    poses = [np.asarray(pose)]
    for t in range(1, t_steps):
        pose = se2.compose(pose, jnp.asarray(seq.odom[t]))
        poses.append(np.asarray(pose))
    with open(path, "w") as f:
        f.write("# synthetic CARMEN log (ndt_feature_graph_tpu)\n")
        for t in range(t_steps):
            r = np.where(hit[t], ranges[t], max_range * 1.1)
            row = (
                ["FLASER", str(b)]
                + [f"{v:.4f}" for v in r]
                + ["0.0000", "0.0000", "0.0000"]
                + [f"{v:.6f}" for v in poses[t]]
                + [f"{100.0 + t:.4f}", "sim", f"{100.0 + t:.4f}"]
            )
            f.write(" ".join(row) + "\n")
