"""High-level pipelines: the offline drivers of the reference
(ndt_graph_offline.cpp:90-715 sequence processing,
ndt_feature_graph_opt.cpp:29-210 offline optimization) as plain
functions over Sequence data."""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import SLAMParams
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset as dataset_mod
from ndt_feature_graph_tpu.io import tum


def run_slam(
    params: SLAMParams,
    seq: dataset_mod.Sequence,
    seed: int = 0,
    min_incr_dist: float = None,
    min_incr_rot: float = None,
    verbose: bool = False,
):
    """Online pass: scan gating + graph building
    (the ndt_graph_offline driver loop: accumulate motion; update when
    moved > 0.2 m or > 5 deg, ndt_graph_offline.cpp:575-592).

    Returns (slam, stats dict)."""
    mi = params.min_incr_dist if min_incr_dist is None else min_incr_dist
    mr = params.min_incr_rot if min_incr_rot is None else min_incr_rot

    slam = NDTFeatureGraphSLAM(params, seed=seed)
    slam.initialize(
        seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0], t=0.0
    )
    # Motion gating is pure numpy (no per-scan device ops): accumulate
    # odometry, keep scans that moved > mi metres or > mr radians.
    odom_np = np.asarray(seq.odom, np.float32)
    acc = np.zeros(3, np.float32)
    keep_idx, keep_acc = [], []
    for t in range(1, seq.gt.shape[0]):
        acc = se2.compose_np(acc, odom_np[t])
        if float(np.linalg.norm(acc[:2])) < mi and abs(float(acc[2])) < mr:
            continue
        keep_idx.append(t)
        keep_acc.append(acc)
        acc = np.zeros(3, np.float32)
    n_updates = len(keep_idx)

    t0 = time.perf_counter()
    if n_updates:
        idx = np.asarray([0] + keep_idx)
        odom_g = np.concatenate(
            [np.zeros((1, 3), np.float32), np.stack(keep_acc)]
        )
        ranges_g = np.asarray(seq.ranges)[idx]
        hit_g = np.asarray(seq.hit)[idx]
        times = [0.0] + [float(t) for t in keep_idx]
        if params.graph.online_loop_closure:
            slam.run_sequence_chunked(
                odom_g, ranges_g, hit_g, times=times
            )
        else:
            # Gated sequence through the fully device-resident driver
            # (one dispatch, splits on device).
            slam.run_sequence_device(odom_g, ranges_g, hit_g, times=times)
    slam.finalize_current_node()
    wall = time.perf_counter() - t0
    est = np.stack(slam.trajectory)
    stats = {
        "n_scans": int(seq.gt.shape[0]),
        "n_updates": n_updates,
        "n_nodes": len(slam.nodes),
        "wall_s": wall,
        "scans_per_sec": n_updates / max(wall, 1e-9),
    }
    if verbose:
        print(stats)
    return slam, stats


def evaluate(slam, seq, align=False):
    """ATE of the online trajectory against GT at update times."""
    est = np.stack(slam.trajectory)
    t_idx = np.asarray(slam.times, int)
    gt = np.asarray(seq.gt)[t_idx]
    return tum.ate_rmse(est, gt, align=align)
