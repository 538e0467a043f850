"""Benchmark: sustained SLAM throughput (scans/s) on one chip at the
reference's canonical operating point (resolution 0.5 m, 100x100 m map,
30 m sensor range, 720-beam scans — launch/gustav_laser_tf.launch:11-23).

Two measurements:
  - full_slam_scans_per_sec (HEADLINE): the complete online graph-SLAM
    pipeline — feature detect + describe + RANSAC + joint NDT/feature/
    odometry fusion + map update + on-device split detection
    (fusion/scan_driver.run_graph_chunk) with host-side node freezing at
    splits — i.e. the reference's whole per-scan online node
    (publish_graph_message.cpp:1259-1628) plus graph maintenance.
  - fuser_scans_per_sec: NDT-only scan-to-submap fusion
    (fusion/scan_driver.run_sequence), the narrow registration+map hot
    path.

Measurement protocol (CLAUDE.md): whole workloads inside jitted
executables, host-distinct inputs per rep, consumption of outputs that
depend on every step, block per rep, median over reps.

The reference publishes no numbers (BASELINE.md); vs_baseline is
measured against the real-time bar the reference must sustain online —
50 scans/s (a 2D lidar's top scan rate; the reference gates updates at
0.02 m increments, publish_graph_message.cpp:316).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"extra"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams, FuserParams, GraphParams, NDTMapParams, SLAMParams,
)
from ndt_feature_graph_tpu.fusion import fuser, scan_driver
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset

BASELINE_SCANS_PER_SEC = 50.0
T_STEPS = 40


def canonical_params():
    return FuserParams(
        ndt=NDTMapParams(
            resolution=0.5,
            size_x=100.0,
            size_y=100.0,
            sensor_range=30.0,
            max_points_per_scan=720,
            max_cells=1024,
        ),
        features=FeatureParams(num_beams=720, max_range=30.0),
    )


def make_sequence():
    traj = dataset.loop_trajectory(T_STEPS, radius=5.0)
    return dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=720, max_range=30.0
    )


def bench_fuser(params, seq, reps=12):
    """NDT-only fusion throughput (device-resident sequence driver)."""
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    state = fuser.initialize(
        params, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )

    @jax.jit
    def run(state, odom, pts, mask):
        final, traj, scores = scan_driver.run_sequence.__wrapped__(
            params, state, odom, pts, mask
        )
        digest = sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree.leaves(final)
        )
        return traj, scores, digest

    odom = seq.odom[1:]
    out = run(state, odom, pts_all[1:], mask_all[1:])
    jax.block_until_ready(out)

    times = []
    for k in range(reps):
        odom_k = odom + (k + 1) * 1e-5
        t0 = time.perf_counter()
        out = run(state, odom_k, pts_all[1:], mask_all[1:])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return (T_STEPS - 1) / times[len(times) // 2]


def bench_full_slam(params, seq, reps=6):
    """Full online graph SLAM: feature pipeline + fusion + node splits
    + graph maintenance, ALL inside one executable over the sequence
    (fusion/scan_driver.run_graph_sequence; splits every
    new_node_transl_dist=2 m -> ~13 node freezes per rep, scattered
    into the device node bank).  End-to-end wall time includes the
    final bank unstack + trajectory/edge readbacks — the graph is fully
    usable on return."""
    sparams = SLAMParams(
        fuser=params,
        graph=GraphParams(new_node_transl_dist=2.0, max_nodes=64),
    )

    def run_once(odom):
        slam = NDTFeatureGraphSLAM(sparams, seed=0)
        slam.initialize(
            seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0]
        )
        t0 = time.perf_counter()
        traj = slam.run_sequence_device(odom, seq.ranges, seq.hit)
        # Consumption: the trajectory (host numpy) depends on every
        # scan's outputs; the unstacked node bank is materialized into
        # the host-side graph before the clock stops.
        assert np.isfinite(traj).all()
        dt = time.perf_counter() - t0
        return dt, len(slam.nodes)

    # Warmup: compiles run_graph_chunk + freeze/init paths.
    run_once(seq.odom)
    times = []
    n_nodes = 0
    for k in range(reps):
        odom_k = seq.odom + (k + 1) * 1e-5
        dt, n_nodes = run_once(odom_k)
        times.append(dt)
    times.sort()
    return (T_STEPS - 1) / times[len(times) // 2], n_nodes


def main():
    params = canonical_params()
    seq = make_sequence()
    fuser_sps = bench_fuser(params, seq)
    full_sps, n_nodes = bench_full_slam(params, seq)
    print(
        json.dumps(
            {
                "metric": "full_slam_scans_per_sec",
                "value": round(full_sps, 2),
                "unit": "scans/s",
                "vs_baseline": round(full_sps / BASELINE_SCANS_PER_SEC, 3),
                "extra": {
                    "fuser_scans_per_sec": round(fuser_sps, 2),
                    "nodes_built": n_nodes,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
