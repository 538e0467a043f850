"""Benchmark: sustained scan-to-submap fusion throughput (scans/s) on
one chip, at the reference's canonical operating point (resolution
0.5 m, 100x100 m map, 30 m sensor range, 720-beam scans —
launch/gustav_laser_tf.launch:11-23).

The reference publishes no numbers (BASELINE.md); vs_baseline is
measured against the real-time bar the reference must sustain online —
50 scans/s (a 2D lidar's top scan rate; the reference gates updates at
0.02 m increments, publish_graph_message.cpp:316).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from ndt_feature_graph_tpu.config import FuserParams, NDTMapParams
from ndt_feature_graph_tpu.fusion import fuser
from ndt_feature_graph_tpu.io import dataset

BASELINE_SCANS_PER_SEC = 50.0


def main():
    params = FuserParams(
        ndt=NDTMapParams(
            resolution=0.5,
            size_x=100.0,
            size_y=100.0,
            sensor_range=30.0,
            max_points_per_scan=720,
            max_cells=1024,
        ),
    )
    num_beams = 720

    traj = dataset.loop_trajectory(40, radius=5.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=num_beams, max_range=30.0
    )
    pts0, mask0 = dataset.scan_to_points(seq.ranges[0], seq.hit[0])
    state = fuser.initialize(params, seq.gt[0], jnp.zeros(3), pts0, mask0)

    scans = []
    for t in range(1, traj.shape[0]):
        scans.append(dataset.scan_to_points(seq.ranges[t], seq.hit[t]))

    # Warmup / compile.
    st = state
    st, info = fuser.update(st, params, seq.odom[1], *scans[0])
    jax.block_until_ready(st.Tnow)

    n = 0
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        st = state
        for t, (pts, mask) in enumerate(scans):
            st, info = fuser.update(st, params, seq.odom[t + 1], pts, mask)
            n += 1
    jax.block_until_ready(st.Tnow)
    dt = time.perf_counter() - t0

    scans_per_sec = n / dt
    print(
        json.dumps(
            {
                "metric": "fuser_scans_per_sec",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(
                    scans_per_sec / BASELINE_SCANS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
