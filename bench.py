"""Benchmark: sustained scan-to-submap fusion throughput (scans/s) on
one chip at the reference's canonical operating point (resolution
0.5 m, 100x100 m map, 30 m sensor range, 720-beam scans —
launch/gustav_laser_tf.launch:11-23).

Measures the device-resident sequence driver
(fusion/scan_driver.run_sequence): the whole scan chain runs inside one
XLA executable, and a full-state digest computed in the same executable
guarantees every map update + registration actually executed (no async
under-measurement).

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
from ndt_feature_graph_tpu.fusion import fuser, scan_driver
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
    t_steps = 40

    traj = dataset.loop_trajectory(t_steps, radius=5.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=720, max_range=30.0
    )
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

    # Measurement protocol: every rep gets host-distinct inputs (so no
    # caching layer can memoize) and blocks on the full-state digest
    # (so every scan's registration + map update provably executed).
    # Median over reps discards tunnel warmup outliers.
    reps = 12
    times = []
    for k in range(reps):
        odom_k = odom + (k + 1) * 1e-5
        t0 = time.perf_counter()
        out = run(state, odom_k, pts_all[1:], mask_all[1:])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    per_seq = times[len(times) // 2]
    scans_per_sec = (t_steps - 1) / per_seq
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
