"""Long-sequence sustained full-SLAM bench (VERDICT r3 stretch #9).

1000 gated scans around a closed loop at the canonical operating point
(res 0.5 m, 100x100 m map, 30 m range, 720 beams) with node splits
every 2 m — ~0.026 m/scan over one ~26 m lap gives ~12-13 splits, i.e.
realistic node-bank occupancy (~20% of the 64-slot bank) instead of
the 200-scan headline's 2 nodes / 3%.  Confirms the sustained
full_slam_scans_per_sec headline holds when the device-resident driver
(fusion/scan_driver.run_graph_sequence) actually exercises the split
path + bank scatter at density.

Protocol (CLAUDE.md): whole sequence in ONE executable; host-distinct
odometry per rep; the returned trajectory (host numpy, depends on every
scan's registration chain) is the forcing readback.  Median over reps.

Run on the real chip:  timeout 3000 python examples/bench_long_sequence.py
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import GraphParams, SLAMParams
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset

import bench  # repo-root bench: canonical params + honesty gate

T_STEPS = 1000
SPLIT_M = 2.0
REPS = 3


def main():
    params = bench.canonical_params()
    traj = dataset.loop_trajectory(T_STEPS, radius=4.2)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=720, max_range=30.0
    )
    max_cells, params = bench.verify_cell_budget(params, seq)

    sparams = SLAMParams(
        fuser=params,
        graph=GraphParams(new_node_transl_dist=SPLIT_M, max_nodes=64),
    )

    proto = NDTFeatureGraphSLAM(sparams, seed=0)
    proto.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    init_state, init_fmap, init_key = proto.state, proto.fmap, proto._key
    init_traj = [proto.trajectory[0].copy()]

    def run_once(odom):
        slam = NDTFeatureGraphSLAM(sparams, seed=0)
        slam.current_T = np.asarray(seq.gt[0], np.float32)
        slam.state, slam.fmap, slam._key = init_state, init_fmap, init_key
        slam.trajectory = list(init_traj)
        slam.times = [0.0]
        t0 = time.perf_counter()
        out = slam.run_sequence_device(odom, seq.ranges, seq.hit)
        assert np.isfinite(out).all()
        dt = time.perf_counter() - t0
        # Accuracy sanity at density: ATE vs GT after Horn alignment.
        ate = float(
            np.sqrt(
                np.mean(
                    np.sum(
                        (out[:, :2] - np.asarray(seq.gt[: out.shape[0], :2]))
                        ** 2,
                        axis=-1,
                    )
                )
            )
        )
        return dt, len(slam.nodes), ate

    run_once(seq.odom)  # compile warmup
    times, n_nodes, ate = [], 0, 0.0
    for k in range(REPS):
        dt, n_nodes, ate = run_once(seq.odom + (k + 1) * 1e-5)
        times.append(dt)
    times.sort()
    med = times[len(times) // 2]
    print(
        json.dumps(
            {
                "long_seq_scans_per_sec": round((T_STEPS - 1) / med, 2),
                "t_steps": T_STEPS,
                "nodes_built": n_nodes,
                "ate_raw_m": round(ate, 3),
                "median_s": round(med, 2),
                "match_cell_budget": params.match_cell_budget,
                "max_scan_cells_seen": max_cells,
            }
        )
    )


if __name__ == "__main__":
    main()
