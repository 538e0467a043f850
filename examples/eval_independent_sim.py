"""Out-of-model evaluation: full SLAM (online + offline) on the
independent simulator (io/eval_sim.py — different world model, beam
model, noise family, odometry error family from io/dataset.py), plus
the one-command CARMEN ingestion path.

Produces the numbers recorded in EVAL.md.  CPU-runnable:
    python examples/eval_independent_sim.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams, FuserParams, GraphParams, NDTMapParams, SLAMParams,
)
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import eval_sim, tum

PARAMS = SLAMParams(
    fuser=FuserParams(
        ndt=NDTMapParams(
            resolution=0.5,
            size_x=40.0,
            size_y=40.0,
            sensor_range=15.0,
            max_points_per_scan=512,
            max_cells=512,
        ),
        features=FeatureParams(num_beams=360, max_range=15.0),
    ),
    graph=GraphParams(
        new_node_transl_dist=3.0,
        max_nodes=48,
        valid_max_dist=2.0,
        valid_max_angular_dist=0.5,
        valid_max_score=0.2,
    ),
)


def run_one(seed, n_steps=150):
    seq = eval_sim.simulate(seed, n_steps=n_steps, num_beams=360,
                            max_range=15.0)
    slam = NDTFeatureGraphSLAM(PARAMS, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    t0 = time.time()
    slam.run_sequence_chunked(seq.odom, seq.ranges, seq.hit, chunk=16)
    slam.finalize_current_node()
    online_s = time.time() - t0

    est = np.stack(slam.trajectory)
    gt = np.asarray(seq.gt)
    ate_online = tum.ate_rmse(est, gt)

    # Node-level ATE after offline optimization.
    traj_est = est
    node_T_before = np.stack(slam.node_T)
    n = len(slam.nodes)
    idx = np.array([
        int(np.argmin(np.abs(traj_est - node_T_before[i]).sum(-1)))
        for i in range(n)
    ])
    gt_nodes = gt[idx]
    ate_nodes_before = tum.ate_rmse(node_T_before, gt_nodes)
    out = np.asarray(slam.optimize_offline())
    ate_nodes_after = tum.ate_rmse(out[:n], gt_nodes)

    # Dead-reckoning baseline (what pure odometry would give).
    from ndt_feature_graph_tpu.core import se2
    dr = [gt[0]]
    for t in range(1, len(gt)):
        dr.append(np.asarray(
            se2.compose(jnp.asarray(dr[-1]), jnp.asarray(seq.odom[t]))
        ))
    ate_dr = tum.ate_rmse(np.stack(dr), gt)
    return dict(
        seed=seed, nodes=n, ate_odom=ate_dr, ate_online=ate_online,
        ate_nodes_before=ate_nodes_before,
        ate_nodes_after=ate_nodes_after, online_s=online_s,
    )


def main():
    rows = [run_one(seed) for seed in (0, 1, 2)]
    print("| seed | nodes | odometry ATE | online SLAM ATE | "
          "node ATE before opt | after opt |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['seed']} | {r['nodes']} | {r['ate_odom']:.3f} | "
            f"{r['ate_online']:.3f} | {r['ate_nodes_before']:.3f} | "
            f"{r['ate_nodes_after']:.3f} |"
        )
    med = np.median([r["ate_online"] for r in rows])
    print(f"median online ATE: {med:.3f} m")


if __name__ == "__main__":
    main()
