"""Build the 570-node scaling scenario ONCE and dump everything the
offline solve needs (node poses, odometry edges, proposed/refined links,
GT node poses) to /tmp/diag570.npz so solver/validation experiments can
iterate in seconds instead of re-running the 5-minute pipeline.

Usage: python examples/diag_570_build.py [out.npz]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # match tests/conftest.py

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams, FuserParams, GraphParams, MatcherParams,
    NDTMapParams, SLAMParams,
)
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.graph import node as node_mod
from ndt_feature_graph_tpu.io import dataset, tum

# Same operating point as tests/test_scaling_e2e.py.
PARAMS = SLAMParams(
    fuser=FuserParams(
        ndt=NDTMapParams(
            resolution=0.5, size_x=16.0, size_y=16.0, sensor_range=6.0,
            max_points_per_scan=128, max_cells=128, ray_samples=16,
        ),
        matcher=MatcherParams(itr_max=10),
        features=FeatureParams(
            num_beams=128, max_range=6.0, max_features=8,
            smooth_half_beams=12, ransac_hypotheses=64,
            max_correspondences=16,
        ),
    ),
    graph=GraphParams(
        new_node_transl_dist=0.30, max_nodes=620, max_links=4096,
        valid_min_idx_dist=25, offline_candidate_dist=1.5,
        link_batch_size=256, valid_max_dist=1.0,
        valid_max_angular_dist=0.4, valid_max_score=0.2,
        solver="auto", solver_dense_max_nodes=256, solver_max_seg_len=64,
        gn_iterations=12, fixpoint_max_rounds=2,
    ),
)

def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/diag570.npz"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    traj = dataset.multi_loop_trajectory(n_loops=8, steps_per_loop=165, radius=5.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(seed), traj, num_beams=128, max_range=6.0,
        odom_noise=(0.008, 0.008, 0.004),
    )
    slam = NDTFeatureGraphSLAM(PARAMS, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    slam.run_sequence_chunked(seq.odom, seq.ranges, seq.hit, chunk=8)
    slam.finalize_current_node()
    n = len(slam.nodes)
    print(f"nodes={n}")

    traj_est = np.stack(slam.trajectory)
    node_T = np.stack(slam.node_T)
    idx = np.array([
        int(np.argmin(np.abs(traj_est - node_T[i]).sum(-1))) for i in range(n)
    ])
    gt_nodes = np.asarray(seq.gt)[idx]
    print(f"online node ATE = {tum.ate_rmse(node_T, gt_nodes):.4f}")

    ref, mov, mask = slam.candidate_pairs()
    print(f"candidates = {int(np.asarray(mask).sum())}")
    stacked = node_mod.stack_nodes(slam.nodes)
    link_set = slam._propose_links(stacked, ref, mov, mask)

    odom = slam.odom_edges
    np.savez_compressed(
        out_path,
        node_T=node_T,
        gt_nodes=gt_nodes,
        odom_i=np.asarray([e[0] for e in odom], np.int32),
        odom_j=np.asarray([e[1] for e in odom], np.int32),
        odom_rel=np.stack([np.asarray(e[2]) for e in odom]).astype(np.float32),
        odom_cov=np.stack([np.asarray(e[3]) for e in odom]).astype(np.float32),
        link_ref=np.asarray(link_set.ref),
        link_mov=np.asarray(link_set.mov),
        link_T=np.asarray(link_set.T),
        link_cov=np.asarray(link_set.cov),
        link_score=np.asarray(link_set.score),
        link_mask=np.asarray(link_set.mask),
    )
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
