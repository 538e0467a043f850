"""Locality-grouped link proposal (GraphParams.link_group_nodes)
matches plain chunked proposal.

The grouped path gathers a compact per-chunk sub-bank and remaps node
indices; with chunk boundaries equal to the plain path's (group size
>= nodes referenced per batch-sized chunk) the per-chunk RANSAC keys
line up too, so the outputs must be IDENTICAL.  A second leg with a
small group budget changes chunk boundaries (and so the RANSAC draws)
but must still produce valid links for the same pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams, FuserParams, GraphParams, MatcherParams,
    NDTMapParams, SLAMParams,
)
from ndt_feature_graph_tpu.graph import node as node_mod
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset


def _build_graph():
    params = SLAMParams(
        fuser=FuserParams(
            ndt=NDTMapParams(
                resolution=0.5, size_x=16.0, size_y=16.0,
                sensor_range=6.0, max_points_per_scan=128,
                max_cells=128, ray_samples=16,
            ),
            matcher=MatcherParams(itr_max=10),
            features=FeatureParams(
                num_beams=128, max_range=6.0, max_features=8,
                smooth_half_beams=12, ransac_hypotheses=64,
                max_correspondences=16,
            ),
        ),
        graph=GraphParams(
            new_node_transl_dist=0.5, max_nodes=64,
            valid_min_idx_dist=8, offline_candidate_dist=2.0,
            link_batch_size=16,
        ),
    )
    traj = dataset.multi_loop_trajectory(
        n_loops=2, steps_per_loop=60, radius=5.0
    )
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(3), traj, num_beams=128, max_range=6.0,
        odom_noise=(0.006, 0.006, 0.003),
    )
    slam = NDTFeatureGraphSLAM(params, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    slam.run_sequence_device(seq.odom, seq.ranges, seq.hit)
    slam.finalize_current_node()
    return params, slam


def test_grouped_proposal_matches_plain_chunked():
    params, slam = _build_graph()
    n = len(slam.nodes)
    assert n >= 15, n
    stacked = node_mod.stack_nodes(slam.nodes)
    ref, mov, mask = slam.candidate_pairs()
    assert int(np.asarray(mask).sum()) >= 20

    # Plain chunked baseline.
    key_state = slam._key
    plain = slam._propose_links(stacked, ref, mov, mask)

    # Grouped with a budget that never closes a chunk early: chunk
    # boundaries (and the per-chunk RANSAC keys) coincide with the
    # plain path, so outputs must match to f32 noise.
    slam._key = key_state
    slam.params = params.replace(
        graph=params.graph.replace(link_group_nodes=n)
    )
    grouped = slam._propose_links(stacked, ref, mov, mask)
    np.testing.assert_array_equal(
        np.asarray(plain.ref), np.asarray(grouped.ref)
    )
    np.testing.assert_array_equal(
        np.asarray(plain.mask), np.asarray(grouped.mask)
    )
    np.testing.assert_allclose(
        np.asarray(plain.T), np.asarray(grouped.T),
        rtol=0, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(plain.score), np.asarray(grouped.score),
        rtol=1e-3, atol=1e-3,
    )

    # Small group budget: different boundaries (different RANSAC
    # draws), but the accepted-link structure must hold up — pairs
    # preserved in order, finite fields, and a comparable number of
    # surviving links.
    slam._key = key_state
    slam.params = params.replace(
        graph=params.graph.replace(link_group_nodes=6)
    )
    small = slam._propose_links(stacked, ref, mov, mask)
    np.testing.assert_array_equal(
        np.asarray(small.ref), np.asarray(ref)
    )
    np.testing.assert_array_equal(
        np.asarray(small.mov), np.asarray(mov)
    )
    assert np.isfinite(np.asarray(small.T)).all()
    n_plain = int(np.asarray(plain.mask).sum())
    n_small = int(np.asarray(small.mask).sum())
    assert n_small >= max(1, int(0.6 * n_plain)), (n_plain, n_small)
