"""Node-match harness parity: feature-RANSAC transform -> overlap
score -> D2D refine -> overlap score again — the scenario the
reference checks interactively (ndt_feature_node_test.cpp:48-164).

What must hold (and is asserted here):
  1. for links whose RANSAC proposal is sound, D2D refinement improves
     (or holds) the pose error and lands near truth;
  2. the rescored overlap score separates correctly-aligned refined
     links from wrong-basin ones — i.e. the validation gate
     (valid_max_score, graph_opt.cpp:49) has something real to cut on;
  3. valid_links keeps only correct alignments on this scene
     (perfect precision; the gate may sacrifice recall by design —
     see EVAL.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams,
    FuserParams,
    GraphParams,
    NDTMapParams,
    SLAMParams,
)
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.graph import links as links_mod
from ndt_feature_graph_tpu.graph import node as node_mod
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset

RES = 0.5
PARAMS = SLAMParams(
    fuser=FuserParams(
        ndt=NDTMapParams(
            resolution=RES, size_x=20.0, size_y=20.0, sensor_range=8.0,
            max_points_per_scan=256, max_cells=256, ray_samples=16,
        ),
        features=FeatureParams(num_beams=256, max_range=8.0),
    ),
    graph=GraphParams(new_node_transl_dist=2.0, max_nodes=12),
)


def _nodes_and_truth(seed):
    """Frozen nodes from a low-noise run: node_T ~= ground truth, so
    relative node transforms serve as reference alignments."""
    world, traj = dataset.random_loop_scenario(
        300 + seed, n_steps=60, half_x=7.5, half_y=5.5
    )
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(seed), traj, num_beams=256, max_range=8.0,
        odom_noise=(0.004, 0.004, 0.002),
    )
    slam = NDTFeatureGraphSLAM(PARAMS, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    slam.run_sequence_chunked(seq.odom, seq.ranges, seq.hit, chunk=16)
    slam.finalize_current_node()
    return slam


def test_refine_then_score_separates_good_links():
    slam = _nodes_and_truth(0)
    stacked = node_mod.stack_nodes(slam.nodes)
    node_T = np.stack(slam.node_T)
    n = len(slam.nodes)

    pairs = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if np.linalg.norm(node_T[i][:2] - node_T[j][:2]) < 4.0
    ]
    assert len(pairs) >= 8
    ref = jnp.asarray([p[0] for p in pairs], jnp.int32)
    mov = jnp.asarray([p[1] for p in pairs], jnp.int32)
    mask = jnp.ones(len(pairs), bool)

    p = slam.params.fuser
    ls0 = links_mod.compute_links_batch(
        p.features, RES, stacked, ref, mov, mask,
        jax.random.PRNGKey(5),
    )
    ls1 = links_mod.refine_links_d2d(p.ndt, p.matcher, stacked, ls0)
    ls1 = links_mod.rescore_links(RES, stacked, ls1)

    Ttrue = np.stack([
        np.asarray(se2.sub(jnp.asarray(node_T[i]), jnp.asarray(node_T[j])))
        for (i, j) in pairs
    ])
    m = np.asarray(ls0.mask) & np.asarray(ls1.mask)
    e0 = np.linalg.norm(np.asarray(ls0.T)[:, :2] - Ttrue[:, :2], axis=-1)
    e1 = np.linalg.norm(np.asarray(ls1.T)[:, :2] - Ttrue[:, :2], axis=-1)
    s1 = np.asarray(ls1.score)

    # (1) Sound proposals: refinement improves/holds and lands near
    # truth (sub-decimetre at 0.5 m resolution).
    sound = m & (e0 < 0.5)
    assert sound.sum() >= 3
    assert e1[sound].mean() <= e0[sound].mean() + 1e-3
    assert (e1[sound] < 0.1).all(), e1[sound]

    # (2) Score separation on refined links: correct alignments score
    # strictly below wrong basins.
    good = m & (e1 < 0.5)
    bad = m & (e1 > 1.0)
    assert good.sum() >= 3 and bad.sum() >= 3
    assert s1[good].max() < s1[bad].min(), (
        s1[good].max(), s1[bad].min()
    )

    # (3) The production gate keeps only correct alignments here.
    gp = slam.params.graph.replace(
        valid_max_score=0.12, valid_max_dist=10.0,
        valid_max_angular_dist=3.2, valid_min_idx_dist=0,
    )
    keep = np.asarray(
        links_mod.valid_links(gp, jnp.asarray(node_T), ls1)
    )
    assert keep.sum() >= 3
    assert (e1[keep] < 0.5).all(), e1[keep]


def test_flat_bank_paths_match_per_node_paths():
    """The flat-bank forms (fgh_dense_flat window gathers with row
    offsets, _overlap_score_flat) must agree with the per-node
    reference forms they replaced — same numbers, no per-pair grid
    copies."""
    from ndt_feature_graph_tpu.ops import d2d, d2d_analytic
    from ndt_feature_graph_tpu.ops.ndt_map import CellList

    slam = _nodes_and_truth(1)
    nodes = node_mod.stack_nodes(slam.nodes)
    n = len(slam.nodes)
    assert n >= 3
    mp = PARAMS.fuser.ndt
    m = PARAMS.fuser.matcher
    h, w = mp.grid_h, mp.grid_w
    packed_flat = nodes.target.packed.reshape(-1, 8)
    occ_flat = nodes.occ.reshape(-1)

    rng = np.random.default_rng(0)
    for ref_i, mov_i in ((0, 2), (1, n - 1), (n - 1, 0)):
        ref = jax.tree.map(lambda x: x[ref_i], nodes)
        mov = jax.tree.map(lambda x: x[mov_i], nodes)
        T0 = jnp.asarray(
            se2.sub(
                jnp.asarray(slam.node_T[ref_i]),
                jnp.asarray(slam.node_T[mov_i]),
            )
        ) + jnp.asarray(rng.normal(0, 0.05, 3).astype(np.float32))
        d = jnp.asarray(rng.normal(0, 0.02, 3).astype(np.float32))

        f0, g0, H0 = d2d_analytic.fgh_dense(
            d, T0, mov.cells,
            d2d.dense_from_packed(ref.target, h, w), mp, m,
        )
        src = CellList(
            means=nodes.cells.means[mov_i],
            covs=nodes.cells.covs[mov_i],
            mask=nodes.cells.mask[mov_i],
        )
        f1, g1, H1 = d2d_analytic.fgh_dense_flat(
            d, T0, src, packed_flat, nodes.target.origin[ref_i],
            ref_i * (h * w), h, w, mp.resolution, m,
        )
        np.testing.assert_allclose(f0, f1, rtol=1e-6)
        np.testing.assert_allclose(g0, g1, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(H0, H1, rtol=1e-5, atol=1e-5)

        s0, nb0 = links_mod.occupancy_overlap_score(
            ref, mov, T0, mp.resolution
        )
        s1, nb1 = links_mod._overlap_score_flat(
            occ_flat, nodes.occ_origin,
            jnp.int32(ref_i), jnp.int32(mov_i), T0, h, w, mp.resolution,
        )
        np.testing.assert_allclose(s0, s1, rtol=1e-6)
        assert int(nb0) == int(nb1)
