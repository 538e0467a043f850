"""Multi-device correctness on the 8-device virtual CPU mesh:
sharded solves and link proposal must match single-device results
(the distributed-correctness story, SURVEY.md §7 hard parts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.graph import optimize as opt
from ndt_feature_graph_tpu.parallel import mesh as mesh_mod
from ndt_feature_graph_tpu.parallel import solver_sharded


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def random_graph(key, n_nodes=24, n_loop=10):
    k1, k2, k3 = jax.random.split(key, 3)
    rels = jnp.concatenate(
        [
            jax.random.uniform(k1, (n_nodes - 1, 2), minval=-1.0, maxval=1.0),
            jax.random.uniform(
                k1, (n_nodes - 1, 1), minval=-0.4, maxval=0.4
            ),
        ],
        -1,
    )
    gt = [jnp.zeros(3)]
    for r in rels:
        gt.append(se2.compose(gt[-1], r))
    gt = jnp.stack(gt)

    li = jax.random.randint(k2, (n_loop,), 0, n_nodes - 3)
    lj = li + jax.random.randint(k3, (n_loop,), 2, 3)
    lmeas = se2.sub(gt[li], gt[lj])

    i = jnp.concatenate([jnp.arange(n_nodes - 1), li]).astype(jnp.int32)
    j = jnp.concatenate([jnp.arange(1, n_nodes), lj]).astype(jnp.int32)
    meas = jnp.concatenate([rels, lmeas])
    info = jnp.tile(jnp.eye(3)[None] * 50.0, (i.shape[0], 1, 1))
    edges = opt.EdgeList(
        i=i, j=j, meas=meas, info=info,
        mask=jnp.ones(i.shape[0], bool),
    )
    noise = 0.1 * jax.random.normal(k3, gt.shape)
    init = gt + noise.at[0].set(0.0)
    return gt, init, edges


def test_sharded_solver_matches_dense():
    require_devices(8)
    mesh = mesh_mod.make_mesh(8)
    gt, init, edges = random_graph(jax.random.PRNGKey(0))

    ref, _ = opt.optimize(init, edges, iterations=15)
    out = solver_sharded.optimize_sharded(
        mesh, init, edges, iterations=15
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4
    )
    # And both recover the ground truth.
    np.testing.assert_allclose(np.asarray(out), np.asarray(gt), atol=0.05)


def test_sharded_solver_odd_edge_count():
    """Edge padding: a count not divisible by the mesh size."""
    require_devices(8)
    mesh = mesh_mod.make_mesh(8)
    gt, init, edges = random_graph(jax.random.PRNGKey(1), n_nodes=12,
                                   n_loop=7)  # 11 + 7 = 18 edges
    assert edges.i.shape[0] % 8 != 0
    ref, _ = opt.optimize(init, edges, iterations=15)
    out = solver_sharded.optimize_sharded(mesh, init, edges, iterations=15)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_sharded_links_smoke():
    """Sharded link proposal runs and flags the same valid pairs as the
    single-device batch (PRNG keys are identical per pair)."""
    require_devices(8)
    from ndt_feature_graph_tpu.config import (
        FeatureParams, FuserParams, GraphParams, NDTMapParams, SLAMParams,
    )
    from ndt_feature_graph_tpu.graph import links as links_mod
    from ndt_feature_graph_tpu.graph import node as node_mod
    from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
    from ndt_feature_graph_tpu.io import dataset
    from ndt_feature_graph_tpu.parallel import links_sharded

    params = SLAMParams(
        fuser=FuserParams(
            ndt=NDTMapParams(
                resolution=0.5, size_x=40.0, size_y=40.0,
                sensor_range=15.0, max_points_per_scan=512,
                max_cells=512,
            ),
            features=FeatureParams(num_beams=360, max_range=15.0),
        ),
        graph=GraphParams(new_node_transl_dist=3.0, max_nodes=16),
    )
    traj = dataset.loop_trajectory(36, radius=5.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(7), traj, num_beams=360, max_range=15.0
    )
    slam = NDTFeatureGraphSLAM(params, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    for t in range(1, 36):
        slam.update(seq.odom[t], seq.ranges[t], seq.hit[t])
    slam.finalize_current_node()

    stacked = node_mod.stack_nodes(slam.nodes)
    ref_i, mov_i, mask = slam.candidate_pairs()
    key = jax.random.PRNGKey(3)

    single = links_mod.compute_links_batch(
        params.fuser.features, 0.5, stacked, ref_i, mov_i, mask, key
    )
    mesh = mesh_mod.make_mesh(8)
    shard = links_sharded.compute_links_sharded(
        mesh, params.fuser.features, 0.5, stacked, ref_i, mov_i, mask, key
    )
    n = ref_i.shape[0]
    # Keys differ only if padding changed the split count — the sharded
    # variant splits the key over the padded count, so compare with the
    # same behavior: check structural agreement on validity + score
    # magnitudes rather than bitwise equality.
    np.testing.assert_array_equal(
        np.asarray(single.ref), np.asarray(shard.ref[:n])
    )
    agree = (
        np.asarray(single.mask) == np.asarray(shard.mask[:n])
    ).mean()
    assert agree > 0.9, agree


def test_sharded_schur_matches_dense():
    """The full distributed pipeline (edge-sharded assembly +
    block-sharded Schur elimination) equals the single-device dense
    solve."""
    require_devices(8)
    from ndt_feature_graph_tpu.graph import schur as schur_mod
    from ndt_feature_graph_tpu.parallel import schur_sharded

    mesh = mesh_mod.make_mesh(8)
    gt, init, edges = random_graph(jax.random.PRNGKey(5), n_nodes=48,
                                   n_loop=16)
    part = schur_mod.make_partition(48, edges, 8)
    ref, _ = opt.optimize(init, edges, iterations=15)
    out = schur_sharded.optimize_schur_sharded(
        mesh, init, edges, part, iterations=15
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gt),
                               atol=0.05)


def test_serve_fleet_grouped_matches_single_batch():
    """Group-serving (scaling.serve_fleet_grouped) is exactly the
    batched driver applied per group — outputs must match a whole-
    fleet run to f32 noise, including a padded final partial group."""
    from ndt_feature_graph_tpu.config import FuserParams, NDTMapParams
    from ndt_feature_graph_tpu.fusion import scan_driver
    from ndt_feature_graph_tpu.parallel import scaling

    params = FuserParams(
        ndt=NDTMapParams(
            resolution=0.5, size_x=24.0, size_y=24.0,
            sensor_range=10.0, max_points_per_scan=180,
            max_cells=256, ray_samples=16,
        ),
    )
    b = 5  # group_size=2 -> 2 full groups + 1 padded partial
    states, odom, pts, mask = scaling.build_fleet_inputs(
        params, b, t_steps=5, num_beams=180
    )
    whole = scan_driver.run_sequence_batch(
        params, states, odom, pts, mask
    )
    grouped = scaling.serve_fleet_grouped(
        params, states, odom, pts, mask, group_size=2
    )
    np.testing.assert_allclose(
        np.asarray(whole[1]), np.asarray(grouped[1]),
        rtol=0, atol=2e-3,
    )
    # The latency-bounded round-robin schedule is EXACTLY the grouped
    # path (the time-chunk boundary only splits the lax.scan; the
    # carried state is identical) — trajectories, scores, and final
    # states must match bit-for-bit.
    inter = scaling.serve_fleet_interleaved(
        params, states, odom, pts, mask, group_size=2, time_chunk=2
    )
    np.testing.assert_array_equal(
        np.asarray(grouped[1]), np.asarray(inter[1])
    )
    np.testing.assert_array_equal(
        np.asarray(grouped[2]), np.asarray(inter[2])
    )
    for a, g in zip(jax.tree.leaves(inter[0]),
                    jax.tree.leaves(grouped[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(g))
