"""Serialization round-trips + CLI smoke (the reference's boost-archive
round-trip test shape, serialization_test.cpp:60-211, plus driver
coverage)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu import cli
from ndt_feature_graph_tpu.config import (
    FeatureParams, FuserParams, GraphParams, NDTMapParams, SLAMParams,
)
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset, serialize


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "nested": {
            "b": jnp.asarray([True, False]),
            "c": jnp.int32(7),
        },
    }
    p = tmp_path / "t.npz"
    serialize.save_pytree(p, tree)
    template = jax.tree.map(jnp.zeros_like, tree)
    back = serialize.load_pytree(p, template)
    for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_graph_checkpoint_roundtrip(tmp_path):
    params = SLAMParams(
        fuser=FuserParams(
            ndt=NDTMapParams(
                resolution=0.5, size_x=40.0, size_y=40.0,
                sensor_range=15.0, max_points_per_scan=512, max_cells=512,
            ),
            features=FeatureParams(num_beams=360, max_range=15.0),
        ),
        graph=GraphParams(new_node_transl_dist=2.0, max_nodes=16),
    )
    traj = dataset.corridor_trajectory(40, x0=-7.0, x1=3.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=360, max_range=15.0
    )
    slam = NDTFeatureGraphSLAM(params, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    for t in range(1, 40):
        slam.update(seq.odom[t], seq.ranges[t], seq.hit[t], t=float(t))
    slam.finalize_current_node()

    p = tmp_path / "graph.npz"
    slam.save(p)
    loaded = NDTFeatureGraphSLAM.load(p, params)
    assert len(loaded.nodes) == len(slam.nodes)
    assert len(loaded.odom_edges) == len(slam.odom_edges)
    np.testing.assert_allclose(
        np.stack(loaded.node_T), np.stack(slam.node_T), atol=1e-6
    )
    for a, b in zip(slam.nodes, loaded.nodes):
        np.testing.assert_allclose(
            np.asarray(a.occ), np.asarray(b.occ), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(a.desc), np.asarray(b.desc), atol=1e-6
        )
    # The loaded graph can run the offline phase.
    out = loaded.optimize_offline()
    assert np.isfinite(np.asarray(out)).all()


def test_cli_simulate_eval(tmp_path):
    seqf = str(tmp_path / "seq.npz")
    cli.main([
        "simulate", "--out", seqf, "--trajectory", "corridor",
        "--steps", "12", "--seed", "1",
    ])
    assert os.path.exists(seqf)
    seq = dataset.load_sequence(seqf)
    assert seq.ranges.shape[0] == 12

    # eval on identical files -> zero ATE.
    from ndt_feature_graph_tpu.io import tum

    est = np.asarray(seq.gt)
    tum.write_tum(tmp_path / "a.tum", range(12), est)
    cli.main([
        "eval", "--est", str(tmp_path / "a.tum"),
        "--gt", str(tmp_path / "a.tum"),
    ])


def test_cli_fuse_hmt_dir_and_resume(tmp_path):
    """cli fuse --hmt-dir: the NDTFuserHMT odometry node with the
    disk-backed HMT live map — runs, persists the tile store, and
    resumes from it."""
    seqf = str(tmp_path / "seq.npz")
    cli.main([
        "simulate", "--out", seqf, "--trajectory", "corridor",
        "--steps", "24", "--num-beams", "180", "--sensor-range", "6",
        "--seed", "2",
    ])
    out = str(tmp_path / "out")
    hmt = str(tmp_path / "hmt")
    args = [
        "fuse", "--dataset", seqf, "--out", out, "--hmt-dir", hmt,
        "--map-size", "20", "--sensor-range", "6",
        "--num-beams", "180", "--recenter-margin", "2",
        "--chunk", "4",
    ]
    cli.main(args)
    assert os.path.exists(os.path.join(hmt, "hmt.json"))
    assert os.path.exists(os.path.join(out, "est.tum"))
    # Resume from the persisted store.
    cli.main(args + ["--resume"])
