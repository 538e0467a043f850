"""Full graph-SLAM integration: online node chaining + offline
loop-closure optimization on a simulated loop (the configs[3] target of
BASELINE.md: odometry edges + loop closures + pose-graph solve)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_feature_graph_tpu.config import (
    FeatureParams,
    FuserParams,
    GraphParams,
    NDTMapParams,
    SLAMParams,
)
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset, tum

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
    graph=GraphParams(new_node_transl_dist=3.0, max_nodes=24),
)


def build_graph(seq, params=PARAMS):
    """Run the online graph; also record the GT pose at each node
    creation so node estimates can be scored against truth."""
    slam = NDTFeatureGraphSLAM(params, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    gt_nodes = [np.asarray(seq.gt[0])]
    n_nodes = 0
    for t in range(1, seq.gt.shape[0]):
        slam.update(seq.odom[t], seq.ranges[t], seq.hit[t], t=float(t))
        if len(slam.nodes) != n_nodes:       # split happened at step t
            n_nodes = len(slam.nodes)
            gt_nodes.append(np.asarray(seq.gt[t]))
    slam.finalize_current_node()
    slam.gt_nodes = np.stack(gt_nodes[: len(slam.nodes)])
    return slam


@pytest.fixture(scope="module")
def loop_slam():
    traj = dataset.loop_trajectory(100, radius=5.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(42), traj, num_beams=360, max_range=15.0,
        odom_noise=(0.02, 0.02, 0.008),
    )
    return build_graph(seq), seq


def test_online_graph_builds_nodes(loop_slam):
    slam, seq = loop_slam
    assert len(slam.nodes) >= 5
    assert len(slam.odom_edges) >= len(slam.nodes) - 1
    est = np.stack(slam.trajectory)
    gt = np.asarray(seq.gt)
    err = tum.ate_rmse(est, gt)
    assert err < 0.5, err


def test_offline_optimization_improves_node_poses(loop_slam):
    slam, seq = loop_slam
    node_T_before = np.stack(slam.node_T)
    out = np.asarray(slam.optimize_offline(verbose=True))
    assert np.isfinite(out).all()
    # Node origins stay near their (already decent) estimates but the
    # graph must remain consistent: odometry edges approximately
    # satisfied.
    for (i, j, rel, cov) in slam.odom_edges:
        if j >= len(out):
            continue
        from ndt_feature_graph_tpu.core import se2

        pred = np.asarray(
            se2.sub(jnp.asarray(out[i]), jnp.asarray(out[j]))
        )
        assert np.linalg.norm(pred[:2] - rel[:2]) < 0.5


def test_tum_roundtrip(tmp_path, loop_slam):
    slam, seq = loop_slam
    est = np.stack(slam.trajectory)
    path = tmp_path / "est.txt"
    tum.write_tum(path, slam.times, est)
    t, poses = tum.read_tum(path)
    np.testing.assert_allclose(poses[:, :2], est[:, :2], atol=1e-5)
    np.testing.assert_allclose(
        np.unwrap(poses[:, 2]), np.unwrap(est[:, 2].astype(np.float64)),
        atol=1e-5,
    )


def test_graph_slam_with_drifty_odometry_loop_closure():
    """The headline scenario: strong odometry drift around a loop; the
    offline stage must pull the loop back together."""
    traj = dataset.loop_trajectory(100, radius=5.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(43), traj, num_beams=360, max_range=15.0,
        odom_noise=(0.004, 0.004, 0.002),
    )
    # Make the *fuser* blind: shrink sensor range so NDT matching sees
    # little structure and odometry bias dominates... simpler: inject a
    # rotation bias into the odometry stream and force odometry as the
    # estimate so drift accumulates in node poses.
    params = PARAMS.replace(
        fuser=PARAMS.fuser.replace(force_odom_as_est=True),
        graph=PARAMS.graph.replace(
            new_node_transl_dist=3.0,
            valid_max_dist=3.0,
            valid_max_angular_dist=0.6,
            valid_max_score=0.2,
        ),
    )
    biased = seq._replace(
        odom=seq.odom + jnp.array([0.0, 0.0, 0.0035])
    )
    slam = build_graph(biased, params)
    node_T_before = np.stack(slam.node_T)
    gt_nodes = slam.gt_nodes

    out = np.asarray(slam.optimize_offline(verbose=True))
    assert np.isfinite(out).all()
    err_before = tum.ate_rmse(node_T_before, gt_nodes)
    err_after = tum.ate_rmse(out, gt_nodes)
    print("node ATE before/after optimization:", err_before, err_after)
    # Loop closures must reduce the drifted node-pose error materially
    # AND land under an absolute bound: measured 0.865 -> 0.151 m, so
    # 0.25 m (half the NDT cell size) leaves real margin while still
    # failing if the closures stop pulling the loop together.
    assert err_after < 0.25, (err_before, err_after)
    assert err_after < err_before * 0.5, (err_before, err_after)
