"""Joint NDT+feature+odometry fusion tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import FeatureParams, FuserParams, NDTMapParams
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.fusion import feature_fuser
from ndt_feature_graph_tpu.io import dataset

PARAMS = FuserParams(
    ndt=NDTMapParams(
        resolution=0.5,
        size_x=40.0,
        size_y=40.0,
        sensor_range=15.0,
        max_points_per_scan=512,
        max_cells=512,
    ),
    features=FeatureParams(num_beams=360, max_range=15.0),
)


def run(seq, params=PARAMS):
    state = feature_fuser.initialize(
        params, seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0],
        jax.random.PRNGKey(0),
    )
    est = [np.asarray(state.base.Tnow)]
    n_feat_updates = 0
    for t in range(1, seq.gt.shape[0]):
        state, info, res = feature_fuser.update(
            state, params, seq.odom[t], seq.ranges[t], seq.hit[t]
        )
        est.append(np.asarray(state.base.Tnow))
        n_feat_updates += int(res.valid)
    return np.stack(est), n_feat_updates


def ate(est, gt):
    return float(np.sqrt(np.mean(np.sum((est[:, :2] - gt[:, :2]) ** 2, -1))))


def test_feature_fusion_tracks_and_matches():
    traj = dataset.corridor_trajectory(25, x0=-6.0, x1=0.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(10), traj, num_beams=360, max_range=15.0
    )
    est, n_feat = run(seq)
    gt = np.asarray(seq.gt)
    assert ate(est, gt) < 0.15
    # Features must actually contribute on most frames (structured room).
    assert n_feat >= 10, n_feat


def test_feature_fusion_with_feature_only_matcher():
    """Disable the NDT term: features + odometry prior must still track
    (matchFusion useNDT=false mode, ndt_fusion_test flags)."""
    params = PARAMS.replace(
        matcher=PARAMS.matcher.replace(use_ndt=False)
    )
    traj = dataset.corridor_trajectory(20, x0=-6.0, x1=-1.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(11), traj, num_beams=360, max_range=15.0
    )
    est, n_feat = run(seq, params)
    gt = np.asarray(seq.gt)
    assert n_feat >= 8
    # Looser bound: feature-only relies on sparse correspondences.
    assert ate(est, gt) < 0.3


def test_gate_blocks_bogus_feature_transform():
    """If RANSAC hallucinates a transform inconsistent with odometry the
    gate must keep pairs out of the cost (fuser_hmt.cpp:268-289)."""
    traj = dataset.corridor_trajectory(4, x0=-6.0, x1=-5.4, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(12), traj, num_beams=360, max_range=15.0
    )
    state = feature_fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0],
        jax.random.PRNGKey(0),
    )
    # Claim a wildly wrong odometry: the features (which see the truth)
    # now disagree with odometry by >> gate; fusion must fall back near
    # odometry rather than jump.
    bogus = jnp.array([2.0, 0.0, 0.0])
    state2, info, res = feature_fuser.update(
        state, PARAMS, bogus, seq.ranges[1], seq.hit[1]
    )
    moved = np.asarray(se2.sub(state.base.Tnow, state2.base.Tnow))
    # The consistency gate blocked features; NDT may still pull back
    # toward truth a bit, but the result stays finite and bounded.
    assert np.isfinite(moved).all()
    assert np.linalg.norm(moved[:2]) < 3.0
