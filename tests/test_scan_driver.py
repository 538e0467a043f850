"""Device-resident sequence drivers match the step-by-step host loop."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import FeatureParams, FuserParams, NDTMapParams
from ndt_feature_graph_tpu.fusion import feature_fuser, fuser, scan_driver
from ndt_feature_graph_tpu.io import dataset

PARAMS = FuserParams(
    ndt=NDTMapParams(
        resolution=0.5, size_x=40.0, size_y=40.0, sensor_range=15.0,
        max_points_per_scan=512, max_cells=512,
    ),
    features=FeatureParams(num_beams=360, max_range=15.0),
)


def make_seq(t=10):
    traj = dataset.corridor_trajectory(t, x0=-6.0, x1=-3.0, y=-4.5)
    return dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=360, max_range=15.0
    )


def test_scan_driver_matches_host_loop():
    seq = make_seq()
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    state0 = fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )
    final, traj, scores = scan_driver.run_sequence(
        PARAMS, state0, seq.odom[1:], pts_all[1:], mask_all[1:]
    )

    st = state0
    host = []
    for t in range(1, seq.gt.shape[0]):
        st, info = fuser.update(
            st, PARAMS, seq.odom[t], pts_all[t], mask_all[t]
        )
        host.append(np.asarray(st.Tnow))
    np.testing.assert_allclose(
        np.asarray(traj), np.stack(host), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(final.Tnow), host[-1], atol=1e-5
    )


def test_feature_scan_driver_runs_and_tracks():
    seq = make_seq(15)
    state0 = feature_fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0],
        jax.random.PRNGKey(1),
    )
    final, traj, scores = scan_driver.run_sequence_features(
        PARAMS, state0, seq.odom[1:], seq.ranges[1:], seq.hit[1:]
    )
    est = np.asarray(traj)
    gt = np.asarray(seq.gt[1:])
    err = np.sqrt(np.mean(np.sum((est[:, :2] - gt[:, :2]) ** 2, -1)))
    assert err < 0.15, err


def test_batch_driver_shapes():
    seq = make_seq(6)
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    state0 = fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )
    b = 3
    states = jax.tree.map(lambda x: jnp.stack([x] * b), state0)
    odom = jnp.stack([seq.odom[1:]] * b)
    pts = jnp.stack([pts_all[1:]] * b)
    mask = jnp.stack([mask_all[1:]] * b)
    finals, trajs, scores = scan_driver.run_sequence_batch(
        PARAMS, states, odom, pts, mask
    )
    assert trajs.shape == (b, 5, 3)
    # All streams identical input -> identical output.
    np.testing.assert_allclose(
        np.asarray(trajs[0]), np.asarray(trajs[1]), atol=1e-6
    )


def test_batch_driver_matches_single_stream():
    """The flat-bank batched fleet step (fuser.update_batch via
    run_sequence_batch) must reproduce the single-stream driver per
    stream — same registration, gate, and map update — on DISTINCT
    streams (per-stream odometry jitter)."""
    seq = make_seq(8)
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    state0 = fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )
    b = 3
    states = jax.tree.map(lambda x: jnp.stack([x] * b), state0)
    jitter = 1e-3 * jnp.arange(b)[:, None, None]
    odom = jnp.stack([seq.odom[1:]] * b) + jitter
    pts = jnp.stack([pts_all[1:]] * b)
    mask = jnp.stack([mask_all[1:]] * b)
    finals, trajs, scores = scan_driver.run_sequence_batch(
        PARAMS, states, odom, pts, mask
    )
    for i in range(b):
        _f, traj_i, scores_i = scan_driver.run_sequence(
            PARAMS, state0, odom[i], pts_all[1:], mask_all[1:]
        )
        # Cross-executable f32 noise (reduction order, fused eig)
        # perturbs LM trial acceptance, and differences compound over
        # the sequential map updates — poses stay sub-mm, scores can
        # drift ~1% by the end of the sequence.
        np.testing.assert_allclose(
            np.asarray(trajs[i]), np.asarray(traj_i),
            rtol=0, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(scores[i]), np.asarray(scores_i),
            rtol=3e-2, atol=1e-2,
        )
