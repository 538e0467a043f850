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


def test_batch_driver_occ_cadence_never_touches_poses():
    """config.occ_every gates only the occupancy ray scatter in the
    batch drivers: trajectories and scores are bit-identical at any
    cadence (occupancy never feeds registration), and occ_every=0
    leaves log-odds at the initialize()-only content."""
    seq = make_seq(8)
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    state0 = fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )
    b = 2
    states = jax.tree.map(lambda x: jnp.stack([x] * b), state0)
    odom = jnp.stack([seq.odom[1:]] * b)
    pts = jnp.stack([pts_all[1:]] * b)
    mask = jnp.stack([mask_all[1:]] * b)
    f0, t0, s0 = scan_driver.run_sequence_batch(
        PARAMS, states, odom, pts, mask
    )
    f4, t4, s4 = scan_driver.run_sequence_batch(
        PARAMS.replace(occ_every=4), states, odom, pts, mask
    )
    np.testing.assert_array_equal(np.asarray(t4), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(s4), np.asarray(s0))
    assert float(jnp.abs(f4.grid.occ - f0.grid.occ).max()) > 0.0
    fz, tz, _sz = scan_driver.run_sequence_batch(
        PARAMS.replace(occ_every=0), states, odom, pts, mask
    )
    np.testing.assert_array_equal(np.asarray(tz), np.asarray(t0))
    np.testing.assert_array_equal(
        np.asarray(fz.grid.occ[0]), np.asarray(state0.grid.occ)
    )


def test_features_batch_driver_matches_single_stream():
    """The FULL-pipeline fleet step (feature_fuser.update_batch via
    run_sequence_features_batch: vmapped detect/describe/RANSAC +
    flat-bank joint Newton with the paired feature term) must
    reproduce the single-stream feature driver per stream on DISTINCT
    streams."""
    seq = make_seq(8)
    state0 = feature_fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0],
        jax.random.PRNGKey(1),
    )
    b = 3
    states = jax.tree.map(lambda x: jnp.stack([x] * b), state0)
    jitter = 1e-3 * jnp.arange(b)[:, None, None]
    odom = jnp.stack([seq.odom[1:]] * b) + jitter
    ranges = jnp.stack([seq.ranges[1:]] * b)
    hit = jnp.stack([seq.hit[1:]] * b)
    finals, trajs, scores = scan_driver.run_sequence_features_batch(
        PARAMS, states, odom, ranges, hit
    )
    for i in range(b):
        _f, traj_i, scores_i = scan_driver.run_sequence_features(
            PARAMS, state0, odom[i], seq.ranges[1:], seq.hit[1:]
        )
        np.testing.assert_allclose(
            np.asarray(trajs[i]), np.asarray(traj_i),
            rtol=0, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(scores[i]), np.asarray(scores_i),
            rtol=3e-2, atol=1e-2,
        )


def test_batch_driver_windowed_bank_exact_and_bf16_close():
    """The sensor-window-bounded gather bank (gather_window_cells)
    must be BIT-EXACT vs the full-grid wide table whenever the window
    covers every source cell's neighbourhood (same rows gathered, same
    masks); the bf16 cell-relative variant must agree to the bf16
    quantization level (~mm poses at 0.5 m resolution)."""
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

    _f0, t0, s0 = scan_driver.run_sequence_batch(
        PARAMS, states, odom, pts, mask
    )
    # 72 cells covers 2*(sensor_range/res + n + slack) = 68 at this
    # op point (15 m / 0.5 m, n=2, slack 2).
    pw = PARAMS.replace(gather_window_cells=72)
    _f1, t1, s1 = scan_driver.run_sequence_batch(
        pw, states, odom, pts, mask
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))

    pb = pw.replace(gather_table_bf16=True)
    _f2, t2, s2 = scan_driver.run_sequence_batch(
        pb, states, odom, pts, mask
    )
    np.testing.assert_allclose(
        np.asarray(t2), np.asarray(t0), rtol=0, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(s0), rtol=3e-2, atol=1e-2
    )

    # Win-block variant (one gathered row per source cell): f32 is
    # bit-exact; bf16 agrees at the quantization level.
    pblk = pw.replace(gather_block=True)
    _f3, t3, s3 = scan_driver.run_sequence_batch(
        pblk, states, odom, pts, mask
    )
    np.testing.assert_array_equal(np.asarray(t3), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(s3), np.asarray(s0))
    pblk16 = pblk.replace(gather_table_bf16=True)
    _f4, t4, s4 = scan_driver.run_sequence_batch(
        pblk16, states, odom, pts, mask
    )
    np.testing.assert_allclose(
        np.asarray(t4), np.asarray(t0), rtol=0, atol=2e-3
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
