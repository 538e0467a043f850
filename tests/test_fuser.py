"""End-to-end scan-to-submap odometry tests on a simulated world
(the "minimum end-to-end slice", SURVEY.md §7.4; replay-style eval as
the reference's gt/est TUM machinery, publish_graph_message.cpp:881)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import FuserParams, NDTMapParams
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.fusion import fuser
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
)


def run_sequence(seq, params=PARAMS, num_beams=360):
    pts0, mask0 = dataset.scan_to_points(seq.ranges[0], seq.hit[0])
    state = fuser.initialize(
        params, seq.gt[0], jnp.zeros(3), pts0, mask0
    )
    est = [np.asarray(state.Tnow)]
    infos = []
    for t in range(1, seq.gt.shape[0]):
        pts, mask = dataset.scan_to_points(seq.ranges[t], seq.hit[t])
        state, info = fuser.update(
            state, params, seq.odom[t], pts, mask
        )
        est.append(np.asarray(state.Tnow))
        infos.append(info)
    return np.stack(est), state, infos


def ate(est, gt):
    return float(np.sqrt(np.mean(np.sum((est[:, :2] - gt[:, :2]) ** 2, -1))))


def test_fuser_tracks_short_corridor():
    traj = dataset.corridor_trajectory(25, x0=-6.0, x1=0.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=360, max_range=15.0
    )
    est, state, infos = run_sequence(seq)
    gt = np.asarray(seq.gt)

    err = ate(est, gt)
    # Dead-reckoning error for comparison.
    odo = [gt[0]]
    for t in range(1, len(gt)):
        odo.append(np.asarray(se2.compose(jnp.asarray(odo[-1]),
                                          seq.odom[t])))
    odo = np.stack(odo)
    odo_err = ate(odo, gt)

    assert err < 0.15, (err, odo_err)
    assert err <= odo_err + 0.02, (err, odo_err)


def test_fuser_beats_odometry_with_bias():
    """With biased odometry the fuser must do clearly better than
    dead reckoning."""
    traj = dataset.corridor_trajectory(30, x0=-6.0, x1=2.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(1), traj, num_beams=360, max_range=15.0
    )
    # Inject systematic odometry bias (scale error + drift).
    biased = seq._replace(
        odom=seq.odom * 1.08 + jnp.array([0.0, 0.002, 0.002])
    )
    est, state, infos = run_sequence(biased)
    gt = np.asarray(seq.gt)

    odo = [gt[0]]
    for t in range(1, len(gt)):
        odo.append(
            np.asarray(se2.compose(jnp.asarray(odo[-1]), biased.odom[t]))
        )
    odo = np.stack(odo)

    assert ate(est, gt) < 0.2
    assert ate(est, gt) < 0.5 * ate(odo, gt)


def test_consistency_gate_falls_back_to_odometry():
    """A garbage scan (all empty) must not produce a wild pose jump."""
    traj = dataset.corridor_trajectory(5, x0=-6.0, x1=-5.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(2), traj, num_beams=360, max_range=15.0
    )
    pts0, mask0 = dataset.scan_to_points(seq.ranges[0], seq.hit[0])
    state = fuser.initialize(PARAMS, seq.gt[0], jnp.zeros(3), pts0, mask0)

    pts, _ = dataset.scan_to_points(seq.ranges[1], seq.hit[1])
    empty = jnp.zeros_like(seq.hit[1])
    state2, info = fuser.update(state, PARAMS, seq.odom[1], pts, empty)
    # With no cells the estimate equals odometry propagation.
    expect = np.asarray(se2.compose(state.Tnow, seq.odom[1]))
    np.testing.assert_allclose(np.asarray(state2.Tnow), expect, atol=5e-2)


def test_update_is_jitted_once():
    """Repeated updates must not retrace (static shapes everywhere)."""
    traj = dataset.corridor_trajectory(6, x0=-6.0, x1=-4.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(3), traj, num_beams=360, max_range=15.0
    )
    pts0, mask0 = dataset.scan_to_points(seq.ranges[0], seq.hit[0])
    state = fuser.initialize(PARAMS, seq.gt[0], jnp.zeros(3), pts0, mask0)
    for t in range(1, 6):
        pts, mask = dataset.scan_to_points(seq.ranges[t], seq.hit[t])
        state, _ = fuser.update(state, PARAMS, seq.odom[t], pts, mask)
    count = fuser.update._cache_size()
    assert count == 1, count


def test_rolling_map_tracks_beyond_window():
    """Rolling-map mode (NDTMapHMT window follow): a grid window much
    smaller than the traverse keeps tracking because it recentres onto
    the vehicle on device; the same window WITHOUT rolling loses the
    map once the vehicle leaves it."""
    small = FuserParams(
        ndt=NDTMapParams(
            resolution=0.5,
            size_x=16.0,
            size_y=16.0,
            sensor_range=8.0,
            max_points_per_scan=512,
            max_cells=512,
        ),
        rolling_map=True,
        roll_margin=3.0,
    )
    traj = dataset.corridor_trajectory(50, x0=-12.0, x1=12.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(2),
        traj,
        num_beams=360,
        max_range=8.0,
        segments=dataset.warehouse_world(),
    )
    est, state, infos = run_sequence(seq, params=small)
    gt = np.asarray(seq.gt)
    err = ate(est, gt)
    assert err < 0.25, err
    # The window actually moved (origin follows the vehicle).
    origin = np.asarray(state.grid.origin)
    assert origin[0] > 0.0, origin
    # Map stayed populated after recentres.
    assert float(jnp.sum(state.grid.count)) > 100.0

    # Control: same tiny window, fixed in the world -> the vehicle
    # exits it and tracking (fallback odometry) degrades.
    fixed = small.replace(rolling_map=False)
    est2, state2, _ = run_sequence(seq, params=fixed)
    err2 = ate(est2, gt)
    assert err2 > err, (err, err2)


def test_match_cell_budget_exact_when_cells_fit():
    """match_cell_budget >= the scan's valid-cell count must be EXACT:
    identical pose, score, and map to the unbudgeted matcher (the
    compacted CellList puts valid cells first; the budget only strips
    masked padding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ndt_feature_graph_tpu.io import dataset

    params = PARAMS
    traj = dataset.loop_trajectory(6, radius=4.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(11), traj, num_beams=360,
        max_range=params.ndt.sensor_range,
    )
    pts0, m0 = dataset.scan_to_points(seq.ranges[0], seq.hit[0])
    counts = []
    for t in range(1, 6):
        pts, m = dataset.scan_to_points(seq.ranges[t], seq.hit[t])
        src, _ = fuser._build_local_cells(params, jnp.zeros(3), pts, m)
        counts.append(int(jnp.sum(src.mask)))
    budget = 64 * ((max(counts) + 63) // 64)
    assert budget < params.ndt.max_cells, "scene too dense for the test"

    pb = params.replace(match_cell_budget=budget)
    s_full = fuser.initialize(params, seq.gt[0], jnp.zeros(3), pts0, m0)
    s_bud = fuser.initialize(pb, seq.gt[0], jnp.zeros(3), pts0, m0)
    for t in range(1, 6):
        pts, m = dataset.scan_to_points(seq.ranges[t], seq.hit[t])
        s_full, i_full = fuser.update(s_full, params, seq.odom[t], pts, m)
        s_bud, i_bud = fuser.update(s_bud, pb, seq.odom[t], pts, m)
        np.testing.assert_array_equal(
            np.asarray(s_full.Tnow), np.asarray(s_bud.Tnow)
        )
        np.testing.assert_array_equal(
            np.asarray(i_full.score), np.asarray(i_bud.score)
        )
    np.testing.assert_array_equal(
        np.asarray(s_full.grid.count), np.asarray(s_bud.grid.count)
    )


def test_incremental_packed_matches_full_refinalize():
    """FuserState.packed is maintained incrementally (only touched
    cells re-finalized per scan, d2d.refresh_packed) and must match
    the full-grid re-finalize it replaced (d2d.packed_from_grid) to
    f32 ulp tolerance (separately-compiled programs fuse the eig
    reconstruction differently), including across rolling-map recentres
    (recenter_with_aux rolls rows in lockstep; exposed rows get the
    empty-cell pack)."""
    from ndt_feature_graph_tpu.ops import d2d

    small = PARAMS.replace(
        ndt=PARAMS.ndt.replace(size_x=16.0, size_y=16.0),
        rolling_map=True,
        roll_margin=2.0,
    )
    traj = dataset.corridor_trajectory(12, x0=-6.0, x1=4.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(3), traj, num_beams=360, max_range=15.0
    )
    pts0, m0 = dataset.scan_to_points(seq.ranges[0], seq.hit[0])
    state = fuser.initialize(small, seq.gt[0], jnp.zeros(3), pts0, m0)
    np.testing.assert_allclose(
        np.asarray(state.packed),
        np.asarray(d2d.packed_from_grid(state.grid, small.ndt)),
        rtol=0, atol=1e-4,
    )
    rolled = False
    for t in range(1, seq.gt.shape[0]):
        pts, m = dataset.scan_to_points(seq.ranges[t], seq.hit[t])
        prev_origin = np.asarray(state.grid.origin)
        state, _ = fuser.update(state, small, seq.odom[t], pts, m)
        rolled = rolled or (
            np.any(np.asarray(state.grid.origin) != prev_origin)
        )
        np.testing.assert_allclose(
            np.asarray(state.packed),
            np.asarray(d2d.packed_from_grid(state.grid, small.ndt)),
            rtol=0, atol=1e-4,
        )
    assert rolled, "trajectory never triggered a recentre"
