"""HMT-backed fuser (fusion/hmt_driver.py): recalled ground is
REGISTERED AGAINST on revisit, through the real chunked SLAM driver —
the beHMT live-map contract (ndt_feature_fuser_hmt.h:5-16,
fuser_hmt.cpp:8-27), not just the raw HMTMap store mechanics
(test_hmt.py covers those bit-exactly)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import FeatureParams, FuserParams, NDTMapParams
from ndt_feature_graph_tpu.fusion import fuser, scan_driver
from ndt_feature_graph_tpu.fusion.hmt_driver import HMTFuser
from ndt_feature_graph_tpu.io import dataset

# Small op point: 20 m window (40 cells), 6 m sensor.  Margin 2 m and
# chunk 4 x 0.5 m steps satisfy the driver's slack bound
# (size/2 - range - margin = 2 >= chunk * step = 2).
PARAMS = FuserParams(
    ndt=NDTMapParams(
        resolution=0.5, size_x=20.0, size_y=20.0, sensor_range=6.0,
        max_points_per_scan=256, max_cells=256,
    ),
    features=FeatureParams(num_beams=180, max_range=6.0),
)
MARGIN = 2.0


def make_out_and_back(seed=0, x_end=21.0, step=0.5):
    """Corridor drive from -x_end to +x_end and back (the out leg is
    >= 2 window widths), in a long randomized corridor world."""
    n = int(round(2 * x_end / step)) + 1
    xs = np.linspace(-x_end, x_end, n)
    out = np.stack([xs, np.zeros(n), np.zeros(n)], -1)
    back = out[-2::-1].copy()  # reverse drive (theta stays 0)
    traj = jnp.asarray(
        np.concatenate([out, back]).astype(np.float32)
    )
    keep = np.stack(
        [np.asarray(traj[:, 0]), np.asarray(traj[:, 1])], -1
    )
    world = dataset.random_world(
        seed, half_x=x_end + 3.0, half_y=4.0, n_obstacles=16,
        keepout=keep, clearance=1.0,
    )
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(seed), traj, num_beams=180, max_range=6.0,
        segments=world, odom_noise=(0.004, 0.004, 0.002),
    )
    return seq


def test_hmt_driver_recalls_and_tracks():
    seq = make_out_and_back()
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    t_total = seq.gt.shape[0]
    # Stop the return leg at x = 0: ground near x = -8 is then inside
    # the recentred window but farther than the 6 m sensor range from
    # EVERY return-leg pose — valid cells there can only have been
    # RELOADED from the tile store (they were spilled once the out leg
    # passed x ~ +12).
    stop = int(np.argmin(np.abs(np.asarray(seq.gt[t_total // 2:, 0])))
               ) + t_total // 2

    hf = HMTFuser(
        PARAMS, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0],
        recenter_margin=MARGIN,
    )
    traj = hf.run_sequence(
        seq.odom[1:stop], pts_all[1:stop], mask_all[1:stop], chunk=4
    )

    # The out leg crossed ~4 window widths of ground: recentres
    # happened and evicted content went to the store, not the void.
    assert hf.n_recenters >= 8, hf.n_recenters
    assert hf.stored_cell_count() > 100, hf.stored_cell_count()

    # Recall: valid cells on the corridor WALLS around x = -8 (the
    # walls run at y = +-4, so that's where cell-bearing structure is)
    # exist in the live window.
    recalled = (
        hf.window_cells_near((-8.0, -4.0), 2.0)
        + hf.window_cells_near((-8.0, 4.0), 2.0)
    )
    assert recalled > 5, recalled

    # Control: the plain in-jit rolling map (drop semantics) has
    # nothing there — same course, same scans.
    drop_params = PARAMS.replace(rolling_map=True, roll_margin=MARGIN)
    st = fuser.initialize(
        drop_params, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )
    st, _traj2, _s = scan_driver.run_sequence(
        drop_params, st, seq.odom[1:stop], pts_all[1:stop],
        mask_all[1:stop],
    )
    from ndt_feature_graph_tpu.ops import ndt_map

    mean, _cov, valid = ndt_map.finalize(st.grid, drop_params.ndt)
    m = np.asarray(valid)
    mm = np.asarray(mean)[m]
    dropped_count = 0
    for probe in ((-8.0, -4.0), (-8.0, 4.0)):
        d = np.linalg.norm(mm - np.asarray(probe)[None, :], axis=-1)
        dropped_count += int((d <= 2.0).sum())
    assert dropped_count == 0, dropped_count

    # And the recalled ground is REGISTERED AGAINST: tracking through
    # the full out-and-back stays locked to ground truth.
    gt = np.asarray(seq.gt[1:stop])
    err = np.linalg.norm(traj[:, :2] - gt[:, :2], axis=-1)
    assert err[-1] < 0.3, err[-1]
    assert np.max(err) < 0.6, np.max(err)


def test_hmt_driver_save_load_roundtrip(tmp_path):
    seq = make_out_and_back(seed=3, x_end=12.0)
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    t = seq.gt.shape[0] // 2
    hf = HMTFuser(
        PARAMS, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0],
        recenter_margin=MARGIN,
    )
    hf.run_sequence(seq.odom[1:t], pts_all[1:t], mask_all[1:t], chunk=4)
    d = str(tmp_path / "hmt_map_dir")
    hf.save(d)

    hf2 = HMTFuser.load(d, PARAMS)
    assert hf2.stored_cell_count() == hf.stored_cell_count()
    np.testing.assert_allclose(
        np.asarray(hf2.state.Tnow), np.asarray(hf.state.Tnow)
    )
    np.testing.assert_array_equal(
        np.asarray(hf2.state.grid.count), np.asarray(hf.state.grid.count)
    )
    # Resumed driving works from the loaded state.
    hf2.run_sequence(
        seq.odom[t: t + 8], pts_all[t: t + 8], mask_all[t: t + 8],
        chunk=4,
    )
    assert np.isfinite(np.asarray(hf2.state.Tnow)).all()
