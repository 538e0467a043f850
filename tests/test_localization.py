"""Localization subsystem tests: distance field, scan-pose evaluator,
MCL tracking, place recognition (scenario shapes of flirtlib_ros's
localization_monitor + place_rec_test + NDTMCL wrapper)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams,
    FuserParams,
    MotionParams,
    NDTMapParams,
)
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.io import dataset
from ndt_feature_graph_tpu.localization import mcl, monitor, place_rec
from ndt_feature_graph_tpu.ops import d2d, distance_field, ndt_map

MAP = NDTMapParams(
    resolution=0.5, size_x=24.0, size_y=24.0, sensor_range=15.0,
    max_points_per_scan=512, max_cells=512,
)


def test_distance_field_exact_small():
    occ = jnp.zeros((16, 16), bool).at[8, 8].set(True)
    d = np.asarray(distance_field.distance_field(occ))
    assert d[8, 8] == 0.0
    np.testing.assert_allclose(d[8, 12], 4.0, atol=1e-5)
    np.testing.assert_allclose(d[5, 4], np.hypot(3, 4), atol=1e-5)


def test_distance_field_multiple_seeds():
    occ = jnp.zeros((32, 32), bool).at[4, 4].set(True).at[28, 28].set(True)
    d = np.asarray(distance_field.distance_field(occ))
    # Brute-force reference.
    ys, xs = np.mgrid[0:32, 0:32]
    ref = np.minimum(
        np.hypot(ys - 4, xs - 4), np.hypot(ys - 28, xs - 28)
    )
    np.testing.assert_allclose(d, ref, atol=1e-4)


def _build_world_grid():
    """NDT map of the default world seen from the centre-ish."""
    segs = dataset.default_world()
    # Scans from several poses fused into one grid (GT poses).
    grid = ndt_map.empty_grid(MAP, jnp.zeros(2))
    for pose in [
        (0.0, -4.5, 0.0), (2.0, -4.5, 1.0), (-2.0, -4.0, 2.0),
        (0.0, 0.0, 0.5),
    ]:
        p = jnp.asarray(pose, jnp.float32)
        rng, hit = dataset.raycast(segs, p, 360, 15.0)
        pts, mask = dataset.scan_to_points(rng, hit)
        world = se2.transform_points(p, pts)
        grid = ndt_map.add_points(grid, MAP, world, mask)
        grid = ndt_map.update_occupancy(grid, MAP, p[:2], world, mask)
    return grid


def test_scan_pose_evaluator():
    grid = _build_world_grid()
    dmap = monitor.build_distance_map(
        grid.occ, grid.origin, MAP.resolution
    )
    segs = dataset.default_world()
    true_pose = jnp.array([0.5, -4.0, 0.3])
    rng, hit = dataset.raycast(segs, true_pose, 360, 15.0)
    pts, mask = dataset.scan_to_points(rng, hit)

    good = float(monitor.badness(dmap, true_pose, pts, mask))
    bad_pose = true_pose + jnp.array([1.5, 1.0, 0.4])
    bad = float(monitor.badness(dmap, bad_pose, pts, mask))
    assert good < 0.3, good
    assert bad > good * 2, (good, bad)

    # adjust_pose recovers from a moderate offset.
    off_pose = true_pose + jnp.array([0.2, -0.15, 0.05])
    adj, score = monitor.adjust_pose(dmap, off_pose, pts, mask)
    assert float(score) <= float(
        monitor.badness(dmap, off_pose, pts, mask)
    ) + 1e-6


def test_mcl_tracks_and_localizes():
    grid = _build_world_grid()
    tgt = d2d.make_dense_target(grid, MAP)
    segs = dataset.default_world()

    traj = dataset.corridor_trajectory(20, x0=-3.0, x1=2.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=360, max_range=15.0
    )

    loc = mcl.MCL(MAP, MotionParams(), tgt, n_particles=512, seed=1)
    loc.initialize(seq.gt[0], spread_xy=0.5, spread_theta=0.2)
    errs = []
    for t in range(1, traj.shape[0]):
        pts, mask = dataset.scan_to_points(seq.ranges[t], seq.hit[t])
        est = loc.step(seq.odom[t], pts, mask)
        errs.append(
            float(jnp.linalg.norm(est[:2] - seq.gt[t][:2]))
        )
    # Converged tracking by the second half.
    assert np.mean(errs[10:]) < 0.3, errs


def test_place_recognition_roundtrip():
    fp = FeatureParams(num_beams=360, max_range=15.0)
    segs = dataset.default_world()
    db = place_rec.empty_database(fp, capacity=8)

    stored_poses = [
        (0.0, -4.5, 0.0), (5.0, -4.5, 1.5), (-6.0, 0.0, 2.0),
        (5.0, 5.0, -2.0),
    ]
    for p in stored_poses:
        pj = jnp.asarray(p, jnp.float32)
        rng, hit = dataset.raycast(segs, pj, 360, 15.0)
        db = place_rec.insert_scan(db, fp, pj, rng, hit)
    assert int(jnp.sum(db.mask)) == 4

    # Novelty gate: re-inserting a nearby pose is a no-op.
    db2 = place_rec.insert_scan(
        db, fp, jnp.array([0.1, -4.4, 0.2]), rng, hit
    )
    assert int(jnp.sum(db2.mask)) == 4

    # Relocalize a kidnapped robot near stored pose 1.
    query = jnp.array([5.3, -4.3, 1.7])
    rng, hit = dataset.raycast(segs, query, 360, 15.0)
    pose, best, n = place_rec.relocalize(
        db, fp, rng, hit, jax.random.PRNGKey(2), min_num_matches=5
    )
    assert pose is not None, n
    np.testing.assert_allclose(pose[:2], np.asarray(query)[:2], atol=0.5)
    assert abs(se2.normalize_angle(pose[2] - float(query[2]))) < 0.25


def test_scan_database_persists(tmp_path):
    """The RefScan DB survives a save/load (process restart) and still
    recovers a kidnapped robot — mongo-collection parity
    (localization_monitor_node.cpp:69-547: the scan map outlives the
    node; generate_scan_map.cpp writes it once, the monitor reloads)."""
    fp = FeatureParams(num_beams=360, max_range=15.0)
    segs = dataset.default_world()
    db = place_rec.empty_database(fp, capacity=8)
    for p in [(0.0, -4.5, 0.0), (5.0, -4.5, 1.5), (-6.0, 0.0, 2.0)]:
        pj = jnp.asarray(p, jnp.float32)
        rng, hit = dataset.raycast(segs, pj, 360, 15.0)
        db = place_rec.insert_scan(db, fp, pj, rng, hit)

    path = tmp_path / "scan_db.npz"
    place_rec.save_database(path, db)
    db2 = place_rec.load_database(path, fp)

    # Bit-exact round trip of every leaf.
    for a, b in zip(jax.tree.leaves(db), jax.tree.leaves(db2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Kidnapped recovery across the restart boundary.
    query = jnp.array([5.3, -4.3, 1.7])
    rng, hit = dataset.raycast(segs, query, 360, 15.0)
    pose, _best, n = place_rec.relocalize(
        db2, fp, rng, hit, jax.random.PRNGKey(2), min_num_matches=5
    )
    assert pose is not None, n
    np.testing.assert_allclose(pose[:2], np.asarray(query)[:2], atol=0.5)

    # The reloaded DB keeps accepting novel scans (ring state intact).
    far = jnp.asarray([5.0, 5.0, -2.0], jnp.float32)
    rng, hit = dataset.raycast(segs, far, 360, 15.0)
    db3 = place_rec.insert_scan(db2, fp, far, rng, hit)
    assert int(jnp.sum(db3.mask)) == 4
