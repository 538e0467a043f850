"""Utility-layer tests: occupancy export, pairwise tools, extrinsic
calibration, P2D registration, logging, timers."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams, MatcherParams, NDTMapParams,
)
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.io import dataset
from ndt_feature_graph_tpu.ops import d2d, ndt_map
from ndt_feature_graph_tpu.utils import occupancy, pairwise
from ndt_feature_graph_tpu.utils.logging_ext import desc_string
from ndt_feature_graph_tpu.utils.timers import StageTimers

MAP = NDTMapParams(
    resolution=0.5, size_x=30.0, size_y=30.0, sensor_range=15.0,
    max_points_per_scan=512, max_cells=512,
)


def world_scan(pose):
    segs = dataset.default_world()
    rng, hit = dataset.raycast(segs, jnp.asarray(pose, jnp.float32),
                               360, 15.0)
    return dataset.scan_to_points(rng, hit), (rng, hit)


def test_p2d_registration_recovers_offset():
    """configs[0] of BASELINE.md: single scan-pair P2D registration
    converging from a perturbed init."""
    (pts, mask), _ = world_scan((0.0, -4.5, 0.0))
    grid = ndt_map.build_from_scan(MAP, jnp.zeros(2), jnp.zeros(2),
                                   pts, mask)
    tgt = d2d.make_dense_target(grid, MAP)
    res = pairwise.match_p2d(
        tgt, pts, mask, jnp.array([0.25, -0.2, 0.08]), MAP,
        MatcherParams(),
    )
    T = np.asarray(res.T)
    assert np.linalg.norm(T[:2]) < 0.05, T
    assert abs(T[2]) < 0.02, T


def test_icp_with_corr_closed_form():
    key = jax.random.PRNGKey(0)
    b = jax.random.uniform(key, (20, 2), minval=-3, maxval=3)
    T_true = jnp.array([0.5, -0.3, 0.4])
    a = se2.transform_points(T_true, b)
    T = pairwise.icp_with_corr(a, b, jnp.ones(20))
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true),
                               atol=1e-5)


def test_extrinsic_calibration_identifies_offset():
    """A laser mounted at a known offset: the grid search must prefer
    (a neighborhood of) the true extrinsic."""
    true_E = jnp.array([0.3, 0.1, 0.15])
    segs = dataset.default_world()
    poses = [jnp.array([0.0, -4.5, 0.2]), jnp.array([0.5, -4.3, 0.7])]
    pairs, rels = [], []
    for k in range(len(poses) - 1):
        sa = se2.compose(poses[k], true_E)
        sb = se2.compose(poses[k + 1], true_E)
        ra, ha = dataset.raycast(segs, sa, 240, 15.0)
        rb, hb = dataset.raycast(segs, sb, 240, 15.0)
        pa, ma = dataset.scan_to_points(ra, ha)
        pb, mb = dataset.scan_to_points(rb, hb)
        pairs.append(((pa, ma), (pb, mb)))
        rels.append(np.asarray(se2.sub(poses[k], poses[k + 1])))
    best, scores = pairwise.calibrate_extrinsic(
        pairs, rels, search_xy=0.4, search_theta=0.25, n=7
    )
    # True offset's score must beat the zero-offset hypothesis.
    cand0 = jnp.zeros((1, 3))
    candt = true_E[None, :]
    (pa, ma), (pb, mb) = pairs[0]
    s0 = pairwise.extrinsic_calibration_score(
        pa, ma, pb, mb, jnp.asarray(rels[0]), cand0
    )
    st = pairwise.extrinsic_calibration_score(
        pa, ma, pb, mb, jnp.asarray(rels[0]), candt
    )
    assert float(st[0]) < float(s0[0])


def test_frame_and_flirt_match():
    fp = FeatureParams(num_beams=360, max_range=15.0)
    (_, _), (ra, ha) = world_scan((0.0, -4.5, 0.0))
    (_, _), (rb, hb) = world_scan((0.4, -4.3, 0.2))
    fa = pairwise.make_frame(fp, ra, ha)
    fb = pairwise.make_frame(fp, rb, hb)
    res = pairwise.match_frames_flirt(fp, fa, fb, jax.random.PRNGKey(1))
    assert bool(res.valid)


def test_occupancy_export(tmp_path):
    (pts, mask), _ = world_scan((0.0, -4.5, 0.0))
    grid = ndt_map.build_from_scan(
        MAP, jnp.zeros(2), jnp.array([0.0, -4.5]), pts, mask
    )
    prob = occupancy.grid_probabilities(grid.occ)
    assert float(prob.max()) > 0.6 and float(prob.min()) < 0.4
    p = str(tmp_path / "map.pgm")
    occupancy.write_pgm(p, np.asarray(prob))
    with open(p, "rb") as f:
        head = f.readline()
    assert head == b"P5\n"

    shifted, snapped = occupancy.shift_origin(
        grid.occ, grid.origin, MAP.resolution,
        np.asarray(grid.origin) - [1.0, 0.5],
    )
    assert shifted.shape == np.asarray(grid.occ).shape
    # Mass preserved up to cropping.
    assert abs(shifted.sum() - np.asarray(grid.occ).sum()) < abs(
        np.asarray(grid.occ).sum()
    ) * 0.2


def test_desc_string_and_timers():
    from ndt_feature_graph_tpu.config import SLAMParams

    s = desc_string(SLAMParams())
    assert "resolution" in s and len(s) <= 200
    t = StageTimers()
    with t.stage("x"):
        pass
    assert t.counts["x"] == 1
    assert "x" in t.report()


def test_graph_logger(tmp_path):
    from ndt_feature_graph_tpu.config import (
        FeatureParams, FuserParams, GraphParams, SLAMParams,
    )
    from ndt_feature_graph_tpu.utils.logging_ext import GraphLogger

    params = SLAMParams(
        fuser=FuserParams(
            ndt=MAP, features=FeatureParams(num_beams=360, max_range=15.0)
        ),
        graph=GraphParams(new_node_transl_dist=5.0, max_nodes=4),
    )
    traj = dataset.corridor_trajectory(5, x0=-6.0, x1=-5.0, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=360, max_range=15.0
    )
    log_path = str(tmp_path / "poses.log")
    g = GraphLogger(params, log_path)
    g.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    for t in range(1, 5):
        g.update(seq.odom[t], seq.ranges[t], seq.hit[t], t=float(t))
    g.close()
    rows = np.loadtxt(log_path)
    assert rows.shape == (5, 4)
    np.testing.assert_allclose(rows[:, 3], np.arange(5), atol=1e-6)
