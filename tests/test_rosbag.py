"""ROS1 bag container round-trips (io/rosbag.py): the LaserBagReader
parity path (ndt_graph_offline.cpp:458-633) without ROS."""

import bz2

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.io import dataset, rosbag


def _seq():
    traj = dataset.loop_trajectory(30, radius=4.0)
    return dataset.simulate_sequence(
        jax.random.PRNGKey(3), traj, num_beams=180, max_range=15.0,
        odom_noise=(0.01, 0.01, 0.004),
    )


def _odom_chain(seq):
    pose = jnp.asarray(seq.gt[0])
    out = [np.asarray(pose)]
    for t in range(1, seq.odom.shape[0]):
        pose = se2.compose(pose, jnp.asarray(seq.odom[t]))
        out.append(np.asarray(pose))
    return np.stack(out)


def test_bag_roundtrip(tmp_path):
    seq = _seq()
    path = tmp_path / "run.bag"
    rosbag.write_bag(path, seq, max_range=15.0)

    out, stamps = rosbag.read_bag_sequence(str(path), max_range=15.0)
    assert out.ranges.shape == seq.ranges.shape
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(seq.hit))
    hit = np.asarray(seq.hit)
    np.testing.assert_allclose(
        np.asarray(out.ranges)[hit], np.asarray(seq.ranges)[hit],
        atol=1e-3,
    )
    # Absolute odometry read back = the written dead-reckoning chain
    # (yaw modulo 2*pi: quaternions wrap to (-pi, pi]).
    def close_mod2pi(a, b, atol):
        np.testing.assert_allclose(a[:, :2], b[:, :2], atol=atol)
        d = np.arctan2(
            np.sin(a[:, 2] - b[:, 2]), np.cos(a[:, 2] - b[:, 2])
        )
        np.testing.assert_allclose(d, 0.0, atol=atol)

    close_mod2pi(np.asarray(out.gt), _odom_chain(seq), 1e-5)
    # Relative odometry reconstructs the same chain.
    close_mod2pi(_odom_chain(out), _odom_chain(seq), 1e-4)
    assert stamps.shape == (seq.ranges.shape[0],)


def test_bag_bz2_chunks(tmp_path):
    seq = _seq()
    path = tmp_path / "run_bz2.bag"
    rosbag.write_bag(path, seq, max_range=15.0, compression="bz2")
    raw = path.read_bytes()
    assert b"bz2" in raw
    out, _ = rosbag.read_bag_sequence(str(path), max_range=15.0)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(seq.hit))


def test_bag_topic_listing_and_selection(tmp_path):
    seq = _seq()
    path = tmp_path / "named.bag"
    rosbag.write_bag(
        path, seq, scan_topic="/base_scan", odom_topic="/robot/odom"
    )
    types = rosbag._topic_types(str(path))
    assert types == {
        "/base_scan": rosbag.LASERSCAN_TYPE,
        "/robot/odom": rosbag.ODOM_TYPE,
    }
    out, _ = rosbag.read_bag_sequence(
        str(path), scan_topic="/base_scan", odom_topic="/robot/odom"
    )
    assert out.ranges.shape == seq.ranges.shape


def test_bag_nan_and_inf_ranges(tmp_path):
    """Real drivers emit inf (no return) and NaN beams; the reader must
    mask them out and keep finite arrays."""
    seq = _seq()
    path = tmp_path / "dirty.bag"
    ranges = np.asarray(seq.ranges).copy()
    hit = np.asarray(seq.hit).copy()
    dirty_r = np.where(hit, ranges, np.inf).astype(np.float32)
    dirty_r[0, :5] = np.nan
    hit_expect = hit.copy()
    hit_expect[0, :5] = False
    # hit=True everywhere so the writer passes inf/NaN onto the wire.
    dirty = seq._replace(
        ranges=jnp.asarray(dirty_r), hit=jnp.ones_like(seq.hit)
    )
    rosbag.write_bag(path, dirty, max_range=15.0)
    out, _ = rosbag.read_bag_sequence(str(path), max_range=15.0)
    assert np.isfinite(np.asarray(out.ranges)).all()
    assert not np.asarray(out.hit)[~hit_expect].any()
    assert np.asarray(out.hit)[hit_expect].all()
