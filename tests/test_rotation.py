"""Rotation-heavy robustness: sharp turns and rotation in place
(scenario shape of flirtlib_ros rotate_in_place.cpp:48-141)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import FeatureParams, FuserParams, NDTMapParams
from ndt_feature_graph_tpu.fusion import fuser
from ndt_feature_graph_tpu.io import dataset, tum

PARAMS = FuserParams(
    ndt=NDTMapParams(
        resolution=0.5, size_x=40.0, size_y=40.0, sensor_range=15.0,
        max_points_per_scan=512, max_cells=512,
    ),
    features=FeatureParams(num_beams=360, max_range=15.0),
)


def run(seq):
    pts_all, mask_all = jax.vmap(dataset.scan_to_points)(
        seq.ranges, seq.hit
    )
    st = fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), pts_all[0], mask_all[0]
    )
    est = [np.asarray(st.Tnow)]
    for t in range(1, seq.gt.shape[0]):
        st, _ = fuser.update(
            st, PARAMS, seq.odom[t], pts_all[t], mask_all[t]
        )
        est.append(np.asarray(st.Tnow))
    return np.stack(est)


def test_rotate_in_place():
    """Full revolution standing still: heading must track through the
    wrap and position must stay put."""
    n = 36
    theta = np.linspace(0, 2 * np.pi, n)
    traj = jnp.asarray(
        np.stack([np.full(n, 0.5), np.full(n, -4.0), theta], -1),
        jnp.float32,
    )
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=360, max_range=15.0,
        odom_noise=(0.002, 0.002, 0.004),
    )
    est = run(seq)
    gt = np.asarray(seq.gt)
    # Position pinned.
    assert np.abs(est[:, :2] - gt[:, :2]).max() < 0.12
    # Heading tracked through the wrap.
    dth = np.arctan2(
        np.sin(est[:, 2] - gt[:, 2]), np.cos(est[:, 2] - gt[:, 2])
    )
    assert np.abs(dth).max() < 0.05, np.abs(dth).max()


def test_figure_eight_sharp_turns():
    n = 80
    t = np.linspace(0, 2 * np.pi, n)
    x = 4.0 * np.sin(t)
    y = -1.5 + 2.5 * np.sin(2 * t)
    th = np.unwrap(np.arctan2(np.gradient(y), np.gradient(x)))
    traj = jnp.asarray(np.stack([x, y, th], -1), jnp.float32)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(1), traj, num_beams=360, max_range=15.0,
        odom_noise=(0.01, 0.01, 0.006),
    )
    est = run(seq)
    err = tum.ate_rmse(est, np.asarray(seq.gt))
    assert err < 0.1, err
