"""Generalization regression: the pipeline must track in a second,
geometry-poor world (warehouse corridors), not just the default room."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import FeatureParams, FuserParams, NDTMapParams
from ndt_feature_graph_tpu.fusion import feature_fuser
from ndt_feature_graph_tpu.io import dataset, tum

PARAMS = FuserParams(
    ndt=NDTMapParams(
        resolution=0.5, size_x=50.0, size_y=50.0, sensor_range=20.0,
        max_points_per_scan=512, max_cells=512,
    ),
    features=FeatureParams(num_beams=360, max_range=20.0),
)


def test_warehouse_tracking():
    segs = dataset.warehouse_world()
    x = np.linspace(-12.0, 12.0, 40)
    y = np.full(40, -4.5)
    th = np.zeros(40)
    traj = jnp.asarray(np.stack([x, y, th], -1), jnp.float32)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(3), traj, num_beams=360, max_range=20.0,
        segments=segs,
    )
    st = feature_fuser.initialize(
        PARAMS, seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0],
        jax.random.PRNGKey(0),
    )
    est = [np.asarray(st.base.Tnow)]
    for t in range(1, 40):
        st, info, res = feature_fuser.update(
            st, PARAMS, seq.odom[t], seq.ranges[t], seq.hit[t]
        )
        est.append(np.asarray(st.base.Tnow))
    err = tum.ate_rmse(np.stack(est), np.asarray(seq.gt))
    # Corridor direction is weakly constrained by NDT; the odometry
    # prior must keep drift bounded.
    assert err < 0.35, err
    assert np.isfinite(np.stack(est)).all()


def test_random_world_keepout():
    """Obstacles honor the clearance constraint for every seed."""
    for seed in range(4):
        world, traj = dataset.random_loop_scenario(seed, n_steps=50)
        keep = np.asarray(traj[:, :2], np.float64)
        segs = np.asarray(world)[4:]  # skip outer walls
        for s in segs:
            d = dataset._point_segment_dist(keep, s).min()
            assert d > 1.1, (seed, d)


def test_random_world_tracking():
    """The pipeline must track in procedurally generated worlds, not
    just the two hand-built ones (ROADMAP item 7)."""
    for seed in (1, 7):
        segs, traj = dataset.random_loop_scenario(seed, n_steps=40)
        seq = dataset.simulate_sequence(
            jax.random.PRNGKey(seed), traj, num_beams=360,
            max_range=20.0, segments=segs,
        )
        st = feature_fuser.initialize(
            PARAMS, seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0],
            jax.random.PRNGKey(0),
        )
        est = [np.asarray(st.base.Tnow)]
        for t in range(1, 40):
            st, info, res = feature_fuser.update(
                st, PARAMS, seq.odom[t], seq.ranges[t], seq.hit[t]
            )
            est.append(np.asarray(st.base.Tnow))
        err = tum.ate_rmse(np.stack(est), np.asarray(seq.gt))
        assert err < 0.35, (seed, err)
        assert np.isfinite(np.stack(est)).all()
