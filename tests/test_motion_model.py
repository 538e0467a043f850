"""Motion-model covariance tests vs closed forms
(motion_model.cpp:29-50, 197-207 semantics)."""

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import MotionParams
from ndt_feature_graph_tpu.core import motion_model, se2


def test_measurement_cov_closed_form():
    p = MotionParams(Cd=0.1, Ct=0.2, Dd=0.3, Dt=0.4, Td=0.5, Tt=0.6)
    rel = jnp.array([3.0, 4.0, 0.5])  # dist = 5
    cov = np.asarray(motion_model.measurement_cov(p, rel))
    d2, r2 = 25.0, 0.25
    np.testing.assert_allclose(cov[0, 0], 0.3 * d2 + 0.4 * r2, rtol=1e-5)
    np.testing.assert_allclose(cov[1, 1], 0.1 * d2 + 0.2 * r2, rtol=1e-5)
    np.testing.assert_allclose(cov[2, 2], 0.5 * d2 + 0.6 * r2, rtol=1e-5)
    assert np.allclose(cov - np.diag(np.diag(cov)), 0.0)


def test_cov_lift_roundtrip():
    cov3 = jnp.array(
        [[0.1, 0.01, 0.02], [0.01, 0.2, 0.03], [0.02, 0.03, 0.3]]
    )
    cov6 = motion_model.cov3_to_cov6(cov3)
    back = motion_model.cov6_to_cov3(cov6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cov3), atol=1e-6)
    # Dead axes get identity variance.
    c6 = np.asarray(cov6)
    for i in (2, 3, 4):
        np.testing.assert_allclose(c6[i, i], 1.0)


def test_compose_pose_cov_monte_carlo():
    """Jacobian propagation should match sampled statistics."""
    rng = np.random.default_rng(0)
    mean_a = jnp.array([1.0, 0.5, 0.3])
    mean_b = jnp.array([0.4, -0.2, 0.1])
    cov_a = jnp.diag(jnp.array([1e-4, 2e-4, 1e-4]))
    cov_b = jnp.diag(jnp.array([2e-4, 1e-4, 2e-4]))
    mean, cov = motion_model.compose_pose_cov(mean_a, cov_a, mean_b, cov_b)

    n = 20000
    sa = rng.multivariate_normal(np.asarray(mean_a), np.asarray(cov_a), n)
    sb = rng.multivariate_normal(np.asarray(mean_b), np.asarray(cov_b), n)
    samples = np.asarray(
        se2.compose(jnp.asarray(sa, jnp.float32), jnp.asarray(sb, jnp.float32))
    )
    emp_mean = samples.mean(0)
    emp_cov = np.cov(samples.T)
    np.testing.assert_allclose(np.asarray(mean), emp_mean, atol=5e-3)
    np.testing.assert_allclose(np.asarray(cov), emp_cov, atol=5e-5)


def test_odometry_information_inverts_cov():
    p = MotionParams()
    rel = jnp.array([1.0, 0.0, 0.1])
    cov = motion_model.measurement_cov(p, rel)
    info = motion_model.odometry_information(p, rel)
    prod = np.asarray(cov @ info)
    np.testing.assert_allclose(prod, np.eye(3), atol=1e-3)
