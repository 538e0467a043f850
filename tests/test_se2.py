"""SE(2) identity tests (scenario shape of utils_affine_test.cpp:9-86)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_feature_graph_tpu.core import se2


def rand_pose(key, n=()):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, n + (2,), minval=-5.0, maxval=5.0)
    th = jax.random.uniform(k2, n + (1,), minval=-np.pi, maxval=np.pi)
    return jnp.concatenate([xy, th], -1)


def test_compose_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    a = rand_pose(key, (16,))
    ident = se2.compose(a, se2.inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)


def test_sub_is_inverse_compose():
    key = jax.random.PRNGKey(1)
    a = rand_pose(key, (8,))
    b = rand_pose(jax.random.PRNGKey(2), (8,))
    rel = se2.sub(a, b)
    back = se2.compose(a, rel)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-5)


def test_matrix_roundtrip():
    key = jax.random.PRNGKey(3)
    a = rand_pose(key, (8,))
    np.testing.assert_allclose(
        np.asarray(se2.from_matrix3(se2.to_matrix3(a))),
        np.asarray(a),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(se2.from_matrix4(se2.to_matrix4(a))),
        np.asarray(a),
        atol=1e-5,
    )


def test_compose_matches_matrix_product():
    a = rand_pose(jax.random.PRNGKey(4), (8,))
    b = rand_pose(jax.random.PRNGKey(5), (8,))
    lhs = se2.to_matrix3(se2.compose(a, b))
    rhs = se2.to_matrix3(a) @ se2.to_matrix3(b)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_transform_points():
    pose = jnp.array([1.0, 2.0, np.pi / 2])
    pts = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    out = se2.transform_points(pose, pts)
    np.testing.assert_allclose(
        np.asarray(out), [[1.0, 3.0], [0.0, 2.0]], atol=1e-5
    )


def test_normalize_angle():
    a = jnp.array([0.0, 3 * np.pi, -3 * np.pi, np.pi / 2])
    out = np.asarray(se2.normalize_angle(a))
    np.testing.assert_allclose(
        np.abs(out), [0.0, np.pi, np.pi, np.pi / 2], atol=1e-5
    )


def test_to_tum_shape():
    pose = jnp.array([1.0, 2.0, 0.5])
    row = se2.to_tum(jnp.float32(3.0), pose)
    assert row.shape == (8,)
    np.testing.assert_allclose(
        np.asarray(row)[:4], [3.0, 1.0, 2.0, 0.0], atol=1e-6
    )
