"""D2D registration tests.

Scenario shapes from the reference's manual harnesses:
  - gradient/Hessian vs finite differences (SURVEY.md §7 hard parts)
  - convergence from perturbed initial guesses (ndt_fusion_test.cpp
    offset_Tx/Ty/Tth flags)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_feature_graph_tpu.config import MatcherParams, NDTMapParams
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.ops import d2d, ndt_map

MAP = NDTMapParams(
    resolution=0.5,
    size_x=30.0,
    size_y=30.0,
    max_points_per_scan=512,
    max_cells=256,
)
MATCH = MatcherParams()


def make_world(key, n=400):
    """Synthetic structured world: two walls + scattered clutter."""
    k1, k2, k3 = jax.random.split(key, 3)
    wall1 = jnp.stack(
        [jnp.linspace(-8.0, 8.0, n // 2),
         2.5 + 0.03 * jax.random.normal(k1, (n // 2,))], -1
    )
    wall2 = jnp.stack(
        [-3.0 + 0.03 * jax.random.normal(k2, (n // 4,)),
         jnp.linspace(-6.0, 6.0, n // 4)], -1
    )
    clutter = jax.random.uniform(
        k3, (n - n // 2 - n // 4, 2), minval=-7.0, maxval=7.0
    )
    return jnp.concatenate([wall1, wall2, clutter])


def build(pts):
    grid = ndt_map.build_from_scan(
        MAP, jnp.zeros(2), jnp.zeros(2), pts, jnp.ones(len(pts), bool)
    )
    return grid


def test_score_gradient_matches_finite_differences():
    pts = make_world(jax.random.PRNGKey(0))
    grid = build(pts)
    tgt = d2d.make_dense_target(grid, MAP)
    src = ndt_map.to_cell_list(grid, MAP)
    T0 = jnp.array([0.05, -0.08, 0.03])

    def f(d):
        return d2d.d2d_score_dense(d, T0, src, tgt, MAP, MATCH)

    d0 = jnp.array([0.02, 0.01, -0.015])
    g = np.asarray(jax.grad(f)(d0))
    H = np.asarray(jax.jacfwd(jax.grad(f))(d0))

    eps = 1e-3
    for i in range(3):
        e = np.zeros(3)
        e[i] = eps
        fd = (float(f(d0 + e)) - float(f(d0 - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-4)
        gp = np.asarray(jax.grad(f)(d0 + e))
        gm = np.asarray(jax.grad(f)(d0 - e))
        np.testing.assert_allclose(H[:, i], (gp - gm) / (2 * eps),
                                   rtol=5e-2, atol=5e-3)
    # Hessian symmetric.
    np.testing.assert_allclose(H, H.T, rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize(
    "offset",
    [
        (0.3, 0.0, 0.0),
        (0.0, -0.3, 0.0),
        (0.0, 0.0, 0.12),
        (0.25, 0.2, -0.08),
    ],
)
def test_convergence_from_perturbed_init(offset):
    """Register a map against itself starting from a perturbed guess —
    the estimate must return to identity (ndt_fusion_test shape)."""
    pts = make_world(jax.random.PRNGKey(1))
    grid = build(pts)
    tgt = d2d.make_dense_target(grid, MAP)
    src = ndt_map.to_cell_list(grid, MAP)

    T_init = jnp.array(offset, jnp.float32)
    res = d2d.match_d2d(tgt, src, T_init, MAP, MATCH)
    T = np.asarray(res.T)
    assert np.linalg.norm(T[:2]) < 0.05, T
    assert abs(T[2]) < 0.02, T


def test_identity_is_stationary():
    pts = make_world(jax.random.PRNGKey(2))
    grid = build(pts)
    tgt = d2d.make_dense_target(grid, MAP)
    src = ndt_map.to_cell_list(grid, MAP)
    res = d2d.match_d2d(tgt, src, jnp.zeros(3), MAP, MATCH)
    T = np.asarray(res.T)
    assert np.linalg.norm(T[:2]) < 0.02
    assert abs(T[2]) < 0.01


def test_known_transform_recovered():
    """Shift the source cloud by a known transform; the matcher must
    recover its inverse."""
    pts = make_world(jax.random.PRNGKey(3))
    grid = build(pts)
    tgt = d2d.make_dense_target(grid, MAP)

    T_true = jnp.array([0.4, -0.25, 0.1])
    moved_pts = se2.transform_points(T_true, pts)
    src_grid = build(moved_pts)
    src = ndt_map.to_cell_list(src_grid, MAP)

    # Estimate mapping src -> tgt; should equal inverse(T_true).
    res = d2d.match_d2d(tgt, src, jnp.zeros(3), MAP, MATCH)
    expect = np.asarray(se2.inverse(T_true))
    got = np.asarray(res.T)
    np.testing.assert_allclose(got[:2], expect[:2], atol=0.08)
    np.testing.assert_allclose(got[2], expect[2], atol=0.03)


def test_paired_score_and_match():
    """Correspondence-restricted matching (NDTMatcherFeatureD2D shape)."""
    key = jax.random.PRNGKey(4)
    means = jax.random.uniform(key, (32, 2), minval=-5.0, maxval=5.0)
    covs = jnp.tile(jnp.eye(2) * 2e-4, (32, 1, 1))
    mask = jnp.ones(32, bool)
    tgt = ndt_map.CellList(means, covs, mask)

    T_true = jnp.array([0.3, 0.1, 0.05])
    src = ndt_map.CellList(
        se2.transform_points(se2.inverse(T_true), means), covs, mask
    )

    def score(d):
        return d2d.d2d_score_paired(d, jnp.zeros(3), src, tgt, MATCH)

    d, f, itr, conv = d2d.newton_match(score, jnp.zeros(3), MATCH)
    got = np.asarray(se2.compose(d * 0.0, d))  # d is the increment
    np.testing.assert_allclose(np.asarray(d)[:2], np.asarray(T_true)[:2],
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(d)[2], float(T_true[2]), atol=0.01)


def test_covariance_positive_definite():
    pts = make_world(jax.random.PRNGKey(5))
    grid = build(pts)
    tgt = d2d.make_dense_target(grid, MAP)
    src = ndt_map.to_cell_list(grid, MAP)
    cov = np.asarray(d2d.covariance_d2d(tgt, src, jnp.zeros(3), MAP, MATCH))
    evals = np.linalg.eigvalsh(cov)
    assert (evals > 0).all()
    np.testing.assert_allclose(cov, cov.T, atol=1e-8)


def test_mahalanobis_term():
    Q = jnp.diag(jnp.array([4.0, 2.0, 8.0]))
    d = jnp.array([0.5, -1.0, 0.25])
    s = float(d2d.mahalanobis_score(d, Q))
    np.testing.assert_allclose(s, 4 * 0.25 + 2 * 1.0 + 8 * 0.0625, rtol=1e-6)
