"""6-DoF matcher surface (core/se3.py + ops/d2d3d.py): SE(3) algebra
round trips, full 6-DoF registration recovery, and the force2D planar
clamp's agreement with the native SE(2) machinery."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import MatcherParams
from ndt_feature_graph_tpu.core import se3
from ndt_feature_graph_tpu.ops.d2d3d import (
    CellList3D, d2d_score_3d, match_d2d_3d,
)


def test_se3_algebra_round_trips():
    rng = np.random.default_rng(0)
    for k in range(30):
        scale = 2.5 if k % 3 else 1e-5     # generic + near-identity
        rv = rng.normal(0, scale, 3)
        if k == 7:                          # near-pi branch
            rv = rv / np.linalg.norm(rv) * (np.pi - 1e-4)
        a = jnp.asarray(
            np.concatenate([rng.normal(0, 3.0, 3), rv]), jnp.float32
        )
        # exp/log round trip through the matrix.
        R = se3.rotmat(a[3:6])
        np.testing.assert_allclose(
            np.asarray(R @ R.T), np.eye(3), atol=1e-5
        )
        rv_back = se3.rotvec_from_matrix(R)
        # Near pi the axis comes from a f32 sqrt of the symmetric
        # part's diagonal — ~1e-4 matrix accuracy is expected there.
        np.testing.assert_allclose(
            np.asarray(se3.rotmat(rv_back)), np.asarray(R), atol=5e-4
        )
        # compose/inverse identities.
        b = jnp.asarray(
            np.concatenate([rng.normal(0, 3.0, 3),
                            rng.normal(0, 1.0, 3)]),
            jnp.float32,
        )
        ab = se3.compose(a, b)
        b_back = se3.compose(se3.inverse(a), ab)
        # Near-pi log/exp amplifies f32 axis error (~6e-4 measured).
        np.testing.assert_allclose(
            np.asarray(se3.rotmat(b_back[3:6])),
            np.asarray(se3.rotmat(b[3:6])), atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(b_back[:3]), np.asarray(b[:3]), atol=1e-4
        )
        # transform_points consistency with compose.
        pts = jnp.asarray(rng.normal(0, 2.0, (5, 3)), jnp.float32)
        p1 = se3.transform_points(a, se3.transform_points(b, pts))
        p2 = se3.transform_points(ab, pts)
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), atol=1e-2
        )


def _random_scene(rng, n=40):
    means = rng.normal(0, 4.0, (n, 3)).astype(np.float32)
    covs = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        A = rng.normal(0, 0.15, (3, 3))
        covs[i] = A @ A.T + np.eye(3) * 0.01
    return CellList3D(
        means=jnp.asarray(means),
        covs=jnp.asarray(covs),
        mask=jnp.ones(n, bool),
    )


def test_6dof_registration_recovers_pose():
    rng = np.random.default_rng(1)
    tgt = _random_scene(rng)
    m = MatcherParams(itr_max=40, lfd2=0.2)
    for k in range(4):
        true = jnp.asarray(
            np.concatenate(
                [rng.uniform(-0.4, 0.4, 3), rng.uniform(-0.12, 0.12, 3)]
            ),
            jnp.float32,
        )
        # Source = target moved by the INVERSE of `true`: registering
        # src onto tgt must recover `true`.
        src = tgt.transform(se3.inverse(true))
        res = match_d2d_3d(tgt, src, jnp.zeros(6), m, cutoff=3.0)
        err_t = float(jnp.linalg.norm(res.T[:3] - true[:3]))
        R_err = np.asarray(
            se3.rotmat(res.T[3:6]).T @ se3.rotmat(true[3:6])
        )
        ang = float(
            np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
        )
        assert err_t < 0.03, (k, err_t)
        assert ang < 0.02, (k, ang)
        # Covariance is 6x6 SPD.
        ev = np.linalg.eigvalsh(np.asarray(res.cov))
        assert (ev > 0).all()


def test_force2d_matches_se2_matcher():
    """The planar clamp (force2D, ndt_feature_graph.cpp:518-525) on a
    z=0 scene must land on the same pose as the native SE(2) matcher
    given the same gaussians."""
    rng = np.random.default_rng(2)
    n = 30
    means2 = rng.normal(0, 4.0, (n, 2)).astype(np.float32)
    covs2 = np.zeros((n, 2, 2), np.float32)
    for i in range(n):
        A = rng.normal(0, 0.15, (2, 2))
        covs2[i] = A @ A.T + np.eye(2) * 0.01
    true2 = jnp.asarray([0.25, -0.2, 0.1], jnp.float32)

    # 3D embedding: z = 0, small isotropic z-variance.
    means3 = np.concatenate(
        [means2, np.zeros((n, 1), np.float32)], 1
    )
    covs3 = np.zeros((n, 3, 3), np.float32)
    covs3[:, :2, :2] = covs2
    covs3[:, 2, 2] = 0.01
    tgt3 = CellList3D(
        means=jnp.asarray(means3), covs=jnp.asarray(covs3),
        mask=jnp.ones(n, bool),
    )
    src3 = tgt3.transform(se3.inverse(se3.from_se2(true2)))
    m = MatcherParams(itr_max=40, lfd2=0.2)
    res3 = match_d2d_3d(
        tgt3, src3, jnp.zeros(6), m, cutoff=3.0, force2d=True
    )
    # Planar components recover the SE(2) truth; clamped axes stay 0.
    est2 = np.asarray(se3.to_se2(res3.T))
    np.testing.assert_allclose(est2, np.asarray(true2), atol=0.02)
    assert abs(float(res3.T[2])) < 1e-6
    assert abs(float(res3.T[3])) < 1e-6
    assert abs(float(res3.T[4])) < 1e-6

    # And the embedded planar score prefers the SE(2) truth to a
    # perturbed pose (optimum in the right place).
    d_at_truth = se3.from_se2(true2)
    s_truth = float(
        d2d_score_3d(d_at_truth, jnp.zeros(6), src3, tgt3, m, 3.0)
    )
    s_off = float(
        d2d_score_3d(
            d_at_truth + jnp.asarray([0.1, 0, 0, 0, 0, 0.0]),
            jnp.zeros(6), src3, tgt3, m, 3.0,
        )
    )
    assert s_truth < s_off
