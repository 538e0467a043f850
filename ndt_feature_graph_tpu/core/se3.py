"""SE(3) pose math for the 6-DoF registration surface.

The reference's matcher stack is natively 3D (perception_oru
NDTMatcherD2D works on 6-DoF poses; ndt_feature restricts it with
`force2D`, ndt_feature_graph.cpp:518-525, and links still carry 6x6
cov_3d, ndt_feature_link.h:9-56).  This repo is SE(2)-by-design for
everything online (SURVEY.md); this module + ops/d2d3d.py cover the
reference's vestigial 6-DoF matcher surface.

Representation: pose = (6,) f32 [tx, ty, tz, rx, ry, rz] with the
rotation as a rotation VECTOR (axis * angle, exp-map coordinates) —
closed-form Rodrigues both ways, no Euler singularities.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def identity():
    return jnp.zeros(6, jnp.float32)


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], -1),
            jnp.stack([z, o, -x], -1),
            jnp.stack([-y, x, o], -1),
        ],
        -2,
    )


def rotmat(rv):
    """Rodrigues: rotation vector (..., 3) -> matrix (..., 3, 3).
    Taylor-guarded at small angles (sin t / t, (1-cos t)/t^2).

    The generic branch's angle is FLOORED before use: `jnp.where`
    routes primal values and first tangents correctly, but higher-
    order autodiff (jacfwd-of-grad, used by the 6-DoF matcher's
    Hessian) evaluates the untaken branch's derivatives too, and
    1/t^k at t=0 overflows to inf -> 0*inf = NaN in the selected
    result.  With the floor every branch has finite derivatives of
    all orders at the origin."""
    t2 = jnp.sum(rv * rv, -1)
    t2s = jnp.maximum(t2, _EPS)
    t = jnp.sqrt(t2s)
    a = jnp.where(t2 > _EPS, jnp.sin(t) / t, 1.0 - t2 / 6.0)
    b = jnp.where(
        t2 > _EPS, (1.0 - jnp.cos(t)) / t2s,
        0.5 - t2 / 24.0,
    )
    K = _skew(rv)
    eye = jnp.eye(3, dtype=rv.dtype)
    return (
        eye
        + a[..., None, None] * K
        + b[..., None, None] * (K @ K)
    )


def rotvec_from_matrix(R):
    """Log map: rotation matrix (3, 3) -> rotation vector (3,).
    Handles the small-angle and near-pi branches."""
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    t = jnp.arccos(cos_t)
    # Generic branch: axis from the skew part.
    w = jnp.stack(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    sin_t = jnp.sin(t)
    generic = w * (t / jnp.maximum(2.0 * sin_t, _EPS))
    small = 0.5 * w * (1.0 + t * t / 6.0)
    # Near pi: axis from the symmetric part diag; sign from w.
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    d = jnp.sqrt(jnp.clip(jnp.diagonal(B), 0.0, None))
    k = jnp.argmax(d)
    col = B[:, k] / jnp.maximum(d[k], _EPS)
    axis = col / jnp.maximum(jnp.linalg.norm(col), _EPS)
    sign = jnp.where(jnp.sum(axis * w) < 0.0, -1.0, 1.0)
    near_pi = axis * sign * t
    out = jnp.where(t < 1e-4, small, generic)
    return jnp.where(t > jnp.pi - 1e-3, near_pi, out)


def compose(a, b):
    """a ∘ b (apply b then a), both (6,)."""
    Ra = rotmat(a[3:6])
    Rb = rotmat(b[3:6])
    t = Ra @ b[0:3] + a[0:3]
    rv = rotvec_from_matrix(Ra @ Rb)
    return jnp.concatenate([t, rv])


def inverse(a):
    R = rotmat(a[3:6])
    return jnp.concatenate([-(R.T @ a[0:3]), -a[3:6] * 0 - a[3:6]])


def sub(origin, pose):
    """Relative pose: origin^-1 ∘ pose."""
    return compose(inverse(origin), pose)


def transform_points(pose, pts):
    """Apply pose (6,) to points (..., 3)."""
    R = rotmat(pose[3:6])
    return pts @ R.T + pose[0:3]


def rotate_covs(pose, covs):
    """R C R^T for covs (..., 3, 3)."""
    R = rotmat(pose[3:6])
    return jnp.einsum("ij,...jk,lk->...il", R, covs, R)


def from_se2(pose2):
    """Embed an SE(2) pose (3,) [x, y, theta] in SE(3) (z=0 plane)."""
    return jnp.concatenate(
        [
            pose2[0:2],
            jnp.zeros(1, pose2.dtype),
            jnp.zeros(2, pose2.dtype),
            pose2[2:3],
        ]
    )


def to_se2(pose6):
    """Project an (approximately planar) SE(3) pose to SE(2)."""
    return jnp.stack([pose6[0], pose6[1], pose6[5]])
