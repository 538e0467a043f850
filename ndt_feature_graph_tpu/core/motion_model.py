"""Odometry motion model: Eliazar-style covariance + SE(2) covariance
propagation.

Re-implements the behavior of MotionModel2d / addPose2dCov
(motion_model.cpp:5-207): per-axis variance grows with distance^2 and
rotation^2; composed covariances propagate through the compose Jacobians
(Frese Eq. 2.11 form).
"""

from __future__ import annotations

import jax.numpy as jnp

from ndt_feature_graph_tpu.config import MotionParams
from ndt_feature_graph_tpu.core import se2


def measurement_cov(params: MotionParams, rel_pose):
    """Diagonal 3x3 covariance of a relative motion (..., 3) ->
    (..., 3, 3).  Matches getMeasurementCov (motion_model.cpp:197-207):
    var_forward = Dd*d^2 + Dt*r^2, var_side = Cd*d^2 + Ct*r^2,
    var_theta = Td*d^2 + Tt*r^2.
    """
    d2 = rel_pose[..., 0] ** 2 + rel_pose[..., 1] ** 2
    r2 = rel_pose[..., 2] ** 2
    vx = params.Dd * d2 + params.Dt * r2
    vy = params.Cd * d2 + params.Ct * r2
    vt = params.Td * d2 + params.Tt * r2
    z = jnp.zeros_like(vx)
    row0 = jnp.stack([vx, z, z], -1)
    row1 = jnp.stack([z, vy, z], -1)
    row2 = jnp.stack([z, z, vt], -1)
    return jnp.stack([row0, row1, row2], -2)


def cov3_to_cov6(cov3):
    """Lift 3x3 (x, y, theta) covariance to the reference's 6x6 layout
    (x, y, z, roll, pitch, yaw) with identity on the dead axes
    (getCovMatrix6, motion_model.cpp:177-196 + fuser overrides
    fuser_hmt.cpp:137-141 setting z/roll/pitch variance to 1)."""
    batch = cov3.shape[:-2]
    cov6 = jnp.broadcast_to(
        jnp.eye(6, dtype=cov3.dtype), batch + (6, 6)
    ).copy()
    cov6 = cov6.at[..., :2, :2].set(cov3[..., :2, :2])
    cov6 = cov6.at[..., :2, 5].set(cov3[..., :2, 2])
    cov6 = cov6.at[..., 5, :2].set(cov3[..., 2, :2])
    cov6 = cov6.at[..., 5, 5].set(cov3[..., 2, 2])
    return cov6


def cov6_to_cov3(cov6):
    """Inverse lift (cov6toCov3, motion_model.cpp:148-161)."""
    c = jnp.zeros(cov6.shape[:-2] + (3, 3), cov6.dtype)
    c = c.at[..., :2, :2].set(cov6[..., :2, :2])
    c = c.at[..., :2, 2].set(cov6[..., :2, 5])
    c = c.at[..., 2, :2].set(cov6[..., 5, :2])
    c = c.at[..., 2, 2].set(cov6[..., 5, 5])
    return c


def compose_pose_cov(mean_a, cov_a, mean_b, cov_b):
    """Compound (mean, cov) ∘ (mean, cov) with Jacobian propagation
    (addPose2dCov, motion_model.cpp:29-50):
      J1 = d(a∘b)/da, J2 = d(a∘b)/db; cov = J1 Ca J1' + J2 Cb J2'.
    Returns (mean, cov)."""
    mean = se2.compose(mean_a, mean_b)
    c, s = jnp.cos(mean_a[..., 2]), jnp.sin(mean_a[..., 2])
    bx, by = mean_b[..., 0], mean_b[..., 1]
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    J1 = jnp.stack(
        [
            jnp.stack([o, z, -s * bx - c * by], -1),
            jnp.stack([z, o, c * bx - s * by], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )
    J2 = jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )
    cov = (
        J1 @ cov_a @ jnp.swapaxes(J1, -1, -2)
        + J2 @ cov_b @ jnp.swapaxes(J2, -1, -2)
    )
    return mean, cov


def odometry_information(params: MotionParams, rel_pose, floor=1e-6):
    """Inverse measurement covariance (3x3) with a variance floor so the
    information stays finite for zero motion."""
    cov = measurement_cov(params, rel_pose)
    eye = jnp.eye(3, dtype=cov.dtype)
    cov = cov + floor * eye
    # Diagonal by construction — invert elementwise.
    diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
    return eye * (1.0 / diag)[..., None, :]
