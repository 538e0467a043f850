"""6-DoF NDT D2D registration — the reference's vestigial 3D matcher
surface.

perception_oru's NDTMatcherD2D is natively 6-DoF; ndt_feature clamps
it to the plane with `force2D` (ndt_feature_graph.cpp:518-525) but its
links still carry full 6x6 covariances (ndt_feature_link.h:9-56).
Everything online in this repo is SE(2)-by-design (SURVEY.md); this
module provides the 6-DoF matcher for parity: 3D gaussian cell lists,
the Magnusson D2D cost under an SE(3) left increment, a damped-Newton
(LM) minimizer over the 6-vector, and the repo's one covariance
convention lifted to 6x6.

Association is list-vs-list with a Euclidean cutoff (all pairs masked
by distance) rather than a dense 3D voxel window: the 2D pipeline's
dense-grid windows exist because the online submap is a grid; the
6-DoF surface registers free-standing cell lists (the reference's
matcher also consumes `std::vector<NDTCell*>`).  Derivatives come
from autodiff (forward-over-reverse) — this surface is off the online
hot path, and the autodiff cost is the repo's correctness oracle
pattern (ops/d2d.py docstring).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndt_feature_graph_tpu.config import MatcherParams
from ndt_feature_graph_tpu.core import se3


class CellList3D(NamedTuple):
    """Padded 3D gaussian list."""

    means: jnp.ndarray   # (N, 3)
    covs: jnp.ndarray    # (N, 3, 3)
    mask: jnp.ndarray    # (N,)

    def transform(self, pose):
        return CellList3D(
            means=se3.transform_points(pose, self.means),
            covs=se3.rotate_covs(pose, self.covs),
            mask=self.mask,
        )


def _inv3(S):
    """Closed-form inverse of symmetric 3x3 (..., 3, 3) via adjugate."""
    a, b, c = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    d, e = S[..., 1, 1], S[..., 1, 2]
    f = S[..., 2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.maximum(det, 1e-18)
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    row0 = jnp.stack([A, B, C], -1)
    row1 = jnp.stack([B, D, E], -1)
    row2 = jnp.stack([C, E, F], -1)
    return jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None]


def _apply_increment(d, T0):
    """Left SE(3) increment: T = exp-ish(d) ∘ T0 (same convention as
    the 3-DoF `d2d._apply_increment`)."""
    return se3.compose(d, T0)


def d2d_score_3d(
    d,
    T0,
    src: CellList3D,
    tgt: CellList3D,
    m: MatcherParams,
    cutoff: float = 2.0,
):
    """Total 6-DoF D2D score under pose `compose(d, T0)`:
    sum over (src cell, tgt cell) pairs within `cutoff` metres of
      -d1 exp(-d2/2 mu^T (Sig1 + Sig2)^-1 mu).
    Differentiable in `d` (6,).

    The increment is applied DIRECTLY (Rodrigues on d's rotation
    vector acting on the T0-pretransformed cells) rather than through
    `se3.compose`: the compose path runs the matrix LOG map, whose
    arccos has an unbounded derivative at the identity — autodiff
    through `jnp.where`'s untaken branch then poisons the gradient
    with NaN exactly at the d=0 starting point."""
    base = src.transform(T0)
    R = se3.rotmat(d[3:6])
    moved = CellList3D(
        means=base.means @ R.T + d[0:3],
        covs=jnp.einsum("ij,njk,lk->nil", R, base.covs, R),
        mask=base.mask,
    )
    mu = moved.means[:, None, :] - tgt.means[None, :, :]     # (N,M,3)
    dist2 = jnp.sum(mu * mu, -1)
    ok = (
        moved.mask[:, None]
        & tgt.mask[None, :]
        & (dist2 <= cutoff * cutoff)
    )
    Sig = moved.covs[:, None, :, :] + tgt.covs[None, :, :, :]
    A = _inv3(Sig)
    q = jnp.einsum("nmi,nmij,nmj->nm", mu, A, mu)
    s = -m.lfd1 * jnp.exp(-0.5 * m.lfd2 * q)
    return jnp.sum(jnp.where(ok, s, 0.0))


def newton_match_6dof(score_fn, d_init, m: MatcherParams):
    """Damped-Newton (LM) over the 6-DoF increment with autodiff
    derivatives — the 6-vector analogue of d2d.newton_match (same
    fgh-reuse trial structure, fixed-trip chunked scan, Armijo
    acceptance, best fallback; PSD safety comes from the adaptive
    damping, which is exactly the reference matcher's regularization
    role in 6-DoF, fusion.h:922-940)."""
    grad_fn = jax.grad(score_fn)
    hess_fn = jax.jacfwd(jax.grad(score_fn))

    def fgh_fn(dd):
        return score_fn(dd), grad_fn(dd), hess_fn(dd)

    max_trials = 2 * m.itr_max
    lam_min = jnp.float32(1e-6)
    lam_max = jnp.float32(1e7)
    eye = jnp.eye(6, dtype=jnp.float32)

    def body(state, _):
        d, f, g, H, lam, best_d, best_f, itr, stop = state
        gnorm = jnp.linalg.norm(g)
        grad_vanished = gnorm <= m.delta_score
        delta = -jnp.linalg.solve(H + lam * eye, g)
        f_new, g_new, H_new = fgh_fn(d + delta)
        accept = (f_new <= f + 1e-4 * jnp.dot(delta, g)) & ~stop
        d_next = jnp.where(accept, d + delta, d)
        f_next = jnp.where(accept, f_new, f)
        g_next = jnp.where(accept, g_new, g)
        H_next = jnp.where(accept, H_new, H)
        lam_new = jnp.where(
            accept, jnp.maximum(lam * 0.33, lam_min), lam * 6.0
        )
        lam_new = jnp.where(stop, lam, lam_new)
        better = f_next < best_f
        best_f2 = jnp.where(better, f_next, best_f)
        best_d2 = jnp.where(better, d_next, best_d)
        score_converged = accept & (f - f_new <= m.delta_score)
        stop_new = stop | grad_vanished | (lam_new > lam_max) | (
            score_converged
        )
        itr_new = jnp.where(stop, itr, itr + 1)
        return (
            d_next, f_next, g_next, H_next, lam_new,
            best_d2, best_f2, itr_new, stop_new,
        ), None

    d0 = jnp.asarray(d_init, jnp.float32)
    f0, g0, H0 = fgh_fn(d0)
    init = (
        d0, f0, g0, H0, jnp.float32(1e-2), d0, f0,
        jnp.int32(0), jnp.bool_(False),
    )
    trial_chunk = 6
    n_chunks = -(-max_trials // trial_chunk)

    def chunk(state, _):
        def run(st):
            out, _ = jax.lax.scan(body, st, None, length=trial_chunk)
            return out

        return jax.lax.cond(state[-1], lambda st: st, run, state), None

    (d, f, g, H, lam, best_d, best_f, itr, stop), _ = jax.lax.scan(
        chunk, init, None, length=n_chunks
    )
    use_best = f > best_f
    d_out = jnp.where(use_best, best_d, d)
    f_out = jnp.where(use_best, best_f, f)
    return d_out, f_out, itr, stop


class Match3DResult(NamedTuple):
    d: jnp.ndarray           # (6,) increment
    T: jnp.ndarray           # (6,) final pose
    score: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    cov: jnp.ndarray         # (6, 6) pose covariance


@functools.partial(
    jax.jit, static_argnames=("m", "cutoff", "force2d")
)
def match_d2d_3d(
    tgt: CellList3D,
    src: CellList3D,
    T_init,
    m: MatcherParams,
    cutoff: float = 2.0,
    force2d: bool = False,
) -> Match3DResult:
    """Full 6-DoF D2D registration (NDTMatcherD2D::match in its native
    6-DoF form).  `force2d=True` reproduces the reference's planar
    clamp (ndt_feature_graph.cpp:518-525): z / roll / pitch of the
    increment are projected out every trial, leaving the SE(2)
    subproblem embedded in the 6-DoF machinery.

    Pose covariance follows the repo convention (d2d.cov_from_hessian
    lifted to 6x6): cov_scale * inverse of the eigenvalue-floored
    Hessian, symmetrized.
    """
    mask6 = jnp.asarray(
        [1.0, 1.0, 0.0, 0.0, 0.0, 1.0] if force2d else [1.0] * 6,
        jnp.float32,
    )

    def score_fn(d):
        return d2d_score_3d(d * mask6, T_init, src, tgt, m, cutoff)

    d, f, itr, conv = newton_match_6dof(score_fn, jnp.zeros(6), m)
    d = d * mask6
    H = jax.jacfwd(jax.grad(score_fn))(d)
    # Planar clamp: fix the projected-out axes so the floored inverse
    # stays well-defined.
    if force2d:
        fixed = (1.0 - mask6) * 1e6
        H = H * mask6[:, None] * mask6[None, :] + jnp.diag(fixed)
    evals, evecs = jnp.linalg.eigh(0.5 * (H + H.T))
    evals = jnp.maximum(evals, 1e-6)
    cov = (evecs / evals[None, :]) @ evecs.T
    cov = m.cov_scale * 0.5 * (cov + cov.T)
    return Match3DResult(
        d=d,
        T=_apply_increment(d, T_init),
        score=f,
        iterations=itr,
        converged=conv,
        cov=cov,
    )
