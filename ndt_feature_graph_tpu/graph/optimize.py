"""SE(2) pose-graph optimizer: batched Gauss-Newton.

TPU-native replacement of the iSAM bridge (optimizeGraphUsingISAM,
ndt_offline_mapper.h:40-107: prior Information(100*I) on node 0 + one
Pose2d_Pose2d_Factor per link + batch_optimization).  Instead of
sparse-Cholesky-with-elimination-ordering (isam/cholmod), factors are
linearized *in batch* (vmapped analytic Jacobians), scattered into the
dense normal-equations matrix, and solved with a damped dense Cholesky —
dense is the right call on an MXU for graphs up to a few thousand
nodes; the distributed Schur-complement path (parallel/) takes over
beyond that.

Edge measurement convention: meas = pose of node j expressed in node
i's frame (relative pose), i.e. meas ≈ inv(T_i) ∘ T_j, matching
Pose2d_Pose2d_Factor semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndt_feature_graph_tpu.core import se2


class EdgeList(NamedTuple):
    """Padded factor list."""

    i: jnp.ndarray       # (E,) int32 ref node
    j: jnp.ndarray       # (E,) int32 mov node
    meas: jnp.ndarray    # (E, 3) relative pose (j in i's frame)
    info: jnp.ndarray    # (E, 3, 3) information matrix
    mask: jnp.ndarray    # (E,) bool


def edge_residual(Ti, Tj, meas):
    """r = (inv(Ti) ∘ Tj) ⊖ meas with wrapped angle."""
    pred = se2.sub(Ti, Tj)
    r = pred - meas
    return r.at[..., 2].set(se2.normalize_angle(pred[..., 2] - meas[..., 2]))


def _edge_jacobians(Ti, Tj, meas):
    """Analytic Jacobians of edge_residual wrt Ti and Tj, each (3, 3)."""
    ci, si = jnp.cos(Ti[2]), jnp.sin(Ti[2])
    dx = Tj[0] - Ti[0]
    dy = Tj[1] - Ti[1]
    # pred = [ c*dx + s*dy, -s*dx + c*dy, tj - ti ]
    Ji = jnp.array(
        [
            [-ci, -si, -si * dx + ci * dy],
            [si, -ci, -ci * dx - si * dy],
            [0.0, 0.0, -1.0],
        ]
    )
    Jj = jnp.array(
        [
            [ci, si, 0.0],
            [-si, ci, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    return Ji, Jj


def assemble_normal_equations(p, edges: EdgeList, n: int):
    """Batched factor linearization into dense block normal equations.

    Returns H (n, n, 3, 3) and b (n, 3).  This is the unit of work that
    shards over a device mesh: edge subsets produce *additive*
    contributions, so a psum over per-shard results reconstructs the
    global system exactly (parallel/solver_sharded.py).
    """
    Ti = p[edges.i]
    Tj = p[edges.j]
    r = edge_residual(Ti, Tj, edges.meas)
    Ji, Jj = jax.vmap(_edge_jacobians)(Ti, Tj, edges.meas)

    w = edges.mask[:, None, None].astype(p.dtype)
    info = edges.info * w
    Hii = jnp.einsum("eki,ekl,elj->eij", Ji, info, Ji)
    Hjj = jnp.einsum("eki,ekl,elj->eij", Jj, info, Jj)
    Hij = jnp.einsum("eki,ekl,elj->eij", Ji, info, Jj)
    bi = jnp.einsum("eki,ekl,el->ei", Ji, info, r)
    bj = jnp.einsum("eki,ekl,el->ei", Jj, info, r)

    H = jnp.zeros((n, n, 3, 3), p.dtype)
    H = H.at[edges.i, edges.i].add(Hii)
    H = H.at[edges.j, edges.j].add(Hjj)
    H = H.at[edges.i, edges.j].add(Hij)
    H = H.at[edges.j, edges.i].add(jnp.swapaxes(Hij, -1, -2))
    b = jnp.zeros((n, 3), p.dtype)
    b = b.at[edges.i].add(bi)
    b = b.at[edges.j].add(bj)
    return H, b


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize(
    poses,
    edges: EdgeList,
    prior_information: float = 100.0,
    iterations: int = 20,
    damping: float = 1e-6,
):
    """Gauss-Newton over all node poses.

    poses: (N, 3).  Node 0 is softly pinned with `prior_information * I`
    at its initial value (the iSAM bridge's prior factor,
    ndt_offline_mapper.h:61).  Returns (poses, final_chi2).
    """
    n = poses.shape[0]
    dim = 3 * n
    prior_pose = poses[0]

    def chi2(p):
        r = edge_residual(p[edges.i], p[edges.j], edges.meas)
        per = jnp.einsum("ei,eij,ej->e", r, edges.info, r)
        c = jnp.sum(jnp.where(edges.mask, per, 0.0))
        rp = p[0] - prior_pose
        rp = rp.at[2].set(se2.normalize_angle(rp[2]))
        return c + prior_information * jnp.dot(rp, rp)

    def gn_step(p, _):
        H, b = assemble_normal_equations(p, edges, n)

        # Prior on node 0.
        rp = p[0] - prior_pose
        rp = rp.at[2].set(se2.normalize_angle(rp[2]))
        H = H.at[0, 0].add(prior_information * jnp.eye(3, dtype=p.dtype))
        b = b.at[0].add(prior_information * rp)

        Hd = H.transpose(0, 2, 1, 3).reshape(dim, dim)
        bd = b.reshape(dim)
        Hd = Hd + damping * jnp.eye(dim, dtype=p.dtype)
        # Guard unconstrained (inactive) nodes: unit diagonal.
        diag = jnp.diagonal(Hd)
        Hd = Hd + jnp.diag(jnp.where(diag < 1e-8, 1.0, 0.0))

        delta = -jnp.linalg.solve(Hd, bd).reshape(n, 3)
        p_new = p + delta
        p_new = p_new.at[:, 2].set(se2.normalize_angle(p_new[:, 2]))
        return p_new, None

    poses_out, _ = jax.lax.scan(gn_step, poses, None, length=iterations)
    return poses_out, chi2(poses_out)
