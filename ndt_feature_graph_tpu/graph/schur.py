"""Blocked Schur-complement pose-graph solve.

The scaling path past dense Cholesky (BASELINE.md north star:
"distributed Schur-complement bundle adjustment"): nodes partition into
contiguous keyframe blocks; nodes touched by cross-block edges form the
*separator*.  Interiors of different blocks never couple directly (any
coupling edge would make both endpoints separators), so the interior
system is block-diagonal and each block eliminates independently —
the embarrassingly-parallel step that shards over the mesh
(parallel/schur_sharded.py).  The reduced separator system
  (H_SS - sum_b H_SI_b H_II_b^{-1} H_IS_b) dS = b_S - sum_b ...
is small (loop-closure endpoints + block boundaries), solved
replicated, then interiors back-substitute in parallel.

Exactness: identical to the dense solve up to float tolerance
(tests/test_schur.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.graph import optimize as opt

from ndt_feature_graph_tpu.graph.optimize import f32_matmul as _f32


class Partition(NamedTuple):
    """Static block structure (host-precomputed from the edge list)."""

    assign: jnp.ndarray     # (N,) int32 node -> block
    sep_idx: jnp.ndarray    # (S,) separator node ids (padded)
    sep_mask: jnp.ndarray   # (S,) bool
    int_idx: jnp.ndarray    # (B, I) interior node ids per block (padded)
    int_mask: jnp.ndarray   # (B, I) bool
    n_blocks: int


def make_partition(n_nodes, edges: opt.EdgeList, n_blocks) -> Partition:
    """Contiguous keyframe partition + separator extraction
    (host-side, cheap)."""
    ei = np.asarray(edges.i)
    ej = np.asarray(edges.j)
    em = np.asarray(edges.mask)
    assign = np.minimum(
        np.arange(n_nodes) * n_blocks // n_nodes, n_blocks - 1
    )
    cross = (assign[ei] != assign[ej]) & em
    sep = np.zeros(n_nodes, bool)
    sep[ei[cross]] = True
    sep[ej[cross]] = True
    sep[0] = True  # prior anchor lives in the separator system

    sep_ids = np.nonzero(sep)[0]
    s_cap = max(len(sep_ids), 1)
    sep_idx = np.zeros(s_cap, np.int32)
    sep_idx[: len(sep_ids)] = sep_ids
    sep_mask = np.zeros(s_cap, bool)
    sep_mask[: len(sep_ids)] = True

    int_lists = [
        np.nonzero((assign == b) & ~sep)[0] for b in range(n_blocks)
    ]
    i_cap = max(max((len(x) for x in int_lists), default=1), 1)
    int_idx = np.zeros((n_blocks, i_cap), np.int32)
    int_mask = np.zeros((n_blocks, i_cap), bool)
    for b, ids in enumerate(int_lists):
        int_idx[b, : len(ids)] = ids
        int_mask[b, : len(ids)] = True
    return Partition(
        assign=jnp.asarray(assign, jnp.int32),
        sep_idx=jnp.asarray(sep_idx),
        sep_mask=jnp.asarray(sep_mask),
        int_idx=jnp.asarray(int_idx),
        int_mask=jnp.asarray(int_mask),
        n_blocks=n_blocks,
    )


def _gather_block(H, rows, cols):
    """H (n, n, 3, 3) -> dense (3R, 3C) for index lists rows/cols."""
    sub = H[rows][:, cols]                      # (R, C, 3, 3)
    r, c = sub.shape[0], sub.shape[1]
    return sub.transpose(0, 2, 1, 3).reshape(3 * r, 3 * c)


def block_eliminate(H, b_vec, part: Partition, damping):
    """Per-block interior elimination.  Returns
    (schur_contrib (3S, 3S), rhs_contrib (3S,), solve context)."""
    sep = part.sep_idx

    def one_block(iidx, imask):
        mi = jnp.repeat(imask, 3)
        H_II = _gather_block(H, iidx, iidx)
        # Masked-out rows/cols -> identity (no effect on Schur term).
        eye = jnp.eye(H_II.shape[0], dtype=H.dtype)
        H_II = jnp.where(
            mi[:, None] & mi[None, :], H_II, eye
        ) + damping * eye
        H_IS = _gather_block(H, iidx, sep)
        H_IS = jnp.where(mi[:, None], H_IS, 0.0)
        b_I = jnp.where(mi, b_vec[iidx].reshape(-1), 0.0)

        H_II_inv_IS = jnp.linalg.solve(H_II, H_IS)
        H_II_inv_bI = jnp.linalg.solve(H_II, b_I)
        schur = H_IS.T @ H_II_inv_IS
        rhs = H_IS.T @ H_II_inv_bI
        return schur, rhs, (H_II, H_IS, b_I)

    return jax.vmap(one_block)(part.int_idx, part.int_mask)


@_f32
@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize_schur(
    poses,
    edges: opt.EdgeList,
    part: Partition,
    prior_information: float = 100.0,
    iterations: int = 20,
    damping: float = 1e-6,
):
    """GN with blocked Schur elimination; same contract as
    graph.optimize.optimize."""
    n = poses.shape[0]
    prior_pose = poses[0]
    sep = part.sep_idx
    ms = jnp.repeat(part.sep_mask, 3)

    def gn_step(p, _):
        H, b = opt.assemble_normal_equations(p, edges, n)
        rp = p[0] - prior_pose
        rp = rp.at[2].set(se2.normalize_angle(rp[2]))
        H = H.at[0, 0].add(
            prior_information * jnp.eye(3, dtype=p.dtype)
        )
        b = b.at[0].add(prior_information * rp)

        schur_c, rhs_c, ctx = block_eliminate(H, b, part, damping)

        H_SS = _gather_block(H, sep, sep)
        eye_s = jnp.eye(H_SS.shape[0], dtype=p.dtype)
        H_SS = jnp.where(
            ms[:, None] & ms[None, :], H_SS, eye_s
        ) + damping * eye_s
        b_S = jnp.where(ms, b[sep].reshape(-1), 0.0)

        S = H_SS - jnp.sum(schur_c, axis=0)
        r = b_S - jnp.sum(rhs_c, axis=0)
        # Guard any unconstrained separator dof.
        diag = jnp.diagonal(S)
        S = S + jnp.diag(jnp.where(diag < 1e-8, 1.0, 0.0))
        dS = -jnp.linalg.solve(S, r)

        # Back-substitution per block (parallel).
        H_II, H_IS, b_I = ctx

        def back(Hii, His, bi):
            return -jnp.linalg.solve(Hii, bi + His @ dS)

        dI = jax.vmap(back)(H_II, H_IS, b_I)    # (B, 3I)

        delta = jnp.zeros((n, 3), p.dtype)
        delta = delta.at[sep].add(
            jnp.where(ms, dS, 0.0).reshape(-1, 3)
        )
        bcount, icap = part.int_idx.shape
        dI_nodes = dI.reshape(bcount, icap, 3)
        delta = delta.at[part.int_idx.reshape(-1)].add(
            jnp.where(
                part.int_mask.reshape(-1, 1),
                dI_nodes.reshape(-1, 3),
                0.0,
            )
        )
        p_new = p + delta
        return p_new.at[:, 2].set(se2.normalize_angle(p_new[:, 2])), None

    poses_out, _ = jax.lax.scan(gn_step, poses, None, length=iterations)
    return poses_out
