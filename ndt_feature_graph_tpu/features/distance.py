"""Histogram distances (flirtlib's SymmetricChi2Distance<double>,
used at flirtlib.cpp:70 and ndt_feature_graph_opt.cpp:95)."""

from __future__ import annotations

import jax.numpy as jnp


def symmetric_chi2_matrix(a, b, eps=1e-9):
    """Pairwise symmetric chi-square distance.

    a: (F1, D), b: (F2, D) -> (F1, F2) with
      d(p, q) = 0.5 * sum_i (p_i - q_i)^2 / (p_i + q_i).
    """
    diff = a[:, None, :] - b[None, :, :]
    s = a[:, None, :] + b[None, :, :]
    return 0.5 * jnp.sum(diff * diff / (s + eps), axis=-1)
