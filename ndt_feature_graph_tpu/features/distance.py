"""Histogram distances (flirtlib's SymmetricChi2Distance<double>,
used at flirtlib.cpp:70 and ndt_feature_graph_opt.cpp:95).

flirtlib's HistogramDistance implementations normalize each histogram
to unit mass before comparing, which is what puts the reference's
matching thresholds (0.6 fuser / 0.4 flirtlib_ros+startup) on a [0, 1]
scale.  The same normalization happens here so those gate values are
directly transplantable.
"""

from __future__ import annotations

import jax.numpy as jnp


def symmetric_chi2_matrix(a, b, eps=1e-9):
    """Pairwise symmetric chi-square distance between histogram rows.

    a: (F1, D), b: (F2, D) -> (F1, F2) with
      d(p, q) = 0.5 * sum_i (p_i - q_i)^2 / (p_i + q_i)
    computed on sum-normalized histograms (flirtlib
    HistogramDistances.hpp semantics), so d in [0, 1].
    """
    an = a / jnp.maximum(jnp.sum(a, -1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.sum(b, -1, keepdims=True), eps)
    diff = an[:, None, :] - bn[None, :, :]
    s = an[:, None, :] + bn[None, :, :]
    return 0.5 * jnp.sum(diff * diff / (s + eps), axis=-1)
