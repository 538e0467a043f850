"""Analytic D2D derivatives: score + gradient + Hessian in ONE pass
over cell pairs.

This is the TPU `derivativesNDT` (perception_oru's hand-derived
Magnusson-2009 derivatives, the hot loop of the reference's Newton
iteration — SURVEY.md §3.1).  The autodiff path (ops/d2d.py) evaluates
the cost ~4x per Newton trial (value + reverse pass + 3 forward-over-
reverse columns); this closed form computes all three quantities in a
single fused sweep.  ops/d2d.py's autodiff remains the verification
oracle: tests/test_d2d_analytic.py checks agreement to float tolerance.

Derivation (SE(2) left-increment p = (dx, dy, dtheta) at evaluation
point d, per pair with T0-pretransformed source gaussians (m, C) and
target (mu2, S2)):
    R = R(dtheta), R' = dR/dtheta
    mu  = R m + t - mu2,         Sig = R C R^T + S2,   A = Sig^{-1}
    q   = mu^T A mu,             s = -d1 exp(-(d2/2) q)
    J   = [e_x, e_y, R' m]                        (dmu/dp)
    S   = R' C R^T + R C R'^T                     (dSig/dtheta)
    A_t = -A S A                                  (dA/dtheta)
    q_i   = 2 mu^T A J_i + [i==theta] mu^T A_t mu
    q_ij  = 2 J_j^T A J_i
          + [j==t] 2 mu^T A_t J_i + [i==t] 2 mu^T A_t J_j
          + [i==j==t] (2 mu^T A mu_tt + 4 mu^T A_t mu_t + mu^T A_tt mu)
      with mu_tt = -R m,  S2d = -2 R C R^T + 2 R' C R'^T,
           A_tt = 2 A S A S A - A S2d A
    g_i  = d1 a e^{-aq} q_i,  H_ij = d1 a e^{-aq} (q_ij - a q_i q_j),
      a = d2/2.
"""

from __future__ import annotations

import jax.numpy as jnp

from ndt_feature_graph_tpu.config import MatcherParams, NDTMapParams
from ndt_feature_graph_tpu.ops.d2d import DenseTarget
from ndt_feature_graph_tpu.ops.ndt_map import CellList


def _inv2(Sig):
    a = Sig[..., 0, 0]
    b = Sig[..., 0, 1]
    c = Sig[..., 1, 1]
    det = jnp.maximum(a * c - b * b, 1e-12)
    inv_det = 1.0 / det
    A = jnp.stack(
        [
            jnp.stack([c * inv_det, -b * inv_det], -1),
            jnp.stack([-b * inv_det, a * inv_det], -1),
        ],
        -2,
    )
    return A


def _pair_fgh(mu, Sig, m_rot, Crot, lfd1, lfd2):
    """Per-pair (score, grad (3,), hess (3, 3)) — batched over leading
    dims.

    mu: (..., 2) mean difference; Sig: (..., 2, 2) summed covariance;
    m_rot: the rotation-dependent part of the moved source mean at the
    evaluation point (moved_mean - d_translation — the left-increment's
    rotation acts on everything except d's own translation);
    Crot = rotated source cov.  Derivatives use the rotation generator
    G = [[0,-1],[1,0]] applied to m_rot/Crot.
    """
    A = _inv2(Sig)
    Amu = jnp.einsum("...ij,...j->...i", A, mu)
    q = jnp.einsum("...i,...i->...", mu, Amu)

    # Rotation generator applied at the evaluation point:
    # d/dtheta (R m) = G (R m); d/dtheta (R C R^T) = G K + K G^T, K=RCR^T.
    gx, gy = -m_rot[..., 1], m_rot[..., 0]          # G (R m)
    mu_t = jnp.stack([gx, gy], -1)
    mu_tt = -m_rot

    # S = G K + K G^T with K = Crot (2x2 symmetric).
    k00 = Crot[..., 0, 0]
    k01 = Crot[..., 0, 1]
    k11 = Crot[..., 1, 1]
    # G K = [[-k10, -k11], [k00, k01]]
    S = jnp.stack(
        [
            jnp.stack([-2.0 * k01, k00 - k11], -1),
            jnp.stack([k00 - k11, 2.0 * k01], -1),
        ],
        -2,
    )
    # S2d = d/dtheta S = G S + S G^T = -2 K + 2 G K G^T.
    # G K G^T = [[k11, -k01], [-k01, k00]]
    GKG = jnp.stack(
        [
            jnp.stack([k11, -k01], -1),
            jnp.stack([-k01, k00], -1),
        ],
        -2,
    )
    S2d = -2.0 * Crot + 2.0 * GKG

    ASA_mu = jnp.einsum(
        "...ij,...jk,...k->...i", A, S, Amu
    )  # A S A mu
    # q_i for translations: 2 (A mu)_i
    q_x = 2.0 * Amu[..., 0]
    q_y = 2.0 * Amu[..., 1]
    q_t = 2.0 * jnp.einsum("...i,...i->...", Amu, mu_t) - jnp.einsum(
        "...i,...i->...", mu, ASA_mu
    )
    q_grad = jnp.stack([q_x, q_y, q_t], -1)

    # Hessian of q.
    # translations block: 2 A
    h_xx = 2.0 * A[..., 0, 0]
    h_xy = 2.0 * A[..., 0, 1]
    h_yy = 2.0 * A[..., 1, 1]
    # x/theta & y/theta: 2 e_i^T A mu_t + 2 e_i^T A_t mu
    #   A_t mu = -A S A mu = -ASA_mu
    A_mu_t = jnp.einsum("...ij,...j->...i", A, mu_t)
    h_xt = 2.0 * A_mu_t[..., 0] - 2.0 * ASA_mu[..., 0]
    h_yt = 2.0 * A_mu_t[..., 1] - 2.0 * ASA_mu[..., 1]
    # theta/theta:
    #   2 mu_t^T A mu_t + 2 mu^T A mu_tt + 4 mu^T A_t mu_t
    #   + mu^T A_tt mu,  A_tt = 2 A S A S A - A S2d A
    t1 = 2.0 * jnp.einsum("...i,...i->...", mu_t, A_mu_t)
    t2 = 2.0 * jnp.einsum("...i,...i->...", Amu, mu_tt)
    t3 = -4.0 * jnp.einsum("...i,...i->...", ASA_mu, mu_t)
    # A_tt mu = 2 A S A S A mu - A S2d A mu
    ASASA_mu = jnp.einsum("...ij,...jk,...k->...i", A, S, ASA_mu)
    AS2A_mu = jnp.einsum("...ij,...jk,...k->...i", A, S2d, Amu)
    t4 = jnp.einsum(
        "...i,...i->...", mu, 2.0 * ASASA_mu - AS2A_mu
    )
    h_tt = t1 + t2 + t3 + t4

    q_hess = jnp.stack(
        [
            jnp.stack([h_xx, h_xy, h_xt], -1),
            jnp.stack([h_xy, h_yy, h_yt], -1),
            jnp.stack([h_xt, h_yt, h_tt], -1),
        ],
        -2,
    )

    a = 0.5 * lfd2
    E = jnp.exp(-a * q)
    s = -lfd1 * E
    g = (lfd1 * a) * E[..., None] * q_grad
    H = (lfd1 * a) * E[..., None, None] * (
        q_hess
        - a * q_grad[..., :, None] * q_grad[..., None, :]
    )
    return s, g, H


def _fgh_reduce(d, moved, t_means, t_covs, t_valid, m: MatcherParams):
    """Shared reduction: per-pair fgh over gathered windows, masked sum."""
    mu = moved.means[:, None, :] - t_means
    Sig = moved.covs[:, None, :, :] + t_covs
    m_rot = (moved.means - d[:2])[:, None, :]
    ok = t_valid & moved.mask[:, None]

    if m.use_pallas:
        from ndt_feature_graph_tpu.ops import pallas_kernels

        return pallas_kernels.pair_fgh_reduce(
            mu, Sig, m_rot, moved.covs[:, None, :, :], ok,
            m.lfd1, m.lfd2,
        )

    s, g, H = _pair_fgh(
        mu, Sig, m_rot, moved.covs[:, None, :, :], m.lfd1, m.lfd2
    )
    okf = ok.astype(jnp.float32)
    f = jnp.sum(s * okf)
    grad = jnp.sum(g * okf[..., None], axis=(0, 1))
    hess = jnp.sum(H * okf[..., None, None], axis=(0, 1))
    return f, grad, hess


def fgh_dense(
    d,
    T0,
    src: CellList,
    tgt: DenseTarget,
    map_params: NDTMapParams,
    m: MatcherParams,
):
    """Analytic (score, grad, Hessian) of the dense D2D cost — exactly
    ops.d2d.d2d_score_dense's value/derivatives in one pass."""
    from ndt_feature_graph_tpu.ops.d2d import _apply_increment, gather_windows

    T = _apply_increment(d, T0)
    moved = src.transform(T)
    n = m.n_neighbours

    rel = (moved.means - tgt.origin) / map_params.resolution
    ix0 = jnp.floor(rel[..., 0]).astype(jnp.int32)
    iy0 = jnp.floor(rel[..., 1]).astype(jnp.int32)
    t_means, t_covs, t_valid = gather_windows(tgt, iy0, ix0, n)
    return _fgh_reduce(d, moved, t_means, t_covs, t_valid, m)


def fgh_dense_flat(
    d,
    T0,
    src: CellList,
    packed_flat,
    origin,
    row_offset,
    h: int,
    w: int,
    resolution: float,
    m: MatcherParams,
):
    """fgh_dense against a target selected by `row_offset` out of a
    FLAT packed bank (N*H*W, 8) — the batched-pair form: under vmap the
    window gather indexes the shared bank directly instead of first
    materializing a per-pair (H*W, 8) target copy (see
    d2d.gather_windows_flat).  Numerically identical to fgh_dense on
    the corresponding DenseTarget."""
    from ndt_feature_graph_tpu.ops.d2d import (
        _apply_increment, gather_windows_flat,
    )

    T = _apply_increment(d, T0)
    moved = src.transform(T)
    n = m.n_neighbours

    rel = (moved.means - origin) / resolution
    ix0 = jnp.floor(rel[..., 0]).astype(jnp.int32)
    iy0 = jnp.floor(rel[..., 1]).astype(jnp.int32)
    t_means, t_covs, t_valid = gather_windows_flat(
        packed_flat, h, w, iy0, ix0, n, row_offset
    )
    return _fgh_reduce(d, moved, t_means, t_covs, t_valid, m)


def fgh_paired(d, T0, src: CellList, tgt: CellList, m: MatcherParams):
    """Analytic (score, grad, Hessian) of the correspondence-restricted
    cost (ops.d2d.d2d_score_paired)."""
    from ndt_feature_graph_tpu.ops.d2d import _apply_increment

    T = _apply_increment(d, T0)
    moved = src.transform(T)
    mu = moved.means - tgt.means
    Sig = moved.covs + tgt.covs
    s, g, H = _pair_fgh(
        mu, Sig, moved.means - d[:2], moved.covs, m.lfd1, m.lfd2
    )
    ok = (src.mask & tgt.mask).astype(jnp.float32)
    return (
        jnp.sum(s * ok),
        jnp.sum(g * ok[..., None], axis=0),
        jnp.sum(H * ok[..., None, None], axis=0),
    )


def fgh_mahalanobis(d, Q):
    """(d^T Q d, (Q+Q^T) d, Q+Q^T) — the soft-constraint terms
    (fusion.h:11-32)."""
    Qs = Q + Q.T
    return d @ Q @ d, Qs @ d, Qs


def fgh_dense_flat_batch(
    d_b,            # (B, 3) per-lane increments
    T0_b,           # (B, 3) per-lane initial transforms
    src_b,          # CellList batched (B, N, ...)
    packed_flat,    # (R, 8) shared flat packed bank
    origins,        # (B, 2) per-lane target origins
    row_offsets,    # (B,) int32 per-lane bank row offsets
    h: int,
    w: int,
    resolution: float,
    m: MatcherParams,
):
    """Batched fgh_dense_flat for B lanes with ONE unbatched gather.

    vmap(fgh_dense_flat) makes the window gather's indices carry a
    batch dim over a shared operand; on TPU that lowering materializes
    a per-lane broadcast of the WHOLE bank (seen round 4: a
    f32[128, 5.12M, 8] = 20 GB remat allocation killed the B=128 fleet
    compile).  Here the per-lane geometry runs under vmap (cheap
    elementwise math) but the gather is issued manually with FLATTENED
    1-D indices — a plain gather, no operand batching dims.

    Returns (f (B,), g (B, 3), H (B, 3, 3)).
    """
    import jax

    from ndt_feature_graph_tpu.ops.d2d import _apply_increment

    n = m.n_neighbours
    win = 2 * n + 1
    k = win * win

    def geom(d, T0, src, origin):
        T = _apply_increment(d, T0)
        moved = src.transform(T)
        rel = (moved.means - origin) / resolution
        ix0 = jnp.floor(rel[..., 0]).astype(jnp.int32)
        iy0 = jnp.floor(rel[..., 1]).astype(jnp.int32)
        return moved, iy0, ix0

    moved, iy0, ix0 = jax.vmap(geom)(d_b, T0_b, src_b, origins)

    offs = jnp.arange(-n, n + 1)
    dy = jnp.repeat(offs, win)
    dx = jnp.tile(offs, win)
    iy = iy0[..., None] + dy            # (B, N, K)
    ix = ix0[..., None] + dx
    inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    flat = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    linear = (row_offsets[:, None, None] + flat).reshape(-1)
    rows = packed_flat[linear].reshape(flat.shape + (8,))  # (B,N,K,8)

    t_means = rows[..., 0:2]
    c00 = rows[..., 2]
    c01 = rows[..., 3]
    c11 = rows[..., 4]
    t_covs = jnp.stack(
        [
            jnp.stack([c00, c01], -1),
            jnp.stack([c01, c11], -1),
        ],
        -2,
    )
    t_valid = (rows[..., 5] > 0.5) & inb

    mu = moved.means[..., None, :] - t_means              # (B,N,K,2)
    Sig = moved.covs[..., None, :, :] + t_covs            # (B,N,K,2,2)
    m_rot = (moved.means - d_b[:, None, :2])[..., None, :]
    ok = t_valid & moved.mask[..., None]

    s, g, H = _pair_fgh(
        mu, Sig, m_rot, moved.covs[..., None, :, :], m.lfd1, m.lfd2
    )
    okf = ok.astype(jnp.float32)
    f = jnp.sum(s * okf, axis=(1, 2))
    grad = jnp.sum(g * okf[..., None], axis=(1, 2))
    hess = jnp.sum(H * okf[..., None, None], axis=(1, 2))
    return f, grad, hess


def fgh_dense_window_batch(
    d_b,            # (B, 3)
    T0_b,           # (B, 3)
    src_b,          # CellList batched (B, N, ...)
    wide_flat,      # (R, (2n+1)*8) win-row table (d2d.build_window_tables)
    cell0,          # (B, 2) int32 window-corner cell coords (wx0, wy0)
    origins,        # (B, 2) GRID origins (world)
    wh: int,        # window height in cells
    ww: int,        # window width in cells
    resolution: float,
    m: MatcherParams,
    rel_means: bool = False,
    row_offsets=None,
):
    """fgh_dense_wide_batch against per-stream WINDOW win-row tables
    (d2d.build_window_tables): gather indices are window-relative
    (global cell minus `cell0`), rows outside the window are masked
    (identical to off-grid when the window covers the sensor disc —
    see config.gather_window_cells), and with rel_means=True the
    gathered (possibly bf16) cell-relative means are upcast to f32 and
    re-anchored at their cells' world centres before the pair math.

    Returns (f (B,), g (B, 3), H (B, 3, 3)).
    """
    import jax

    from ndt_feature_graph_tpu.ops.d2d import _apply_increment

    n = m.n_neighbours
    win = 2 * n + 1
    wp = ww + 2 * n
    b = d_b.shape[0]
    if row_offsets is None:
        # Default: lane b owns table slab b (the fleet shape).  Pair
        # registration against a stacked NODE bank passes explicit
        # offsets (ref_index * stride) instead — many lanes may read
        # the same slab (graph/links.refine_links_d2d).
        row_offsets = jnp.arange(b, dtype=jnp.int32) * (wh * wp)

    def geom(d, T0, src, origin):
        T = _apply_increment(d, T0)
        moved = src.transform(T)
        rel = (moved.means - origin) / resolution
        ix0 = jnp.floor(rel[..., 0]).astype(jnp.int32)
        iy0 = jnp.floor(rel[..., 1]).astype(jnp.int32)
        return moved, iy0, ix0

    moved, iy0g, ix0g = jax.vmap(geom)(d_b, T0_b, src_b, origins)
    iy0 = iy0g - cell0[:, 1:2]                      # window-relative
    ix0 = ix0g - cell0[:, 0:1]

    offs = jnp.arange(-n, n + 1)
    iy = iy0[..., None] + offs                       # (B, N, win)
    inb_y = (iy >= 0) & (iy < wh)
    jx0 = ix0 + n                                    # padded column
    inb_x0 = (jx0 >= 0) & (jx0 < wp)                 # (B, N)
    flat = jnp.clip(iy, 0, wh - 1) * wp + jnp.clip(jx0, 0, wp - 1)[
        ..., None
    ]
    linear = (row_offsets[:, None, None] + flat).reshape(-1)
    rows = wide_flat[linear].reshape(
        flat.shape + (win * 8,)
    )                                                # (B, N, win, win*8)
    rows = rows.reshape(flat.shape + (win, 8))       # (B,N,dy,dx,8)
    k = win * win
    rows = rows.reshape(rows.shape[:2] + (k, 8))     # (B, N, K, 8)
    rows = rows.astype(jnp.float32)

    t_means = rows[..., 0:2]
    if rel_means:
        # Re-anchor cell-relative means: element k of a window sits at
        # global cell (iy0g + dy, ix0g + dx), dy = k // win - n,
        # dx = k % win - n.
        dxk = (jnp.arange(k) % win - n).astype(jnp.float32)
        dyk = (jnp.arange(k) // win - n).astype(jnp.float32)
        cxk = (
            origins[:, None, None, 0]
            + (ix0g[..., None].astype(jnp.float32) + dxk + 0.5)
            * resolution
        )
        cyk = (
            origins[:, None, None, 1]
            + (iy0g[..., None].astype(jnp.float32) + dyk + 0.5)
            * resolution
        )
        t_means = t_means + jnp.stack([cxk, cyk], -1)
    c00 = rows[..., 2]
    c01 = rows[..., 3]
    c11 = rows[..., 4]
    t_covs = jnp.stack(
        [
            jnp.stack([c00, c01], -1),
            jnp.stack([c01, c11], -1),
        ],
        -2,
    )
    inb = (
        jnp.repeat(inb_y, win, axis=-1)              # (B, N, K) dy-major
        & inb_x0[..., None]
    )
    t_valid = (rows[..., 5] > 0.5) & inb

    mu = moved.means[..., None, :] - t_means
    Sig = moved.covs[..., None, :, :] + t_covs
    m_rot = (moved.means - d_b[:, None, :2])[..., None, :]
    ok = t_valid & moved.mask[..., None]

    s, g, H = _pair_fgh(
        mu, Sig, m_rot, moved.covs[..., None, :, :], m.lfd1, m.lfd2
    )
    okf = ok.astype(jnp.float32)
    f = jnp.sum(s * okf, axis=(1, 2))
    grad = jnp.sum(g * okf[..., None], axis=(1, 2))
    hess = jnp.sum(H * okf[..., None, None], axis=(1, 2))
    return f, grad, hess


def fgh_dense_block_batch(
    d_b,            # (B, 3)
    T0_b,           # (B, 3)
    src_b,          # CellList batched (B, N, ...)
    block_flat,     # (R, (2n+1)^2*8) win-block table
    cell0,          # (B, 2) int32 window-corner cell coords
    origins,        # (B, 2) grid origins (world)
    wc: int,        # window side in cells
    resolution: float,
    m: MatcherParams,
    rel_means: bool = False,
):
    """fgh against WIN-BLOCK window tables
    (d2d.build_window_block_tables): ONE gathered row per source cell
    carries its whole (2n+1)^2 neighbourhood — the minimum possible
    transaction count for the window association (the gather is
    row-transaction-bound, BENCH_NOTES rounds 4-5).  Masking: the
    doubly-padded table gives every centre whose window intersects the
    window slice an exact row with per-cell validity; centres outside
    the padded bounds have fully-off-window neighbourhoods and are
    masked here.  With rel_means=True the (bf16) cell-relative means
    are upcast and re-anchored in f32 after the gather.

    Returns (f (B,), g (B, 3), H (B, 3, 3)).
    """
    import jax

    from ndt_feature_graph_tpu.ops.d2d import _apply_increment

    n = m.n_neighbours
    win = 2 * n + 1
    hp = wc + 2 * n
    k = win * win
    b = d_b.shape[0]
    row_offsets = jnp.arange(b, dtype=jnp.int32) * (hp * hp)

    def geom(d, T0, src, origin):
        T = _apply_increment(d, T0)
        moved = src.transform(T)
        rel = (moved.means - origin) / resolution
        ix0 = jnp.floor(rel[..., 0]).astype(jnp.int32)
        iy0 = jnp.floor(rel[..., 1]).astype(jnp.int32)
        return moved, iy0, ix0

    moved, iy0g, ix0g = jax.vmap(geom)(d_b, T0_b, src_b, origins)
    iyp = iy0g - cell0[:, 1:2] + n                  # padded coords
    jxp = ix0g - cell0[:, 0:1] + n
    inb = (iyp >= 0) & (iyp < hp) & (jxp >= 0) & (jxp < hp)  # (B, N)
    flat = jnp.clip(iyp, 0, hp - 1) * hp + jnp.clip(jxp, 0, hp - 1)
    linear = (row_offsets[:, None] + flat).reshape(-1)
    rows = block_flat[linear].reshape(
        flat.shape + (k, 8)
    ).astype(jnp.float32)                           # (B, N, K, 8)

    t_means = rows[..., 0:2]
    if rel_means:
        dxk = (jnp.arange(k) % win - n).astype(jnp.float32)
        dyk = (jnp.arange(k) // win - n).astype(jnp.float32)
        cxk = (
            origins[:, None, None, 0]
            + (ix0g[..., None].astype(jnp.float32) + dxk + 0.5)
            * resolution
        )
        cyk = (
            origins[:, None, None, 1]
            + (iy0g[..., None].astype(jnp.float32) + dyk + 0.5)
            * resolution
        )
        t_means = t_means + jnp.stack([cxk, cyk], -1)
    c00 = rows[..., 2]
    c01 = rows[..., 3]
    c11 = rows[..., 4]
    t_covs = jnp.stack(
        [
            jnp.stack([c00, c01], -1),
            jnp.stack([c01, c11], -1),
        ],
        -2,
    )
    t_valid = (rows[..., 5] > 0.5) & inb[..., None]

    mu = moved.means[..., None, :] - t_means
    Sig = moved.covs[..., None, :, :] + t_covs
    m_rot = (moved.means - d_b[:, None, :2])[..., None, :]
    ok = t_valid & moved.mask[..., None]

    s, g, H = _pair_fgh(
        mu, Sig, m_rot, moved.covs[..., None, :, :], m.lfd1, m.lfd2
    )
    okf = ok.astype(jnp.float32)
    f = jnp.sum(s * okf, axis=(1, 2))
    grad = jnp.sum(g * okf[..., None], axis=(1, 2))
    hess = jnp.sum(H * okf[..., None, None], axis=(1, 2))
    return f, grad, hess


def fgh_dense_wide_batch(
    d_b,            # (B, 3)
    T0_b,           # (B, 3)
    src_b,          # CellList batched (B, N, ...)
    wide_flat,      # (R, (2n+1)*8) win-row table (d2d.build_wide_table)
    origins,        # (B, 2)
    h: int,
    w: int,
    resolution: float,
    m: MatcherParams,
    row_offsets=None,   # (B,) explicit table-slab offsets (units of
                        # wide_row_stride); None = lane b -> slab b
):
    """fgh_dense_flat_batch against the WIN-ROW table: each source
    cell's (2n+1)^2 window is (2n+1) gathered win-rows (vertical
    neighbours), each already carrying the (2n+1) horizontal cells —
    (2n+1)x fewer gather rows than the 8-channel table, and the gather
    is row-transaction-bound (see d2d.build_wide_table).  Numerically
    identical to fgh_dense_flat_batch everywhere including the
    horizontal edge bands: the table's padded column layout gives
    every centre column whose window intersects the grid an exact
    win-row with per-cell validity (tests/test_d2d_analytic.py::
    test_wide_batch_matches_flat_batch covers off-grid centres).

    Per-lane row offsets default to lane b -> slab b (stride =
    d2d.wide_row_stride(h, w, n) = h*(w+2n)); pair registration
    against a stacked node bank passes explicit offsets
    (ref_index * stride) so many lanes can read one slab.  This is
    the full-grid special case of fgh_dense_window_batch (cell0 = 0),
    to which it delegates.

    Returns (f (B,), g (B, 3), H (B, 3, 3)).
    """
    b = d_b.shape[0]
    cell0 = jnp.zeros((b, 2), jnp.int32)
    return fgh_dense_window_batch(
        d_b, T0_b, src_b, wide_flat, cell0, origins, h, w,
        resolution, m, rel_means=False, row_offsets=row_offsets,
    )
