"""Pallas TPU kernels for the hot compute paths.

`pair_fgh_reduce` fuses the per-pair analytic D2D derivative algebra
(ops/d2d_analytic._pair_fgh) with the masked reduction to
(score, gradient, Hessian) in a single VMEM-resident pass — the
`derivativesNDT` inner loop as one kernel: no intermediate (N, K, 3, 3)
Hessian tensor ever hits HBM.

Layout: all pair quantities are flattened component-wise to (M,)
vectors, padded to row tiles of (8, 128) f32, processed tile-by-tile
over a 1-D grid with accumulation in VMEM scratch, written out once.
Falls back to interpret mode off-TPU (tests).

MEASURED VERDICT (re-measured 2026-08-20 with READBACK-FORCED timing —
the round-2 numbers "34 vs 382,559 scans/s" were artifacts of
jax.block_until_ready being a NO-OP through the TPU relay, see
CLAUDE.md): on real Mosaic/v5e at the canonical op point the kernel is
at PARITY with the XLA-fused analytic path — fgh evaluation 0.25 ms
(pallas) vs 0.23 ms (XLA); full fuser.update 11.0 vs 10.7 ms/scan;
identical results to 1e-6.  Neither wins: the evaluation is
gather/work-bound, not op-overhead-bound, and the kernel covers only
the pair algebra after the same gathers.  `use_pallas` stays False
(no benefit, extra compile path); the kernel is retained as a verified
Mosaic reference (tests run it in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES  # elements per grid step


def _fgh_components(mu_x, mu_y, s00, s01, s11, mx, my, c00, c01, c11,
                    ok, lfd1, lfd2):
    """Elementwise per-pair (s, g0..g2, h00,h01,h02,h11,h12,h22).

    Mirrors d2d_analytic._pair_fgh with 2x2 algebra unrolled to scalar
    lanes (the kernel body — also reused by the reference jnp
    implementation in tests)."""
    det = jnp.maximum(s00 * s11 - s01 * s01, 1e-12)
    inv = 1.0 / det
    a00 = s11 * inv
    a01 = -s01 * inv
    a11 = s00 * inv

    amu_x = a00 * mu_x + a01 * mu_y
    amu_y = a01 * mu_x + a11 * mu_y
    q = mu_x * amu_x + mu_y * amu_y

    # mu_t = G m_rot = (-my, mx); mu_tt = -m_rot
    mt_x = -my
    mt_y = mx

    # S = G K + K G^T (K = Crot)
    S00 = -2.0 * c01
    S01 = c00 - c11
    S11 = 2.0 * c01
    # S2d = -2K + 2 G K G^T
    S2d00 = -2.0 * c00 + 2.0 * c11
    S2d01 = -4.0 * c01
    S2d11 = 2.0 * c00 - 2.0 * c11

    # ASA_mu = A S (A mu)
    sa_x = S00 * amu_x + S01 * amu_y
    sa_y = S01 * amu_x + S11 * amu_y
    asa_x = a00 * sa_x + a01 * sa_y
    asa_y = a01 * sa_x + a11 * sa_y

    q_x = 2.0 * amu_x
    q_y = 2.0 * amu_y
    q_t = 2.0 * (amu_x * mt_x + amu_y * mt_y) - (
        mu_x * asa_x + mu_y * asa_y
    )

    amt_x = a00 * mt_x + a01 * mt_y
    amt_y = a01 * mt_x + a11 * mt_y

    h_xx = 2.0 * a00
    h_xy = 2.0 * a01
    h_yy = 2.0 * a11
    h_xt = 2.0 * amt_x - 2.0 * asa_x
    h_yt = 2.0 * amt_y - 2.0 * asa_y

    t1 = 2.0 * (mt_x * amt_x + mt_y * amt_y)
    t2 = 2.0 * (amu_x * (-mx) + amu_y * (-my))
    t3 = -4.0 * (asa_x * mt_x + asa_y * mt_y)
    # A_tt mu = 2 A S (ASA_mu) - A S2d (A mu)
    sasa_x = S00 * asa_x + S01 * asa_y
    sasa_y = S01 * asa_x + S11 * asa_y
    asasa_x = a00 * sasa_x + a01 * sasa_y
    asasa_y = a01 * sasa_x + a11 * sasa_y
    s2a_x = S2d00 * amu_x + S2d01 * amu_y
    s2a_y = S2d01 * amu_x + S2d11 * amu_y
    as2a_x = a00 * s2a_x + a01 * s2a_y
    as2a_y = a01 * s2a_x + a11 * s2a_y
    t4 = mu_x * (2.0 * asasa_x - as2a_x) + mu_y * (
        2.0 * asasa_y - as2a_y
    )
    h_tt = t1 + t2 + t3 + t4

    alpha = 0.5 * lfd2
    E = jnp.exp(-alpha * q) * ok
    s = -lfd1 * E
    k = lfd1 * alpha * E
    g0 = k * q_x
    g1 = k * q_y
    g2 = k * q_t
    h00 = k * (h_xx - alpha * q_x * q_x)
    h01 = k * (h_xy - alpha * q_x * q_y)
    h02 = k * (h_xt - alpha * q_x * q_t)
    h11 = k * (h_yy - alpha * q_y * q_y)
    h12 = k * (h_yt - alpha * q_y * q_t)
    h22 = k * (h_tt - alpha * q_t * q_t)
    return s, g0, g1, g2, h00, h01, h02, h11, h12, h22


def _kernel(mu_x, mu_y, s00, s01, s11, mx, my, c00, c01, c11, ok,
            lfd_ref, out_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for k in range(16):
            acc[0, k] = jnp.float32(0.0)

    comps = _fgh_components(
        mu_x[:, :], mu_y[:, :], s00[:, :], s01[:, :], s11[:, :],
        mx[:, :], my[:, :], c00[:, :], c01[:, :], c11[:, :], ok[:, :],
        lfd_ref[0], lfd_ref[1],
    )
    for k, c in enumerate(comps):
        acc[0, k] += jnp.sum(c)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        for k in range(16):
            out_ref[0, k] = acc[0, k]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pair_fgh_reduce(
    mu, Sig, m_rot, Crot, ok, lfd1, lfd2, interpret: bool = False
):
    """Fused masked reduction of the pair derivatives.

    mu: (..., 2); Sig: (..., 2, 2); m_rot: (..., 2) broadcastable;
    Crot: (..., 2, 2) broadcastable; ok: (...) bool.
    Returns (f, g (3,), H (3, 3)).
    """
    shape = ok.shape
    m_rot = jnp.broadcast_to(m_rot, shape + (2,))
    Crot = jnp.broadcast_to(Crot, shape + (2, 2))

    def flat(x):
        v = x.reshape(-1)
        pad = (-v.shape[0]) % _TILE
        v = jnp.pad(v, (0, pad))
        return v.reshape(-1, _LANES)

    comps = [
        flat(mu[..., 0]), flat(mu[..., 1]),
        flat(Sig[..., 0, 0]), flat(Sig[..., 0, 1]), flat(Sig[..., 1, 1]),
        flat(m_rot[..., 0]), flat(m_rot[..., 1]),
        flat(Crot[..., 0, 0]), flat(Crot[..., 0, 1]),
        flat(Crot[..., 1, 1]),
        flat(ok.astype(jnp.float32)),
    ]
    rows = comps[0].shape[0]
    grid = rows // _SUBLANES
    lfd = jnp.asarray([lfd1, lfd2], jnp.float32)

    spec = pl.BlockSpec(
        (_SUBLANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[spec] * 11 + [
            pl.BlockSpec(memory_space=pltpu.SMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 16), jnp.float32)],
        interpret=interpret,
    )(*comps, lfd)

    f = out[0, 0]
    g = out[0, 1:4]
    H = jnp.array(
        [
            [out[0, 4], out[0, 5], out[0, 6]],
            [out[0, 5], out[0, 7], out[0, 8]],
            [out[0, 6], out[0, 8], out[0, 9]],
        ]
    )
    return f, g, H
