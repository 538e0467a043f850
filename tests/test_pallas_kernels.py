"""Pallas kernel equivalence vs the jnp analytic implementation
(interpret mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import MatcherParams
from ndt_feature_graph_tpu.ops import d2d_analytic, pallas_kernels


def random_pairs(key, n=70, k=25):
    ks = jax.random.split(key, 6)
    mu = 0.5 * jax.random.normal(ks[0], (n, k, 2))
    # SPD covariances.
    L = 0.2 * jax.random.normal(ks[1], (n, k, 2, 2))
    Sig = L @ jnp.swapaxes(L, -1, -2) + 0.05 * jnp.eye(2)
    m_rot = 3.0 * jax.random.normal(ks[2], (n, 1, 2))
    Lc = 0.2 * jax.random.normal(ks[3], (n, 1, 2, 2))
    Crot = Lc @ jnp.swapaxes(Lc, -1, -2) + 0.02 * jnp.eye(2)
    ok = jax.random.bernoulli(ks[4], 0.7, (n, k))
    return mu, Sig, m_rot, Crot, ok


def test_pallas_matches_jnp_reference():
    mu, Sig, m_rot, Crot, ok = random_pairs(jax.random.PRNGKey(0))
    lfd1, lfd2 = 1.0, 0.05

    # jnp reference via the verified analytic implementation.
    s, g, H = d2d_analytic._pair_fgh(
        mu, Sig, jnp.broadcast_to(m_rot, mu.shape),
        jnp.broadcast_to(Crot, Sig.shape), lfd1, lfd2,
    )
    okf = ok.astype(jnp.float32)
    f_ref = jnp.sum(s * okf)
    g_ref = jnp.sum(g * okf[..., None], axis=(0, 1))
    H_ref = jnp.sum(H * okf[..., None, None], axis=(0, 1))

    f, g2, H2 = pallas_kernels.pair_fgh_reduce(
        mu, Sig, m_rot, Crot, ok, lfd1, lfd2, interpret=True
    )
    np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g2), np.asarray(g_ref), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(H2), np.asarray(H_ref), rtol=2e-3, atol=1e-3
    )


def test_pallas_padding_is_masked():
    """Sizes that don't fill a tile: padded lanes contribute zero."""
    mu, Sig, m_rot, Crot, ok = random_pairs(
        jax.random.PRNGKey(1), n=3, k=7
    )
    f, g, H = pallas_kernels.pair_fgh_reduce(
        mu, Sig, m_rot, Crot, ok, 1.0, 0.05, interpret=True
    )
    s, gg, HH = d2d_analytic._pair_fgh(
        mu, Sig, jnp.broadcast_to(m_rot, mu.shape),
        jnp.broadcast_to(Crot, Sig.shape), 1.0, 0.05,
    )
    okf = ok.astype(jnp.float32)
    np.testing.assert_allclose(
        float(f), float(jnp.sum(s * okf)), rtol=1e-4
    )
