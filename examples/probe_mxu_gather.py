"""MXU one-hot-matmul gather vs direct row gather (VERDICT r4 item 6).

Question: can the registration window gather ride the (idle) MXU as a
one-hot matmul instead of the scatter/gather engine?  With the
win-block table (one row per source cell) the gather per Newton trial
is (B*N) rows from per-stream (hp, hp*C) tables.  The one-hot form
factors the 2-D row selection:

  stage 1 (MXU):  onehot_y (N, hp)  @  table (hp, hp*C)  -> (N, hp*C)
  stage 2 (VPU):  einsum('nxc,nx->nc', stage1.reshape(N,hp,C),
                  onehot_x) -> (N, C)

FLOPs per trial per stream: N*hp*hp*C*2 (stage 1) + N*hp*C*2 — at the
canonical op point (N=256, hp=140, C=200 bf16) stage 1 alone is
2.0 GFLOP/trial/stream, so the MXU must beat ~26 Mrows/s of the
direct gather (~0.35 ms/trial at B=32) on ~64 GFLOP/trial — i.e.
sustain >180 TFLOP/s bf16 incl. the (N, hp*C) = 14 MB/stream
intermediate traffic.  This probe measures both on one trial's shapes.

Run: timeout 1800 python examples/probe_mxu_gather.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

R = 8
TIME_REPS = 5
N = 256          # source cells per stream
HP = 140         # padded window side
C = 200          # win-block channels ((2n+1)^2 * 8)


def timed(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(TIME_REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / R


def main():
    rng = np.random.default_rng(0)
    for B in (8, 32):
        table = jnp.asarray(
            rng.normal(0, 1, (B, HP, HP * C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        iy = jnp.asarray(
            rng.integers(0, HP, (B, N)).astype(np.int32)
        )
        ix = jnp.asarray(
            rng.integers(0, HP, (B, N)).astype(np.int32)
        )

        @jax.jit
        def direct(table, iy, ix, k0):
            tf = table.reshape(B * HP * HP, C)

            def body(c, k):
                iyk = (iy + k) % HP
                off = jnp.arange(B, dtype=jnp.int32)[:, None] * HP * HP
                lin = (off + iyk * HP + ix).reshape(-1)
                rows = tf[lin].astype(jnp.float32)
                return c + jnp.sum(rows), None

            d, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                k0 + jnp.arange(R, dtype=jnp.int32),
            )
            return d

        @jax.jit
        def onehot(table, iy, ix, k0):
            def body(c, k):
                iyk = (iy + k) % HP
                ohy = jax.nn.one_hot(iyk, HP, dtype=jnp.bfloat16)
                # stage 1: (B, N, HP) @ (B, HP, HP*C) on the MXU
                s1 = jnp.einsum(
                    "bnh,bhm->bnm", ohy, table,
                    preferred_element_type=jnp.float32,
                )
                s1 = s1.reshape(B, N, HP, C)
                ohx = jax.nn.one_hot(ix, HP, dtype=jnp.float32)
                rows = jnp.einsum("bnxc,bnx->bnc", s1, ohx)
                return c + jnp.sum(rows), None

            d, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                k0 + jnp.arange(R, dtype=jnp.int32),
            )
            return d

        for name, fn in (("direct", direct), ("onehot", onehot)):
            try:
                t = timed(
                    lambda k0, fn=fn: fn(table, iy, ix, jnp.int32(k0)),
                    1,
                )
                rows_per_s = B * N / t
                print(
                    f"B={B:3d} {name:7s} {t*1e3:9.3f} ms/trial "
                    f"({rows_per_s/1e6:7.1f} Mrows/s)",
                    flush=True,
                )
            except Exception as e:
                print(f"B={B:3d} {name:7s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
