"""Microbench: gather formulations for batched pair registration on
the real chip (refine_links_d2d shapes).  Decides how the window gather
should be expressed — the TPU compiler rewrites big-table gathers in
ways that can broadcast the operand per batch lane (seen: a
f32[1024,840000,8] remat allocation = 27 GB for a 27 MB table).

Formulations at (B pairs, N=192 src cells, K=25 window rows), bank of
21 nodes x 200x200 grid:
  a) direct:   one gather from the flat f32 (N_bank*H*W, 8) table
  b) compact:  int32 index-grid gather (N_bank*H*W,) -> second gather
               from the compact (N_bank*Cmax, 8) valid-cell table
  c) per-pair: materialize (B, H*W, 8) per-pair tables first (round-3
               formulation)
Forced-readback timing per CLAUDE.md.
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

N_NODES = 21
H = W = 200
CMAX = 256
N_SRC = 192
K = 25
TRIALS = 10  # scan length mimicking the Newton trial loop


def bench(fn, *args, reps=5):
    out = fn(*args)
    float(out)
    times = []
    for k in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    rng = np.random.default_rng(0)
    bank = jnp.asarray(
        rng.normal(size=(N_NODES * H * W, 8)).astype(np.float32)
    )
    # Index grid: ~150 valid cells per node mapped into compact rows.
    idx_grid = np.full(N_NODES * H * W, -1, np.int32)
    compact = np.zeros((N_NODES * CMAX, 8), np.float32)
    for nidx in range(N_NODES):
        cells = rng.choice(H * W, 150, replace=False)
        for c, cell in enumerate(cells):
            idx_grid[nidx * H * W + cell] = nidx * CMAX + c
            compact[nidx * CMAX + c] = rng.normal(size=8)
    idx_grid = jnp.asarray(idx_grid)
    compact = jnp.asarray(compact)

    for B in (256, 1024):
        ref = jnp.asarray(rng.integers(0, N_NODES, B).astype(np.int32))
        base_iy = jnp.asarray(
            rng.integers(2, H - 3, (B, N_SRC)).astype(np.int32)
        )
        base_ix = jnp.asarray(
            rng.integers(2, W - 3, (B, N_SRC)).astype(np.int32)
        )
        offs = jnp.arange(-2, 3)
        dy = jnp.repeat(offs, 5)
        dx = jnp.tile(offs, 5)

        def win_flat(iy, ix, shift):
            # (B, N, K) flat in-grid index, jittered per trial like a
            # moving pose re-associates windows.
            iyw = jnp.clip(iy[..., None] + dy + shift, 0, H - 1)
            ixw = jnp.clip(ix[..., None] + dx, 0, W - 1)
            return iyw * W + ixw

        @jax.jit
        def direct(iy, ix):
            def body(c, _):
                fl = win_flat(iy, ix, c % 3)
                rows = bank[ref[:, None, None] * (H * W) + fl]
                return c + jnp.int32(1), jnp.sum(rows)

            _, sums = jax.lax.scan(
                body, jnp.int32(0), None, length=TRIALS
            )
            return jnp.sum(sums)

        @jax.jit
        def two_level(iy, ix):
            def body(c, _):
                fl = win_flat(iy, ix, c % 3)
                ci = idx_grid[ref[:, None, None] * (H * W) + fl]
                rows = compact[jnp.maximum(ci, 0)]
                rows = rows * (ci >= 0)[..., None]
                return c + jnp.int32(1), jnp.sum(rows)

            _, sums = jax.lax.scan(
                body, jnp.int32(0), None, length=TRIALS
            )
            return jnp.sum(sums)

        @jax.jit
        def per_pair(iy, ix):
            tables = bank.reshape(N_NODES, H * W, 8)[ref]  # (B, HW, 8)

            def body(c, _):
                fl = win_flat(iy, ix, c % 3)
                rows = jnp.take_along_axis(
                    tables, fl.reshape(B, -1, 1), axis=1
                )
                return c + jnp.int32(1), jnp.sum(rows)

            _, sums = jax.lax.scan(
                body, jnp.int32(0), None, length=TRIALS
            )
            return jnp.sum(sums)

        rows_per_eval = B * N_SRC * K
        for name, fn in (
            ("direct", direct), ("two_level", two_level),
            ("per_pair", per_pair),
        ):
            try:
                t = bench(fn, base_iy, base_ix)
                per_eval = t / TRIALS
                print(
                    f"B={B} {name:10s} {t*1e3:9.2f} ms/{TRIALS} evals "
                    f"({per_eval*1e3:7.3f} ms/eval, "
                    f"{rows_per_eval/per_eval/1e9:6.2f} Grows/s)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"B={B} {name:10s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
