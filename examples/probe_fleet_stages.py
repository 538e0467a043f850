"""Decompose the NEW batched fleet update (round 4, flat-bank batched
newton) on the real chip: which stage eats the time, and does it scale
with B?

Stages per scan step at canonical shapes (N=256 src cells, K=25 window
rows, 200x200 grid/stream), each timed inside ONE executable with a
lax.scan of R jittered reps, forced by scalar-digest readback:
  gather   : flattened 1-D window gather (B*N*K rows) from (B*H*W, 8)
  pairmath : _pair_fgh reduction on pre-gathered windows (no gather)
  fgh      : one full fgh_dense_flat_batch evaluation (gather+math)
  newton   : full newton_match_batch (up to 60 lockstep trials)
  update   : full fuser.update_batch (adds local build + map update)
Also reports newton's executed-trial count per lane (lockstep chunks
run until EVERY lane stops — wasted-trial factor vs single-stream).

Run: timeout 3000 python examples/probe_fleet_stages.py
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

import bench
from ndt_feature_graph_tpu.fusion import fuser
from ndt_feature_graph_tpu.ops import d2d, d2d_analytic
from ndt_feature_graph_tpu.parallel import scaling

R = 6
TIME_REPS = 5


def timed(fn, *args):
    out = fn(*args)
    float(out)
    ts = []
    for _ in range(TIME_REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / R


def main():
    params = bench.canonical_params()
    m = params.matcher
    h, w = params.ndt.grid_h, params.ndt.grid_w
    res = params.ndt.resolution
    nsrc = params.match_cell_budget
    K = (2 * m.n_neighbours + 1) ** 2

    for B in (1, 8, 32, 128):
        states, odom, pts, mask = scaling.build_fleet_inputs(
            params, B, t_steps=3, num_beams=720
        )
        odom1, pts1, mask1 = odom[:, 0], pts[:, 0], mask[:, 0]

        @jax.jit
        def prep(states, pts1, mask1):
            def one(st, p, mk):
                src, _ = fuser._build_local_cells(
                    params, st.sensor_pose, p, mk
                )
                from ndt_feature_graph_tpu.ops.ndt_map import CellList
                return CellList(
                    means=src.means[:nsrc], covs=src.covs[:nsrc],
                    mask=src.mask[:nsrc],
                )

            return jax.vmap(one)(states, pts1, mask1)

        src_b = jax.tree.map(
            lambda x: x.copy(), prep(states, pts1, mask1)
        )
        T_pred = jax.vmap(
            lambda a, b: a + b.at[2].set(0.0) * 0 + b
        )(states.Tnow, odom1)  # cheap approx init, shapes only
        packed_b = states.packed
        origins = states.grid.origin
        row_offsets = jnp.arange(B, dtype=jnp.int32) * (h * w)

        def scan_stage(step):
            @jax.jit
            def run(*args):
                def body(c, k):
                    return c + step(k, *args), None

                dsum, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    jnp.arange(R, dtype=jnp.int32),
                )
                return dsum

            return run

        # --- gather only ---
        rng = np.random.default_rng(0)
        iy0 = jnp.asarray(
            rng.integers(2, h - 3, (B, nsrc)).astype(np.int32)
        )
        ix0 = jnp.asarray(
            rng.integers(2, w - 3, (B, nsrc)).astype(np.int32)
        )
        offs = jnp.arange(-m.n_neighbours, m.n_neighbours + 1)
        dy = jnp.repeat(offs, 2 * m.n_neighbours + 1)
        dx = jnp.tile(offs, 2 * m.n_neighbours + 1)

        def gather_step(k, packed_b):
            pf = packed_b.reshape(B * h * w, 8)
            iy = jnp.clip(iy0[..., None] + dy + (k % 3), 0, h - 1)
            ix = jnp.clip(ix0[..., None] + dx, 0, w - 1)
            flat = iy * w + ix
            lin = (row_offsets[:, None, None] + flat).reshape(-1)
            rows = pf[lin].reshape(flat.shape + (8,))
            return jnp.sum(rows)

        # --- pairmath only (pre-gathered windows) ---
        rows_const = jnp.asarray(
            rng.normal(size=(B, nsrc, K, 8)).astype(np.float32)
        )

        def pairmath_step(k, rows_const, src_b):
            rows = rows_const + k.astype(jnp.float32) * 1e-6
            t_means = rows[..., 0:2]
            t_covs = jnp.stack(
                [
                    jnp.stack([rows[..., 2] + 1.0, rows[..., 3]], -1),
                    jnp.stack([rows[..., 3], rows[..., 4] + 1.0], -1),
                ],
                -2,
            )
            t_valid = rows[..., 5] > 0.0
            mu = src_b.means[..., None, :] - t_means
            Sig = src_b.covs[..., None, :, :] + t_covs
            m_rot = src_b.means[..., None, :]
            ok = t_valid & src_b.mask[..., None]
            s, g, H = d2d_analytic._pair_fgh(
                mu, Sig, m_rot, src_b.covs[..., None, :, :],
                m.lfd1, m.lfd2,
            )
            okf = ok.astype(jnp.float32)
            return (
                jnp.sum(s * okf)
                + jnp.sum(g * okf[..., None])
                + jnp.sum(H * okf[..., None, None])
            )

        # --- one fgh evaluation ---
        def fgh_step(k, states, src_b):
            pf = states.packed.reshape(B * h * w, 8)
            d_b = jnp.zeros((B, 3)) + k.astype(jnp.float32) * 1e-6
            f, g, H = d2d_analytic.fgh_dense_flat_batch(
                d_b, T_pred, src_b, pf, origins, row_offsets,
                h, w, res, m,
            )
            return jnp.sum(f) + jnp.sum(g) + jnp.sum(H)

        # --- full newton ---
        def newton_step(k, states, src_b):
            pf = states.packed.reshape(B * h * w, 8)

            def fgh_batch(d_b):
                return d2d_analytic.fgh_dense_flat_batch(
                    d_b, T_pred + k.astype(jnp.float32) * 1e-6,
                    src_b, pf, origins, row_offsets, h, w, res, m,
                )

            d_b, f_b, itr, conv = d2d.newton_match_batch(
                jnp.zeros((B, 3)), m, fgh_batch
            )
            return jnp.sum(d_b) + jnp.sum(f_b) + jnp.sum(
                itr.astype(jnp.float32)
            )

        # --- full update_batch ---
        def update_step(k, states, odom1, pts1, mask1):
            ns, info = fuser.update_batch.__wrapped__(
                states, params,
                odom1 + (k + 1).astype(jnp.float32) * 1e-6,
                pts1, mask1,
            )
            return sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree.leaves((ns.Tnow, info.score))
            )

        stages = [
            ("gather", gather_step, (packed_b,)),
            ("pairmath", pairmath_step, (rows_const, src_b)),
            ("fgh", fgh_step, (states, src_b)),
            ("newton", newton_step, (states, src_b)),
            ("update", update_step, (states, odom1, pts1, mask1)),
        ]
        for name, step, args in stages:
            try:
                t = timed(scan_stage(step), *args)
                rows_s = (B * nsrc * K) / t / 1e6
                print(
                    f"B={B:4d} {name:9s} {t*1e3:9.3f} ms "
                    f"({t*1e3/B:8.4f} ms/stream, {rows_s:8.1f} Mrows/s)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(
                    f"B={B:4d} {name:9s} FAILED {type(e).__name__}: "
                    f"{str(e)[:150]}",
                    flush=True,
                )

        # Executed trials (lockstep): one untimed run.
        @jax.jit
        def trials(states, src_b):
            pf = states.packed.reshape(B * h * w, 8)

            def fgh_batch(d_b):
                return d2d_analytic.fgh_dense_flat_batch(
                    d_b, T_pred, src_b, pf, origins, row_offsets,
                    h, w, res, m,
                )

            _, _, itr, _ = d2d.newton_match_batch(
                jnp.zeros((B, 3)), m, fgh_batch
            )
            return jnp.max(itr), jnp.mean(itr.astype(jnp.float32))

        mx, mean = trials(states, src_b)
        print(
            f"B={B:4d} trials: max {int(mx)} mean {float(mean):.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
