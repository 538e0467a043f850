"""Stage profile of the BATCHED (vmapped) fuser update vs batch size.

Round-4 finding to explain: the fleet bench (bench.py bench_fleet)
measured aggregate throughput FLAT in B (130-140 scans/s at B in
{8, 32, 128} vs 174 single-stream) — the batched executable takes ~B x
the single-stream time, i.e. vmap buys no parallelism at all.  This
script times each stage of fuser.update vmapped over B to find which
stage(s) serialize per lane (scatter/gather loops are the suspects:
TPU implements general gathers/scatters as sequential element loops,
so their cost is proportional to TOTAL rows regardless of batching).

Stages (all vmapped over B, R=6 reps chained inside ONE executable with
per-rep input jitter, scalar digest read back — CLAUDE.md protocol):
  full    : fuser.update (update_map=True)    — whole per-scan pipeline
  reg     : fuser.update (update_map=False)   — local build+target+newton
  local   : _build_local_cells                — local grid + compaction
  tgt     : make_dense_target                 — 200x200 finalize + pack
  map     : add_points + update_occupancy     — submap scatter updates
  newton  : newton_match on prebuilt src/tgt  — gather + pair math only

Run on the real chip: timeout 3000 python examples/profile_fleet.py
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

import bench
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.fusion import fuser
from ndt_feature_graph_tpu.ops import d2d, d2d_analytic, ndt_map
from ndt_feature_graph_tpu.parallel import scaling

R = 6          # reps chained inside the executable
TIME_REPS = 5  # outer medians


def timed(fn, *args):
    out = fn(*args)
    float(out)
    ts = []
    for _ in range(TIME_REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / R  # per inner rep


def main():
    params = bench.canonical_params()
    m = params.matcher
    lp = fuser.local_map_params(params)

    for B in (1, 8, 32, 128):
        states, odom, pts, mask = scaling.build_fleet_inputs(
            params, B, t_steps=3, num_beams=720
        )
        # One scan per stream.
        odom1 = odom[:, 0]
        pts1, mask1 = pts[:, 0], mask[:, 0]

        def scan_stage(step):
            """Chain R jittered reps of `step(k, ...)` into one digest."""

            @jax.jit
            def run(states, odom1, pts1, mask1):
                def body(c, k):
                    return c + step(k, states, odom1, pts1, mask1), None

                d, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    jnp.arange(R, dtype=jnp.int32),
                )
                return d

            return run

        def digest(tree):
            return sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree.leaves(tree)
            )

        def full_step(k, states, odom1, pts1, mask1):
            j = odom1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, tm, p, mk):
                ns, info = fuser.update.__wrapped__(
                    st, params, tm, p, mk
                )
                return digest((ns, info.score))

            return jnp.sum(jax.vmap(one)(states, j, pts1, mask1))

        def reg_step(k, states, odom1, pts1, mask1):
            j = odom1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, tm, p, mk):
                ns, info = fuser.update.__wrapped__(
                    st, params, tm, p, mk, update_map=False
                )
                return digest((info.T_est, info.score))

            return jnp.sum(jax.vmap(one)(states, j, pts1, mask1))

        def local_step(k, states, odom1, pts1, mask1):
            jp = pts1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, p, mk):
                src, _ = fuser._build_local_cells(
                    params, st.sensor_pose, p, mk
                )
                return digest(src)

            return jnp.sum(jax.vmap(one)(states, jp, mask1))

        def tgt_step(k, states, odom1, pts1, mask1):
            def one(st):
                g = st.grid._replace(
                    count=st.grid.count
                    + (k + 1).astype(jnp.float32) * 1e-6
                )
                return digest(d2d.make_dense_target(g, params.ndt).packed)

            return jnp.sum(jax.vmap(one)(states))

        def map_step(k, states, odom1, pts1, mask1):
            jp = pts1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, p, mk):
                world_T = se2.compose(st.Tnow, st.sensor_pose)
                wp = se2.transform_points(world_T, p)
                g = ndt_map.add_points(st.grid, params.ndt, wp, mk)
                g = ndt_map.update_occupancy(
                    g, params.ndt, world_T[:2], wp, mk
                )
                return digest((g.count, g.occ))

            return jnp.sum(jax.vmap(one)(states, jp, mask1))

        # Prebuilt src/tgt for the newton-only stage (one-time, untimed).
        @jax.jit
        def prep(states, pts1, mask1):
            def one(st, p, mk):
                src, _ = fuser._build_local_cells(
                    params, st.sensor_pose, p, mk
                )
                nb = params.match_cell_budget
                src = ndt_map.CellList(
                    means=src.means[:nb], covs=src.covs[:nb],
                    mask=src.mask[:nb],
                )
                tgt = d2d.make_dense_target(st.grid, params.ndt)
                return src, tgt

            return jax.vmap(one)(states, pts1, mask1)

        src_b, tgt_b = prep(states, pts1, mask1)
        src_b = jax.tree.map(lambda x: x.copy(), src_b)
        tgt_b = jax.tree.map(lambda x: x.copy(), tgt_b)

        def newton_step(k, states, odom1, pts1, mask1):
            j = odom1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, tm, src, tgt):
                T_pred = se2.compose(st.Tnow, tm)

                def fgh_fn(d):
                    return d2d_analytic.fgh_dense(
                        d, T_pred, src, tgt, lp, m
                    )

                d_, score, itr, conv = d2d.newton_match(
                    None, jnp.zeros(3), m, fgh_fn=fgh_fn
                )
                return jnp.sum(d_) + score + itr.astype(jnp.float32)

            return jnp.sum(jax.vmap(one)(states, j, src_b, tgt_b))

        stages = [
            ("full", full_step), ("reg", reg_step),
            ("local", local_step), ("tgt", tgt_step),
            ("map", map_step), ("newton", newton_step),
        ]
        for name, step in stages:
            t = timed(scan_stage(step), states, odom1, pts1, mask1)
            print(
                f"B={B:4d} {name:7s} {t*1e3:9.3f} ms/step "
                f"({t*1e3/B:8.4f} ms/stream)",
                flush=True,
            )


if __name__ == "__main__":
    main()
