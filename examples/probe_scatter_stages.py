"""Split the fleet step's scatter-bound stages (round 5): after the
win-block table removed the gather bottleneck, `local` (per-scan local
NDT build) and `map` (submap update) dominate the batched step.  Which
sub-stage?

  local_grid : empty local grid + 720-point stats scatter
  local_fin  : finalize whole 126^2 local grid + nonzero-compaction
  map_pts    : add_points_touched + refresh_packed on the 200^2 submap
  map_occ    : update_occupancy (720 hits + 720*ray_samples miss
               scatter — the suspected dominant transaction count)

Run: timeout 2400 python examples/probe_scatter_stages.py
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
from ndt_feature_graph_tpu.ops import d2d, ndt_map
from ndt_feature_graph_tpu.parallel import scaling

R = 6
TIME_REPS = 5


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
    params = bench.canonical_params()
    lp = fuser.local_map_params(params)

    for B in (8, 32):
        states, odom, pts, mask = scaling.build_fleet_inputs(
            params, B, t_steps=3, num_beams=720
        )
        odom1, pts1, mask1 = odom[:, 0], pts[:, 0], mask[:, 0]

        def scan_stage(step):
            @jax.jit
            def run(states, pts1, mask1):
                def body(c, k):
                    return c + step(k, states, pts1, mask1), None

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

        def local_grid_step(k, states, pts1, mask1):
            jp = pts1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, p, mk):
                vpts = se2.transform_points(st.sensor_pose, p)
                g = ndt_map.empty_grid(lp, jnp.zeros(2))
                g = ndt_map.add_points(g, lp, vpts, mk)
                return digest((g.count, g.psum))

            return jnp.sum(jax.vmap(one)(states, jp, mask1))

        def local_fin_step(k, states, pts1, mask1):
            jp = pts1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, p, mk):
                vpts = se2.transform_points(st.sensor_pose, p)
                g = ndt_map.empty_grid(lp, jnp.zeros(2))
                g = ndt_map.add_points(g, lp, vpts, mk)
                return digest(ndt_map.to_cell_list(g, lp))

            return jnp.sum(jax.vmap(one)(states, jp, mask1))

        def map_pts_step(k, states, pts1, mask1):
            jp = pts1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, p, mk):
                world_T = se2.compose(st.Tnow, st.sensor_pose)
                wp = se2.transform_points(world_T, p)
                g, touched = ndt_map.add_points_touched(
                    st.grid, params.ndt, wp, mk
                )
                packed = d2d.refresh_packed(
                    st.packed, g, params.ndt, touched
                )
                return digest((g.count, packed.sum()))

            return jnp.sum(jax.vmap(one)(states, jp, mask1))

        def map_occ_step(k, states, pts1, mask1):
            jp = pts1 + (k + 1).astype(jnp.float32) * 1e-6

            def one(st, p, mk):
                world_T = se2.compose(st.Tnow, st.sensor_pose)
                wp = se2.transform_points(world_T, p)
                g = ndt_map.update_occupancy(
                    st.grid, params.ndt, world_T[:2], wp, mk
                )
                return digest(g.occ)

            return jnp.sum(jax.vmap(one)(states, jp, mask1))

        for name, step in [
            ("local_grid", local_grid_step),
            ("local_fin", local_fin_step),
            ("map_pts", map_pts_step),
            ("map_occ", map_occ_step),
        ]:
            t = timed(scan_stage(step), states, pts1, mask1)
            print(
                f"B={B:3d} {name:10s} {t*1e3:9.3f} ms/step "
                f"({t*1e3/B:8.4f} ms/stream)",
                flush=True,
            )


if __name__ == "__main__":
    main()
