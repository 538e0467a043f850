"""Stage profile of the FLAT-BANK batched fuser step (fuser.
update_batch — the real fleet path) vs batch size and gather-bank
variant (full-grid f32 / sensor-window f32 / sensor-window bf16).

Round-5 question: the fleet curve still halves per-stream rate from
B=8 to B=16 even with a 24 MB bf16 window bank
(examples/probe_window_fleet.py), so which stage scales superlinearly
per stream?

Stages (R reps chained in ONE executable, jittered inputs, scalar
digest readback — CLAUDE.md protocol):
  full    : update_batch (update_map=True)   — whole per-scan step
  reg     : update_batch (update_map=False)  — local build + newton
  local   : vmapped _build_local_cells       — local grid + compaction
  table   : window/wide table build only
  newton  : batch Newton on prebuilt src/tables (gather + pair math)
  map     : vmapped add_points_touched + refresh + occupancy

Run on the real chip: timeout 3600 python examples/profile_fleet_r5.py
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


def profile(params, B, label):
    m = params.matcher
    h, w = params.ndt.grid_h, params.ndt.grid_w
    res = params.ndt.resolution
    states, odom, pts, mask = scaling.build_fleet_inputs(
        params, B, t_steps=3, num_beams=720
    )
    odom1, pts1, mask1 = odom[:, 0], pts[:, 0], mask[:, 0]

    def scan_stage(step):
        @jax.jit
        def run(states, odom1, pts1, mask1):
            def body(c, k):
                return c + step(k, states, odom1, pts1, mask1), None

            d, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(R, dtype=jnp.int32)
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
        ns, info = fuser.update_batch.__wrapped__(
            states, params, j, pts1, mask1
        )
        return digest((ns, info.score))

    def reg_step(k, states, odom1, pts1, mask1):
        j = odom1 + (k + 1).astype(jnp.float32) * 1e-6
        ns, info = fuser.update_batch.__wrapped__(
            states, params, j, pts1, mask1, update_map=False
        )
        return digest((info.T_est, info.score))

    def local_step(k, states, odom1, pts1, mask1):
        jp = pts1 + (k + 1).astype(jnp.float32) * 1e-6

        def one(st, p, mk):
            src, _ = fuser._build_local_cells(params, st.sensor_pose, p, mk)
            return digest(src)

        return jnp.sum(jax.vmap(one)(states, jp, mask1))

    wc = params.gather_window_cells
    use_window = 0 < wc < min(h, w)
    use_block = use_window and params.gather_block

    def table_step(k, states, odom1, pts1, mask1):
        j = odom1 + (k + 1).astype(jnp.float32) * 1e-6
        T_pred = jax.vmap(se2.compose)(states.Tnow, j)
        if use_block:
            blk, cell0 = d2d.build_window_block_tables(
                states.packed, states.grid.origin, T_pred[:, :2], h, w,
                m.n_neighbours, wc, res, bf16=params.gather_table_bf16,
            )
            return digest((blk.astype(jnp.float32).sum(), cell0))
        if use_window:
            wide, cell0 = d2d.build_window_tables(
                states.packed, states.grid.origin, T_pred[:, :2], h, w,
                m.n_neighbours, wc, res, bf16=params.gather_table_bf16,
            )
            return digest((wide.astype(jnp.float32).sum(), cell0))
        wide = d2d.build_wide_table(states.packed, h, w, m.n_neighbours)
        return digest(wide.sum())

    # Prebuilt source lists + tables for the newton-only stage.
    @jax.jit
    def prep(states, odom1, pts1, mask1):
        T_pred = jax.vmap(se2.compose)(states.Tnow, odom1)

        def one(st, p, mk):
            src, _ = fuser._build_local_cells(params, st.sensor_pose, p, mk)
            nb = params.match_cell_budget
            src = ndt_map.CellList(
                means=src.means[:nb], covs=src.covs[:nb], mask=src.mask[:nb]
            )
            return src

        src_b = jax.vmap(one)(states, pts1, mask1)
        if use_block:
            tbl, cell0 = d2d.build_window_block_tables(
                states.packed, states.grid.origin, T_pred[:, :2], h, w,
                m.n_neighbours, wc, res, bf16=params.gather_table_bf16,
            )
            hp = wc + 2 * m.n_neighbours
            stride = hp * hp
        elif use_window:
            tbl, cell0 = d2d.build_window_tables(
                states.packed, states.grid.origin, T_pred[:, :2], h, w,
                m.n_neighbours, wc, res, bf16=params.gather_table_bf16,
            )
            stride = d2d.wide_row_stride(wc, wc, m.n_neighbours)
        else:
            tbl = d2d.build_wide_table(states.packed, h, w, m.n_neighbours)
            stride = d2d.wide_row_stride(h, w, m.n_neighbours)
            cell0 = jnp.zeros((B, 2), jnp.int32)
        return src_b, tbl.reshape(B * stride, tbl.shape[-1]), cell0, T_pred

    src_b, tbl_flat, cell0, T_pred = prep(states, odom1, pts1, mask1)
    src_b, tbl_flat, cell0, T_pred = jax.tree.map(
        lambda x: x.copy(), (src_b, tbl_flat, cell0, T_pred)
    )
    dims = (wc, wc) if use_window else (h, w)
    relm = params.gather_table_bf16 and use_window

    def fgh_of(d_b, tp):
        if use_block:
            return d2d_analytic.fgh_dense_block_batch(
                d_b, tp, src_b, tbl_flat, cell0, states.grid.origin,
                wc, res, m, rel_means=relm,
            )
        return d2d_analytic.fgh_dense_window_batch(
            d_b, tp, src_b, tbl_flat, cell0, states.grid.origin,
            dims[0], dims[1], res, m, rel_means=relm,
        )

    def newton_step(k, states, odom1, pts1, mask1):
        tp = T_pred + (k + 1).astype(jnp.float32) * 1e-6
        d_b, f_b, itr, conv = d2d.newton_match_batch(
            jnp.zeros((B, 3), jnp.float32), m,
            lambda d_b: fgh_of(d_b, tp),
        )
        return jnp.sum(d_b) + jnp.sum(f_b) + jnp.sum(itr)

    def onetrial_step(k, states, odom1, pts1, mask1):
        tp = T_pred + (k + 1).astype(jnp.float32) * 1e-6
        f, g, H = fgh_of(jnp.zeros((B, 3), jnp.float32), tp)
        return jnp.sum(f) + jnp.sum(g) + jnp.sum(H)

    def map_step(k, states, odom1, pts1, mask1):
        jp = pts1 + (k + 1).astype(jnp.float32) * 1e-6

        def one(st, p, mk):
            world_T = se2.compose(st.Tnow, st.sensor_pose)
            wp = se2.transform_points(world_T, p)
            g, touched = ndt_map.add_points_touched(
                st.grid, params.ndt, wp, mk
            )
            packed = d2d.refresh_packed(st.packed, g, params.ndt, touched)
            g = ndt_map.update_occupancy(g, params.ndt, world_T[:2], wp, mk)
            return digest((g.count, g.occ, packed.sum()))

        return jnp.sum(jax.vmap(one)(states, jp, mask1))

    stages = [
        ("full", full_step), ("reg", reg_step), ("local", local_step),
        ("table", table_step), ("newton", newton_step),
        ("1trial", onetrial_step), ("map", map_step),
    ]
    for name, step in stages:
        t = timed(scan_stage(step), states, odom1, pts1, mask1)
        print(
            f"{label:12s} B={B:3d} {name:7s} {t*1e3:9.3f} ms/step "
            f"({t*1e3/B:8.4f} ms/stream)",
            flush=True,
        )


def main():
    base = bench.canonical_params()
    all_variants = {
        "win136_bf16": base.replace(gather_window_cells=136,
                                    gather_table_bf16=True),
        "blk136_bf16": base.replace(gather_window_cells=136,
                                    gather_table_bf16=True,
                                    gather_block=True),
        "full_f32": base,
    }
    names = os.environ.get(
        "PROFILE_VARIANTS", "win136_bf16,full_f32"
    ).split(",")
    bs = [int(v) for v in
          os.environ.get("PROFILE_BS", "8,16,32").split(",")]
    for label in names:
        for B in bs:
            profile(all_variants[label], B, label)


if __name__ == "__main__":
    main()
