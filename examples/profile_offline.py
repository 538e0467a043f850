"""Stage profile of the offline link pipeline on the real chip.

Measures propose (feature RANSAC) / D2D refine / overlap rescore
separately at the bench's canonical 256-pair batch, plus the node
occupancy stats that bound the gather work (VERDICT r3 next-round #2:
take offline_pairs_per_sec from 31.8 to >=300).

Forced-readback protocol (CLAUDE.md): scalar digest inside the
executable, float() per rep, median.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

# Persistent compile cache: the canonical-op-point executables cost
# ~15 min of fresh compiles per process; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams, FuserParams, GraphParams, NDTMapParams, SLAMParams,
)
from ndt_feature_graph_tpu.graph import links as links_mod
from ndt_feature_graph_tpu.graph import node as node_mod
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset


def canonical_params():
    return FuserParams(
        ndt=NDTMapParams(
            resolution=0.5, size_x=100.0, size_y=100.0,
            sensor_range=30.0, max_points_per_scan=720, max_cells=1024,
        ),
        features=FeatureParams(num_beams=720, max_range=30.0),
    )


def median_time(fn, reps):
    times = []
    for k in range(reps):
        t0 = time.perf_counter()
        fn(k)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    params = canonical_params()
    t_steps = 200
    half = t_steps * 0.025 / 2.0
    traj = dataset.corridor_trajectory(t_steps, x0=-half, x1=half, y=-4.5)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(0), traj, num_beams=720, max_range=30.0
    )
    sparams = SLAMParams(
        fuser=params,
        graph=GraphParams(new_node_transl_dist=0.25, max_nodes=64),
    )
    cache = "/tmp/profile_offline_graph.npz"
    if os.path.exists(cache):
        slam = NDTFeatureGraphSLAM.load(cache, sparams)
        print("(graph loaded from cache)", flush=True)
    else:
        slam = NDTFeatureGraphSLAM(sparams, seed=0)
        slam.initialize(
            seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0]
        )
        slam.run_sequence_device(seq.odom, seq.ranges, seq.hit)
        slam.finalize_current_node()
        slam.save(cache)
    n = len(slam.nodes)
    stacked = node_mod.stack_nodes(slam.nodes)
    print(f"nodes: {n}", flush=True)

    # Occupancy stats: how much of the padded work is real?
    cell_counts = np.asarray(jnp.sum(stacked.cells.mask, axis=1))
    valid_counts = np.asarray(
        jnp.sum(stacked.target.packed[..., 5] > 0.5, axis=1)
    )
    print(
        f"cells/node (of {params.ndt.max_cells} padded): "
        f"mean {cell_counts.mean():.0f} max {cell_counts.max()}",
        flush=True,
    )
    print(
        f"valid target cells/node (of "
        f"{stacked.target.packed.shape[1]}"
        f" grid): mean {valid_counts.mean():.0f} max {valid_counts.max()}",
        flush=True,
    )

    B = 256
    pairs = [(i, j) for i in range(n) for j in range(i + 2, n)]
    reps_idx = np.resize(np.asarray(pairs, np.int32), (B, 2))
    ref = jnp.asarray(reps_idx[:, 0])
    mov = jnp.asarray(reps_idx[:, 1])
    mask = jnp.ones(B, bool)
    p = sparams.fuser
    reps = 5

    @jax.jit
    def propose(key):
        ls = links_mod.compute_links_batch.__wrapped__(
            p.features, p.ndt.resolution, stacked, ref, mov, mask, key
        )
        return ls, sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(ls)
        )

    ls0, dg = propose(jax.random.PRNGKey(0))
    float(dg)
    tp = median_time(
        lambda k: float(propose(jax.random.PRNGKey(k + 1))[1]), reps
    )
    print(f"propose:  {tp * 1e3:8.1f} ms  ({B / tp:7.1f} pairs/s)",
          flush=True)

    budget = links_mod.source_cell_budget(stacked)
    print(f"src budget: {budget}", flush=True)

    @jax.jit
    def refine(ls):
        out = links_mod.refine_links_d2d.__wrapped__(
            p.ndt, p.matcher, stacked, ls, src_budget=budget
        )
        return out, sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
        )

    ls1, dg = refine(ls0)
    float(dg)

    def rep_refine(k):
        ls_k = ls0._replace(T=ls0.T + (k + 1) * 1e-5)
        float(refine(ls_k)[1])

    tr = median_time(rep_refine, reps)
    print(f"refine:   {tr * 1e3:8.1f} ms  ({B / tr:7.1f} pairs/s)",
          flush=True)

    # Wider batch: does refine amortize further at 1024 pairs?
    B4 = 1024
    idx4 = np.resize(np.asarray(pairs, np.int32), (B4, 2))
    ls4 = links_mod.compute_links_batch(
        p.features, p.ndt.resolution, stacked,
        jnp.asarray(idx4[:, 0]), jnp.asarray(idx4[:, 1]),
        jnp.ones(B4, bool), jax.random.PRNGKey(9),
    )
    _, dg = refine(ls4)
    float(dg)

    def rep_refine4(k):
        ls_k = ls4._replace(T=ls4.T + (k + 1) * 1e-5)
        float(refine(ls_k)[1])

    tr4 = median_time(rep_refine4, reps)
    print(
        f"refine B=1024: {tr4 * 1e3:8.1f} ms  ({B4 / tr4:7.1f} pairs/s)",
        flush=True,
    )

    @jax.jit
    def rescore(ls):
        out = links_mod.rescore_links(p.ndt.resolution, stacked, ls)
        return out, sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
        )

    _, dg = rescore(ls1)
    float(dg)

    def rep_rescore(k):
        ls_k = ls1._replace(T=ls1.T + (k + 1) * 1e-5)
        float(rescore(ls_k)[1])

    ts = median_time(rep_rescore, reps)
    print(f"rescore:  {ts * 1e3:8.1f} ms  ({B / ts:7.1f} pairs/s)",
          flush=True)

    tot = tp + tr + ts
    print(f"total:    {tot * 1e3:8.1f} ms  ({B / tot:7.1f} pairs/s)",
          flush=True)

    # Newton trial statistics in refine (how much of the 60-trial
    # budget does the vmapped batch actually need?)
    from ndt_feature_graph_tpu.ops import d2d, d2d_analytic
    from ndt_feature_graph_tpu.core import se2

    @jax.jit
    def trial_stats(ls):
        def one(ref_i, mov_i, T0):
            refn = jax.tree.map(lambda x: x[ref_i], stacked)
            movn = jax.tree.map(lambda x: x[mov_i], stacked)
            refn = refn._replace(target=d2d.dense_from_packed(
                refn.target, p.ndt.grid_h, p.ndt.grid_w))

            def score_fn(d):
                return d2d.d2d_score_dense(
                    d, T0, movn.cells, refn.target, p.ndt, p.matcher
                )

            def fgh_fn(d):
                return d2d_analytic.fgh_dense(
                    d, T0, movn.cells, refn.target, p.ndt, p.matcher
                )

            d, score, itr, conv = d2d.newton_match(
                score_fn, jnp.zeros(3), p.matcher, fgh_fn
            )
            return itr, conv

        itr, conv = jax.vmap(one)(ls.ref, ls.mov, ls.T)
        return itr, conv

    itr, conv = trial_stats(ls0)
    itr = np.asarray(itr)
    print(
        f"newton trials used: mean {itr.mean():.1f} p95 "
        f"{np.percentile(itr, 95):.0f} max {itr.max()} "
        f"(budget {2 * p.matcher.itr_max}); converged "
        f"{int(np.asarray(conv).sum())}/{B}",
        flush=True,
    )


if __name__ == "__main__":
    main()
