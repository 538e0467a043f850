"""Multi-process (multi-host-shaped) worker for the distributed
correctness test (tests/test_multihost.py).

Each process is one "host": jax.distributed bootstrap, 4 virtual CPU
devices (the launcher sets XLA_FLAGS), a 2-D (dcn, ici) global mesh
(parallel/mesh.make_mesh_2d), and the edge-sharded solvers running over
BOTH axes — collectives reduce over ICI within the host row and DCN
across rows, the layout SURVEY.md §2.3/§7.9 mandates.  Rank 0 writes
the optimized poses so the test can compare against the single-process
solvers bit-for-bit (same float ops, different reduction placement —
tolerance is float-level).

Usage (launched twice by the test):
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python examples/multihost_worker.py --rank R --nprocs 2 \
      --port P --out out.npz
"""

import argparse

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init


def build_graph(seed: int = 3, n_nodes: int = 24, n_loop: int = 10):
    """Deterministic noisy loopy pose graph (identical on every rank)."""
    import jax.numpy as jnp
    from ndt_feature_graph_tpu.core import se2
    from ndt_feature_graph_tpu.graph import optimize as opt

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    rels = jnp.concatenate(
        [
            jax.random.uniform(
                k1, (n_nodes - 1, 2), minval=-1.0, maxval=1.0
            ),
            jax.random.uniform(
                k1, (n_nodes - 1, 1), minval=-0.4, maxval=0.4
            ),
        ],
        -1,
    )
    gt = [jnp.zeros(3)]
    for r in rels:
        gt.append(se2.compose(gt[-1], r))
    gt = jnp.stack(gt)
    li = jax.random.randint(k2, (n_loop,), 0, n_nodes - 3)
    lj = li + jax.random.randint(k3, (n_loop,), 2, 3)
    lmeas = se2.sub(gt[li], gt[lj])
    i = jnp.concatenate([jnp.arange(n_nodes - 1), li]).astype(jnp.int32)
    j = jnp.concatenate([jnp.arange(1, n_nodes), lj]).astype(jnp.int32)
    meas = jnp.concatenate([rels, lmeas])
    info = jnp.tile(jnp.eye(3)[None] * 50.0, (i.shape[0], 1, 1))
    edges = opt.EdgeList(
        i=i, j=j, meas=meas, info=info,
        mask=jnp.ones(i.shape[0], bool),
    )
    noise = 0.1 * jax.random.normal(k3, gt.shape)
    init = gt + noise.at[0].set(0.0)
    return init, edges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import numpy as np

    from ndt_feature_graph_tpu.parallel import mesh as mesh_mod

    mesh_mod.init_distributed(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nprocs,
        process_id=args.rank,
    )
    assert jax.process_count() == args.nprocs
    mesh = mesh_mod.make_mesh_2d()
    assert mesh.shape["dcn"] == args.nprocs

    from ndt_feature_graph_tpu.graph import sparse_direct as sd
    from ndt_feature_graph_tpu.parallel import (
        solver_sharded, sparse_direct_sharded,
    )

    poses, edges = build_graph()
    axis = ("dcn", "ici")
    dense = solver_sharded.optimize_sharded(
        mesh, poses, edges, iterations=10, axis=axis
    )
    part = sd.make_segments(poses.shape[0], edges, max_seg_len=8)
    direct, chi = sparse_direct_sharded.optimize_direct_sharded(
        mesh, poses, edges, part, iterations=10, axis=axis
    )
    if args.rank == 0 and args.out:
        np.savez(
            args.out,
            dense=np.asarray(dense),
            direct=np.asarray(direct),
            chi=np.asarray(chi),
        )
    print(f"rank {args.rank} done", flush=True)


if __name__ == "__main__":
    main()
