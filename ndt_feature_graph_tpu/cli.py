"""Command-line interface.

Replaces the reference's boost::program_options drivers:
  simulate  — generate a synthetic sequence        (simulate_scans role)
  slam      — online graph SLAM over a sequence    (ndt_graph_offline)
  optimize  — offline loop closure on a checkpoint (ndt_feature_graph_opt,
              flags mirror graph_opt.cpp:38-56)
  eval      — ATE between two TUM trajectory files
Run:  python -m ndt_feature_graph_tpu.cli <cmd> --help
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _params_from_args(a):
    from ndt_feature_graph_tpu.config import (
        FeatureParams,
        FuserParams,
        GraphParams,
        NDTMapParams,
        SLAMParams,
    )

    return SLAMParams(
        fuser=FuserParams(
            ndt=NDTMapParams(
                resolution=a.resolution,
                size_x=a.map_size,
                size_y=a.map_size,
                sensor_range=a.sensor_range,
                max_points_per_scan=max(a.num_beams, 512),
                max_cells=a.max_cells,
            ),
            features=FeatureParams(
                num_beams=a.num_beams, max_range=a.sensor_range
            ),
        ),
        graph=GraphParams(
            new_node_transl_dist=a.new_node_dist,
            max_nodes=a.max_nodes,
            valid_max_score=a.max_score,
            valid_max_dist=a.max_dist,
            valid_max_angular_dist=a.max_angular_dist,
            valid_min_idx_dist=a.min_idx_dist,
        ),
    )


def _add_common(p):
    p.add_argument("--resolution", type=float, default=0.5)
    p.add_argument("--map-size", type=float, default=40.0)
    p.add_argument("--sensor-range", type=float, default=15.0)
    p.add_argument("--num-beams", type=int, default=360)
    p.add_argument("--max-cells", type=int, default=512)
    p.add_argument("--new-node-dist", type=float, default=3.0)
    p.add_argument("--max-nodes", type=int, default=64)
    # getValidLinks gates (graph_opt.cpp:49-52 defaults).
    p.add_argument("--max-score", type=float, default=0.1)
    p.add_argument("--max-dist", type=float, default=1.0)
    p.add_argument("--max-angular-dist", type=float, default=0.2)
    p.add_argument("--min-idx-dist", type=int, default=2)


def cmd_simulate(a):
    import jax
    from ndt_feature_graph_tpu.io import dataset

    if a.trajectory == "loop":
        traj = dataset.loop_trajectory(a.steps, radius=a.radius)
    else:
        traj = dataset.corridor_trajectory(a.steps)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(a.seed),
        traj,
        num_beams=a.num_beams,
        max_range=a.sensor_range,
        odom_noise=(a.odom_noise, a.odom_noise, a.odom_noise / 2.5),
    )
    dataset.save_sequence(a.out, seq)
    print(f"wrote {a.out}: {traj.shape[0]} steps, {a.num_beams} beams")


def cmd_slam(a):
    import numpy as np
    from ndt_feature_graph_tpu import pipeline
    from ndt_feature_graph_tpu.io import dataset, tum

    params = _params_from_args(a)
    seq = dataset.load_sequence(a.dataset)
    slam, stats = pipeline.run_slam(params, seq, verbose=True)
    ate = pipeline.evaluate(slam, seq)
    stats["ate_rmse_m"] = ate
    print(json.dumps(stats))

    os.makedirs(a.out, exist_ok=True)
    est = np.stack(slam.trajectory)
    t_idx = np.asarray(slam.times, int)
    tum.write_tum(os.path.join(a.out, "est.tum"), slam.times, est)
    tum.write_tum(
        os.path.join(a.out, "gt.tum"),
        slam.times,
        np.asarray(seq.gt)[t_idx],
    )
    slam.save(os.path.join(a.out, "graph.npz"))
    if a.plot:
        from ndt_feature_graph_tpu.viz import plot

        plot.save_slam_overview(
            os.path.join(a.out, "overview.png"),
            slam,
            gt=np.asarray(seq.gt)[t_idx],
        )
    if a.optimize:
        slam.optimize_offline(verbose=True)
        tum.write_tum(
            os.path.join(a.out, "nodes_opt.tum"),
            list(range(len(slam.node_T))),
            np.stack(slam.node_T),
        )
    print(f"outputs in {a.out}")


def cmd_optimize(a):
    import numpy as np
    from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
    from ndt_feature_graph_tpu.io import tum

    params = _params_from_args(a)
    slam = NDTFeatureGraphSLAM.load(a.graph, params)
    print(f"loaded {len(slam.nodes)} nodes, "
          f"{len(slam.odom_edges)} odometry edges")
    before = np.stack(slam.node_T)
    out = np.asarray(slam.optimize_offline(verbose=True))
    print("max node move:",
          float(np.max(np.linalg.norm(out[:, :2] - before[:, :2], axis=1))))
    tum.write_tum(a.out, list(range(len(out))), out)
    print(f"wrote {a.out}")


def cmd_eval(a):
    from ndt_feature_graph_tpu.io import tum

    _, est = tum.read_tum(a.est)
    _, gt = tum.read_tum(a.gt)
    n = min(len(est), len(gt))
    print(
        json.dumps(
            {
                "ate_rmse_m": tum.ate_rmse(est[:n], gt[:n]),
                "ate_rmse_aligned_m": tum.ate_rmse(
                    est[:n], gt[:n], align=True
                ),
                "poses": n,
            }
        )
    )


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="ndt_feature_graph_tpu",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("simulate", help="generate synthetic sequence")
    p.add_argument("--out", required=True)
    p.add_argument("--trajectory", choices=["loop", "corridor"],
                   default="loop")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--num-beams", type=int, default=360)
    p.add_argument("--sensor-range", type=float, default=15.0)
    p.add_argument("--odom-noise", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("slam", help="run online graph SLAM")
    p.add_argument("--dataset", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--optimize", action="store_true")
    p.add_argument("--plot", action="store_true")
    _add_common(p)
    p.set_defaults(fn=cmd_slam)

    p = sub.add_parser("optimize", help="offline loop-closure optimization")
    p.add_argument("--graph", required=True, help="graph.npz checkpoint")
    p.add_argument("--out", required=True, help="optimized nodes TUM file")
    _add_common(p)
    p.set_defaults(fn=cmd_optimize)

    p = sub.add_parser("eval", help="ATE between TUM files")
    p.add_argument("--est", required=True)
    p.add_argument("--gt", required=True)
    p.set_defaults(fn=cmd_eval)

    a = ap.parse_args(argv)
    a.fn(a)


if __name__ == "__main__":
    main()
