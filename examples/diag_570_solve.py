"""Fast offline-solve experiments on a saved 570-node snapshot
(examples/diag_570_build.py).  Loads node poses + odometry edges +
proposed links + GT, then runs {validate -> solve} fixpoint rounds under
different robust kernels / solvers / covariance scalings in seconds.

Usage: python examples/diag_570_solve.py [--kernel dcs] [--delta 1.0]
       [--solver direct|dense] [--rounds 4] [--link-cov-scale 1.0]
       [--npz /tmp/diag570.npz]
"""

import argparse

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import GraphParams
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.graph import links as links_mod
from ndt_feature_graph_tpu.graph import optimize as opt_mod
from ndt_feature_graph_tpu.graph import sparse_direct as sd
from ndt_feature_graph_tpu.io import tum

ap = argparse.ArgumentParser()
ap.add_argument("--npz", default="/tmp/diag570.npz")
ap.add_argument("--kernel", default="dcs")
ap.add_argument("--delta", type=float, default=1.0)
ap.add_argument("--solver", default="direct")
ap.add_argument("--rounds", type=int, default=4)
ap.add_argument("--gn-iters", type=int, default=12)
ap.add_argument("--link-cov-scale", type=float, default=1.0)
ap.add_argument("--max-score", type=float, default=0.2)
ap.add_argument("--max-dist", type=float, default=1.0)
ap.add_argument("--oracle", action="store_true",
                help="drop links whose T disagrees with GT (floor probe)")
ap.add_argument("--max-dist-later", type=float, default=0.0,
                help="tighter valid_max_dist for rounds >= 1 (0 = off)")
ap.add_argument("--kernel-later", default="",
                help="kernel for rounds >= 1 ('' = same)")
ap.add_argument("--delta-later", type=float, default=0.0)
ap.add_argument("--info-eps", type=float, default=1e-6)
args = ap.parse_args()

d = np.load(args.npz)
node_T0 = d["node_T"].astype(np.float32)
gt = d["gt_nodes"].astype(np.float32)
n = node_T0.shape[0]

link_set = links_mod.LinkSet(
    ref=jnp.asarray(d["link_ref"]),
    mov=jnp.asarray(d["link_mov"]),
    T=jnp.asarray(d["link_T"]),
    cov=jnp.asarray(d["link_cov"] * args.link_cov_scale),
    score=jnp.asarray(d["link_score"]),
    mask=jnp.asarray(d["link_mask"]),
)
gp = GraphParams(
    valid_min_idx_dist=25,
    valid_max_dist=args.max_dist,
    valid_max_angular_dist=0.4,
    valid_max_score=args.max_score,
    solver_max_seg_len=64,
)

# ---- link-quality ground truth ----
ref_np = d["link_ref"]
mov_np = d["link_mov"]
gt_rel = np.asarray(
    se2.sub(jnp.asarray(gt[ref_np]), jnp.asarray(gt[mov_np]))
)
lerr = np.linalg.norm(d["link_T"][:, :2] - gt_rel[:, :2], axis=-1)
aerr = np.abs(np.asarray(se2.normalize_angle(
    jnp.asarray(d["link_T"][:, 2] - gt_rel[:, 2])
)))


def link_stats(keep):
    keep = np.asarray(keep)
    k = int(keep.sum())
    if k == 0:
        return "0 links"
    le, ae = lerr[keep], aerr[keep]
    wrong = int(((le > 0.25) | (ae > 0.15)).sum())
    return (f"{k} links | wrong(>0.25m|0.15rad)={wrong} ({100*wrong/k:.1f}%) "
            f"| med err {np.median(le):.3f} m, p95 {np.percentile(le,95):.3f} m")


def edges_from(keep_np, node_T):
    e_i, e_j, e_meas, e_info = [], [], [], []
    oi, oj = d["odom_i"], d["odom_j"]
    for k in range(len(oi)):
        if oj[k] >= n:
            continue
        e_i.append(oi[k]); e_j.append(oj[k])
        e_meas.append(d["odom_rel"][k])
        e_info.append(opt_mod.spd_info_np(d["odom_cov"][k]))
    for k in range(keep_np.shape[0]):
        if not keep_np[k]:
            continue
        e_i.append(ref_np[k]); e_j.append(mov_np[k])
        e_meas.append(d["link_T"][k])
        cov = d["link_cov"][k] * args.link_cov_scale
        e_info.append(opt_mod.spd_info_np(cov, eps=args.info_eps))
    return opt_mod.EdgeList(
        i=jnp.asarray(np.asarray(e_i, np.int32)),
        j=jnp.asarray(np.asarray(e_j, np.int32)),
        meas=jnp.asarray(np.asarray(e_meas, np.float32)),
        info=jnp.asarray(np.asarray(e_info, np.float32)),
        mask=jnp.ones(len(e_i), bool),
    )


print(f"nodes={n}  online ATE={tum.ate_rmse(node_T0, gt):.4f}")
node_T = jnp.asarray(node_T0)
prev_keep = None
for rnd in range(args.rounds):
    gp_rnd = gp
    if args.max_dist_later > 0 and rnd >= 1:
        gp_rnd = gp.replace(
            valid_max_dist=args.max_dist_later,
            valid_max_angular_dist=0.2,
        )
    keep = links_mod.valid_links(gp_rnd, node_T, link_set)
    keep_np = np.asarray(keep)
    if args.oracle:
        keep_np = keep_np & (lerr <= 0.25) & (aerr <= 0.15)
    print(f"round {rnd}: {link_stats(keep_np)}")
    if prev_keep is not None and (keep_np == prev_keep).all():
        print("fixpoint")
        break
    prev_keep = keep_np
    kern = args.kernel
    delt = args.delta
    if rnd >= 1 and args.kernel_later:
        kern = args.kernel_later
        delt = args.delta_later or args.delta
    edges = edges_from(keep_np, node_T)
    if args.solver == "direct":
        part = sd.make_segments(n, edges, max_seg_len=gp.solver_max_seg_len)
        node_T, chi2 = sd.optimize_direct(
            node_T, edges, part, prior_information=gp.prior_information,
            iterations=args.gn_iters, damping=gp.gn_damping,
            robust_kernel=kern, robust_delta=delt,
        )
    else:
        node_T, chi2 = opt_mod.optimize(
            node_T, edges, prior_information=gp.prior_information,
            iterations=args.gn_iters, damping=gp.gn_damping,
            robust_kernel=kern, robust_delta=delt,
        )
    ate = tum.ate_rmse(np.asarray(node_T), gt)
    ate_al = tum.ate_rmse(np.asarray(node_T), gt, align=True)
    print(f"  -> chi2={float(chi2):.1f}  ATE={ate:.4f} "
          f"(aligned {ate_al:.4f})")
print(f"final ATE = {tum.ate_rmse(np.asarray(node_T), gt):.4f} "
      f"(aligned {tum.ate_rmse(np.asarray(node_T), gt, align=True):.4f}; "
      f"online aligned {tum.ate_rmse(node_T0, gt, align=True):.4f})")
