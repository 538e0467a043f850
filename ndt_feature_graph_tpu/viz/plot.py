"""Matplotlib visualization: the L9 replacement for the rviz marker
builders + rviz plugin (ndt_rviz.h, ndt_feature_rviz.h:24-322,
ndt_rviz_visualisation_ndt_feature) — NDT cell ellipses, occupancy,
graph nodes/links, trajectories, MCL particles — rendered to PNG/axes
instead of ROS markers."""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import Ellipse  # noqa: E402


def plot_ndt_cells(ax, means, covs, mask, color="tab:blue", alpha=0.4,
                   n_sigma=2.0):
    """Covariance ellipses per cell (markerNDTCells equivalent)."""
    means = np.asarray(means).reshape(-1, 2)
    covs = np.asarray(covs).reshape(-1, 2, 2)
    mask = np.asarray(mask).reshape(-1)
    for mu, cov in zip(means[mask], covs[mask]):
        evals, evecs = np.linalg.eigh(cov)
        angle = np.degrees(np.arctan2(evecs[1, 1], evecs[0, 1]))
        e = Ellipse(
            mu,
            2 * n_sigma * np.sqrt(max(evals[1], 1e-12)),
            2 * n_sigma * np.sqrt(max(evals[0], 1e-12)),
            angle=angle,
            facecolor=color,
            alpha=alpha,
            edgecolor="none",
        )
        ax.add_patch(e)


def plot_occupancy(ax, occ_logodds, origin, resolution, cmap="gray_r"):
    occ = 1.0 / (1.0 + np.exp(-np.asarray(occ_logodds)))
    h, w = occ.shape
    origin = np.asarray(origin)
    extent = [
        origin[0],
        origin[0] + w * resolution,
        origin[1],
        origin[1] + h * resolution,
    ]
    ax.imshow(
        occ, origin="lower", extent=extent, cmap=cmap, vmin=0, vmax=1,
        alpha=0.8,
    )


def plot_pose(ax, pose, color="tab:red", length=0.5):
    pose = np.asarray(pose)
    ax.plot(pose[0], pose[1], "o", color=color, ms=4)
    ax.arrow(
        pose[0], pose[1],
        length * np.cos(pose[2]), length * np.sin(pose[2]),
        head_width=0.12, color=color,
    )


def plot_trajectories(ax, named_trajectories):
    """named_trajectories: dict name -> (T, 3) array."""
    for name, traj in named_trajectories.items():
        traj = np.asarray(traj)
        ax.plot(traj[:, 0], traj[:, 1], label=name, lw=1.2)
    ax.legend(loc="best", fontsize=8)
    ax.set_aspect("equal")


def plot_graph(ax, node_T, links=None, link_mask=None):
    """Node poses + loop-closure links
    (publishMarkerNDTFeatureNodes/Links equivalent)."""
    node_T = np.asarray(node_T)
    ax.plot(node_T[:, 0], node_T[:, 1], "k.-", lw=0.8, ms=6)
    for i, p in enumerate(node_T):
        ax.annotate(str(i), p[:2], fontsize=7)
    if links is not None:
        ref = np.asarray(links.ref)
        mov = np.asarray(links.mov)
        keep = (
            np.asarray(link_mask)
            if link_mask is not None
            else np.asarray(links.mask)
        )
        for k in range(len(ref)):
            if not keep[k]:
                continue
            a, b = node_T[ref[k]], node_T[mov[k]]
            ax.plot([a[0], b[0]], [a[1], b[1]], "g--", lw=1.0)


def plot_particles(ax, poses, logw=None, color="tab:orange"):
    """MCL particle cloud (markerParticlesNDTMCL3D equivalent)."""
    poses = np.asarray(poses)
    if logw is not None:
        w = np.exp(np.asarray(logw) - np.asarray(logw).max())
        s = 2 + 18 * w / w.max()
    else:
        s = 4
    ax.scatter(poses[:, 0], poses[:, 1], s=s, c=color, alpha=0.5)


def save_slam_overview(path, slam, gt=None):
    """One-call overview figure: map occupancy of every node + graph +
    trajectories."""
    fig, ax = plt.subplots(figsize=(9, 9))
    res = slam.params.fuser.ndt.resolution
    from ndt_feature_graph_tpu.core import se2
    import jax.numpy as jnp

    for nd, T in zip(slam.nodes, slam.node_T):
        # Occupancy is stored in the node frame; just scatter occupied
        # cell centres transformed to global.
        occ = np.asarray(nd.occ)
        h, w = occ.shape
        ys, xs = np.nonzero(occ > 0.5)
        if len(ys) == 0:
            continue
        centers = np.stack(
            [
                np.asarray(nd.occ_origin)[0] + (xs + 0.5) * res,
                np.asarray(nd.occ_origin)[1] + (ys + 0.5) * res,
            ],
            -1,
        )
        world = np.asarray(
            se2.transform_points(jnp.asarray(T), jnp.asarray(centers))
        )
        ax.scatter(world[:, 0], world[:, 1], s=1, c="0.6")
    trajs = {"estimate": np.stack(slam.trajectory)}
    if gt is not None:
        trajs["ground truth"] = np.asarray(gt)
    plot_trajectories(ax, trajs)
    plot_graph(ax, np.stack(slam.node_T))
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path
