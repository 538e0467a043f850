"""Visualization layer: static overview PNG (viz/plot.py) and the
interactive self-contained HTML viewer (viz/html.py) — the L9
replacements for the rviz marker builders / plugin and the interactive
debug nodes (ndt_feature_rviz.h:24-322)."""

import json
import re

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import (
    FeatureParams,
    FuserParams,
    GraphParams,
    NDTMapParams,
    SLAMParams,
)
from ndt_feature_graph_tpu.graph.slam import NDTFeatureGraphSLAM
from ndt_feature_graph_tpu.io import dataset

PARAMS = SLAMParams(
    fuser=FuserParams(
        ndt=NDTMapParams(
            resolution=0.5, size_x=16.0, size_y=16.0, sensor_range=6.0,
            max_points_per_scan=128, max_cells=128, ray_samples=16,
        ),
        features=FeatureParams(
            num_beams=128, max_range=6.0, max_features=8,
            ransac_hypotheses=32, max_correspondences=16,
        ),
    ),
    graph=GraphParams(new_node_transl_dist=1.5, max_nodes=8),
)


def _tiny_slam():
    traj = dataset.loop_trajectory(24, radius=3.0)
    seq = dataset.simulate_sequence(
        jax.random.PRNGKey(3), traj, num_beams=128, max_range=6.0
    )
    slam = NDTFeatureGraphSLAM(PARAMS, seed=0)
    slam.initialize(seq.gt[0], jnp.zeros(3), seq.ranges[0], seq.hit[0])
    slam.run_sequence_chunked(seq.odom, seq.ranges, seq.hit, chunk=8)
    slam.finalize_current_node()
    return slam, seq


def test_overview_png_and_html_viewer(tmp_path):
    slam, seq = _tiny_slam()
    assert len(slam.nodes) >= 2

    from ndt_feature_graph_tpu.viz import plot

    png = plot.save_slam_overview(
        tmp_path / "overview.png", slam, gt=np.asarray(seq.gt)
    )
    assert (tmp_path / "overview.png").stat().st_size > 1000

    from ndt_feature_graph_tpu.viz import html as viz_html

    out = viz_html.export_html(
        tmp_path / "viewer.html", slam, gt=np.asarray(seq.gt)
    )
    text = (tmp_path / "viewer.html").read_text()
    # Self-contained: no external references.
    assert "http://" not in text and "https://" not in text
    # The embedded payload must round-trip as JSON and describe the run.
    m = re.search(r"const D = (\{.*?\});\n", text, re.S)
    assert m, "embedded data blob not found"
    payload = json.loads(m.group(1))
    assert len(payload["nodes"]) == len(slam.nodes)
    assert len(payload["traj"]) == len(slam.trajectory)
    assert payload["resolution"] == PARAMS.fuser.ndt.resolution
    # Every node carries world-frame occupied cells within map bounds.
    for nd in payload["nodes"]:
        assert len(nd["pose"]) == 3
        if nd["cells"]:
            c = np.asarray(nd["cells"])
            assert np.isfinite(c).all()
            assert np.abs(c).max() < 50.0
