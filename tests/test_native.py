"""Native C++ component tests: CARMEN parser (vs the pure-Python
fallback) and the NGF binary grid codec round-trip."""

import numpy as np
import pytest

from ndt_feature_graph_tpu.io import native


def write_sample_clf(path, n_scans=5, n_beams=8):
    rng = np.random.default_rng(0)
    lines = ["# test log"]
    for k in range(n_scans):
        r = rng.uniform(0.5, 10.0, n_beams)
        odom = [0.1 * k, 0.02 * k, 0.01 * k]
        parts = (
            ["FLASER", str(n_beams)]
            + [f"{v:.4f}" for v in r]
            + ["0.0", "0.0", "0.0"]
            + [f"{v:.4f}" for v in odom]
            + [f"{100.0 + k:.4f}", "host", f"{100.0 + k:.4f}"]
        )
        lines.append(" ".join(parts))
    # A ROBOTLASER1 record too.
    r = rng.uniform(0.5, 10.0, n_beams)
    parts = (
        ["ROBOTLASER1", "0", "-1.57", "3.14", "0.0175", "50.0", "0.01",
         "0", str(n_beams)]
        + [f"{v:.4f}" for v in r]
        + ["0"]
        + ["1.0", "2.0", "0.3"]      # laser pose
        + ["1.1", "2.1", "0.35"]     # robot pose
        + ["0.1", "0.0", "0.0", "0.0", "0.0"]
        + ["200.5", "host", "200.5"]
    )
    lines.append(" ".join(parts))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_native_library_builds():
    lib = native.load()
    assert lib is not None, "g++ build of native library failed"


def test_carmen_native_matches_python(tmp_path):
    p = str(tmp_path / "test.clf")
    write_sample_clf(p)
    log_native = native.read_carmen(p)
    log_py = native._read_carmen_py(p, 81.91)
    assert native.load() is not None
    # Python fallback parses FLASER only; compare that subset.
    n_fl = log_py.ranges.shape[0]
    assert log_native.ranges.shape[0] == n_fl + 1  # + ROBOTLASER1
    np.testing.assert_allclose(
        log_native.ranges[:n_fl], log_py.ranges, atol=1e-4
    )
    np.testing.assert_allclose(
        log_native.odom_abs[:n_fl], log_py.odom_abs, atol=1e-4
    )
    np.testing.assert_allclose(
        log_native.times[:n_fl], log_py.times, atol=1e-6
    )
    # ROBOTLASER1 robot pose captured.
    np.testing.assert_allclose(
        log_native.odom_abs[-1], [1.1, 2.1, 0.35], atol=1e-4
    )


def test_ngf_roundtrip(tmp_path):
    import jax.numpy as jnp

    from ndt_feature_graph_tpu.config import NDTMapParams
    from ndt_feature_graph_tpu.ops import ndt_map

    params = NDTMapParams(resolution=0.5, size_x=8.0, size_y=8.0)
    rng = np.random.default_rng(1)
    pts = rng.normal([1.0, 1.0], 0.3, (64, 2)).astype(np.float32)
    grid = ndt_map.empty_grid(params, jnp.zeros(2))
    grid = ndt_map.add_points(
        grid, params, jnp.asarray(pts), jnp.ones(64, bool)
    )
    grid = ndt_map.update_occupancy(
        grid, params, jnp.zeros(2), jnp.asarray(pts), jnp.ones(64, bool)
    )

    p = str(tmp_path / "map.ngf")
    native.write_grid(p, grid, params.resolution)
    back, res = native.read_grid(p)
    assert res == params.resolution
    for a, b in zip(grid, back):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_carmen_to_sequence(tmp_path):
    """CARMEN absolute odometry -> relative Sequence odometry."""
    p = str(tmp_path / "seq.clf")
    write_sample_clf(p, n_scans=6, n_beams=360)
    log = native.read_carmen(p)
    from ndt_feature_graph_tpu.io.carmen import log_to_sequence

    seq = log_to_sequence(log, max_range=20.0)
    assert seq.ranges.shape[0] == 7
    # Relative odometry composes back to absolute.
    import jax.numpy as jnp

    from ndt_feature_graph_tpu.core import se2

    pose = jnp.asarray(log.odom_abs[0])
    for t in range(1, 6):
        pose = se2.compose(pose, seq.odom[t])
    np.testing.assert_allclose(
        np.asarray(pose), log.odom_abs[5], atol=1e-4
    )
