"""NDT grid builder tests: cell statistics vs numpy (SURVEY.md §7.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import NDTMapParams
from ndt_feature_graph_tpu.ops import ndt_map

PARAMS = NDTMapParams(
    resolution=0.5, size_x=10.0, size_y=10.0, max_points_per_scan=256,
    max_cells=64,
)


def test_cell_stats_match_numpy():
    rng = np.random.default_rng(0)
    # Two clusters in distinct cells.
    c1 = rng.normal([1.1, 1.1], 0.08, (50, 2))
    c2 = rng.normal([-2.2, 0.6], 0.05, (40, 2))
    pts = np.concatenate([c1, c2]).astype(np.float32)
    mask = np.ones(len(pts), bool)

    grid = ndt_map.empty_grid(PARAMS, jnp.zeros(2))
    grid = ndt_map.add_points(grid, PARAMS, jnp.asarray(pts), jnp.asarray(mask))
    mean, cov, valid = ndt_map.finalize(grid, PARAMS)
    mean, cov, valid = map(np.asarray, (mean, cov, valid))

    origin = np.asarray(grid.origin)
    for cluster in (c1, c2):
        # All cluster points that landed in the modal cell.
        idx = np.floor((cluster - origin) / PARAMS.resolution).astype(int)
        vals, counts = np.unique(idx, axis=0, return_counts=True)
        iy, ix = vals[np.argmax(counts)][::-1]
        in_cell = (idx == vals[np.argmax(counts)]).all(1)
        ref_pts = cluster[in_cell]
        assert valid[iy, ix]
        np.testing.assert_allclose(
            mean[iy, ix], ref_pts.mean(0), atol=1e-4
        )
        ref_cov = np.cov(ref_pts.T, ddof=1)
        # Conditioning may clamp tiny eigenvalues; compare loosely.
        np.testing.assert_allclose(cov[iy, ix], ref_cov, atol=2e-3)


def test_min_points_gate():
    pts = jnp.array([[0.1, 0.1], [0.12, 0.14]])  # only 2 points
    grid = ndt_map.empty_grid(PARAMS, jnp.zeros(2))
    grid = ndt_map.add_points(grid, PARAMS, pts, jnp.ones(2, bool))
    _, _, valid = ndt_map.finalize(grid, PARAMS)
    assert not np.asarray(valid).any()


def test_mask_respected():
    pts = jnp.tile(jnp.array([[0.1, 0.1]]), (10, 1)) + 0.01 * jnp.arange(
        10
    )[:, None] * jnp.array([[1.0, -1.0]])
    mask = jnp.zeros(10, bool)
    grid = ndt_map.empty_grid(PARAMS, jnp.zeros(2))
    grid = ndt_map.add_points(grid, PARAMS, pts, mask)
    assert float(jnp.sum(grid.count)) == 0.0


def test_out_of_bounds_dropped():
    pts = jnp.array([[100.0, 100.0], [-100.0, 3.0]])
    grid = ndt_map.empty_grid(PARAMS, jnp.zeros(2))
    grid = ndt_map.add_points(grid, PARAMS, pts, jnp.ones(2, bool))
    assert float(jnp.sum(grid.count)) == 0.0


def test_incremental_equals_batch():
    """Streaming sample-variance semantics: adding in two batches must
    equal adding at once (CELL_UPDATE_MODE_SAMPLE_VARIANCE)."""
    rng = np.random.default_rng(1)
    pts = rng.normal([0.6, 0.6], 0.1, (64, 2)).astype(np.float32)
    m = np.ones(64, bool)

    g1 = ndt_map.empty_grid(PARAMS, jnp.zeros(2))
    g1 = ndt_map.add_points(g1, PARAMS, jnp.asarray(pts), jnp.asarray(m))

    g2 = ndt_map.empty_grid(PARAMS, jnp.zeros(2))
    g2 = ndt_map.add_points(
        g2, PARAMS, jnp.asarray(pts[:30]), jnp.asarray(m[:30])
    )
    g2 = ndt_map.add_points(
        g2, PARAMS, jnp.asarray(pts[30:]), jnp.asarray(m[30:])
    )
    for a, b in zip(ndt_map.finalize(g1, PARAMS), ndt_map.finalize(g2, PARAMS)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_occupancy_hits_and_misses():
    params = PARAMS
    origin = jnp.array([0.0, 0.0])
    endpoint = jnp.array([[3.0 + 0.25, 0.25]])  # cell centre-ish
    grid = ndt_map.empty_grid(params, jnp.zeros(2))
    grid = ndt_map.update_occupancy(
        grid, params, origin, endpoint, jnp.ones(1, bool)
    )
    occ = np.asarray(ndt_map.occupancy_rescaled(grid))
    oy, ox = np.asarray(
        ndt_map.cell_index(params, grid.origin, endpoint)
    ).reshape(2)
    assert occ[oy, ox] > 0.5  # hit cell occupied
    # A cell along the ray is free.
    my, mx = np.asarray(
        ndt_map.cell_index(params, grid.origin, jnp.array([[1.5, 0.25]]))
    ).reshape(2)
    assert occ[my, mx] < 0.5
    # An untouched cell stays at 0.5 (no information).
    assert abs(occ[0, 0] - 0.5) < 1e-6


def test_cell_list_compaction():
    rng = np.random.default_rng(2)
    pts = np.concatenate(
        [
            rng.normal([1.1, 1.1], 0.05, (30, 2)),
            rng.normal([-1.9, -1.4], 0.05, (30, 2)),
        ]
    ).astype(np.float32)
    grid = ndt_map.empty_grid(PARAMS, jnp.zeros(2))
    grid = ndt_map.add_points(
        grid, PARAMS, jnp.asarray(pts), jnp.ones(len(pts), bool)
    )
    cl = ndt_map.to_cell_list(grid, PARAMS)
    n_valid = int(jnp.sum(cl.mask))
    assert n_valid >= 2
    # Means of valid cells are near the cluster centres.
    means = np.asarray(cl.means)[np.asarray(cl.mask)]
    d = np.linalg.norm(
        means[:, None, :] - np.array([[1.1, 1.1], [-1.9, -1.4]])[None], axis=-1
    )
    assert (d.min(1) < 0.5).all()


def test_cell_list_transform():
    cl = ndt_map.CellList(
        means=jnp.array([[1.0, 0.0]]),
        covs=jnp.array([[[0.04, 0.0], [0.0, 0.01]]]),
        mask=jnp.ones(1, bool),
    )
    moved = cl.transform(jnp.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(
        np.asarray(moved.means), [[0.0, 1.0]], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(moved.covs), [[[0.01, 0.0], [0.0, 0.04]]], atol=1e-6
    )


def test_recenter_preserves_retained_cells():
    """Rolling-map window shift (NDTMapHMT equivalent): statistics of
    cells that stay inside the window are exact; everything outside is
    dropped; zero shift is a no-op."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-4.5, 4.5, (400, 2)).astype(np.float32)
    mask = jnp.ones(len(pts), bool)

    grid = ndt_map.empty_grid(PARAMS, jnp.zeros(2))
    grid = ndt_map.add_points(grid, PARAMS, jnp.asarray(pts), mask)
    grid = ndt_map.update_occupancy(
        grid, PARAMS, jnp.zeros(2), jnp.asarray(pts), mask
    )

    # No-op shift: identical pytree.
    same = ndt_map.recenter(grid, PARAMS, jnp.zeros(2))
    for a, b in zip(jax.tree.leaves(grid), jax.tree.leaves(same)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Shift by (+2.0, -1.5) m = (4, -3) cells: rebuild reference grid
    # at the new origin from only the points that remain inside.
    new_center = jnp.asarray([2.0, -1.5])
    moved = ndt_map.recenter(grid, PARAMS, new_center)
    np.testing.assert_allclose(
        np.asarray(moved.origin), np.asarray(grid.origin) + [2.0, -1.5],
        atol=1e-6,
    )
    ref = ndt_map.empty_grid(PARAMS, new_center)
    ref = ndt_map.add_points(ref, PARAMS, jnp.asarray(pts), mask)
    np.testing.assert_allclose(
        np.asarray(moved.count), np.asarray(ref.count), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(moved.psum), np.asarray(ref.psum), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(moved.outer), np.asarray(ref.outer), atol=1e-3
    )
    # Finalized gaussians agree wherever both are valid.
    m1, c1, v1 = map(np.asarray, ndt_map.finalize(moved, PARAMS))
    m2, c2, v2 = map(np.asarray, ndt_map.finalize(ref, PARAMS))
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(m1[v1], m2[v2], atol=1e-4)
    np.testing.assert_allclose(c1[v1], c2[v2], atol=1e-3)

    # Shift far beyond the window empties the grid.
    gone = ndt_map.recenter(grid, PARAMS, jnp.asarray([100.0, 100.0]))
    assert float(jnp.sum(gone.count)) == 0.0
    assert float(jnp.sum(jnp.abs(gone.occ))) == 0.0


def test_to_cell_list_touched_bit_exact():
    """The touched-candidate compaction (to_cell_list_touched — the
    fleet path's local-cell build) is BIT-exact vs the full-grid
    to_cell_list: same cells, same ascending order, same stats."""
    import numpy as np

    from ndt_feature_graph_tpu.io import dataset

    p = NDTMapParams(
        resolution=0.5, size_x=30.0, size_y=30.0, sensor_range=15.0,
        max_points_per_scan=512, max_cells=512,
    )
    for seed in range(3):
        traj = dataset.loop_trajectory(4, radius=3.0)
        seq = dataset.simulate_sequence(
            jax.random.PRNGKey(seed), traj, num_beams=360,
            max_range=15.0,
        )
        pts, mask = dataset.scan_to_points(seq.ranges[1], seq.hit[1])
        g = ndt_map.empty_grid(p, jnp.zeros(2))
        g, touched = ndt_map.add_points_touched(g, p, pts, mask)
        a = ndt_map.to_cell_list(g, p)
        b = ndt_map.to_cell_list_touched(g, p, touched)
        n_valid = int(jnp.sum(a.mask))
        assert n_valid > 20, n_valid
        np.testing.assert_array_equal(
            np.asarray(a.mask), np.asarray(b.mask)
        )
        m = np.asarray(a.mask)
        np.testing.assert_array_equal(
            np.asarray(a.means)[m], np.asarray(b.means)[m]
        )
        np.testing.assert_array_equal(
            np.asarray(a.covs)[m], np.asarray(b.covs)[m]
        )
