"""NDTMapHMT tile spill + recall (ops/hmt.py).

Contract under test (reference NDTMapHMT writeTo/hmt_map_dir round
trip, gated by beHMT at ndt_feature_fuser_hmt.h:5-16): driving the
rolling window off mapped ground must SPILL the evicted cells to the
tile store, and returning must RECALL them exactly — cell sufficient
statistics bit-comparable to what was evicted, not re-observed.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndt_feature_graph_tpu.config import NDTMapParams
from ndt_feature_graph_tpu.ops import hmt, ndt_map


def small_params():
    return NDTMapParams(
        resolution=0.5, size_x=20.0, size_y=20.0, sensor_range=10.0,
        max_points_per_scan=256, max_cells=256, ray_samples=16,
    )


def populated_map(params, seed=0, tile_cells=16):
    m = hmt.HMTMap(params, (0.0, 0.0), tile_cells=tile_cells)
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(
        rng.uniform(-8.0, 8.0, (256, 2)).astype(np.float32)
    )
    mask = jnp.ones(256, bool)
    m.add_points(pts, mask)
    m.update_occupancy(jnp.zeros(2), pts, mask)
    return m


def grid_arrays(grid):
    g = jax.device_get(grid)
    return {
        "origin": np.asarray(g.origin),
        "count": np.asarray(g.count),
        "psum": np.asarray(g.psum),
        "outer": np.asarray(g.outer),
        "occ": np.asarray(g.occ),
    }


def assert_grids_identical(a, b):
    for k in ("origin", "count", "psum", "outer", "occ"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def drive(m, xs):
    for cx in xs:
        m.recenter((float(cx), 0.0))


def test_zero_shift_noop():
    params = small_params()
    m = populated_map(params)
    before = grid_arrays(m.grid)
    m.recenter((0.0, 0.0))
    assert_grids_identical(before, grid_arrays(m.grid))
    assert not m.tiles


def test_spill_then_exact_recall():
    """Drive out 2 window widths (progressive half-window steps — the
    eviction happens band by band across tile boundaries), come back:
    every sufficient statistic and the occupancy must be bit-identical
    to the pre-departure window."""
    params = small_params()
    m = populated_map(params)
    before = grid_arrays(m.grid)
    total_count = before["count"].sum()
    assert total_count > 0

    drive(m, (10, 20, 30, 40))
    away = grid_arrays(m.grid)
    assert away["count"].sum() == 0.0, "window should be empty far away"
    assert np.all(away["occ"] == 0.0)
    assert m.stored_cell_count() > 0, "evicted cells must be stored"

    drive(m, (30, 20, 10, 0))
    after = grid_arrays(m.grid)
    assert_grids_identical(before, after)
    # Everything moved back out of the store.
    assert m.stored_cell_count() == 0
    assert not m.tiles


def test_recall_is_not_reobservation():
    """Total mass is conserved across spill/reload — no duplication of
    cells that straddle tile boundaries or partial-eviction bands."""
    params = small_params()
    m = populated_map(params, seed=3, tile_cells=8)
    before = grid_arrays(m.grid)

    # Diagonal drive: evicts L-shaped bands (both axes shift).
    for c in ((7, 5), (15, 11), (24, 19), (15, 11), (7, 5), (0, 0)):
        m.recenter((float(c[0]), float(c[1])))
    after = grid_arrays(m.grid)
    assert_grids_identical(before, after)


def test_partial_overlap_keeps_live_and_stored_disjoint():
    """Stop with the window HALF overlapping the mapped region: the
    live window and the store partition the cells exactly."""
    params = small_params()
    m = populated_map(params)
    before = grid_arrays(m.grid)
    m.recenter((10.0, 0.0))  # half-window shift
    live = grid_arrays(m.grid)
    live_mass = live["count"].sum()
    stored_mass = sum(
        t["count"].sum() for t in m.tiles.values()
    )
    np.testing.assert_allclose(
        live_mass + stored_mass, before["count"].sum()
    )
    assert live_mass > 0 and stored_mass > 0
    # The surviving half matches the original right half exactly.
    h, w = params.grid_h, params.grid_w
    sx = 20  # 10 m / 0.5 m
    np.testing.assert_array_equal(
        live["count"][:, : w - sx], before["count"][:, sx:]
    )


def test_accumulation_after_recall():
    """Re-observing recalled ground keeps accumulating the recursive
    sample-variance statistics (recall + update, not overwrite)."""
    params = small_params()
    m = populated_map(params)
    before = grid_arrays(m.grid)
    drive(m, (10, 20, 10, 0))
    pts = jnp.asarray([[1.2, 1.2]], jnp.float32)
    m.add_points(pts, jnp.ones(1, bool))
    after = grid_arrays(m.grid)
    iy, ix = ndt_map.cell_index(
        params, jnp.asarray(after["origin"]), pts
    )
    iy, ix = int(iy[0]), int(ix[0])
    assert after["count"][iy, ix] == before["count"][iy, ix] + 1


def test_save_load_roundtrip(tmp_path):
    """hmt_map_dir contract: persist mid-journey (store + live window),
    reload in a fresh process-equivalent, drive back, recall exactly."""
    params = small_params()
    m = populated_map(params)
    before = grid_arrays(m.grid)
    drive(m, (10, 20, 30))

    d = str(tmp_path / "hmt_map_dir")
    m.save(d)
    m2 = hmt.HMTMap.load(d, params)
    assert m2.stored_cell_count() == m.stored_cell_count()
    assert_grids_identical(grid_arrays(m.grid), grid_arrays(m2.grid))

    drive(m2, (20, 10, 0))
    assert_grids_identical(before, grid_arrays(m2.grid))


def test_global_gaussians_cover_live_and_stored():
    params = small_params()
    m = populated_map(params)
    means_before, _ = m.global_gaussians()
    m.recenter((10.0, 0.0))
    means_after, _ = m.global_gaussians()
    # Same gaussians regardless of which side of the spill they sit on.
    a = means_before[np.lexsort(means_before.T)]
    b = means_after[np.lexsort(means_after.T)]
    np.testing.assert_allclose(a, b, atol=1e-5)
