"""Place recognition / relocalization against a scan database.

Replaces flirtlib_ros's localization-monitor + place-rec + scan-map
stack (localization_monitor_node.cpp:69-547: mongo DB of RefScans;
unlocalized → RANSAC-match the live scan against every stored scan,
keep the best if >= min_num_matches (8), evaluate badness, publish the
pose; localized → insert novel scans; generate_scan_map.cpp:115-140:
store when >= 0.5 m from all stored poses).

The database is fixed-capacity stacked arrays; the match-against-all
loop is one vmapped RANSAC batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import FeatureParams
from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.features import descriptor, detector, ransac


class ScanDatabase(NamedTuple):
    """RefScan store (conversions.h RefScan: scan + pose + features)."""

    poses: jnp.ndarray        # (K, 3) world pose of each stored scan
    feats: detector.FeatureSet  # stacked (K, F, ...)
    desc: jnp.ndarray         # (K, F, D)
    mask: jnp.ndarray         # (K,) slot used


def empty_database(fp: FeatureParams, capacity: int) -> ScanDatabase:
    f = fp.max_features
    from ndt_feature_graph_tpu.features.descriptor import descriptor_dim

    d = descriptor_dim(fp)
    return ScanDatabase(
        poses=jnp.zeros((capacity, 3)),
        feats=detector.FeatureSet(
            pts=jnp.zeros((capacity, f, 2)),
            angles=jnp.zeros((capacity, f)),
            scales=jnp.ones((capacity, f)),
            response=jnp.zeros((capacity, f)),
            mask=jnp.zeros((capacity, f), bool),
        ),
        desc=jnp.full((capacity, f, d), 0.5),
        mask=jnp.zeros(capacity, bool),
    )


def insert_scan(
    db: ScanDatabase,
    fp: FeatureParams,
    pose,
    ranges,
    hit,
    min_dist: float = 0.5,
) -> ScanDatabase:
    """Store the scan if it is novel (>= min_dist from every stored
    pose) and capacity remains (generate_scan_map semantics)."""
    pose = jnp.asarray(pose, jnp.float32)
    d = jnp.linalg.norm(db.poses[:, :2] - pose[:2], axis=-1)
    novel = ~jnp.any(db.mask & (d < min_dist))
    slot = jnp.argmin(db.mask)          # first free slot
    has_room = ~jnp.all(db.mask)
    do = bool(novel & has_room)
    if not do:
        return db
    feats = detector.detect(fp, ranges, hit)
    desc = descriptor.describe(fp, feats, ranges, hit)
    return ScanDatabase(
        poses=db.poses.at[slot].set(pose),
        feats=jax.tree.map(
            lambda buf, new: buf.at[slot].set(new), db.feats, feats
        ),
        desc=db.desc.at[slot].set(desc),
        mask=db.mask.at[slot].set(True),
    )


def save_database(path, db: ScanDatabase):
    """Persist the RefScan store to one npz.

    The reference keeps its RefScans in a mongo collection that
    survives node restarts (localization_monitor_node.cpp:69-547,
    generate_scan_map.cpp:115-140 'scan map' persisted via
    mongo_ros::MessageCollection); here the whole fixed-capacity
    database pytree checkpoints through io.serialize."""
    from ndt_feature_graph_tpu.io import serialize

    serialize.save_pytree(path, db)


def load_database(path, fp: FeatureParams) -> ScanDatabase:
    """Rebuild a ScanDatabase from a checkpoint (capacity comes from
    the file)."""
    from ndt_feature_graph_tpu.io import serialize

    data = np.load(path)
    capacity = int(data["poses"].shape[0])
    template = empty_database(fp, capacity)
    return serialize.load_pytree(path, template)


def relocalize(
    db: ScanDatabase,
    fp: FeatureParams,
    ranges,
    hit,
    key,
    min_num_matches: int = 8,
):
    """Match the live scan against every stored scan; return
    (pose (3,) or None, best_index, num_inliers).

    The RANSAC transform maps the live sensor frame onto the stored
    scan's sensor frame; the world pose estimate is then
    ref_pose ∘ T (updateUnlocalized, localization_monitor_node.cpp:
    346-396)."""
    feats = detector.detect(fp, ranges, hit)
    desc = descriptor.describe(fp, feats, ranges, hit)
    k = db.poses.shape[0]
    keys = jax.random.split(key, k)

    def one(i, kk):
        ref_f = jax.tree.map(lambda x: x[i], db.feats)
        ref_d = db.desc[i]
        res = ransac.match_sets(fp, ref_f, ref_d, feats, desc, kk)
        n = jnp.where(db.mask[i] & res.valid, res.num_inliers, 0)
        return n, res.T

    ninl, Ts = jax.vmap(one)(jnp.arange(k), keys)
    best = int(jnp.argmax(ninl))
    n_best = int(ninl[best])
    if n_best < min_num_matches:
        return None, best, n_best
    pose = np.asarray(
        se2.compose(db.poses[best], Ts[best])
    )
    return pose, best, n_best
