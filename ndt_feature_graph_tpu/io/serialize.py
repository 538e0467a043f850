"""Checkpointing: pytree <-> npz.

Replaces the reference's per-node file formats (.jff NDT maps, .feat
boost archives, .T pose text archives — graph.cpp:408-489,
ndt_feature_node.h:100-152, save/load mostly commented out upstream)
and the NDTGraphMsg wire snapshot (ndtgraph_conversion.h:17-216) with
one self-describing npz per checkpoint: every leaf keyed by its pytree
path.  Loading uses a template tree for structure, so NamedTuple nesting
round-trips exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts) if parts else "_root"


def save_pytree(path, tree, exclude_suffixes=()):
    """Save every leaf keyed by its pytree path.

    exclude_suffixes: leaf-path suffixes to OMIT from the file — for
    leaves that are derivable from their siblings (e.g. the packed
    (H*W, 8) gather layout of a DenseTarget, reconstructible from
    means/covs/valid; storing it would add ~1.3 MB/node of redundant
    data).  The matching loader must supply a `derive` handler."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in leaves:
        key = _path_str(p)
        if any(key.endswith(s) for s in exclude_suffixes):
            continue
        arrays[key] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def load_pytree(path, template, derive=None):
    """Rebuild `template`'s structure with arrays from the file.

    derive: optional callable (key, data_dict) -> np.ndarray invoked
    for leaves absent from the file (saved with exclude_suffixes, or
    checkpoints from before a leaf was added).  Raising KeyError from
    it (or leaving it None) keeps the strict behavior."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for p, leaf in leaves:
        key = _path_str(p)
        if key in data:
            arr = data[key]
        elif derive is not None:
            arr = derive(key, data)
        else:
            raise KeyError(
                f"checkpoint {path} missing leaf {key!r}"
            )
        out.append(jnp.asarray(arr, np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), out
    )


def derive_packed(key, data):
    """`derive` handler for DenseTarget.packed leaves: rebuild the
    channel-packed (H*W, 8) gather layout from the sibling
    means/covs/valid arrays (ops/d2d._pack_fields).  Handles both a
    single target ('.../target/packed') and a stacked node bank with a
    leading N axis.  Also makes checkpoints saved BEFORE the packed
    field existed loadable (they have the siblings but not the pack)."""
    if not key.endswith("/packed"):
        raise KeyError(key)
    from ndt_feature_graph_tpu.ops import d2d

    prefix = key[: -len("packed")]
    means = jnp.asarray(data[prefix + "means"])
    covs = jnp.asarray(data[prefix + "covs"])
    valid = jnp.asarray(data[prefix + "valid"])
    pack = d2d._pack_fields
    if means.ndim == 4:  # stacked (N, H, W, 2)
        return np.asarray(jax.vmap(pack)(means, covs, valid))
    return np.asarray(pack(means, covs, valid))
