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


def save_pytree(path, tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in leaves:
        arrays[_path_str(p)] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def load_pytree(path, template):
    """Rebuild `template`'s structure with arrays from the file."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for p, leaf in leaves:
        key = _path_str(p)
        if key not in data:
            raise KeyError(
                f"checkpoint {path} missing leaf {key!r}"
            )
        arr = data[key]
        out.append(jnp.asarray(arr, np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), out
    )
