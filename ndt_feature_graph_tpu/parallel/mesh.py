"""Device-mesh helpers.

The reference has no distributed backend at all (SURVEY.md §2.3 bottom);
scale-out here is new design: jax.sharding Mesh + shard_map with XLA
collectives over ICI (intra-slice) / DCN (inter-slice).  Conventions:
  axis "dp"  — data parallel over submaps / scan streams / link pairs
  axis "gp"  — graph parallel over factor-graph edges
A 1-D mesh uses "dp" for both roles.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="dp"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_to_multiple(x, multiple, axis=0, fill=0):
    """Pad a leading axis so it divides evenly across shards."""
    import jax.numpy as jnp

    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=fill)


def replicated(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def sharded(mesh, x, axis="dp"):
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
