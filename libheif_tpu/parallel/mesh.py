"""Device mesh and sharding helpers for tile-parallel codec work.

TPU-native replacement for the reference's per-tile thread pool
(reference: grid.cc:285-453 std::async fan-out bounded by
max_decoding_threads, context.h:72).  Tiles shard across a
jax.sharding.Mesh; XLA inserts the ICI collectives for assembly
(SURVEY.md §2.9 TPU equivalents table).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("tiles",)):
    """1D (or reshaped N-D) mesh over the first n devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axis_names) == 1:
        shape = (n,)
    elif len(axis_names) == 2:
        # favor a balanced 2D factorization
        a = int(np.floor(np.sqrt(n)))
        while n % a:
            a -= 1
        shape = (n // a, a)
    else:
        raise ValueError("only 1D/2D meshes supported here")
    dev_array = np.array(devs).reshape(shape)
    return Mesh(dev_array, axis_names)


def tile_sharding(mesh, axis: str = "tiles"):
    """NamedSharding that shards the leading (tile-batch) dimension."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m
