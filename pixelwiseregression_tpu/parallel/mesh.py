"""Device mesh + sharding helpers for data-parallel training.

The reference trains on exactly one CUDA device (reference: train.py:133-134,
utils.py:326-330) with no distributed backend. Here scaling is expressed the
TPU-native way: a 1-D ``('data',)`` `jax.sharding.Mesh` over all chips, batch
arrays sharded on axis 0, parameters/optimizer state replicated. ``jax.jit``
with these shardings makes XLA insert the gradient all-reduce over ICI; the
same program spans multi-host slices (and multi-slice over DCN) unchanged.

The model itself is small (a few M params) so data parallelism is the whole
story; tensor/pipeline/sequence parallelism are deliberately out of scope
(no attention, fixed 128x128 resolution — see SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Iterable] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over 'data'; works for any rank via partial PartitionSpec."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with axis 0 sharded over 'data'.

    Single-process: a plain sharded device_put. Multi-host (pod slices, e.g.
    v5e-32): each process passes its *local* shard of the global batch and
    the global array is assembled via
    ``jax.make_array_from_process_local_data`` — the standard multi-host
    feeding pattern (each host only materializes its own samples).
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, x), batch
    )


def process_local_lines(lines, shuffle_order=None):
    """Partition dataset index lines across hosts: process i takes every
    process_count-th line (after an optional shared shuffle order), so the
    global batch is the concatenation of per-host local batches."""
    n = jax.process_count()
    i = jax.process_index()
    if shuffle_order is not None:
        lines = [lines[k] for k in shuffle_order]
    return lines[i::n]
