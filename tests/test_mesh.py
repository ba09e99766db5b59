"""Mesh/sharding helpers on the 8-virtual-device CPU mesh."""

import pytest

pytestmark = pytest.mark.quick

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pixelwiseregression_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    process_local_lines,
    replicated,
    shard_batch,
)


def test_make_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_axis0():
    mesh = make_mesh()
    batch = {"frame": np.zeros((16, 4, 4), np.float32), "cube": np.ones(16, np.float32)}
    out = shard_batch(batch, mesh)
    for v in out.values():
        assert v.sharding.spec == P("data")
        assert len(v.addressable_shards) == 8


def test_gradient_allreduce_over_mesh():
    """jit with sharded batch + replicated params must produce identical
    (replicated) gradients — XLA inserts the all-reduce."""
    mesh = make_mesh()
    x = jax.device_put(jnp.arange(16.0).reshape(16, 1), batch_sharding(mesh))
    w = jax.device_put(jnp.ones((1,)), replicated(mesh))

    @jax.jit
    def grad_w(w, x):
        return jax.grad(lambda w: jnp.sum((x * w) ** 2))(w)

    g = grad_w(w, x)
    # gradient must be the full-batch gradient, identical on every device
    want = float(2 * jnp.sum(jnp.arange(16.0) ** 2))
    assert abs(float(g[0]) - want) < 1e-3
    shards = g.addressable_shards
    vals = {float(np.asarray(s.data).ravel()[0]) for s in shards}
    assert len(vals) == 1


def test_process_local_lines_single_process():
    lines = [f"l{i}" for i in range(10)]
    assert process_local_lines(lines) == lines  # process_count == 1


def test_process_local_lines_multihost_interleave(monkeypatch):
    """With process_count=3, per-host line lists must disjointly cover the
    global list and reassemble it round-robin (global batch = concat of
    local batches in process order)."""
    lines = [f"l{i}" for i in range(10)]
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    parts = []
    for i in range(3):
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        parts.append(process_local_lines(lines))
    assert sorted(sum(parts, [])) == sorted(lines)
    rebuilt = [parts[k % 3][k // 3] for k in range(len(lines))]
    assert rebuilt == lines

    # shared shuffle order is applied before the round-robin split
    order = [9, 3, 5, 1, 0, 2, 8, 7, 4, 6]
    parts = []
    for i in range(3):
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        parts.append(process_local_lines(lines, shuffle_order=order))
    shuffled = [lines[k] for k in order]
    assert [parts[k % 3][k // 3] for k in range(len(lines))] == shuffled


def test_shard_batch_multihost_branch(monkeypatch):
    """Exercise the jax.make_array_from_process_local_data branch (dead in
    single-process runs): with a mocked process_count it must take that
    path and, in a 1-process world, assemble exactly the device_put result."""
    mesh = make_mesh()
    batch = {
        "frame": np.arange(16 * 4, dtype=np.float32).reshape(16, 4),
        "cube": np.arange(16, dtype=np.float32),
    }
    want = shard_batch(batch, mesh)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    out = shard_batch(batch, mesh)
    for k in batch:
        assert out[k].sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(want[k]))
