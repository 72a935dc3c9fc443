"""Device-mesh utilities.

The reference is single-process, single-GPU (main.py:34-37,301) with no
distributed backend (SURVEY §2: none).  Here scaling is TPU-native: a 2-D
``('data', 'model')`` jax.sharding.Mesh; the graph batch shards over
``data`` (gradient psums ride ICI via XLA collectives), and wide dense
kernels shard over ``model``.  Everything works unchanged on one device
(trivial 1x1 mesh) and on a virtual CPU mesh for tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(data: int = 1, model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if need > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def mesh_from_config(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    return make_mesh(cfg.data, cfg.model, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (graph-batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_graphbatch(batch, mesh: Mesh):
    """device_put every array in a GraphBatch with its batch axis on 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def param_shardings(params, mesh: Mesh, min_size: int = 1 << 14):
    """Assign each parameter a NamedSharding: the widest axis divisible by
    the 'model' axis size is sharded for tensors of at least ``min_size``
    elements; everything else is replicated.

    This is the simple tensor-parallel layout for this model family: the big
    flattened-graph Dense kernels (e.g. [N·h, hidden] and latent projections)
    dominate parameter count, and their output dim shards cleanly; XLA then
    inserts the matching all-gathers/reduce-scatters.
    """
    m = mesh.shape["model"]

    def one(p):
        if m == 1 or p.ndim == 0 or p.size < min_size:
            return NamedSharding(mesh, P())
        # prefer sharding the last (output) axis, then earlier axes
        for ax in reversed(range(p.ndim)):
            if p.shape[ax] % m == 0 and p.shape[ax] >= m:
                spec = [None] * p.ndim
                spec[ax] = "model"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(one, params)


def shard_params(params, mesh: Mesh, min_size: int = 1 << 14):
    shardings = param_shardings(params, mesh, min_size)
    return jax.tree.map(jax.device_put, params, shardings)
