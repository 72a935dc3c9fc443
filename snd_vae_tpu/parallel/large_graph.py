"""Large-graph scaling: node-sharded GCN aggregation over the device mesh.

The reference caps out at N=50 because its ops are dense O(N³)-O(N⁴)
(layers.py:143-277) on one device.  For graphs beyond single-chip memory the
TPU-native layout (BASELINE.json config 5, SURVEY §5) shards the *node axis*
across the mesh's ``model`` dimension:

  * adjacency rows  A[i_local, :]  — [N/d, N] per device
  * node features   X[i_local, :]  — [N/d, F] per device

One GCN layer ``lrelu(A @ (X W))`` then needs each device to see all
projected features: project locally ([N/d, F] @ [F, H] — no comms), tiled
``all_gather`` of the [N/d, H] projections over ICI, then the local row-block
contraction ([N/d, N] @ [N, H]) on the MXU.

Everything is expressed with ``jax.shard_map`` so XLA chooses ring
collectives over ICI; the same code runs on the CPU test mesh.

The blocked Pallas kernel (nn/pallas) remains available behind
``use_pallas`` as an EXPERIMENTAL alternative for the local contraction,
but it is not part of the recommended design: XLA's native dot wins at
every measured shape — N=2048/4096/8192 aggregation and every end-to-end
crossover probe (BASELINE.md "Large-N scaling", "Pallas") — because the
plain contraction is already bandwidth-bound and the fused motif kernel
pads narrow hidden widths to the 128-lane tile.  The round-3 rank-R
reassociation (nn/spatial_conv.py) further obsoleted the fused kernel's
interface: the main path no longer materializes the f_ik tensor the kernel
consumes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.basic import lrelu


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def sharded_graph_conv(
    adj: jnp.ndarray,
    x: jnp.ndarray,
    w: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    leak: Optional[float] = 0.2,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """One node-sharded GCN layer: lrelu(A @ (X W)).

    adj [N, N] (rows sharded over ``axis``), x [N, F] (rows sharded),
    w [F, H] (replicated).  Returns [N, H] rows-sharded.
    """

    def layer(a_blk, x_blk, w_full):
        xw = jnp.dot(x_blk, w_full, preferred_element_type=jnp.float32).astype(
            x_blk.dtype
        )
        xw_full = jax.lax.all_gather(xw, axis, tiled=True)  # [N, H]
        if use_pallas:
            from ..nn.pallas import blocked_adj_matmul

            out = blocked_adj_matmul(a_blk, xw_full, leak=leak)
        else:
            out = jnp.dot(
                a_blk, xw_full, preferred_element_type=jnp.float32
            ).astype(x_blk.dtype)
            if leak is not None:
                out = jnp.maximum(out, leak * out)
        return out

    return _shard_map(
        layer,
        mesh,
        in_specs=(P(axis, None), P(axis, None), P(None, None)),
        out_specs=P(axis, None),
    )(adj, x, w)


def sharded_degree(adj: jnp.ndarray, mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """Row degrees of a rows-sharded adjacency (no comms needed)."""
    return _shard_map(
        lambda a: jnp.sum(a, axis=-1, keepdims=True),
        mesh,
        in_specs=(P(axis, None),),
        out_specs=P(axis, None),
    )(adj)


def sharded_gcn_normalize(
    adj: jnp.ndarray, mesh: Mesh, axis: str = "model"
) -> jnp.ndarray:
    """Symmetric D^-1/2 (A+I) D^-1/2 for a rows-sharded adjacency
    (preprocessing.py:15-30, distributed).  Column scales arrive via one
    all_gather of the [N/d, 1] local inverse-sqrt degrees."""

    def norm(a_blk):
        d = mesh.shape[axis]
        n = a_blk.shape[1]
        rows = a_blk.shape[0]
        idx = jax.lax.axis_index(axis)
        # add the identity slice for this row block
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0) + idx * rows
        a_blk = a_blk + (cols == row_ids).astype(a_blk.dtype)
        deg = jnp.sum(a_blk, axis=-1, keepdims=True)
        inv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        inv_full = jax.lax.all_gather(inv, axis, tiled=True)  # [N, 1]
        return a_blk * inv * inv_full[:, 0][None, :]

    return _shard_map(
        norm, mesh, in_specs=(P(axis, None),), out_specs=P(axis, None)
    )(adj)


def shard_graph(
    adj: np.ndarray, x: np.ndarray, mesh: Mesh, axis: str = "model"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad N to the axis size and device_put with rows-sharded layout."""
    d = mesh.shape[axis]
    n = adj.shape[0]
    pad = (-n) % d
    adj_p = np.pad(np.asarray(adj), ((0, pad), (0, pad)))
    x_p = np.pad(np.asarray(x), ((0, pad), (0, 0)))
    spec_a = NamedSharding(mesh, P(axis, None))
    return (
        jax.device_put(jnp.asarray(adj_p), spec_a),
        jax.device_put(jnp.asarray(x_p), spec_a),
    )


class ShardedGCNEncoder:
    """Multi-layer node-sharded GCN encoder for large graphs: stacked
    ``sharded_graph_conv`` with mean-pooled graph readout.

    Parameters are a list of [F_in, H] kernels (created by ``init``)."""

    def __init__(self, mesh: Mesh, hidden: Sequence[int], axis: str = "model",
                 use_pallas: bool = False):
        self.mesh = mesh
        self.hidden = tuple(hidden)
        self.axis = axis
        self.use_pallas = use_pallas

    def init(self, key: jax.Array, num_features: int):
        params = []
        f = num_features
        for h in self.hidden:
            key, sub = jax.random.split(key)
            params.append(
                jax.random.truncated_normal(sub, -2, 2, (f, h), jnp.float32) * 0.02
            )
            f = h
        return params

    def apply(self, params, adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for w in params:
            h = sharded_graph_conv(
                adj, h, w, self.mesh, self.axis, use_pallas=self.use_pallas
            )
        # graph readout: mean over nodes (psum over the shard axis)
        def pool(h_blk):
            s = jnp.sum(h_blk, axis=0)
            return jax.lax.psum(s, self.axis)[None, :]

        n = adj.shape[0]
        pooled = _shard_map(
            pool, self.mesh, in_specs=(P(self.axis, None),), out_specs=P(None, None)
        )(h)
        return pooled[0] / n
