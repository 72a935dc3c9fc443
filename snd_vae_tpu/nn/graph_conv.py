"""Graph convolutions.

  * ``GraphConv``      — batched dense GCN lrelu(A @ (X W)) over raw
                         adjacency (layers.py:115-125); encoder g-branch.
  * ``GraphConvFull``  — per-channel GCN over a multi-channel adjacency
                         [B,N,N,C], channel outputs concatenated
                         (layers.py:127-139); geoGCN/posGCN path.
  * ``normalized_graph_conv`` — the same matmul over the GCN-normalized
                         adjacency D^-1/2(A+I)D^-1/2 (preprocessing.py:15-30),
                         the first-class decode/encode op named in the
                         north-star spec.

All contractions are plain batched matmuls: XLA tiles them straight onto the
MXU; the weight is shared across the batch (the reference tf.tile at
layers.py:120 is just broadcasting).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from . import init as inits
from .basic import lrelu


class GraphConv(nn.Module):
    """lrelu(A @ (X W)); W ~ truncated_normal(0.02) (layers.py:115-125)."""

    features: int
    stddev: float = 0.02

    @nn.compact
    def __call__(self, adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel", inits.truncated_normal(self.stddev), (x.shape[-1], self.features)
        )
        xw = jnp.einsum("...nf,fo->...no", x, w, preferred_element_type=jnp.float32)
        conv = jnp.einsum(
            "...nm,...mo->...no", adj, xw.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return lrelu(conv)


class GraphConvFull(nn.Module):
    """Multi-channel-adjacency GCN (layers.py:127-139).

    adj: [B,N,N,C]; per channel c computes lrelu(A_c @ (X W)); channel
    results concatenate on the feature axis -> [B,N,C*features].
    """

    features: int
    stddev: float = 0.02

    @nn.compact
    def __call__(self, adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel", inits.truncated_normal(self.stddev), (x.shape[-1], self.features)
        )
        xw = jnp.einsum("bnf,fo->bno", x, w, preferred_element_type=jnp.float32)
        conv = jnp.einsum(
            "bnmc,bmo->bnco", adj, xw.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = lrelu(conv)
        b, n = out.shape[0], out.shape[1]
        return out.reshape(b, n, -1)


def normalized_graph_conv(adj_norm: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """A_norm @ (X W) with a caller-supplied normalized adjacency."""
    xw = jnp.einsum("...nf,fo->...no", x, w, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "...nm,...mo->...no", adj_norm, xw.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
