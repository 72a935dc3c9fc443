"""GraphBatch — the canonical pytree for a batch of spatial networks.

Replaces the reference's eight parallel feed_dict arrays
(``/root/reference/preprocessing.py:32-50``, placeholders at
``main.py:252-264``) with one registered pytree carrying explicit
``[B, S, N, ...]`` axes.  The reference folds the spanning-tree sample axis S
into the batch axis via flag mutation (``model.py:100-101``) and ``np.tile``
(``main.py:307-309``); here S is a real axis so the sample-to-graph pairing is
correct by construction (SURVEY §7 quirk 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GraphBatch:
    """A batch of B spatial networks with N nodes each.

    Attributes:
      adj:      [B, N, N]   float — original (truth) adjacency, zero diagonal.
      features: [B, N, F]   float — node attributes (normalized).
      coords:   [B, N, D]   float — node coordinates (normalized).
      rel:      [B, N, N, R] float — pairwise relation features (distances).
      adj_samples: [B, S, N, N] float or None — spanning-tree augmentations
          of ``adj`` (input_data.py:70-83).  None for datasets without the
          augmentation (mnist: input_data.py:224-300).
      factors:  [B, K] float or None — ground-truth generative factors
          (2D_prop.npy, input_data.py:60) for disentanglement evaluation.
      node_mask: [B, N] float or None — 1 for real nodes, 0 for padding.
          None means all nodes are real (fixed-N datasets).
      feat_samples: [B, S, N, F] float or None — per-sample node features for
          the sg-branch.  None (the default) pairs every spanning-tree sample
          with its own graph's features; the loaders fill this under
          ``Config.reproduce_pairing_skew`` with the reference's np.tile
          pairing (main.py:307-309 vs :132, SURVEY §7 quirk 1).
      rel_samples: [B, S, N, N, R] float or None — per-sample relation
          features, same contract as ``feat_samples``.
    """

    adj: jax.Array
    features: jax.Array
    coords: jax.Array
    rel: jax.Array
    adj_samples: Optional[jax.Array] = None
    factors: Optional[jax.Array] = None
    node_mask: Optional[jax.Array] = None
    feat_samples: Optional[jax.Array] = None
    rel_samples: Optional[jax.Array] = None

    @property
    def batch_size(self) -> int:
        return self.adj.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.adj.shape[1]

    @property
    def num_samples(self) -> int:
        return 1 if self.adj_samples is None else self.adj_samples.shape[1]

    def pair_mask(self) -> Optional[jax.Array]:
        """[B, N, N] mask of real node pairs, or None if nothing is padded."""
        if self.node_mask is None:
            return None
        return self.node_mask[:, :, None] * self.node_mask[:, None, :]

    def slice_batch(self, start: int, size: int) -> "GraphBatch":
        """Contiguous batch slice (the reference's batching, main.py:315-323)."""
        take = lambda x: None if x is None else x[start : start + size]
        return GraphBatch(
            adj=take(self.adj),
            features=take(self.features),
            coords=take(self.coords),
            rel=take(self.rel),
            adj_samples=take(self.adj_samples),
            factors=take(self.factors),
            node_mask=take(self.node_mask),
            feat_samples=take(self.feat_samples),
            rel_samples=take(self.rel_samples),
        )

    def to_networkx(self, index: int):
        """One graph as a NetworkX graph — interop with the reference's
        NetworkX-based tooling (input_data.py:9).  Nodes carry ``coords``
        and ``features`` attributes; edges carry ``label`` (the adjacency
        value: 1 for binary graphs, the relation id for scene).  Returns a
        DiGraph when the adjacency is asymmetric, else a Graph; padded
        nodes (node_mask=0) are dropped."""
        import networkx as nx

        adj = np.asarray(self.adj[index])
        coords = np.asarray(self.coords[index])
        feats = np.asarray(self.features[index])
        n = adj.shape[0]
        if self.node_mask is not None:
            n = int(np.asarray(self.node_mask[index]).sum())
        adj = adj[:n, :n]
        directed = not np.allclose(adj, adj.T)
        g = nx.DiGraph() if directed else nx.Graph()
        for v in range(n):
            g.add_node(v, coords=coords[v].copy(), features=feats[v].copy())
        ii, jj = np.nonzero(adj > 0.5)
        for a, b in zip(ii.tolist(), jj.tolist()):
            if directed or a < b:
                g.add_edge(a, b, label=float(adj[a, b]))
        return g

    def astype(self, dtype) -> "GraphBatch":
        cast = lambda x: None if x is None else x.astype(dtype)
        return GraphBatch(
            adj=cast(self.adj),
            features=cast(self.features),
            coords=cast(self.coords),
            rel=cast(self.rel),
            adj_samples=cast(self.adj_samples),
            factors=self.factors,
            node_mask=cast(self.node_mask),
            feat_samples=cast(self.feat_samples),
            rel_samples=cast(self.rel_samples),
        )


def from_numpy(
    adj: np.ndarray,
    features: np.ndarray,
    coords: np.ndarray,
    rel: np.ndarray,
    adj_samples: Optional[np.ndarray] = None,
    factors: Optional[np.ndarray] = None,
    node_mask: Optional[np.ndarray] = None,
    feat_samples: Optional[np.ndarray] = None,
    rel_samples: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> GraphBatch:
    """Build a device GraphBatch from host arrays, normalizing shapes.

    ``rel`` may be [B,N,N] (the on-disk layout, input_data.py:59) or
    [B,N,N,R]; a trailing relation axis is added if missing
    (mirrors the reshape at main.py:250).
    """
    if rel.ndim == 3:
        rel = rel[..., None]
    if features.ndim == 2:
        features = features[..., None]
    if rel_samples is not None and rel_samples.ndim == 4:
        rel_samples = rel_samples[..., None]
    if feat_samples is not None and feat_samples.ndim == 3:
        feat_samples = feat_samples[..., None]
    as_f = lambda x: None if x is None else jnp.asarray(x, dtype)
    return GraphBatch(
        adj=as_f(adj),
        features=as_f(features),
        coords=as_f(coords),
        rel=as_f(rel),
        adj_samples=as_f(adj_samples),
        factors=None if factors is None else jnp.asarray(factors),
        node_mask=as_f(node_mask),
        feat_samples=as_f(feat_samples),
        rel_samples=as_f(rel_samples),
    )


def from_networkx(graphs, num_nodes: Optional[int] = None,
                  dtype=jnp.float32) -> GraphBatch:
    """Build a GraphBatch from NetworkX graphs whose nodes carry ``coords``
    (and optionally ``features``) attributes — the inverse of
    ``GraphBatch.to_networkx``.  Graphs smaller than ``num_nodes`` (default:
    the largest input) are zero-padded with a matching node_mask; ``rel``
    is recomputed as pairwise coordinate distances (input_data.py:145-151)."""
    graphs = list(graphs)
    n = num_nodes or max(g.number_of_nodes() for g in graphs)
    first_coords = next(iter(graphs[0].nodes(data="coords")))[1]
    d = len(np.asarray(first_coords).reshape(-1))
    f_attr = next(iter(graphs[0].nodes(data="features")))[1]
    f = 1 if f_attr is None else len(np.asarray(f_attr).reshape(-1))

    B = len(graphs)
    adj = np.zeros((B, n, n))
    coords = np.zeros((B, n, d))
    feats = np.zeros((B, n, f))
    mask = np.zeros((B, n))
    for b, g in enumerate(graphs):
        nodes = list(g.nodes())
        idx = {v: i for i, v in enumerate(nodes)}
        for v in nodes:
            i = idx[v]
            coords[b, i] = np.asarray(g.nodes[v]["coords"]).reshape(-1)
            fv = g.nodes[v].get("features")
            feats[b, i] = 1.0 if fv is None else np.asarray(fv).reshape(-1)
            mask[b, i] = 1.0
        for u, v, data in g.edges(data=True):
            w = float(data.get("label", 1.0))
            adj[b, idx[u], idx[v]] = w
            if not g.is_directed():
                adj[b, idx[v], idx[u]] = w
    diff = coords[:, :, None, :] - coords[:, None, :, :]
    rel = np.sqrt((diff * diff).sum(-1))
    rel *= mask[:, :, None] * mask[:, None, :]
    all_real = bool(np.all(mask == 1.0))
    return from_numpy(adj, feats, coords, rel,
                      node_mask=None if all_real else mask, dtype=dtype)
