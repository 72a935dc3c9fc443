"""Random spanning-tree sampling for the sg-branch data augmentation.

The reference expands each graph into ``sampling_num`` random spanning trees by
running scipy's minimum-spanning-tree over uniformly re-weighted edges
(``/root/reference/input_data.py:18-38``) inside a per-graph Python loop
(``input_data.py:71-83``).  MST extraction is inherently host-side work; here
it is implemented as

  * a vectorized NumPy Kruskal (union-find) that runs one (graph, sample) pair
    per call but avoids scipy's CSR round-trip, and
  * an optional C++ fast path (``snd_vae_tpu.utils.native``) that samples all
    S trees for a whole batch of graphs in one call using a thread pool,

with results cached per dataset so accelerator steps never wait on MSTs
(SURVEY §7 "spanning-tree augmentation on accelerator cadence").
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _kruskal_random_tree(edges: np.ndarray, num_nodes: int, rng: np.random.Generator) -> np.ndarray:
    """One random spanning tree via Kruskal on uniformly weighted edges.

    ``edges`` is [E, 2] with each undirected edge listed in both directions
    (the reference's np.where output, input_data.py:72-74).  Random weights
    make the MST a (approximately) uniform random spanning tree draw, matching
    ``scipy_spanning_tree`` (input_data.py:18-24).  Returns [T, 2] directed
    tree edges (one direction each).
    """
    e = edges[edges[:, 0] < edges[:, 1]]  # dedupe undirected pairs
    if len(e) == 0:
        return np.zeros((0, 2), dtype=np.int64)
    order = rng.permutation(len(e))  # random weights == random edge order
    parent = np.arange(num_nodes)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    out = []
    for idx in order:
        u, v = int(e[idx, 0]), int(e[idx, 1])
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v))
            if len(out) == num_nodes - 1:
                break
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


def sample_spanning_tree_adj(
    adj: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """One random spanning-tree adjacency (symmetric, zero diagonal)."""
    n = adj.shape[0]
    x, y = np.nonzero(adj)
    edges = np.stack([x, y], axis=1)
    tree = _kruskal_random_tree(edges, n, rng)
    out = np.zeros_like(adj)
    if len(tree):
        out[tree[:, 0], tree[:, 1]] = 1
        out[tree[:, 1], tree[:, 0]] = 1
    return out


def sample_spanning_trees(
    adj_batch: np.ndarray,
    num_samples: int,
    seed: int = 0,
    use_native: bool = True,
) -> np.ndarray:
    """[G, N, N] adjacencies -> [G, S, N, N] spanning-tree samples.

    Mirrors the augmentation loop at input_data.py:70-83 but with a keyed
    NumPy Generator instead of global np.random state, and an optional C++
    fast path.
    """
    if use_native:
        try:
            from ..utils import native

            if native.available():
                return native.sample_spanning_trees(adj_batch, num_samples, seed)
        except Exception:
            pass  # fall back to NumPy
    rng = np.random.default_rng(seed)
    G = adj_batch.shape[0]
    out = np.zeros((G, num_samples) + adj_batch.shape[1:], dtype=adj_batch.dtype)
    for g in range(G):
        for s in range(num_samples):
            out[g, s] = sample_spanning_tree_adj(adj_batch[g], rng)
    return out
