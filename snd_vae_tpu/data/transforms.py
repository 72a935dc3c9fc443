"""Jit-able graph transforms.

Re-implements the reference's host-side NumPy/SciPy preprocessing as pure
``jnp`` functions that fuse into the surrounding XLA program:

  * ``gcn_normalize``        — D^-1/2 (A+I) D^-1/2 (preprocessing.py:15-30)
  * ``pairwise_distances``   — the O(G·N²) Python loop ``cal_rel_dist``
                               (input_data.py:145-151) as one broadcast
  * ``zscore``               — ZscoreNormalization (main.py:110-113)
  * edge-masking utilities   — train/val/test edge splits and edge dropout
                               (preprocessing.py:52-140), vectorized

plus padding helpers for variable-N batching (SURVEY §7 "padded batching").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gcn_normalize(adj: jnp.ndarray, add_self_loops: bool = True) -> jnp.ndarray:
    """Symmetric GCN normalization D^-1/2 (A + I) D^-1/2.

    Batched, dense, jit-able version of ``preprocess_graph``
    (preprocessing.py:23-30).  Accepts [..., N, N].
    """
    n = adj.shape[-1]
    a = adj + jnp.eye(n, dtype=adj.dtype) if add_self_loops else adj
    deg = jnp.sum(a, axis=-1)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return a * inv_sqrt[..., :, None] * inv_sqrt[..., None, :]


def pairwise_distances(coords: jnp.ndarray) -> jnp.ndarray:
    """[..., N, D] coords -> [..., N, N] Euclidean distances.

    One broadcast subtraction + norm replaces the triple Python loop of
    ``cal_rel_dist`` (input_data.py:145-151).
    """
    diff = coords[..., :, None, :] - coords[..., None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def zscore(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """Z-score normalization (main.py:110-113)."""
    return (x - mean) / std


def zero_diagonal(adj: jnp.ndarray) -> jnp.ndarray:
    """Zero the diagonal of [..., N, N] (load-time cleanup, input_data.py:64-65)."""
    n = adj.shape[-1]
    return adj * (1.0 - jnp.eye(n, dtype=adj.dtype))


def edge_logit_mask(n: int, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> jnp.ndarray:
    """The decoder's off-diagonal mask ``diag`` (model.py:185): ones minus eye."""
    m = 1.0 - jnp.eye(n, dtype=dtype)
    return jnp.broadcast_to(m, batch_shape + (n, n))


def motif_adj_3d(adj: jnp.ndarray) -> jnp.ndarray:
    """2-hop motif tensor g3d[i,j,k] = A[i,j]·A[j,k] — the jit-able, batched
    form of ``generate_adj_3d``'s O(N³) Python loop (input_data.py:40-52).
    The spatial-motif convs compute this implicitly; exposed for analysis."""
    return adj[..., :, :, None] * adj[..., None, :, :]


def sparse_to_tuple(sparse_mx) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...]]:
    """scipy sparse -> (coords [nnz,2], values, shape) (preprocessing.py:7-13)."""
    import scipy.sparse as sp

    if not sp.isspmatrix_coo(sparse_mx):
        sparse_mx = sparse_mx.tocoo()
    coords = np.vstack((sparse_mx.row, sparse_mx.col)).transpose()
    return coords, sparse_mx.data, sparse_mx.shape


def dropout_edges(adj: jnp.ndarray, keep_prob: float, key) -> jnp.ndarray:
    """Random edge dropout with inverted scaling — the dense analog of the
    reference's ``dropout_sparse`` over nonzero adjacency entries
    (layers.py:22-30); symmetric masks for undirected graphs."""
    import jax

    mask = jax.random.bernoulli(key, keep_prob, adj.shape)
    mask = jnp.triu(mask) | jnp.triu(mask, 1).swapaxes(-1, -2)
    return jnp.where(mask, adj / keep_prob, 0.0)


# ---------------------------------------------------------------------------
# Edge splitting / masking (legacy VGAE capability, preprocessing.py:52-140)
# ---------------------------------------------------------------------------

def split_edges(
    adj: np.ndarray,
    rng: np.random.Generator,
    test_frac: float = 0.1,
    val_frac: float = 0.05,
) -> dict:
    """Randomly split a single graph's undirected edges into train/val/test
    sets plus matched false (non-edge) sets.

    Host-side NumPy (it is data preparation, run once per dataset), replacing
    the NetworkX loops of ``get_test_edges`` (preprocessing.py:82-116) with
    vectorized sampling.  Unlike the reference this does not guarantee the
    train graph stays connected; combined with the spanning-tree augmentation
    the training signal keeps global connectivity information.
    Returns dict with 'adj_train' and edge index arrays [K, 2].
    """
    n = adj.shape[0]
    iu, ju = np.triu_indices(n, k=1)
    is_edge = adj[iu, ju] > 0
    edges = np.stack([iu[is_edge], ju[is_edge]], axis=1)
    non_edges = np.stack([iu[~is_edge], ju[~is_edge]], axis=1)

    e = len(edges)
    num_test = int(np.floor(e * test_frac))
    num_val = int(np.floor(e * val_frac))
    perm = rng.permutation(e)
    test_e = edges[perm[:num_test]]
    val_e = edges[perm[num_test : num_test + num_val]]
    train_e = edges[perm[num_test + num_val :]]

    fperm = rng.permutation(len(non_edges))
    test_f = non_edges[fperm[:num_test]]
    val_f = non_edges[fperm[num_test : num_test + num_val]]

    adj_train = np.zeros_like(adj)
    adj_train[train_e[:, 0], train_e[:, 1]] = 1
    adj_train[train_e[:, 1], train_e[:, 0]] = 1
    return {
        "adj_train": adj_train,
        "train_edges": train_e,
        "val_edges": val_e,
        "val_edges_false": val_f,
        "test_edges": test_e,
        "test_edges_false": test_f,
    }


def edge_dropout(adj: np.ndarray, dropout: float, rng: np.random.Generator) -> np.ndarray:
    """Randomly remove a fraction of undirected edges (preprocessing.py:118-140)."""
    n = adj.shape[0]
    iu, ju = np.triu_indices(n, k=1)
    is_edge = adj[iu, ju] > 0
    edges = np.stack([iu[is_edge], ju[is_edge]], axis=1)
    num_drop = int(np.floor(len(edges) * dropout))
    keep = rng.permutation(len(edges))[num_drop:]
    kept = edges[keep]
    out = np.zeros_like(adj)
    out[kept[:, 0], kept[:, 1]] = 1
    out[kept[:, 1], kept[:, 0]] = 1
    return out


# ---------------------------------------------------------------------------
# Padding for variable-N batching
# ---------------------------------------------------------------------------

def pad_graph(
    adj: np.ndarray, features: np.ndarray, coords: np.ndarray, n_pad: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad one graph to ``n_pad`` nodes; returns (adj, feat, coords, mask)."""
    n = adj.shape[0]
    assert n <= n_pad, (n, n_pad)
    pad = n_pad - n
    adj_p = np.pad(adj, ((0, pad), (0, pad)))
    feat_p = np.pad(features, ((0, pad), (0, 0)))
    coords_p = np.pad(coords, ((0, pad), (0, 0)))
    mask = np.zeros(n_pad, dtype=adj.dtype)
    mask[:n] = 1
    return adj_p, feat_p, coords_p, mask
