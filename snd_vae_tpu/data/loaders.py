"""Dataset loaders.

Re-implements ``/root/reference/input_data.py`` (load_data_syn :54-142,
load_data_protein :153-222, load_data_mnist :224-300, load_data_scene
:309-415) with the same tensor contract —
``(node, spatial, adj, rel, factor, adj_truth)`` — but:

  * reads the reference's on-disk ``.npy``/pickle/json layouts when present
    and falls back to the built-in synthetic generator otherwise (the
    authors' data files are private);
  * replaces per-element Python loops (rel distances, convex hulls via
    open3d) with vectorized NumPy / scipy.spatial;
  * uses a keyed ``np.random.Generator`` instead of global seed state
    (main.py:124-125);
  * pairs spanning-tree samples with their own graph (the reference's
    np.tile pairing skew, SURVEY §7 quirk 1, is reproducible via
    ``Config.reproduce_pairing_skew``).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional, Tuple

import numpy as np

from ..config import Config
from . import synthetic as syn
from .graphbatch import GraphBatch, from_numpy
from .spanning_tree import sample_spanning_trees

TRAIN_SPLITS = ("train",)
TEST_SPLITS = ("test", "test_generation", "test_disentangle", "test_reconstruct")


def _clean_adj(adj: np.ndarray) -> np.ndarray:
    """Densify, zero the diagonal, check symmetry (input_data.py:61-67)."""
    out = []
    for a in adj:
        a = a.toarray() if hasattr(a, "toarray") else np.asarray(a)
        a = a.astype(np.float64).copy()
        np.fill_diagonal(a, 0)
        if not np.allclose(a, a.T):
            raise ValueError("adjacency must be symmetric")
        out.append(a)
    return np.stack(out)


def _shuffle_all(rng: np.random.Generator, *arrays):
    """Joint shuffle (input_data.py:85-92) with a keyed generator."""
    n = len(arrays[0])
    index = rng.permutation(n)
    return tuple(None if a is None else a[index] for a in arrays)


def load_data_syn(
    type_: str,
    path: str,
    sampling_num: int = 10,
    seed: int = 1,
    num_graphs_fallback: int = 200,
    num_nodes_fallback: int = 25,
) -> Tuple[np.ndarray, ...]:
    """Synthetic 2D spatial networks (input_data.py:54-142).

    Returns (node, spatial, adj_samples, rel, factor, adj_truth) where
    node/spatial/rel are normalized by 120/600/600 and
    adj_samples is [G, S, N, N] spanning trees of adj_truth [G, N, N].
    """
    split = "train" if type_ in TRAIN_SPLITS else "test"
    d = os.path.join(path, split)
    if os.path.exists(os.path.join(d, "2D_adj.npy")):
        adj = np.load(os.path.join(d, "2D_adj.npy"), allow_pickle=True)
        node = np.load(os.path.join(d, "2D_node.npy"), allow_pickle=True) / syn.FEAT_MAX
        spatial = np.load(os.path.join(d, "2D_geometry.npy"), allow_pickle=True) / syn.BOX
        rel = np.load(os.path.join(d, "2D_rel.npy"), allow_pickle=True) / syn.BOX
        # the reference reads factors from train/ for both splits (input_data.py:103)
        factor = np.load(os.path.join(path, "train", "2D_prop.npy"), allow_pickle=True)
        adj_truth = _clean_adj(adj)
    else:
        data = syn.generate_synthetic(
            num_graphs_fallback,
            num_nodes_fallback,
            seed=seed + (0 if split == "train" else 10_000),
        )
        adj_truth = data["adj"]
        node = data["node"] / syn.FEAT_MAX
        spatial = data["geometry"] / syn.BOX
        rel = data["rel"] / syn.BOX
        factor = data["prop"]

    adj_samples = sample_spanning_trees(adj_truth, sampling_num, seed=seed)
    rng = np.random.default_rng(seed)
    node, spatial, adj_samples, rel, factor, adj_truth = _shuffle_all(
        rng, node, spatial, adj_samples, rel, factor, adj_truth
    )
    return node, spatial, adj_samples, rel, factor, adj_truth


def load_data_protein(
    type_: str,
    path: str,
    sampling_num: int = 10,
    seed: int = 1,
    num_graphs_fallback: int = 64,
    num_nodes_fallback: int = 50,
) -> Tuple[np.ndarray, ...]:
    """Protein contact graphs with 3D coords (input_data.py:153-222).

    Node features are all-ones (input_data.py:157); rel is the pairwise 3D
    distance matrix; factor is a synthetic index array (input_data.py:159-160).
    """
    split = "train" if type_ in TRAIN_SPLITS else "test"
    edge_f = os.path.join(path, f"edge_{split}.npy")
    if os.path.exists(edge_f):
        adj_truth = np.asarray(np.load(edge_f, allow_pickle=True), dtype=np.float64)
        spatial = np.asarray(np.load(os.path.join(path, f"node_{split}.npy"), allow_pickle=True))
    else:
        rng = np.random.default_rng(seed + (0 if split == "train" else 10_000))
        adjs, coords = [], []
        for _ in range(num_graphs_fallback):
            a, c, _ = syn.waxman_graph(
                num_nodes_fallback, rng, spread=0.8, density=0.3,
                feat_level=1.0, spatial_dim=3,
            )
            adjs.append(a)
            coords.append(c / syn.BOX * 20.0)  # protein-scale coordinates
        adj_truth, spatial = np.stack(adjs), np.stack(coords)
    G, N = spatial.shape[0], spatial.shape[1]
    node = np.ones((G, N), dtype=np.float64)
    rel = np.linalg.norm(spatial[:, :, None] - spatial[:, None, :], axis=-1)
    factor = np.arange(1, G + 1, dtype=np.float64)[:, None]

    adj_samples = sample_spanning_trees(adj_truth, sampling_num, seed=seed)
    rng = np.random.default_rng(seed)
    node, spatial, adj_samples, rel, factor, adj_truth = _shuffle_all(
        rng, node, spatial, adj_samples, rel, factor, adj_truth
    )
    return node, spatial, adj_samples, rel, factor, adj_truth


def _convex_hull_adj(points: np.ndarray) -> np.ndarray:
    """Adjacency from convex-hull triangles (input_data.py:235-246) using
    scipy.spatial instead of open3d."""
    from scipy.spatial import ConvexHull

    n = points.shape[0]
    adj = np.zeros((n, n), dtype=np.float64)
    tri = ConvexHull(points).simplices
    for a, b, c in tri:
        adj[a, b] = adj[b, a] = 1
        adj[b, c] = adj[c, b] = 1
        adj[a, c] = adj[c, a] = 1
    return adj


def load_data_mnist(
    type_: str,
    path: str,
    seed: int = 1,
    num_points: int = 50,
    num_graphs_fallback: int = 64,
) -> Tuple[np.ndarray, ...]:
    """3D mesh point clouds (input_data.py:224-300).

    Samples ``num_points`` per mesh, builds adjacency from convex-hull
    triangles, shifts coordinates by +10.  Returns only
    (node, spatial, adj, rel) — no spanning-tree augmentation and no factors,
    matching the reference's 4-value contract (input_data.py:300).
    """
    split = "train" if type_ in TRAIN_SPLITS else "test"
    f = os.path.join(path, f"mnist-combined-{split}-tasp_meshes.pickle")
    clouds = []
    if os.path.exists(f):
        with open(f, "rb") as fh:
            data = pickle.load(fh)
        rng = np.random.default_rng(seed)
        for mesh in data.data:
            pts = np.asarray(mesh.sample_points(npoints=num_points))
            clouds.append(pts)
    else:
        rng = np.random.default_rng(seed + (0 if split == "train" else 10_000))
        for _ in range(num_graphs_fallback):
            # digit-like blob: points on a noisy 3D curve
            t = np.sort(rng.random(num_points)) * 2 * np.pi
            pts = np.stack(
                [np.cos(t) + rng.normal(0, 0.15, num_points),
                 np.sin(2 * t) * 0.5 + rng.normal(0, 0.15, num_points),
                 t / (2 * np.pi) + rng.normal(0, 0.15, num_points)],
                axis=-1,
            )
            clouds.append(pts)
    adjs = [_convex_hull_adj(c) for c in clouds]
    spatial = np.stack(clouds)
    adj = _clean_adj(np.stack(adjs))
    G, N = spatial.shape[:2]
    node = np.ones((G, N), dtype=np.float64)
    rel = np.linalg.norm(spatial[:, :, None] - spatial[:, None, :], axis=-1)
    rng2 = np.random.default_rng(seed)
    adj, node, spatial, rel = _shuffle_all(rng2, adj, node, spatial, rel)
    return node, spatial + 10.0, adj, rel


def load_data_scene(
    type_: str,
    path: str,
    seed: int = 1,
    num_graphs_fallback: int = 64,
) -> Tuple[np.ndarray, ...]:
    """CLEVR scenes with exactly 10 objects (input_data.py:309-415).

    One-hot shape features [G,10,3], 3D coordinates, and a directed
    categorical relation adjacency (values 0..4: none/right-left/behind-front
    pairs merged as in input_data.py:344-360).  Fixes the reference's test
    branch crash (``sptial`` typo, input_data.py:414).
    """
    split = "train" if type_ in TRAIN_SPLITS else "val"
    size = 10
    f = os.path.join(path, f"CLEVR_{split}_scenes.json")
    shapes = ["sphere", "cylinder", "cube"]
    rel_feature = ["right", "behind", "front", "left"]
    rel_pairs = [{"12", "21"}, {"13", "31"}, {"24", "42"}, {"34", "43"}]
    node, spatial, adj = [], [], []
    if os.path.exists(f):
        with open(f) as fh:
            data = json.load(fh)
        for scene in data["scenes"]:
            objs = scene["objects"]
            if len(objs) != size:
                continue
            spatial.append([o["3d_coords"] for o in objs])
            oh = np.zeros((size, len(shapes)))
            for j, o in enumerate(objs):
                oh[j, shapes.index(o["shape"])] = 1
            node.append(oh)
            a = np.zeros((size, size), dtype=np.int64)
            merged = np.empty((size, size), dtype=object)
            merged[:, :] = ""
            for direction, rels in scene["relationships"].items():
                code = rel_feature.index(direction) + 1
                for k, members in enumerate(rels):
                    for m in members:
                        merged[m][k] += str(code)
                        a[m][k] = code
            for i in range(size):
                for k in range(size):
                    for pi, pair in enumerate(rel_pairs):
                        if merged[i][k] in pair:
                            a[i][k] = pi + 1
            adj.append(a)
    else:
        rng = np.random.default_rng(seed + (0 if split == "train" else 10_000))
        for _ in range(num_graphs_fallback):
            pts = rng.uniform(-3, 3, (size, 3))
            oh = np.zeros((size, len(shapes)))
            oh[np.arange(size), rng.integers(0, len(shapes), size)] = 1
            a = np.zeros((size, size), dtype=np.int64)
            # right/left from x, front/behind from y; merged pair codes 1..4
            for i in range(size):
                for k in range(size):
                    if i == k:
                        continue
                    a[i][k] = 1 if pts[i, 0] > pts[k, 0] else 2
            node.append(oh)
            spatial.append(pts)
            adj.append(a)
    node = np.asarray(node, dtype=np.float64).reshape(-1, size, len(shapes))
    spatial = np.asarray(spatial, dtype=np.float64)
    adj = np.asarray(adj, dtype=np.float64)
    rel = np.linalg.norm(spatial[:, :, None] - spatial[:, None, :], axis=-1)
    rng2 = np.random.default_rng(seed)
    adj, node, spatial, rel = _shuffle_all(rng2, adj, node, spatial, rel)
    return node, spatial, adj, rel


# ---------------------------------------------------------------------------
# Unified config-driven entry point
# ---------------------------------------------------------------------------

def tile_skew_pairing(
    node: np.ndarray, rel: np.ndarray, num_samples: int
) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's sample/graph pairing skew as per-sample arrays.

    The reference flattens spanning trees tree-major — stream index m holds
    tree ``(g=m//S, s=m%S)`` (main.py:132) — but np.tile's its
    features/spatial/rel graph-major (main.py:307-309), so stream index m is
    fed the features of graph ``m % G``.  Returns ``(feat_samples [G,S,N,F],
    rel_samples [G,S,N,N,R])`` realizing exactly that pairing, so slicing
    batches of any size from the [B,S] layout reproduces the reference's
    feed_dict stream (SURVEY §7 quirk 1).
    """
    G = node.shape[0]
    m = np.arange(G * num_samples)
    skew = (m % G).reshape(G, num_samples)    # graph index fed at stream m
    return node[skew], rel[skew]


def load_dataset(cfg: Config, split: str = "train", num_graphs: Optional[int] = None) -> GraphBatch:
    """Load (or synthesize) the configured dataset as a GraphBatch.

    Mirrors the per-dataset dispatch at main.py:128-241 but returns one
    pytree; spanning-tree samples are paired with their own graph unless
    ``cfg.reproduce_pairing_skew`` requests the reference's tile-skew.
    With ``cfg.normalize_coords`` the coordinates (and rel distances) are
    affinely mapped into the unit box using the train split's bounds.
    """
    batch = _load_raw_dataset(cfg, split, num_graphs)
    if cfg.normalize_coords:
        lo, hi = train_coord_bounds(cfg)
        scale = max(hi - lo, 1e-9)
        batch = batch.replace(
            coords=(batch.coords - lo) / scale,
            rel=batch.rel / scale,
            rel_samples=None if batch.rel_samples is None else batch.rel_samples / scale,
        )
    return batch


_BOUNDS_CACHE: dict = {}


def train_coord_bounds(cfg: Config) -> Tuple[float, float]:
    """Scalar (lo, hi) bounds of the train split's RAW coordinates — the
    affine map applied by ``Config.normalize_coords`` (x -> (x-lo)/(hi-lo)).
    Eval splits reuse these train bounds so decoded coordinates and eval
    targets share one normalized frame; invert to recover raw units."""
    key = (cfg.dataset, cfg.dataset_path, cfg.train.seed, cfg.num_nodes,
           cfg.sampling_num)
    if key not in _BOUNDS_CACHE:
        raw = _load_raw_dataset(cfg, "train", None)
        c = np.asarray(raw.coords)
        _BOUNDS_CACHE[key] = (float(c.min()), float(c.max()))
    return _BOUNDS_CACHE[key]


def _load_raw_dataset(cfg: Config, split: str = "train", num_graphs: Optional[int] = None) -> GraphBatch:
    n_fallback = num_graphs or 200
    seed = cfg.train.seed

    def _with_samples(adj_truth, node, spatial, rel, adj_s, factor=None):
        feat_s = rel_s = None
        if cfg.reproduce_pairing_skew and adj_s is not None:
            feat_s, rel_s = tile_skew_pairing(
                node if node.ndim == 3 else node[..., None],
                rel if rel.ndim == 4 else rel[..., None],
                adj_s.shape[1],
            )
        return from_numpy(
            adj_truth, node, spatial, rel, adj_samples=adj_s, factors=factor,
            feat_samples=feat_s, rel_samples=rel_s,
        )

    if cfg.dataset in ("synthetic1", "synthetic2", "synthetic3"):
        sub = {"synthetic1": "spatial_network_correlated1/25",
               "synthetic2": "spatial_network_correlated2/25",
               "synthetic3": "spatial_network_correlated3/25"}[cfg.dataset]
        node, spatial, adj_s, rel, factor, adj_truth = load_data_syn(
            split, os.path.join(cfg.dataset_path, sub), cfg.sampling_num,
            seed=seed, num_graphs_fallback=n_fallback,
            num_nodes_fallback=cfg.num_nodes,
        )
        return _with_samples(adj_truth, node, spatial, rel, adj_s, factor)
    if cfg.dataset == "protein":
        node, spatial, adj_s, rel, factor, adj_truth = load_data_protein(
            split, os.path.join(cfg.dataset_path, "protein"), cfg.sampling_num,
            seed=seed, num_graphs_fallback=n_fallback,
            num_nodes_fallback=cfg.num_nodes,
        )
        return _with_samples(adj_truth, node, spatial, rel, adj_s, factor)
    if cfg.dataset == "mnist":
        node, spatial, adj, rel = load_data_mnist(
            split, os.path.join(cfg.dataset_path, "3D_mesh"), seed=seed,
            num_points=cfg.num_nodes, num_graphs_fallback=n_fallback,
        )
        adj_s = sample_spanning_trees(adj, cfg.sampling_num, seed=seed)
        return _with_samples(adj, node, spatial, rel, adj_s)
    if cfg.dataset == "scene":
        node, spatial, adj, rel = load_data_scene(
            split, cfg.dataset_path, seed=seed, num_graphs_fallback=n_fallback
        )
        return from_numpy(adj, node, spatial, rel)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")
