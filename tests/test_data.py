"""Data-layer tests: synthetic generator, spanning trees, transforms,
loaders (the reference's inline asserts — adjacency symmetry at
input_data.py:67 etc. — become real tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from snd_vae_tpu.config import Config, preset
from snd_vae_tpu.data import (
    GraphBatch,
    from_numpy,
    generate_synthetic,
    load_dataset,
    pairwise_distances,
    sample_spanning_trees,
    split_edges,
    gcn_normalize,
    zero_diagonal,
    pad_graph,
    edge_dropout,
)


def _connected(adj: np.ndarray) -> bool:
    n = adj.shape[0]
    seen = {0}
    frontier = [0]
    while frontier:
        u = frontier.pop()
        for v in np.nonzero(adj[u])[0]:
            if v not in seen:
                seen.add(v)
                frontier.append(v)
    return len(seen) == n


def test_synthetic_generator_contract():
    data = generate_synthetic(5, num_nodes=12, seed=0)
    adj = data["adj"]
    assert adj.shape == (5, 12, 12)
    assert np.allclose(adj, adj.transpose(0, 2, 1))
    assert np.all(np.diagonal(adj, axis1=1, axis2=2) == 0)
    for a in adj:
        assert _connected(a)
    assert data["node"].min() >= 0 and data["node"].max() <= 120
    assert data["geometry"].min() >= 0 and data["geometry"].max() <= 600
    # rel consistent with coords
    want = np.linalg.norm(
        data["geometry"][:, :, None] - data["geometry"][:, None, :], axis=-1
    )
    np.testing.assert_allclose(data["rel"], want, atol=1e-9)


def test_spanning_trees_are_trees():
    data = generate_synthetic(3, num_nodes=10, seed=1)
    trees = sample_spanning_trees(data["adj"], 4, seed=7, use_native=False)
    assert trees.shape == (3, 4, 10, 10)
    for g in range(3):
        for s in range(4):
            t = trees[g, s]
            assert np.allclose(t, t.T)
            assert t.sum() == 2 * (10 - 1)  # N-1 undirected edges
            assert _connected(t)
            # tree edges are a subset of the original graph's edges
            assert np.all(t <= data["adj"][g] + 1e-9)


def test_spanning_trees_random_across_samples():
    # complete graph: many distinct spanning trees exist
    n = 8
    adj = (np.ones((1, n, n)) - np.eye(n)[None]).astype(np.float64)
    trees = sample_spanning_trees(adj, 6, seed=3, use_native=False)
    distinct = {trees[0, s].tobytes() for s in range(6)}
    assert len(distinct) > 1  # random trees should differ


def test_spanning_trees_native_matches_contract():
    """The C++ fast path must produce valid random spanning trees too."""
    from snd_vae_tpu.utils import native

    if not native.available():
        pytest.skip("native library not built")
    n = 9
    adj = (np.ones((2, n, n)) - np.eye(n)[None]).astype(np.float64)
    trees = native.sample_spanning_trees(adj, 5, seed=11)
    assert trees.shape == (2, 5, n, n)
    for g in range(2):
        for s in range(5):
            t = trees[g, s]
            assert np.allclose(t, t.T)
            assert t.sum() == 2 * (n - 1)
            assert _connected(t)
    distinct = {trees[0, s].tobytes() for s in range(5)}
    assert len(distinct) > 1


def test_gcn_normalize():
    adj = jnp.asarray([[[0.0, 1.0], [1.0, 0.0]]])
    out = np.asarray(gcn_normalize(adj))
    # A+I has rows summing to 2 -> D^-1/2 (A+I) D^-1/2 = [[.5,.5],[.5,.5]]
    np.testing.assert_allclose(out, 0.5 * np.ones((1, 2, 2)), atol=1e-6)


def test_pairwise_distances_matches_loop(rng):
    coords = rng.standard_normal((2, 5, 3))
    got = np.asarray(pairwise_distances(jnp.asarray(coords)))
    for b in range(2):
        for i in range(5):
            for j in range(5):
                want = np.sqrt(((coords[b, i] - coords[b, j]) ** 2).sum())
                assert abs(got[b, i, j] - want) < 1e-5


def test_split_edges_disjoint(rng):
    data = generate_synthetic(1, num_nodes=15, seed=4)
    s = split_edges(data["adj"][0], rng)
    as_set = lambda e: {tuple(sorted(p)) for p in e.tolist()}
    train, val, test = (
        as_set(s["train_edges"]), as_set(s["val_edges"]), as_set(s["test_edges"])
    )
    assert not (train & val) and not (train & test) and not (val & test)
    fal = as_set(s["test_edges_false"]) | as_set(s["val_edges_false"])
    assert not (fal & (train | val | test))


def test_edge_dropout(rng):
    data = generate_synthetic(1, num_nodes=12, seed=5)
    adj = data["adj"][0]
    out = edge_dropout(adj, 0.5, rng)
    assert np.allclose(out, out.T)
    assert out.sum() <= adj.sum()
    assert np.all(out <= adj + 1e-9)


def test_pad_graph():
    data = generate_synthetic(1, num_nodes=6, seed=6)
    a, f, c, m = pad_graph(data["adj"][0], data["node"][0], data["geometry"][0], 10)
    assert a.shape == (10, 10) and f.shape == (10, 1) and c.shape == (10, 2)
    assert m.sum() == 6
    assert a[6:, :].sum() == 0 and a[:, 6:].sum() == 0


def test_load_dataset_synthetic_fallback():
    cfg = preset("synthetic2").with_(num_nodes=10, sampling_num=3)
    batch = load_dataset(cfg, "train", num_graphs=8)
    assert batch.adj.shape == (8, 10, 10)
    assert batch.features.shape == (8, 10, 1)
    assert batch.coords.shape == (8, 10, 2)
    assert batch.rel.shape == (8, 10, 10, 1)
    assert batch.adj_samples.shape == (8, 3, 10, 10)
    assert batch.factors is not None
    # normalized ranges (reference divides by 120/600, input_data.py:57-59)
    assert float(batch.features.max()) <= 1.0 + 1e-6
    assert float(batch.coords.max()) <= 1.0 + 1e-6


def test_normalize_coords_protein():
    """normalize_coords maps raw angstrom-scale coordinates into the unit
    box using TRAIN-split bounds, scaling rel distances consistently, and
    applies the same affine map to the test split."""
    import numpy as np

    from snd_vae_tpu.data.loaders import train_coord_bounds

    cfg = preset("protein").with_(sampling_num=2, normalize_coords=True)
    raw_cfg = cfg.with_(normalize_coords=False)
    raw = load_dataset(raw_cfg, "train", num_graphs=8)
    assert float(raw.coords.max()) > 2.0  # genuinely raw-scale
    batch = load_dataset(cfg, "train", num_graphs=8)
    assert 0.0 <= float(batch.coords.min()) and float(batch.coords.max()) <= 1.0
    lo, hi = train_coord_bounds(cfg)
    np.testing.assert_allclose(
        np.asarray(batch.coords), (np.asarray(raw.coords) - lo) / (hi - lo),
        rtol=1e-6,
    )
    # rel is divided by the same scale -> still the pairwise distance of the
    # normalized coordinates
    c = np.asarray(batch.coords)
    d = np.linalg.norm(c[:, :, None] - c[:, None, :], axis=-1)
    np.testing.assert_allclose(np.asarray(batch.rel)[..., 0], d, atol=1e-5)
    # test split shares the train affine map (same lo/hi), so values can
    # exceed [0,1] slightly but stay near it
    test = load_dataset(cfg, "test", num_graphs=8)
    assert float(test.coords.max()) < 1.5 and float(test.coords.min()) > -0.5


def test_pairing_skew_matches_reference_tile():
    """``reproduce_pairing_skew`` must reproduce the reference's feed stream
    exactly: adjacency samples flattened tree-major (main.py:132) while
    features/rel are np.tile'd graph-major (main.py:307-309), so stream
    index m pairs tree (m//S, m%S) with the features of graph m%G."""
    cfg = preset("synthetic2").with_(
        num_nodes=8, sampling_num=3, reproduce_pairing_skew=True
    )
    batch = load_dataset(cfg, "train", num_graphs=5)
    G, S = 5, 3
    assert batch.feat_samples.shape == (G, S, 8, 1)
    assert batch.rel_samples.shape == (G, S, 8, 8, 1)

    feats = np.asarray(batch.features)       # [G,N,F] (loader-shuffled order)
    rel = np.asarray(batch.rel)              # [G,N,N,R]
    # the reference's literal construction over the same arrays
    feat_ref = np.tile(feats, (S, 1, 1))     # main.py:307
    rel_ref = np.tile(rel, (S, 1, 1, 1))     # main.py:309
    got_f = np.asarray(batch.feat_samples).reshape(G * S, 8, 1)
    got_r = np.asarray(batch.rel_samples).reshape(G * S, 8, 8, 1)
    np.testing.assert_array_equal(got_f, feat_ref)
    np.testing.assert_array_equal(got_r, rel_ref)
    # adjacency stream is tree-major by construction (main.py:132)
    adj_stream = np.asarray(batch.adj_samples).reshape(G * S, 8, 8)
    for m in range(G * S):
        np.testing.assert_array_equal(
            adj_stream[m], np.asarray(batch.adj_samples)[m // S, m % S]
        )
    # default mode carries no skew arrays
    batch2 = load_dataset(cfg.with_(reproduce_pairing_skew=False), "train", num_graphs=5)
    assert batch2.feat_samples is None and batch2.rel_samples is None


def test_load_dataset_roundtrip_reference_layout(tmp_path):
    """Write the reference's on-disk .npy layout and load through the same
    path the reference uses (input_data.py:54-96)."""
    from snd_vae_tpu.data import save_synthetic_npy

    data = generate_synthetic(4, num_nodes=9, seed=8)
    root = tmp_path / "spatial_network_correlated2" / "25"
    save_synthetic_npy(data, str(root / "train"))
    cfg = preset("synthetic2").with_(
        dataset_path=str(tmp_path) + "/", num_nodes=9, sampling_num=2
    )
    batch = load_dataset(cfg, "train")
    assert batch.adj.shape == (4, 9, 9)
    assert float(batch.coords.max()) <= 1.0 + 1e-6


def test_motif_adj_3d_matches_loop(rng):
    from snd_vae_tpu.data import motif_adj_3d
    import jax.numpy as jnp

    adj = (rng.random((2, 5, 5)) < 0.5).astype(np.float32)
    got = np.asarray(motif_adj_3d(jnp.asarray(adj)))
    for b in range(2):
        for i in range(5):
            for j in range(5):
                for k in range(5):
                    want = 1.0 if (adj[b, i, j] == 1 and adj[b, j, k] == 1) else 0.0
                    assert got[b, i, j, k] == want


def test_sparse_to_tuple():
    import scipy.sparse as sp
    from snd_vae_tpu.data import sparse_to_tuple

    m = sp.csr_matrix(np.array([[0.0, 2.0], [3.0, 0.0]]))
    coords, values, shape = sparse_to_tuple(m)
    assert shape == (2, 2)
    assert sorted(map(tuple, coords.tolist())) == [(0, 1), (1, 0)]
    assert sorted(values.tolist()) == [2.0, 3.0]


def test_dropout_edges_symmetric(rng, key):
    import jax.numpy as jnp
    from snd_vae_tpu.data import dropout_edges

    adj = np.ones((6, 6)) - np.eye(6)
    out = np.asarray(dropout_edges(jnp.asarray(adj), 0.5, key))
    assert np.allclose(out, out.T)
    assert set(np.unique(out)).issubset({0.0, 2.0})  # inverted scaling 1/0.5


def test_traverse_joint_grid():
    from snd_vae_tpu.config import preset
    from snd_vae_tpu.models.traversal import traverse_joint

    cfg = preset("synthetic2")
    z = np.random.default_rng(0).standard_normal((50, cfg.encoder.sg_latent_size))
    lat = traverse_joint(cfg, z, fix_dim=3)
    V = cfg.visualize_length
    assert lat.z_sg.shape[1] == 1
    col = np.asarray(lat.z_sg)[3 * V : 3 * V + V, 0, 3]
    np.testing.assert_allclose(col, np.arange(-2.0, 2.0, 4.0 / V)[:V], atol=1e-6)


def test_graphbatch_slice():
    data = generate_synthetic(6, num_nodes=5, seed=9)
    batch = from_numpy(
        data["adj"], data["node"], data["geometry"], data["rel"],
        factors=data["prop"],
    )
    b = batch.slice_batch(2, 3)
    assert b.batch_size == 3
    np.testing.assert_allclose(np.asarray(b.adj), data["adj"][2:5])


def test_mnist_loader_fallback():
    cfg = preset("mnist").with_(num_nodes=12, sampling_num=2)
    batch = load_dataset(cfg, "train", num_graphs=3)
    assert batch.adj.shape == (3, 12, 12)
    a = np.asarray(batch.adj)
    assert np.allclose(a, a.transpose(0, 2, 1))
    # +10 coordinate shift (input_data.py:300)
    assert float(batch.coords.min()) > 5.0


def test_scene_loader_fallback():
    cfg = preset("scene")
    batch = load_dataset(cfg, "train", num_graphs=4)
    assert batch.adj.shape == (4, 10, 10)
    assert batch.features.shape == (4, 10, 3)
    # one-hot features
    np.testing.assert_allclose(np.asarray(batch.features).sum(-1), 1.0)


def test_networkx_roundtrip():
    """GraphBatch -> NetworkX -> GraphBatch preserves topology, coordinates,
    and features (rel is recomputed as pairwise distances)."""
    from snd_vae_tpu.data.graphbatch import from_networkx

    data = generate_synthetic(3, num_nodes=8, seed=5)
    batch = from_numpy(data["adj"], data["node"], data["geometry"],
                       data["rel"])
    graphs = [batch.to_networkx(i) for i in range(3)]
    assert graphs[0].number_of_nodes() == 8
    assert not graphs[0].is_directed()  # synthetic adjacency is symmetric

    rt = from_networkx(graphs)
    np.testing.assert_allclose(np.asarray(rt.adj), np.asarray(batch.adj))
    np.testing.assert_allclose(np.asarray(rt.coords), np.asarray(batch.coords),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rt.features),
                               np.asarray(batch.features), rtol=1e-6)
    assert rt.node_mask is None  # all graphs full-size -> no padding


def test_networkx_directed_and_padded():
    """Directed relation maps come back as DiGraphs with labels; mixed-size
    graph lists pad with a node_mask."""
    import networkx as nx
    from snd_vae_tpu.data.graphbatch import from_networkx

    g1 = nx.DiGraph()
    for v, c in enumerate([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]):
        g1.add_node(v, coords=c, features=[1.0])
    g1.add_edge(0, 1, label=3.0)
    g1.add_edge(1, 0, label=2.0)
    g2 = nx.Graph()
    for v, c in enumerate([[0.5, 0.5], [1.5, 0.5]]):
        g2.add_node(v, coords=c, features=[1.0])
    g2.add_edge(0, 1)

    batch = from_networkx([g1, g2])
    assert batch.num_nodes == 3
    assert batch.node_mask is not None
    np.testing.assert_array_equal(np.asarray(batch.node_mask),
                                  [[1, 1, 1], [1, 1, 0]])
    assert float(batch.adj[0, 0, 1]) == 3.0 and float(batch.adj[0, 1, 0]) == 2.0
    back = batch.to_networkx(0)
    assert back.is_directed() and back.edges[0, 1]["label"] == 3.0
    assert batch.to_networkx(1).number_of_nodes() == 2  # padding dropped
