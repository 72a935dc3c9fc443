"""Write-then-load round-trips for the reference's on-disk dataset formats.

tests/test_data.py covers the synthetic .npy layout (input_data.py:54-96);
these cover the remaining three families so a drop-in of the authors' real
files is format-proven (VERDICT r2 "what's missing" item 2):

  * protein: ``edge_{split}.npy`` + ``node_{split}.npy`` (input_data.py:153-160)
  * mnist:   ``mnist-combined-{split}-tasp_meshes.pickle`` holding an object
             with ``.data`` meshes exposing ``sample_points(npoints)``
             (input_data.py:228-234)
  * scene:   ``CLEVR_{split}_scenes.json`` with 10-object scenes carrying
             ``3d_coords``/``shape``/``relationships`` (input_data.py:309-360)
"""

import json
import pickle

import numpy as np
import pytest

from snd_vae_tpu.config import preset
from snd_vae_tpu.data.loaders import (
    load_data_mnist,
    load_data_protein,
    load_data_scene,
    load_dataset,
)

G, N = 4, 12


# --------------------------------------------------------------------------- #
# protein                                                                     #
# --------------------------------------------------------------------------- #

def _write_protein(root, split, rng):
    coords = rng.normal(0, 5.0, (G, N, 3))
    adj = (rng.random((G, N, N)) < 0.3).astype(np.float64)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    # every graph needs at least a path so spanning trees exist
    for g in range(G):
        for i in range(N - 1):
            adj[g, i, i + 1] = adj[g, i + 1, i] = 1.0
    np.save(root / f"edge_{split}.npy", adj)
    np.save(root / f"node_{split}.npy", coords)
    return adj, coords


def test_protein_npy_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    adj_w, coords_w = _write_protein(tmp_path, "train", rng)
    _write_protein(tmp_path, "test", rng)

    node, spatial, adj_s, rel, factor, adj_truth = load_data_protein(
        "train", str(tmp_path), sampling_num=3, seed=1
    )
    assert node.shape == (G, N) and np.all(node == 1.0)  # input_data.py:157
    assert spatial.shape == (G, N, 3)
    assert adj_s.shape == (G, 3, N, N)
    assert adj_truth.shape == (G, N, N)
    # the loader shuffles jointly; every returned graph must be one of the
    # written graphs with its own coords/rel/adjacency still paired
    for g in range(G):
        matches = [k for k in range(G) if np.allclose(spatial[g], coords_w[k])]
        assert len(matches) == 1
        np.testing.assert_array_equal(adj_truth[g], adj_w[matches[0]])
        want_rel = np.linalg.norm(
            spatial[g][:, None] - spatial[g][None, :], axis=-1
        )
        np.testing.assert_allclose(rel[g], want_rel, atol=1e-12)
        # spanning trees are trees OF this graph's adjacency
        for s in range(3):
            t = adj_s[g, s]
            assert t.sum() == 2 * (N - 1)          # N-1 undirected edges
            assert np.all(adj_truth[g][t > 0] > 0)  # subset of real edges
    # test split reads its own files
    node2, spatial2, *_ = load_data_protein("test", str(tmp_path), 2, seed=1)
    assert spatial2.shape == (G, N, 3)
    assert not np.allclose(np.sort(spatial2.ravel()), np.sort(spatial.ravel()))


def test_protein_config_roundtrip(tmp_path):
    root = tmp_path / "protein"
    root.mkdir()
    rng = np.random.default_rng(3)
    _write_protein(root, "train", rng)
    cfg = preset("protein").with_(
        dataset_path=str(tmp_path) + "/", num_nodes=N, sampling_num=2,
    )
    batch = load_dataset(cfg, "train")
    assert batch.adj.shape == (G, N, N)
    assert batch.adj_samples.shape == (G, 2, N, N)


# --------------------------------------------------------------------------- #
# mnist pickle                                                                #
# --------------------------------------------------------------------------- #

class FakeMesh:
    """Stands in for the reference pickle's mesh entries: the loader's only
    contract is ``sample_points(npoints) -> [npoints, 3]``
    (input_data.py:233-234)."""

    def __init__(self, pts):
        self.pts = np.asarray(pts)

    def sample_points(self, npoints):
        return self.pts[:npoints]


class FakeMeshData:
    """The pickle's top-level object: ``.data`` iterates meshes
    (input_data.py:231)."""

    def __init__(self, meshes):
        self.data = meshes


def test_mnist_pickle_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    clouds = [rng.normal(0, 1.0, (N, 3)) for _ in range(G)]
    payload = FakeMeshData([FakeMesh(c) for c in clouds])
    with open(tmp_path / "mnist-combined-train-tasp_meshes.pickle", "wb") as f:
        pickle.dump(payload, f)

    node, spatial, adj, rel = load_data_mnist(
        "train", str(tmp_path), seed=1, num_points=N
    )
    assert node.shape == (G, N) and np.all(node == 1.0)
    assert spatial.shape == (G, N, 3)
    # the reference shifts coords by +10 (input_data.py:300)
    assert spatial.min() > 10.0 - 5.0 and spatial.mean() == pytest.approx(
        10.0 + np.mean(clouds), abs=1e-9
    )
    for g in range(G):
        matches = [
            k for k in range(G) if np.allclose(spatial[g], clouds[k] + 10.0)
        ]
        assert len(matches) == 1
        a = adj[g]
        np.testing.assert_array_equal(a, a.T)
        assert np.all(np.diag(a) == 0)
        assert a.sum() > 0  # convex hull produced edges
        # rel distances are shift-invariant pairwise distances of the cloud
        want_rel = np.linalg.norm(
            spatial[g][:, None] - spatial[g][None, :], axis=-1
        )
        np.testing.assert_allclose(rel[g], want_rel, atol=1e-12)


def test_mnist_config_roundtrip(tmp_path):
    root = tmp_path / "3D_mesh"
    root.mkdir()
    rng = np.random.default_rng(2)
    clouds = [rng.normal(0, 1.0, (N, 3)) for _ in range(G)]
    with open(root / "mnist-combined-train-tasp_meshes.pickle", "wb") as f:
        pickle.dump(FakeMeshData([FakeMesh(c) for c in clouds]), f)
    cfg = preset("mnist").with_(
        dataset_path=str(tmp_path) + "/", num_nodes=N, sampling_num=2,
    )
    batch = load_dataset(cfg, "train")
    assert batch.adj.shape == (G, N, N)
    assert batch.adj_samples is not None  # trees drawn post-load for mnist


# --------------------------------------------------------------------------- #
# scene json                                                                  #
# --------------------------------------------------------------------------- #

def _scene_json(rng, num_scenes=3, size=10):
    shapes = ["sphere", "cylinder", "cube"]
    scenes = []
    for _ in range(num_scenes):
        coords = rng.uniform(-3, 3, (size, 3))
        objs = [
            {"3d_coords": coords[i].tolist(),
             "shape": shapes[int(rng.integers(0, 3))]}
            for i in range(size)
        ]
        rels = {"right": [], "behind": [], "front": [], "left": []}
        for k in range(size):
            rels["right"].append(
                [m for m in range(size) if coords[m, 0] > coords[k, 0]])
            rels["left"].append(
                [m for m in range(size) if coords[m, 0] < coords[k, 0]])
            rels["behind"].append(
                [m for m in range(size) if coords[m, 1] > coords[k, 1]])
            rels["front"].append(
                [m for m in range(size) if coords[m, 1] < coords[k, 1]])
        scenes.append({"objects": objs, "relationships": rels})
    return {"scenes": scenes}, scenes


def test_scene_json_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    payload, scenes = _scene_json(rng)
    with open(tmp_path / "CLEVR_train_scenes.json", "w") as f:
        json.dump(payload, f)

    node, spatial, adj, rel = load_data_scene("train", str(tmp_path), seed=1)
    S = len(scenes)
    assert node.shape == (S, 10, 3)
    assert spatial.shape == (S, 10, 3)
    assert adj.shape == (S, 10, 10)
    # one-hot features
    assert np.all(node.sum(-1) == 1.0)
    # every CLEVR pair carries a relation (merged codes 1..4), diagonal 0
    off = ~np.eye(10, dtype=bool)
    assert np.all(adj[:, off] >= 1) and np.all(adj[:, off] <= 4)
    assert np.all(adj[:, ~off] == 0)
    # independently recompute the merged relation code from the coordinates:
    # (right,behind)=1 (right,front)=2 (left,behind)=3 (left,front)=4 — the
    # inverse-pair merge of input_data.py:344-360
    for g in range(S):
        c = spatial[g]
        for m in range(10):
            for k in range(10):
                if m == k:
                    continue
                right = c[m, 0] > c[k, 0]
                behind = c[m, 1] > c[k, 1]
                want = (1 if behind else 2) if right else (3 if behind else 4)
                assert adj[g, m, k] == want, (g, m, k)


def test_scene_json_filters_non_ten_object_scenes(tmp_path):
    rng = np.random.default_rng(5)
    payload, _ = _scene_json(rng, num_scenes=2)
    payload["scenes"].append({"objects": [], "relationships": {}})
    with open(tmp_path / "CLEVR_train_scenes.json", "w") as f:
        json.dump(payload, f)
    node, spatial, adj, rel = load_data_scene("train", str(tmp_path), seed=1)
    assert len(node) == 2  # the malformed scene is skipped (input_data.py:312)


def test_scene_config_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    payload, _ = _scene_json(rng)
    # the scene dispatch reads CLEVR_{split}_scenes.json from dataset_path
    # itself (loaders.py scene branch)
    with open(tmp_path / "CLEVR_train_scenes.json", "w") as f:
        json.dump(payload, f)
    cfg = preset("scene").with_(dataset_path=str(tmp_path) + "/")
    batch = load_dataset(cfg, "train")
    assert batch.adj.shape == (3, 10, 10)
    assert batch.features.shape == (3, 10, 3)


# --------------------------------------------------------------------------- #
# eval dispatch: explicit categorical flag (VERDICT r2 weak item 6)           #
# --------------------------------------------------------------------------- #

def test_reconstruct_eval_explicit_categorical_beats_size_coincidence():
    """A class-index decode whose class count equals the feature width used
    to be scored as MSE silently; the explicit flag forces accuracy."""
    from snd_vae_tpu.evaluate import reconstruct_evaluation

    rng = np.random.default_rng(7)
    B, n, K = 3, 6, 6  # K == feature width: sizes coincide
    truth_idx = rng.integers(0, K, (B, n))
    one_hot = np.eye(K)[truth_idx]                     # [B,n,K]
    gen_idx = np.broadcast_to(truth_idx[..., None], (B, n, K)).copy()
    adj = np.zeros((B, n, n))
    adj[:, 0, 1] = adj[:, 1, 0] = 1.0
    coords = rng.random((B, n, 3))

    r = reconstruct_evaluation(
        adj, gen_idx[..., 0], coords, adj, one_hot, coords,
        node_categorical=True,
    )
    assert "node_acc" in r and r["node_acc"] == 1.0 and "node_mse" not in r

    # fallback heuristic keeps working for matched-shape regression decodes
    r2 = reconstruct_evaluation(
        adj, one_hot, coords, adj, one_hot, coords,
    )
    assert r2["node_mse"] == 0.0
