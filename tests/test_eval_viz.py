"""Evaluation and visualization subsystem tests (the reference's missing
utils.evaluation / utils.visualizer, SURVEY §2.9-2.10)."""

import numpy as np
import pytest

from snd_vae_tpu.data import generate_synthetic
from snd_vae_tpu.evaluate import (
    disentangle_evaluation,
    gaussian_mmd,
    generation_evaluation,
    reconstruct_evaluation,
)
from snd_vae_tpu.utils.logging import LossesLogger
from snd_vae_tpu.visualize import (
    find_latent,
    visualize_reconstruct,
    visualize_traverse,
)


def test_reconstruct_perfect_scores():
    data = generate_synthetic(4, num_nodes=8, seed=0)
    r = reconstruct_evaluation(
        data["adj"], data["node"], data["geometry"],
        data["adj"], data["node"], data["geometry"],
    )
    assert r["edge_acc"] == 1.0
    assert r["edge_f1"] == pytest.approx(1.0)
    assert r["node_mse"] == 0.0
    assert r["spatial_mse"] == 0.0
    assert r["edge_auc"] == pytest.approx(1.0)


def test_reconstruct_detects_errors():
    data = generate_synthetic(4, num_nodes=8, seed=0)
    wrong = 1.0 - data["adj"]
    for i in range(4):
        np.fill_diagonal(wrong[i], 0)
    r = reconstruct_evaluation(
        wrong, data["node"], data["geometry"],
        data["adj"], data["node"], data["geometry"],
    )
    assert r["edge_acc"] < 0.5


def test_gaussian_mmd_zero_same():
    x = np.random.default_rng(0).random((10, 5))
    assert gaussian_mmd(x, x) == pytest.approx(0.0, abs=1e-9)
    y = x + 10.0
    assert gaussian_mmd(x, y) > 0.1


def test_generation_evaluation_keys():
    a = generate_synthetic(5, num_nodes=8, seed=1)
    b = generate_synthetic(5, num_nodes=8, seed=2)
    r = generation_evaluation(
        a["adj"], a["node"], a["geometry"] / 600,
        b["adj"], b["node"], b["geometry"] / 600,
    )
    assert {"degree_mmd", "clustering_mmd", "edge_length_mmd",
            "spectral_mmd", "density_gen", "density_ref"} <= set(r)
    # same distribution family -> small MMDs
    assert r["degree_mmd"] < 1.0
    assert r["spectral_mmd"] < 0.5


def test_spectral_mmd_separates_structure():
    """The Laplacian spectrum distinguishes graph families that degree
    histograms alone may not: same-family sets score near zero, while path
    graphs vs complete graphs score high."""
    from snd_vae_tpu.evaluate import _spectral_hist

    n = 8
    path = np.zeros((n, n)); idx = np.arange(n - 1)
    path[idx, idx + 1] = path[idx + 1, idx] = 1.0
    comp = 1.0 - np.eye(n)
    paths = np.stack([path] * 5)
    comps = np.stack([comp] * 5)
    h_p = np.stack([_spectral_hist(a) for a in paths])
    h_c = np.stack([_spectral_hist(a) for a in comps])
    assert gaussian_mmd(h_p, h_p) == pytest.approx(0.0, abs=1e-9)
    assert gaussian_mmd(h_p, h_c) > 0.5
    # eigenvalues of the normalized Laplacian stay in [0, 2]: the density
    # histogram over that fixed range integrates to 1 (no mass clipped)
    assert np.isclose(h_p.sum(-1) * 0.2, 1.0).all()


def test_generation_evaluation_raw_scale_coords():
    """Regression: raw-scale coordinates (protein angstroms, mnist's +10
    shift) have edge lengths beyond sqrt(D); the fixed range=(0, sqrt(D))
    binning produced an all-zero density histogram and NaN edge_length_mmd."""
    a = generate_synthetic(5, num_nodes=8, seed=1)
    b = generate_synthetic(5, num_nodes=8, seed=2)
    for scale, shift in ((20.0, 0.0), (1.0, 10.0)):
        r = generation_evaluation(
            a["adj"], a["node"], a["geometry"] / 600 * scale + shift,
            b["adj"], b["node"], b["geometry"] / 600 * scale + shift,
        )
        assert np.isfinite(r["edge_length_mmd"]), (scale, shift)
        assert r["edge_length_mmd"] < 1.0
    # unit-box binning unchanged: same-family sets stay close
    r = generation_evaluation(
        a["adj"], a["node"], a["geometry"] / 600,
        b["adj"], b["node"], b["geometry"] / 600,
    )
    assert np.isfinite(r["edge_length_mmd"])


def test_disentangle_evaluation_perfect_alignment(rng):
    """If one latent dim IS the factor, max-corr must be ~1."""
    f = rng.standard_normal((200, 2))
    z_s = np.concatenate([f[:, :1], rng.standard_normal((200, 3))], axis=1)
    z_g = np.concatenate([f[:, 1:2], rng.standard_normal((200, 3))], axis=1)
    z_sg = rng.standard_normal((200, 4))
    r = disentangle_evaluation(z_s, z_g, z_sg, f)
    assert r["s_factor0_maxcorr"] > 0.99
    assert r["g_factor1_maxcorr"] > 0.99
    assert r["sg_factor0_maxcorr"] < 0.5
    assert 0.0 <= r["mig_gap"] <= 1.0


def test_visualize_figures(tmp_path):
    data = generate_synthetic(6, num_nodes=8, seed=3)
    p1 = tmp_path / "recon.png"
    visualize_reconstruct(
        3, data["adj"], data["node"], data["geometry"],
        data["adj"], data["node"], data["geometry"], save_path=str(p1),
    )
    assert p1.exists() and p1.stat().st_size > 0
    p2 = tmp_path / "trav.png"
    visualize_traverse(
        data["adj"], data["node"], data["geometry"], 2, 3, "synthetic2",
        save_path=str(p2),
    )
    assert p2.exists()


def test_find_latent():
    z = np.eye(4)
    assert find_latent(z, z[2]) == 2


def test_losses_logger(tmp_path):
    log = LossesLogger(str(tmp_path / "train_loss.txt"))
    means = log.log(0, {"loss": [1.0, 3.0], "adj_acc": [0.5, 0.7]})
    assert means == {"loss": 2.0, "adj_acc": 0.6}
    lines = open(tmp_path / "train_loss.txt").read().splitlines()
    assert lines[0] == "epoch,loss,value"
    assert any("loss,2.0" in l for l in lines)
    import json

    rec = json.loads(open(tmp_path / "train_loss.jsonl").read().splitlines()[0])
    assert rec["epoch"] == 0 and rec["loss"] == 2.0


def test_sap_dci_axis_aligned_vs_mixed(rng):
    """Axis-aligned codes (each factor = one latent dim + noise dims) must
    score near 1 on SAP/DCI; an entangled rotation of the same factors must
    score clearly lower on disentanglement/SAP while staying informative."""
    from snd_vae_tpu.evaluate import dci_scores, sap_score

    f = rng.standard_normal((300, 2))
    noise = 0.01 * rng.standard_normal((300, 3))
    z_aligned = np.concatenate([f, noise], axis=1)

    theta = np.pi / 4
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    z_mixed = np.concatenate([f @ rot.T, noise], axis=1)

    d_a = dci_scores(z_aligned, f)
    d_m = dci_scores(z_mixed, f)
    assert d_a["dci_disentanglement"] > 0.9
    assert d_a["dci_completeness"] > 0.9
    assert d_a["dci_informativeness"] > 0.99
    # the rotation keeps the factors linearly decodable...
    assert d_m["dci_informativeness"] > 0.99
    # ...but spreads each factor across two latents
    assert d_m["dci_disentanglement"] < d_a["dci_disentanglement"] - 0.3
    assert d_m["dci_completeness"] < d_a["dci_completeness"] - 0.3

    assert sap_score(z_aligned, f) > 0.9
    assert sap_score(z_mixed, f) < 0.6


def test_disentangle_evaluation_reports_sap_dci(rng):
    f = rng.standard_normal((100, 2))
    z = rng.standard_normal((100, 4))
    r = disentangle_evaluation(z, z, z, f)
    for k in ("sap", "dci_disentanglement", "dci_completeness",
              "dci_informativeness"):
        assert k in r and np.isfinite(r[k])


def test_visualize_latent_embedding(tmp_path, rng):
    from snd_vae_tpu.visualize import visualize_latent_embedding

    z = rng.standard_normal((50, 6))
    f = rng.standard_normal((50, 2))
    p = tmp_path / "latent.png"
    visualize_latent_embedding(z, f, save_path=str(p))
    assert p.exists() and p.stat().st_size > 0
    # factor-free path
    visualize_latent_embedding(z, None, save_path=str(tmp_path / "l2.png"))


def test_reconstruct_evaluation_scene_categorical(rng):
    """Scene-style inputs: K-way relation labels in the adjacency and
    class-index node decodes vs one-hot truth must evaluate without
    reshape errors, reporting node/relation accuracy instead of node MSE."""
    G, N, K, F = 4, 6, 5, 3
    adj_truth = rng.integers(0, K, size=(G, N, N))
    np.einsum("gii->gi", adj_truth)[:] = 0
    gen_adj = adj_truth.copy()
    feature_truth = np.eye(F)[rng.integers(0, F, size=(G, N))]
    gen_nodes = np.argmax(feature_truth, axis=-1)[..., None]  # [G,N,1] indices
    coords = rng.standard_normal((G, N, 3))
    r = reconstruct_evaluation(
        gen_adj, gen_nodes, coords, adj_truth, feature_truth, coords, "scene"
    )
    assert r["node_acc"] == 1.0
    assert r["relation_acc"] == 1.0
    assert r["edge_acc"] == 1.0
    assert "node_mse" not in r


def test_degree_hist_binarizes_relation_labels():
    """Degree must count edges, not sum scene relation labels."""
    from snd_vae_tpu.evaluate import _degree_hist

    a_labeled = np.array([[0, 3, 0], [3, 0, 2], [0, 2, 0]], dtype=float)
    a_binary = (a_labeled > 0.5).astype(float)
    np.testing.assert_array_equal(_degree_hist(a_labeled, 4),
                                  _degree_hist(a_binary, 4))


def test_generation_evaluation_directed_categorical(rng):
    """Directed scene-style relation maps (argmax decodes are not symmetric)
    must yield finite MMDs — directed triangle counts used to push clustering
    coefficients past 1, emptying the density histogram into NaNs."""
    G, N = 5, 10
    gen_adj = rng.integers(0, 5, size=(G, N, N))  # directed, labels 0..4
    adj = rng.integers(0, 5, size=(G, N, N))
    for a in (gen_adj, adj):
        np.einsum("gii->gi", a)[:] = 0
    feat = np.eye(3)[rng.integers(0, 3, (G, N))]
    coords = rng.standard_normal((G, N, 3))
    r = generation_evaluation(gen_adj, feat, coords, adj, feat, coords, "scene")
    for k, v in r.items():
        assert np.isfinite(v), (k, v)
    assert 0.0 <= r["density_gen"] <= 1.0  # binarized, not label means


def test_directed_edges_counted_in_statistics():
    """Lower-triangle-only (directed) edges must reach the edge-length and
    degree statistics — the statistics symmetrize, matching clustering and
    spectral."""
    from snd_vae_tpu.evaluate import _degree_hist, _edge_lengths

    adj = np.zeros((4, 4))
    adj[2, 0] = 1.0  # only below the diagonal
    coords = np.eye(4, 3)
    lengths = _edge_lengths(adj, coords)
    assert len(lengths) == 1 and lengths[0] > 0  # not the zeros(1) sentinel
    np.testing.assert_array_equal(_degree_hist(adj, 4),
                                  _degree_hist(adj.T, 4))


def test_sap_dci_skip_constant_factors(rng):
    """A zero-variance factor column must not deflate SAP/DCI."""
    from snd_vae_tpu.evaluate import dci_scores, sap_score

    f = rng.standard_normal((200, 2))
    z = np.concatenate([f, 0.01 * rng.standard_normal((200, 2))], axis=1)
    f_dead = np.concatenate([f, np.full((200, 1), 7.0)], axis=1)
    assert sap_score(z, f_dead) == pytest.approx(sap_score(z, f))
    d, d_dead = dci_scores(z, f), dci_scores(z, f_dead)
    for k in d:
        assert d_dead[k] == pytest.approx(d[k])


def test_visualize_latent_embedding_rank1(tmp_path, rng):
    """1-d codes must plot (zero-padded PC2), not crash."""
    from snd_vae_tpu.visualize import visualize_latent_embedding

    visualize_latent_embedding(rng.standard_normal((20, 1)),
                               save_path=str(tmp_path / "r1.png"))
    assert (tmp_path / "r1.png").exists()


def test_edge_presence_scores_matches_softmax(rng):
    from snd_vae_tpu.evaluate import edge_presence_scores

    logits = rng.standard_normal((2, 4, 4, 5))
    p = edge_presence_scores(logits)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    expect = 1.0 - e[..., 0] / e.sum(-1)
    np.testing.assert_allclose(p, expect, rtol=1e-12)
    assert np.all((p >= 0) & (p <= 1))
