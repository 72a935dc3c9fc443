"""Evaluation suite — reconstruction of the reference's missing
``utils/evaluation.py`` (imported at main.py:27, call sites main.py:423-424,
467) from its observable signatures:

  * ``reconstruct_evaluation(gen_adj, gen_nodes, gen_spatial, adj_truth,
    feature_truth, spatial_truth, dataset)`` — edge AUC/AP (the sklearn
    imports at main.py:13-14 signal this), edge accuracy/P/R/F1, node and
    coordinate MSE.
  * ``generation_evaluation(gen_adj, gen_nodes, gen_spatial, adj, feature,
    spatial, dataset)`` — distributional comparison of generated vs. data
    graphs: Gaussian-kernel MMD over degree / clustering-coefficient /
    edge-length histograms plus density statistics.
  * ``disentangle_evaluation(z_s, z_g, z_sg, factor, dataset)`` — latent-vs-
    ground-truth-factor scores (factors from 2D_prop.npy, input_data.py:60):
    per-branch max |correlation| per factor and a MIG-style gap.

All host-side NumPy: these run once per eval, not in the train loop.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Reconstruction metrics
# ---------------------------------------------------------------------------

def _off_diag(a: np.ndarray) -> np.ndarray:
    n = a.shape[-1]
    mask = ~np.eye(n, dtype=bool)
    return a[..., mask]


def edge_presence_scores(adj_prob) -> np.ndarray:
    """P(edge present) = 1 − softmax(logits)[..., 0] from the decoder's
    [..., N, N, C] edge-class logits — P(class 1) for binary heads, "any
    relation" for scene's K-way heads.  Computed in float64 so bf16 runs
    don't quantize the AUC/AP ranking (the single shared implementation for
    the in-training eval and the offline reconstruct eval)."""
    logits = np.asarray(adj_prob, dtype=np.float64)
    logits = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(logits)
    return 1.0 - e[..., 0] / e.sum(-1)


def reconstruct_evaluation(
    gen_adj: np.ndarray,
    gen_nodes: np.ndarray,
    gen_spatial: np.ndarray,
    adj_truth: np.ndarray,
    feature_truth: np.ndarray,
    spatial_truth: np.ndarray,
    dataset: str = "",
    adj_scores: Optional[np.ndarray] = None,
    node_categorical: Optional[bool] = None,
) -> Dict[str, float]:
    from sklearn.metrics import average_precision_score, roc_auc_score

    G = min(len(gen_adj), len(adj_truth))
    y_true = _off_diag(np.asarray(adj_truth[:G])).reshape(-1) > 0.5
    if adj_scores is not None:
        y_score = _off_diag(np.asarray(adj_scores[:G])).reshape(-1)
    else:
        y_score = _off_diag(np.asarray(gen_adj[:G], dtype=np.float64)).reshape(-1)
    y_pred = _off_diag(np.asarray(gen_adj[:G])).reshape(-1) > 0.5

    out: Dict[str, float] = {}
    if y_true.any() and not y_true.all():
        out["edge_auc"] = float(roc_auc_score(y_true, y_score))
        out["edge_ap"] = float(average_precision_score(y_true, y_score))
    tp = float(np.sum(y_pred & y_true))
    fp = float(np.sum(y_pred & ~y_true))
    fn = float(np.sum(~y_pred & y_true))
    out["edge_acc"] = float(np.mean(y_pred == y_true))
    out["edge_precision"] = tp / max(tp + fp, 1.0)
    out["edge_recall"] = tp / max(tp + fn, 1.0)
    p, r = out["edge_precision"], out["edge_recall"]
    out["edge_f1"] = 2 * p * r / max(p + r, 1e-12)
    gn = np.asarray(gen_nodes[:G])
    ft = np.asarray(feature_truth[:G])
    # ``node_categorical`` declares the decode kind explicitly (callers with
    # a DecodedGraph pass ``decoded.node_feat_prob is not None``); the shape
    # heuristic remains only as a fallback for bare-array callers — a
    # class-index decode whose class count coincides with the feature width
    # would otherwise silently score as MSE
    if node_categorical is None:
        node_categorical = gn.size != ft.size
    if not node_categorical:
        out["node_mse"] = float(np.mean((gn - ft.reshape(gn.shape)) ** 2))
    else:
        # categorical node decode (scene, model_joint.py:140-145): gen_nodes
        # are class indices [G,N(,1)] while truth is one-hot [G,N,K] — MSE is
        # meaningless (the reference zeroes the node loss for scene,
        # optimizer.py:146-147); report classification accuracy instead
        idx_true = np.argmax(ft, axis=-1)
        out["node_acc"] = float(np.mean(gn.reshape(idx_true.shape) == idx_true))
    out["spatial_mse"] = float(
        np.mean((np.asarray(gen_spatial[:G]) - np.asarray(spatial_truth[:G])) ** 2)
    )
    at = np.asarray(adj_truth[:G])
    ga = np.asarray(gen_adj[:G])
    if at.max() > 1 or ga.max() > 1:
        # K-way categorical relations (scene): exact relation-type accuracy
        # over off-diagonal pairs, alongside the binarized edge metrics above
        out["relation_acc"] = float(np.mean(_off_diag(ga) == _off_diag(at)))
    return out


# ---------------------------------------------------------------------------
# Generation metrics (graph-statistic MMDs)
# ---------------------------------------------------------------------------

def _sym(adj: np.ndarray) -> np.ndarray:
    """Binarized, symmetrized adjacency: graph statistics here are
    undirected concepts, and scene's argmax decodes are directed — without
    symmetrizing, gen out-degree would be compared against the refs' full
    degree and lower-triangle-only edges would vanish from edge lengths."""
    a = (adj > 0.5).astype(np.float64)
    return np.maximum(a, np.swapaxes(a, -1, -2))


def _degree_hist(adj: np.ndarray, bins: int) -> np.ndarray:
    deg = _sym(adj).sum(-1)  # binarize: scene relations carry labels 0..K-1
    h, _ = np.histogram(deg, bins=bins, range=(0, bins), density=True)
    return h


def _safe_hist(vals: np.ndarray, bins: int, range_) -> np.ndarray:
    """Normalized histogram that returns zeros instead of NaN when no sample
    falls inside ``range_`` (np.histogram's density=True divides 0/0 there —
    hit by scene's directed decodes before coefficients were clamped)."""
    h, edges = np.histogram(vals, bins=bins, range=range_)
    total = h.sum()
    if total == 0:
        return np.zeros(bins)
    return h / (total * (edges[1] - edges[0]))


def _clustering_coeffs(adj: np.ndarray) -> np.ndarray:
    """Per-node clustering coefficients for one binary adjacency.  Directed
    inputs (scene's relation maps) are symmetrized first — clustering is an
    undirected statistic and the directed triangle count can exceed the
    undirected denominator."""
    a = _sym(adj)
    deg = a.sum(-1)
    tri = np.diagonal(a @ a @ a)  # 2x triangles per node
    denom = deg * (deg - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.where(denom > 0, tri / denom, 0.0)
    return c


def _spectral_hist(adj: np.ndarray, bins: int = 10) -> np.ndarray:
    """Eigenvalue histogram of the symmetric normalized Laplacian
    ``I - D^-1/2 A D^-1/2`` (eigenvalues lie in [0, 2]).  The standard
    spectral descriptor of the graph-generation literature (GraphRNN/GRAN
    eval suites); the reference's missing ``utils.evaluation`` module
    (main.py:467) is reconstructed with distributional MMDs, and the
    spectrum captures global structure that degree/clustering histograms
    miss (e.g. connectivity, bipartiteness).  Directed inputs are
    symmetrized (eigvalsh requires a symmetric operator)."""
    a = _sym(adj)
    deg = a.sum(-1)
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, deg**-0.5, 0.0)
    lap = np.eye(a.shape[0]) - dinv[:, None] * a * dinv[None, :]
    ev = np.linalg.eigvalsh(lap)
    h, _ = np.histogram(ev, bins=bins, range=(0.0, 2.0), density=True)
    return h


def _edge_lengths(adj: np.ndarray, coords: np.ndarray) -> np.ndarray:
    i, j = np.nonzero(np.triu(_sym(adj), 1))
    if len(i) == 0:
        return np.zeros(1)
    return np.linalg.norm(coords[i] - coords[j], axis=-1)


def gaussian_mmd(x: np.ndarray, y: np.ndarray, sigma: float = 1.0) -> float:
    """MMD² with a Gaussian kernel between two sets of descriptor vectors."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    def k(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return np.exp(-d2 / (2 * sigma**2))

    return float(k(x, x).mean() + k(y, y).mean() - 2 * k(x, y).mean())


def generation_evaluation(
    gen_adj: np.ndarray,
    gen_nodes: np.ndarray,
    gen_spatial: np.ndarray,
    adj: np.ndarray,
    feature: np.ndarray,
    spatial: np.ndarray,
    dataset: str = "",
) -> Dict[str, float]:
    gen_adj = np.asarray(gen_adj)
    adj = np.asarray(adj)
    if adj.ndim == 4:  # [G,S,N,N] spanning-tree samples -> use originals only
        adj = adj[:, 0]
    n = gen_adj.shape[-1]
    bins = n

    deg_g = np.stack([_degree_hist(a, bins) for a in gen_adj])
    deg_r = np.stack([_degree_hist(a, bins) for a in adj])
    clus_g = np.stack([
        _safe_hist(_clustering_coeffs(a), 10, (0, 1)) for a in gen_adj
    ])
    clus_r = np.stack([
        _safe_hist(_clustering_coeffs(a), 10, (0, 1)) for a in adj
    ])
    G = min(len(gen_adj), len(gen_spatial))
    Gr = min(len(adj), len(spatial))
    spatial = np.asarray(spatial)
    gen_spatial = np.asarray(gen_spatial)
    # Histogram range: sqrt(D) covers a unit coordinate box (the synthetic
    # datasets), but raw-scale coordinates (protein angstroms, mnist's +10
    # shift) have edge lengths far beyond it — an out-of-range density
    # histogram is all-zero and normalizes to NaN.  Take the upper bound
    # from the reference graphs' actual edge lengths, floored at sqrt(D) so
    # unit-box datasets keep their historical binning.
    ref_lengths = [_edge_lengths(adj[i], spatial[i]) for i in range(Gr)]
    el_hi = max(
        float(np.sqrt(spatial.shape[-1])),
        max((float(l.max()) for l in ref_lengths), default=0.0),
    )
    el_g = np.stack([
        _safe_hist(np.minimum(_edge_lengths(gen_adj[i], gen_spatial[i]), el_hi),
                   10, (0, el_hi))
        for i in range(G)
    ])
    el_r = np.stack([
        _safe_hist(l, 10, (0, el_hi)) for l in ref_lengths
    ])

    spec_g = np.stack([_spectral_hist(a) for a in gen_adj])
    spec_r = np.stack([_spectral_hist(a) for a in adj])

    return {
        "degree_mmd": gaussian_mmd(deg_g, deg_r),
        "clustering_mmd": gaussian_mmd(clus_g, clus_r),
        "edge_length_mmd": gaussian_mmd(el_g, el_r),
        "spectral_mmd": gaussian_mmd(spec_g, spec_r),
        # binarized: edge-presence density (scene's labels would otherwise
        # average relation ids, not edge probability)
        "density_gen": float((_off_diag(gen_adj) > 0.5).mean()),
        "density_ref": float((_off_diag(adj) > 0.5).mean()),
    }


# ---------------------------------------------------------------------------
# Disentanglement metrics
# ---------------------------------------------------------------------------

def _abs_corr(z: np.ndarray, f: np.ndarray) -> np.ndarray:
    """|Pearson correlation| matrix between latent dims and factors.
    Returns [L, K]."""
    z = np.asarray(z, dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    zc = z - z.mean(0)
    fc = f - f.mean(0)
    zs = zc.std(0) + 1e-12
    fs = fc.std(0) + 1e-12
    return np.abs((zc / zs).T @ (fc / fs)) / len(z)


def disentangle_evaluation(
    z_s: np.ndarray,
    z_g: np.ndarray,
    z_sg: np.ndarray,
    factor: np.ndarray,
    dataset: str = "",
) -> Dict[str, float]:
    """Latent-vs-factor scores.  For each ground-truth factor, report the
    strongest correlating latent dimension per branch, plus a MIG-style gap
    (top-1 minus top-2 correlation, normalized) over the concatenated space."""
    reshape2 = lambda z: np.asarray(z).reshape(-1, np.asarray(z).shape[-1])
    z_s, z_g, z_sg = reshape2(z_s), reshape2(z_g), reshape2(z_sg)
    factor = np.asarray(factor, dtype=np.float64)
    if factor.ndim == 1:
        factor = factor[:, None]
    n = min(len(z_s), len(z_g), len(z_sg), len(factor))
    z_s, z_g, z_sg, factor = z_s[:n], z_g[:n], z_sg[:n], factor[:n]

    out: Dict[str, float] = {}
    for name, z in (("s", z_s), ("g", z_g), ("sg", z_sg)):
        c = _abs_corr(z, factor)  # [L, K]
        for k in range(factor.shape[1]):
            out[f"{name}_factor{k}_maxcorr"] = float(c[:, k].max())

    z_all = np.concatenate([z_s, z_g, z_sg], axis=1)
    c_all = _abs_corr(z_all, factor)
    gaps = []
    for k in range(factor.shape[1]):
        top = np.sort(c_all[:, k])[::-1]
        if len(top) >= 2 and top[0] > 0:
            gaps.append((top[0] - top[1]) / top[0])
    out["mig_gap"] = float(np.mean(gaps)) if gaps else 0.0
    out["sap"] = sap_score(z_all, factor)
    out.update(dci_scores(z_all, factor))
    return out


# ---------------------------------------------------------------------------
# SAP and DCI — the standard quantitative disentanglement scores for the
# factor-supervised setting the reference targets (its disentangle_evaluation
# consumes the ground-truth factor array from 2D_prop.npy, input_data.py:60,
# and main.py:13-18 imports sklearn, signalling regression-based metrics).
# ---------------------------------------------------------------------------

def sap_score(z: np.ndarray, factors: np.ndarray) -> float:
    """Separated Attribute Predictability (Kumar et al., DIP-VAE — the same
    paper the reference's 'NED-VAE-IP' loss comes from, optimizer.py:176-182).

    For continuous factors the per-(latent, factor) score is the R² of the
    single-latent linear regression, i.e. squared correlation.  SAP is the
    mean over factors of (top-1 − top-2) of that score column: high when each
    factor is predictable from ONE latent dimension and not its runner-up.
    """
    z = np.asarray(z, dtype=np.float64).reshape(len(z), -1)
    f = _varying_factors(factors)
    s = _abs_corr(z, f) ** 2  # [L, K] single-latent R²
    if s.shape[0] < 2 or s.shape[1] == 0:
        return 0.0
    gaps = []
    for k in range(s.shape[1]):
        top = np.sort(s[:, k])[::-1]
        gaps.append(top[0] - top[1])
    return float(np.mean(gaps))


def _entropy(p: np.ndarray) -> float:
    p = p[p > 0]
    return float(-(p * np.log(p)).sum())


def _varying_factors(factors: np.ndarray) -> np.ndarray:
    """[n, K'] factor matrix with constant (zero-variance) columns dropped —
    a dead factor carries no disentanglement signal, and averaging its
    trivial score into SAP/DCI would silently deflate cross-run
    comparisons."""
    f = np.asarray(factors, dtype=np.float64)
    if f.ndim == 1:
        f = f[:, None]
    return f[:, f.std(0) > 1e-12]


def _dci_importance(z: np.ndarray, f: np.ndarray) -> np.ndarray:
    """[L, K] importance of each latent for predicting each factor: |coef| of
    a Lasso fit on standardized inputs (sparse linear importances — the
    lightweight standard choice; falls back to |correlation| without
    sklearn).  Inputs are standardized so coefficient magnitudes compare."""
    try:
        from sklearn.linear_model import Lasso
    except ImportError:  # pragma: no cover - sklearn is baked into this env
        return _abs_corr(z, f)
    zs = (z - z.mean(0)) / (z.std(0) + 1e-12)
    r = np.zeros((z.shape[1], f.shape[1]))
    for k in range(f.shape[1]):
        fk = f[:, k]
        std = fk.std()
        if std < 1e-12:
            continue
        model = Lasso(alpha=0.02, max_iter=5000)
        model.fit(zs, (fk - fk.mean()) / std)
        r[:, k] = np.abs(model.coef_)
    return r


def dci_scores(z: np.ndarray, factors: np.ndarray) -> Dict[str, float]:
    """DCI (Eastwood & Williams 2018): Disentanglement, Completeness,
    Informativeness from a per-(latent, factor) importance matrix R.

      * disentanglement — 1 − H(R[i,:]/ΣR[i,:])/log K per latent, averaged
        with weights ρ_i = ΣR[i,:]/ΣR (latents that matter count more);
      * completeness   — 1 − H(R[:,k]/ΣR[:,k])/log L per factor, averaged;
      * informativeness — mean in-sample R² of the linear predictor per
        factor (small-sample setting: no held-out split; comparable across
        checkpoints of the same run).
    """
    z = np.asarray(z, dtype=np.float64).reshape(len(z), -1)
    f = _varying_factors(factors)
    L, K = z.shape[1], f.shape[1]
    out = {"dci_disentanglement": 0.0, "dci_completeness": 0.0,
           "dci_informativeness": 0.0}
    if K == 0:
        return out
    r = _dci_importance(z, f)
    total = r.sum()
    if total <= 0:
        return out

    if K > 1:
        rho = r.sum(1) / total
        d = np.array([
            1.0 - _entropy(r[i] / r[i].sum()) / np.log(K) if r[i].sum() > 0
            else 0.0
            for i in range(L)
        ])
        out["dci_disentanglement"] = float((rho * d).sum())
    else:
        # one factor: any latent's importance distribution is trivially
        # concentrated — the score carries no information, report 1.0
        out["dci_disentanglement"] = 1.0

    if L > 1:
        c = np.array([
            1.0 - _entropy(r[:, k] / r[:, k].sum()) / np.log(L)
            if r[:, k].sum() > 0 else 0.0
            for k in range(K)
        ])
        out["dci_completeness"] = float(c.mean())
    else:
        out["dci_completeness"] = 1.0

    # informativeness: full (multi-latent) least-squares R² per factor
    zs = (z - z.mean(0)) / (z.std(0) + 1e-12)
    zb = np.concatenate([zs, np.ones((len(zs), 1))], axis=1)
    r2s = []
    for k in range(K):
        fk = f[:, k]
        var = fk.var()
        if var < 1e-12:
            continue
        coef, *_ = np.linalg.lstsq(zb, fk, rcond=None)
        resid = fk - zb @ coef
        r2s.append(1.0 - resid.var() / var)
    out["dci_informativeness"] = float(np.mean(r2s)) if r2s else 0.0
    return out
