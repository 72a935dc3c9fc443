"""ELBO losses and disentanglement regularizers.

Rebuilds ``/root/reference/optimizer.py`` as pure jit-able functions that fuse
into the train step:

  * reconstruction — 2-class softmax CE over edges vs [1-A, A]
    (optimizer.py:135-144; scene: K-way one-hot :138-140), node MSE (:149;
    scene: 0 :146-147), coordinate MSE (:153)
  * ``kl_diag_gaussian`` — the reference's KL with mean over *all* elements
    and z_std consumed as logσ (optimizer.py:160-162, SURVEY §7 quirk 4)
  * capacity-annealed KL (disentangled_C, optimizer.py:166-174)
  * ``dip_regularizer`` — DIP-VAE covariance penalty (optimizer.py:7-21)
  * ``total_correlation`` / ``hierarchical_total_correlation`` — β-TCVAE
    estimators (optimizer.py:23-116)
  * ``kl_between_gaussians`` — KL_div2 (optimizer.py:119-121)
  * optional weighted-BCE edge loss — the capability the reference plumbs
    (pos_weight/norm at main.py:246-247) but never uses (optimizer.py:124)

``elbo_loss`` dispatches on model_type exactly as OptimizerVAE
(optimizer.py:159-194) and returns (total, aux-dict) with the reference's
``overall_loss`` keys (optimizer.py:200-203).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import Config
from .models.outputs import LatentStats, ModelOutput
from .utils.tree import cast_float_leaves


# ---------------------------------------------------------------------------
# Reconstruction terms
# ---------------------------------------------------------------------------

def edge_cross_entropy(adj_logits: jnp.ndarray, adj_true: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax CE of 2-class edge logits vs the [1-A, A] one-hot
    (optimizer.py:135-144)."""
    labels = jnp.stack([1.0 - adj_true, adj_true], axis=-1)
    logp = jax.nn.log_softmax(adj_logits, axis=-1)
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def edge_categorical_cross_entropy(
    adj_logits: jnp.ndarray, adj_true: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Scene dataset: K-way categorical edges (optimizer.py:138-140)."""
    labels = jax.nn.one_hot(adj_true.astype(jnp.int32), num_classes)
    logp = jax.nn.log_softmax(adj_logits, axis=-1)
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def edge_weighted_bce(
    adj_logits: jnp.ndarray, adj_true: jnp.ndarray, pos_weight: float, norm: float
) -> jnp.ndarray:
    """Weighted binary CE on the edge logit — the VGAE-ancestral loss whose
    pos_weight/norm the reference computes (main.py:246-247) but leaves
    unused.  Uses the equivalent single logit l = l1 - l0 of the 2-class
    head."""
    logit = adj_logits[..., 1] - adj_logits[..., 0]
    # weighted sigmoid CE: (1-y)·l + (1 + (w-1)·y)·log(1+exp(-l)) [TF formula]
    log1p = jnp.logaddexp(0.0, -logit)
    loss = (1.0 - adj_true) * logit + (1.0 + (pos_weight - 1.0) * adj_true) * log1p
    return norm * jnp.mean(loss)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(target - pred))


# ---------------------------------------------------------------------------
# KL family
# ---------------------------------------------------------------------------

def kl_diag_gaussian(mean: jnp.ndarray, logstd: jnp.ndarray) -> jnp.ndarray:
    """-(1/2)·mean(1 + 2logσ − μ² − exp(logσ)²) — the reference's KL with
    reduce_mean over all elements (optimizer.py:160-162)."""
    return -0.5 * jnp.mean(
        1.0 + 2.0 * logstd - jnp.square(mean) - jnp.square(jnp.exp(logstd))
    )


def capacity_schedule(
    global_iter: jnp.ndarray, c_max: float, c_stop_iter: float, c_step: float
) -> jnp.ndarray:
    """C = clip(C_max·C_step/C_stop_iter·⌊iter/C_step⌋, 0, C_max)
    (optimizer.py:171)."""
    return jnp.clip(
        c_max * c_step / c_stop_iter * jnp.floor(global_iter / c_step), 0.0, c_max
    )


def kl_between_gaussians(mu, sigma, mu1, sigma1) -> jnp.ndarray:
    """KL(N(μ,σ²) || N(μ1,σ1²)) elementwise (optimizer.py:119-121)."""
    return 0.5 * (
        (sigma / sigma1) ** 2
        + (mu - mu1) ** 2 / sigma1**2
        - 1.0
        + 2.0 * (jnp.log(sigma1) - jnp.log(sigma))
    )


# ---------------------------------------------------------------------------
# Disentanglement regularizers
# ---------------------------------------------------------------------------

def dip_regularizer(enc_mean: jnp.ndarray, lambda_od: float, lambda_d: float) -> jnp.ndarray:
    """DIP-VAE covariance penalty (optimizer.py:7-21)."""
    mu = enc_mean.reshape(-1, enc_mean.shape[-1])
    exp_mu = jnp.mean(mu, axis=0)
    exp_mu_mu_t = jnp.mean(mu[:, None, :] * mu[:, :, None], axis=0)
    cov = exp_mu_mu_t - exp_mu[None, :] * exp_mu[:, None]
    diag = jnp.diagonal(cov)
    off_diag = cov - jnp.diag(diag)
    return lambda_od * jnp.sum(off_diag**2) + lambda_d * jnp.sum((diag - 1.0) ** 2)


def gaussian_log_density(samples, mean, log_var) -> jnp.ndarray:
    """(optimizer.py:23-28)"""
    normalization = jnp.log(2.0 * math.pi)
    inv_sigma = jnp.exp(-log_var)
    tmp = samples - mean
    return -0.5 * (tmp * tmp * inv_sigma + log_var + normalization)


def total_correlation(z, z_mean, z_logstd) -> jnp.ndarray:
    """Minibatch TC estimate (optimizer.py:30-63): E_j[log q(z_j) −
    log Π_l q(z_j_l)] up to constants."""
    z = z.reshape(-1, z.shape[-1])
    z_mean = z_mean.reshape(-1, z_mean.shape[-1])
    z_logstd = z_logstd.reshape(-1, z_logstd.shape[-1])
    z_logvar = 2.0 * z_logstd
    log_qz_prob = gaussian_log_density(
        z[:, None, :], z_mean[None, :, :], z_logvar[None, :, :]
    )
    log_qz_product = jnp.sum(
        jax.scipy.special.logsumexp(log_qz_prob, axis=1), axis=1
    )
    log_qz = jax.scipy.special.logsumexp(jnp.sum(log_qz_prob, axis=2), axis=1)
    return jnp.mean(log_qz - log_qz_product)


def hierarchical_total_correlation(
    z1, m1, s1, z2, m2, s2, z3, m3, s3
) -> jnp.ndarray:
    """Group TC across the three branches (optimizer.py:65-116)."""
    flat = lambda t: t.reshape(-1, t.shape[-1])
    z = jnp.concatenate([flat(z1), flat(z2), flat(z3)], axis=1)
    mean = jnp.concatenate([flat(m1), flat(m2), flat(m3)], axis=1)
    logvar = jnp.concatenate(
        [2.0 * flat(s1), 2.0 * flat(s2), 2.0 * flat(s3)], axis=1
    )
    d1 = z1.shape[-1]
    d2 = d1 + z2.shape[-1]
    d3 = d2 + z3.shape[-1]
    log_qz_prob = gaussian_log_density(
        z[:, None, :], mean[None, :, :], logvar[None, :, :]
    )
    lse = jax.scipy.special.logsumexp
    log_qz1 = lse(jnp.sum(log_qz_prob[:, :, 0:d1], axis=2), axis=1)
    log_qz2 = lse(jnp.sum(log_qz_prob[:, :, d1:d2], axis=2), axis=1)
    log_qz3 = lse(jnp.sum(log_qz_prob[:, :, d2:d3], axis=2), axis=1)
    log_qz = lse(jnp.sum(log_qz_prob, axis=2), axis=1)
    return jnp.mean(log_qz - (log_qz1 + log_qz2 + log_qz3))


# ---------------------------------------------------------------------------
# Full ELBO (OptimizerVAE, optimizer.py:123-203)
# ---------------------------------------------------------------------------

def reconstruction_losses(
    cfg: Config,
    output: ModelOutput,
    adj_true: jnp.ndarray,
    node_true: jnp.ndarray,
    coords_true: jnp.ndarray,
    pos_weight: Optional[float] = None,
    norm: Optional[float] = None,
    node_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    d = output.decoded
    if cfg.dataset == "scene":
        adj_cost = edge_categorical_cross_entropy(
            d.adj_prob, adj_true, cfg.decoder.num_edge_feature
        )
        if cfg.loss.scene_node_loss and d.node_feat_prob is not None:
            # corrected mode: categorical CE over the shape logits.  The
            # reference zeroes scene's node cost (optimizer.py:146-147), so
            # its shape head is never trained and predicts at chance.
            node_cost = -jnp.mean(jnp.sum(
                node_true * jax.nn.log_softmax(d.node_feat_prob, axis=-1),
                axis=-1,
            ))
        else:
            node_cost = jnp.asarray(0.0)
    elif cfg.loss.use_weighted_bce:
        if pos_weight is None:
            # derive the class-imbalance stats from the batch on device —
            # the reference's formulas at main.py:246-247.  Padded nodes
            # (node_mask=0) must not count as negatives.
            if node_mask is not None:
                pair = node_mask[..., :, None] * node_mask[..., None, :]
                n_tot = jnp.sum(pair).astype(adj_true.dtype)
            else:
                n_tot = jnp.asarray(adj_true.size, adj_true.dtype)
            n_pos = jnp.maximum(jnp.sum(adj_true), 1.0)
            pos_weight = (n_tot - n_pos) / n_pos
            norm = n_tot / (2.0 * jnp.maximum(n_tot - n_pos, 1.0))
        if norm is None:
            norm = 1.0  # no Python truthiness on (possibly traced) norm
        adj_cost = edge_weighted_bce(d.adj_prob, adj_true, pos_weight, norm)
        node_cost = mse(d.node_feat, node_true)
    else:
        adj_cost = edge_cross_entropy(d.adj_prob, adj_true)
        node_cost = mse(d.node_feat, node_true)
    spatial_cost = mse(d.coords, coords_true)
    return {"adj_loss": adj_cost, "node_loss": node_cost, "spatial_loss": spatial_cost}


def elbo_loss(
    cfg: Config,
    output: ModelOutput,
    adj_true: jnp.ndarray,
    node_true: jnp.ndarray,
    coords_true: jnp.ndarray,
    global_iter: jnp.ndarray = 0.0,
    beta: Optional[float] = None,
    pos_weight: Optional[float] = None,
    norm: Optional[float] = None,
    node_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total cost + aux dict, dispatching on model_type exactly as
    OptimizerVAE (optimizer.py:159-194)."""
    beta = cfg.loss.beta if beta is None else beta
    # losses always accumulate in float32 regardless of the forward compute
    # dtype (bfloat16 mixed precision casts the model, never the ELBO)
    output = cast_float_leaves(output, jnp.float32)
    adj_true, node_true, coords_true = cast_float_leaves(
        (adj_true, node_true, coords_true), jnp.float32
    )
    rec = reconstruction_losses(
        cfg, output, adj_true, node_true, coords_true, pos_weight, norm,
        node_mask=node_mask,
    )
    mse_loss = rec["adj_loss"] + rec["node_loss"] + rec["spatial_loss"]
    stats = output.stats
    lat = output.latents
    aux = dict(rec)

    kl_sg = kl_diag_gaussian(stats.mean_sg, stats.logstd_sg)
    aux["sg_kl"] = kl_sg

    mt = cfg.model_type
    if mt in ("disentangled", "geoGCN", "posGCN", "disentangled_C", "NED-VAE-IP", "beta-TCVAE"):
        kl_s = kl_diag_gaussian(stats.mean_s, stats.logstd_s)
        kl_g = kl_diag_gaussian(stats.mean_g, stats.logstd_g)
        aux["spatial_kl"] = kl_s
        aux["graph_kl"] = kl_g

    if mt in ("disentangled", "geoGCN", "posGCN"):
        cost = mse_loss + beta * (kl_sg + kl_s + kl_g)
    elif mt == "disentangled_C":
        c = capacity_schedule(
            jnp.asarray(global_iter, jnp.float32),
            cfg.loss.c_max, cfg.loss.c_stop_iter, cfg.loss.c_step,
        )
        kl = cfg.loss.gamma * jax.nn.relu(kl_sg - c) + kl_s + kl_g
        cost = mse_loss + kl
        aux["capacity"] = c
    elif mt == "NED-VAE-IP":
        dip = (
            dip_regularizer(stats.mean_s, cfg.loss.dip_lambda_od, cfg.loss.dip_lambda_d)
            + dip_regularizer(stats.mean_g, cfg.loss.dip_lambda_od, cfg.loss.dip_lambda_d)
            + dip_regularizer(stats.mean_sg, cfg.loss.dip_lambda_od, cfg.loss.dip_lambda_d)
        )
        cost = mse_loss + (kl_sg + kl_s + kl_g) + beta * dip
        aux["dip"] = dip
    elif mt == "beta-TCVAE":
        tc = (
            total_correlation(lat.z_s, stats.mean_s, stats.logstd_s)
            + total_correlation(lat.z_g, stats.mean_g, stats.logstd_g)
            + total_correlation(lat.z_sg, stats.mean_sg, stats.logstd_sg)
        )
        cost = mse_loss + beta * (kl_sg + kl_s + kl_g) + cfg.loss.tc_weight * tc
        aux["tc"] = tc
    else:  # base model (optimizer.py:192-194)
        cost = mse_loss + beta * kl_sg

    aux["loss"] = cost
    aux["mse_loss"] = mse_loss
    return cost, aux
