"""Typed containers for model outputs (replaces the reference's loose
attribute surface ``z_mean_{s,g,sg}`` / ``generated_*`` set in ``_build``,
model.py:76-95)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LatentStats:
    """Per-branch posterior parameters.  ``std`` fields hold logσ consumed as
    exp(logσ) — the reference's convention (model.py:153-161, SURVEY §7
    quirk 4).  Branch fields are None for the joint (base) model."""

    mean_sg: jax.Array                 # [B, S, L_sg] (S=1 when no sampling axis)
    logstd_sg: jax.Array
    mean_s: Optional[jax.Array] = None   # [B, L_s]
    logstd_s: Optional[jax.Array] = None
    mean_g: Optional[jax.Array] = None   # [B, L_g]
    logstd_g: Optional[jax.Array] = None


@struct.dataclass
class Latents:
    z_sg: jax.Array                    # [B, S, L_sg]
    z_s: Optional[jax.Array] = None    # [B, L_s]
    z_g: Optional[jax.Array] = None    # [B, L_g]


@struct.dataclass
class DecodedGraph:
    """The decoder's three heads (model.py:172-222)."""

    adj: jax.Array          # [B, N, N] hard 0/1 edges (argmax)
    adj_prob: jax.Array     # [B, N, N, C] edge-class logits (diag-masked)
    coords: jax.Array       # [B, N, D]
    node_feat: jax.Array    # [B, N, F]
    node_feat_prob: Optional[jax.Array] = None  # scene: categorical logits


@struct.dataclass
class ModelOutput:
    stats: Optional[LatentStats]
    latents: Latents
    decoded: DecodedGraph


def apply_coord_activation(cfg, raw: jax.Array, reference_linear: bool) -> jax.Array:
    """Coordinate-head output activation (DecoderConfig.coord_activation).

    ``reference_linear`` is what the reference would do at this call site:
    the disentangled decoder is always sigmoid (model.py:219); the joint
    decoder is linear for synthetic3/scene, sigmoid otherwise
    (model_joint.py:118-123).  "auto" keeps that; "linear"/"sigmoid" force
    one (e.g. linear is the corrected-mode fix for mnist's +10-shifted
    coordinates — BASELINE.md "mnist caveats").
    """
    mode = cfg.decoder.coord_activation
    linear = reference_linear if mode == "auto" else (mode == "linear")
    return raw if linear else jax.nn.sigmoid(raw)


def edge_distance_channel(cfg, coords: jax.Array, dtype) -> jax.Array:
    """Decoded-coordinate pairwise distances as a [B,N,N,1] edge channel
    (DecoderConfig.edge_from_coords, corrected mode; no reference analog —
    the reference's edge head sees only latent tiles, model.py:196-198).

    With ``efc_stop_grad`` the adjacency loss cannot pull on the coordinate
    head through this channel: the coordinates stay trained by the spatial
    MSE alone and the edge head merely consumes the decoded geometry.
    """
    if cfg.decoder.efc_stop_grad:
        coords = jax.lax.stop_gradient(coords)
    diff = coords[:, :, None, :] - coords[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True) + 1e-8)
    return dist.astype(dtype)
