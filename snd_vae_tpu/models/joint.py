"""The joint (non-disentangled) SND-VAE — single latent z_sg.

Rebuilds ``model_joint.py::SGCNModelVAE`` (/root/reference/model_joint.py:11-206)
— note the reference naming inversion: *model_joint.py is the baseline* "base"
model (SURVEY §2.5).  Single sg-encoder (stacked SpatialGraphConv + dropout,
model_joint.py:72-85), one latent, and a three-headed decoder from the joint
per-node state alone (model_joint.py:94-182) including the scene-dataset
branches: linear (non-sigmoid) coordinates for synthetic3/scene
(:118-121), softmax-categorical node features (:140-145), and
``num_edge_feature``-way categorical edges (:171-179).

The reference reads the undeclared ``FLAGS.num_edge_feature`` flag
unconditionally at :171 (a latent crash, SURVEY §2.5); here it is the
explicit ``DecoderConfig.num_edge_feature`` (2 reproduces the binary-edge
behavior).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..data.graphbatch import GraphBatch
from .. import nn as ops
from .outputs import (
    DecodedGraph, Latents, LatentStats, ModelOutput, apply_coord_activation,
    edge_distance_channel,
)


class JointSNDVAE(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        enc, dec = cfg.encoder, cfg.decoder
        norm = lambda: ops.make_norm(cfg.parity)
        N = cfg.num_nodes

        # cfg.remat: recompute each motif conv's [B,N,N,h]-scale internals in
        # backward; only the [B,N,h] layer boundaries are saved
        # cfg.remat_policy refines full remat to a selective policy over the
        # tagged N² intermediates (nn/ckpt.py)
        pol = ops.policy_from_config(cfg.remat, cfg.remat_policy)
        sgc3 = (
            nn.remat(ops.SpatialGraphConv3D, policy=pol)
            if cfg.remat else ops.SpatialGraphConv3D
        )
        sgc = (
            nn.remat(ops.SpatialGraphConv, policy=pol)
            if cfg.remat else ops.SpatialGraphConv
        )
        if cfg.uses_3d_conv:
            self.sg_convs = [
                sgc3(tuple(h), block_rows=cfg.motif_block_rows)
                for h in enc.sg_conv_hidden
            ]
        else:
            self.sg_convs = [
                sgc(tuple(h), block_rows=cfg.motif_block_rows)
                for h in enc.sg_conv_hidden
            ]
        self.sg_bns = [norm() for _ in enc.sg_conv_hidden]
        self.sg_lin1 = ops.Dense(enc.sg_hidden_size)
        self.sg_lin_mean = ops.Dense(enc.sg_latent_size)
        self.sg_lin_std = ops.Dense(enc.sg_latent_size)

        self.d_sg_lin1 = ops.Dense(N * dec.node_h_size)

        self.s_deconvs = [
            ops.Conv1D(c, k, s)
            for c, k, s in zip(dec.s_d_channels, dec.s_d_kernel_sizes, dec.s_d_strides)
        ]
        self.d_bn_s = [norm() for _ in dec.s_d_channels]
        self.d_s_lin2 = ops.Dense(cfg.spatial_dim)

        self.n_deconvs = [
            ops.Conv1D(c, k, s)
            for c, k, s in zip(dec.n_d_channels, dec.n_d_kernel_sizes, dec.n_d_strides)
        ]
        self.d_bn_n = [norm() for _ in dec.n_d_channels]
        self.d_n_lin2 = ops.Dense(cfg.num_features)

        self.e_deconvs = [ops.E2E(h, k_h=N) for h in dec.e_d_hidden]
        # fixed-width first BN so the factored head can apply it per channel
        # block without materializing the tile-concat map (E2E._separable)
        c_pair = 2 * dec.node_h_size + (1 if dec.edge_from_coords else 0)
        self.d_bn_e = [
            ops.make_norm(cfg.parity, features=c_pair if i == 0 else None)
            for i in range(len(dec.e_d_hidden))
        ]
        self.d_e_lin2 = ops.Dense(dec.num_edge_feature)

    # ------------------------------------------------------------------ #
    def __call__(
        self,
        batch: GraphBatch,
        key: Optional[jax.Array] = None,
        sample_prior: bool = False,
        deterministic_z: bool = False,
        dropout_keep: float = 1.0,
    ) -> ModelOutput:
        drop_key = None
        if key is not None and dropout_keep < 1.0:
            key, drop_key = jax.random.split(key)
        stats = self.encode(batch, key=drop_key, dropout_keep=dropout_keep)
        if sample_prior:
            z_sg = jax.random.normal(key, stats.mean_sg.shape, stats.mean_sg.dtype)
        elif deterministic_z:
            z_sg = stats.mean_sg
        else:
            z_sg = stats.mean_sg + jax.random.normal(
                key, stats.mean_sg.shape, stats.mean_sg.dtype
            ) * jnp.exp(stats.logstd_sg)
        latents = Latents(z_sg=z_sg)
        decoded = self.decode(
            latents,
            key=None if drop_key is None else jax.random.fold_in(drop_key, 101),
            dropout_keep=dropout_keep,
        )
        return ModelOutput(stats=stats, latents=latents, decoded=decoded)

    def encode(
        self,
        batch: GraphBatch,
        key: Optional[jax.Array] = None,
        dropout_keep: float = 1.0,
    ) -> LatentStats:
        """Single joint branch over the truth graph (model_joint.py:72-85)."""
        B = batch.batch_size
        sg = batch.features
        for i, (conv, bn) in enumerate(zip(self.sg_convs, self.sg_bns)):
            sg = ops.lrelu(bn(conv(batch.adj, sg, batch.rel)))
            if dropout_keep < 1.0 and key is not None:
                sg = ops.dropout(
                    sg, dropout_keep, jax.random.fold_in(key, i), deterministic=False
                )
        sg_ = self.sg_lin1(sg.reshape(B, -1))
        mean = self.sg_lin_mean(sg_)
        logstd = self.sg_lin_std(sg_)
        # one-sample axis keeps the latent layout uniform with the
        # disentangled model's [B, S, L]
        return LatentStats(mean_sg=mean[:, None, :], logstd_sg=logstd[:, None, :])

    def decode(
        self,
        latents: Latents,
        key: Optional[jax.Array] = None,
        dropout_keep: float = 1.0,
    ) -> DecodedGraph:
        cfg = self.cfg
        dec = cfg.decoder
        N = cfg.num_nodes
        z_sg = latents.z_sg
        B = z_sg.shape[0]
        no_drop = dropout_keep >= 1.0 or key is None
        drop = lambda t, i: t if no_drop else ops.dropout(
            t, dropout_keep, jax.random.fold_in(key, i), deterministic=False
        )
        joint_h = self.d_sg_lin1(z_sg.reshape(B, -1)).reshape(B, N, dec.node_h_size)

        # coordinate head (model_joint.py:112-123; training-time dropout after
        # each lrelu, model_joint.py:116)
        sp = joint_h
        for i, (conv, bn) in enumerate(zip(self.s_deconvs, self.d_bn_s)):
            sp = drop(ops.lrelu(bn(conv(sp))), i)
        sp_flat = sp.reshape(B * N, -1)
        coords = apply_coord_activation(
            cfg, self.d_s_lin2(sp_flat),
            reference_linear=cfg.dataset in ("synthetic3", "scene"),
        ).reshape(B, N, -1)

        # node-feature head (model_joint.py:129-145; dropout at :139)
        x = joint_h
        for i, (conv, bn) in enumerate(zip(self.n_deconvs, self.d_bn_n)):
            x = drop(ops.lrelu(bn(conv(x))), 100 + i)
        node_logits = self.d_n_lin2(x.reshape(B * N, -1))
        if cfg.dataset == "scene":
            node_feat_prob = node_logits.reshape(B, N, -1)
            node_feat = jnp.argmax(
                jax.nn.softmax(node_feat_prob, axis=-1), axis=-1
            ).astype(node_logits.dtype)[..., None]
        else:
            node_feat_prob = None
            node_feat = jax.nn.sigmoid(node_logits).reshape(B, N, -1)

        # adjacency head (model_joint.py:164-179); cfg.remat recomputes the
        # whole [B,N,N,*] head from the small (joint_h, coords) in backward
        head = (
            nn.remat(
                type(self)._adj_head,
                policy=ops.policy_from_config(cfg.remat, cfg.remat_policy),
            )
            if cfg.remat else type(self)._adj_head
        )
        adj_prob = head(self, joint_h, coords)
        adj = jnp.argmax(jax.nn.softmax(adj_prob, axis=-1), axis=-1)

        return DecodedGraph(
            adj=adj,
            adj_prob=adj_prob,
            coords=coords,
            node_feat=node_feat,
            node_feat_prob=node_feat_prob,
        )

    def _adj_head(self, joint_h: jax.Array, coords: jax.Array) -> jax.Array:
        """Pairwise tile-concat + E2E stack (+ scene categorical edges,
        model_joint.py:164-179)."""
        cfg, dec = self.cfg, self.cfg.decoder
        B, N = joint_h.shape[0], cfg.num_nodes
        if cfg.adj_factored_engaged and self.e_deconvs:
            # separable lowering of the first E2E: the tile-concat map is
            # never materialized (see DisentangledSNDVAE._adj_head)
            C = joint_h.shape[-1]
            bn0 = self.d_bn_e[0]
            p = jax.nn.relu(bn0(joint_h, block=(0, C)))
            q = jax.nn.relu(bn0(joint_h, block=(C, 2 * C)))
            d = None
            if dec.edge_from_coords:
                dch = edge_distance_channel(cfg, coords, joint_h.dtype)
                d = jax.nn.relu(bn0(dch, block=(2 * C, 2 * C + dch.shape[-1])))
            t = self.e_deconvs[0](factors=(p, q, d))
            layers = zip(self.e_deconvs[1:], self.d_bn_e[1:])
        else:
            t1 = jnp.broadcast_to(joint_h[:, :, None, :], (B, N, N, joint_h.shape[-1]))
            t2 = jnp.broadcast_to(joint_h[:, None, :, :], (B, N, N, joint_h.shape[-1]))
            parts = [t1, t2]
            if dec.edge_from_coords:
                # corrected mode: decoded-coordinate distances as an edge
                # channel (see DecoderConfig.edge_from_coords)
                parts.append(edge_distance_channel(cfg, coords, t1.dtype))
            t = ops.tag(jnp.concatenate(parts, axis=-1), "dec.pair")
            layers = zip(self.e_deconvs, self.d_bn_e)
        for e2e, bn in layers:
            t = bn(t)
            t = ops.tag(e2e(jax.nn.relu(t)), "dec.e2e")
        # Dense contracts the last axis at any rank — the reference's
        # [B·N·N, C] flatten (model_joint.py:171-177) is identity here, and
        # skipping it keeps the node axis sharded under the mesh
        logits = ops.shard_nodes(self.d_e_lin2(jax.nn.relu(t)), tag="dec.logits")
        if cfg.dataset == "scene":
            return logits
        off_diag = 1.0 - jnp.eye(N, dtype=logits.dtype)
        prob1 = off_diag * logits[..., 1]
        prob0 = off_diag * logits[..., 0] + (1.0 - off_diag)
        return jnp.stack([prob0, prob1], axis=-1)

    def generate(self, key: jax.Array, num: int) -> DecodedGraph:
        z = jax.random.normal(key, (num, 1, self.cfg.encoder.sg_latent_size))
        return self.decode(Latents(z_sg=z))
