"""The disentangled SND-VAE — three latent branches (spatial z_s, topology
z_g, joint z_sg) with a three-headed decoder.

Rebuilds ``model.py::SGCNModelVAE`` (/root/reference/model.py:19-229) as a
functional Flax module:

  * the reference's build-time mode dispatch on ``FLAGS.type``
    (model.py:76-95) becomes separate pure entry points
    (``__call__`` train/reconstruct, ``generate`` from-prior, ``decode``);
  * the flag-mutation shape bookkeeping (``sg_batch_size *= sampling_num``,
    model.py:100-101,174-175) becomes an explicit [B, S, ...] sample axis;
  * spanning-tree samples pair with their own graph's features (the
    reference's tile-skew, SURVEY §7 quirk 1, corrected).

Encoder parity map (model.py:98-151):
  g-branch: stacked GraphConv + frozen-BN + skip-concat with raw features;
  s-branch: stacked SAME conv1d + frozen-BN + relu over coordinates;
  sg-branch: stacked SpatialGraphConv(+3D) + frozen-BN + lrelu over the
  sampled spanning trees (synthetic/protein/mnist) or the truth graph
  (geoGCN/posGCN — model.py:141-144 pass self.adj/self.rel/self.inputs_3d,
  not the sampled tensors, so those baselines carry no sample axis).

Decoder parity map (model.py:172-222): per-branch projection to per-node
states, sg states averaged over the sample axis, then node-feature head
(conv1d), adjacency head (pairwise tile-concat + E2E + diag mask), and
coordinate head (conv1d), all with frozen-BN.
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


class DisentangledSNDVAE(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        enc, dec = cfg.encoder, cfg.decoder
        norm = lambda: ops.make_norm(cfg.parity)

        # --- encoder: topology branch ------------------------------------
        self.g_convs = [ops.GraphConv(h) for h in enc.g_conv_hidden]
        self.g_bns = [norm() for _ in enc.g_conv_hidden]
        self.encoder_g_bn = norm()
        self.g_lin1 = ops.Dense(enc.g_hidden_size)
        self.g_lin_mean = ops.Dense(enc.g_latent_size)
        self.g_lin_std = ops.Dense(enc.g_latent_size)

        # --- encoder: spatial branch -------------------------------------
        self.s_convs = [
            ops.Conv1D(c, k, s)
            for c, k, s in zip(enc.s_channels, enc.s_kernel_sizes, enc.s_strides)
        ]
        self.s_bns = [norm() for _ in enc.s_channels]
        self.encoder_s_bn = norm()
        self.s_lin1 = ops.Dense(enc.s_hidden_size)
        self.s_lin_mean = ops.Dense(enc.s_latent_size)
        self.s_lin_std = ops.Dense(enc.s_latent_size)

        # --- encoder: joint branch ---------------------------------------
        # cfg.remat: recompute each motif conv's [B,N,N,h]-scale internals in
        # backward; only the [B,N,h] layer boundaries are saved.
        # cfg.remat_policy refines that to a selective policy over the
        # checkpoint_name-tagged N² intermediates (nn/ckpt.py) — e.g.
        # "recompute-big" keeps every small tensor and recomputes only the
        # tagged [B,N,N,h] residuals.
        pol = ops.policy_from_config(cfg.remat, cfg.remat_policy)
        sgc3 = (
            nn.remat(ops.SpatialGraphConv3D, policy=pol)
            if cfg.remat else ops.SpatialGraphConv3D
        )
        sgc = (
            nn.remat(ops.SpatialGraphConv, policy=pol)
            if cfg.remat else ops.SpatialGraphConv
        )
        sg_convs = []
        for hidden in enc.sg_conv_hidden:
            if cfg.model_type == "geoGCN":
                out = hidden[0] if isinstance(hidden, (tuple, list)) else hidden
                sg_convs.append(ops.GeoGraphConv(out))
            elif cfg.model_type == "posGCN":
                out = hidden[0] if isinstance(hidden, (tuple, list)) else hidden
                sg_convs.append(ops.StructGraphConv(out))
            elif cfg.uses_3d_conv:
                sg_convs.append(
                    sgc3(tuple(hidden), block_rows=cfg.motif_block_rows)
                )
            else:
                sg_convs.append(
                    sgc(tuple(hidden), block_rows=cfg.motif_block_rows)
                )
        self.sg_convs = sg_convs
        self.sg_bns = [norm() for _ in enc.sg_conv_hidden]
        self.encoder_sg_bn = norm()
        self.sg_lin1 = ops.Dense(enc.sg_hidden_size)
        self.sg_lin_mean = ops.Dense(enc.sg_latent_size)
        self.sg_lin_std = ops.Dense(enc.sg_latent_size)

        # --- decoder ------------------------------------------------------
        N = cfg.num_nodes
        self.d_sg_lin1 = ops.Dense(N * dec.node_h_size)
        self.d_s_lin1 = ops.Dense(N * dec.node_h_size)
        self.d_g_lin1 = ops.Dense(N * dec.node_h_size)

        self.n_deconvs = [
            ops.Conv1D(c, k, s)
            for c, k, s in zip(dec.n_d_channels, dec.n_d_kernel_sizes, dec.n_d_strides)
        ]
        self.d_bn_n = [norm() for _ in dec.n_d_channels]
        self.decoder_node_bn = norm()
        self.d_n_lin2 = ops.Dense(cfg.num_features)

        self.e_deconvs = [ops.E2E(h, k_h=N) for h in dec.e_d_hidden]
        # the first adjacency BN normalizes the (possibly never-materialized)
        # tile-concat map: fix its width so the factored head can apply it
        # per channel block (E2E._separable)
        c_pair = 2 * (2 * dec.node_h_size) + (1 if dec.edge_from_coords else 0)
        self.d_bn_e = [
            ops.make_norm(cfg.parity, features=c_pair if i == 0 else None)
            for i in range(len(dec.e_d_hidden))
        ]
        self.decoder_adj_bn = norm()
        self.d_e_lin2 = ops.Dense(2)

        self.s_deconvs = [
            ops.Conv1D(c, k, s)
            for c, k, s in zip(dec.s_d_channels, dec.s_d_kernel_sizes, dec.s_d_strides)
        ]
        self.d_bn_s = [norm() for _ in dec.s_d_channels]
        self.d_s_lin2 = ops.Dense(cfg.spatial_dim)

    # ------------------------------------------------------------------ #
    # Entry points                                                       #
    # ------------------------------------------------------------------ #
    def __call__(
        self,
        batch: GraphBatch,
        key: Optional[jax.Array] = None,
        sample_prior: bool = False,
        deterministic_z: bool = False,
        dropout_keep: float = 1.0,
    ) -> ModelOutput:
        # dropout_keep is accepted for train-step uniformity with the joint
        # model but intentionally unused: every dropout site in the reference
        # disentangled model is commented out (model.py:108,192,217)
        del dropout_keep
        stats = self.encode(batch)
        if sample_prior:
            latents = self.prior_latents(batch.batch_size, batch.num_samples, key)
        elif deterministic_z:
            latents = Latents(z_sg=stats.mean_sg, z_s=stats.mean_s, z_g=stats.mean_g)
        else:
            latents = self.reparameterize(stats, key)
        decoded = self.decode(latents)
        return ModelOutput(stats=stats, latents=latents, decoded=decoded)

    # ------------------------------------------------------------------ #
    # Encoder (model.py:98-151)                                          #
    # ------------------------------------------------------------------ #
    def encode(self, batch: GraphBatch) -> LatentStats:
        cfg = self.cfg
        B, N = batch.batch_size, batch.num_nodes
        feats, coords, adj = batch.features, batch.coords, batch.adj

        # topology branch
        g = feats
        for conv, bn in zip(self.g_convs, self.g_bns):
            g = bn(conv(adj, g))
            g = jnp.concatenate([g, feats], axis=-1)
        g = self.encoder_g_bn(g)
        g_ = self.g_lin1(g.reshape(B, -1))
        z_mean_g, z_std_g = self.g_lin_mean(g_), self.g_lin_std(g_)

        # spatial branch
        h = coords
        for conv, bn in zip(self.s_convs, self.s_bns):
            h = jax.nn.relu(bn(conv(h)))
        h = self.encoder_s_bn(h)
        h_ = self.s_lin1(h.reshape(B, -1))
        z_mean_s, z_std_s = self.s_lin_mean(h_), self.s_lin_std(h_)

        # joint branch
        if cfg.model_type in ("geoGCN", "posGCN"):
            S = 1
            sg = feats
            for conv, bn in zip(self.sg_convs, self.sg_bns):
                if cfg.model_type == "geoGCN":
                    sg = conv(adj, sg, batch.rel)
                else:
                    sg = conv(adj, sg, coords)
                sg = ops.lrelu(bn(sg))
            sg = self.encoder_sg_bn(sg)  # BN before flatten (model.py:148)
            sg_flat = sg.reshape(B, -1)
        else:
            assert batch.adj_samples is not None, "sg-branch needs spanning-tree samples"
            S = batch.num_samples
            adj_s = batch.adj_samples.reshape(B * S, N, N)
            # per-sample features/rel when the loader provides them (the
            # reference's tile-skew pairing under reproduce_pairing_skew);
            # otherwise each tree pairs with its own graph's tensors
            if batch.rel_samples is not None:
                rel_s = batch.rel_samples.reshape(B * S, N, N, -1)
            else:
                rel_s = jnp.broadcast_to(
                    batch.rel[:, None], (B, S) + batch.rel.shape[1:]
                ).reshape(B * S, N, N, -1)
            if batch.feat_samples is not None:
                sg = batch.feat_samples.reshape(B * S, N, -1)
            else:
                sg = jnp.broadcast_to(
                    feats[:, None], (B, S) + feats.shape[1:]
                ).reshape(B * S, N, -1)
            for conv, bn in zip(self.sg_convs, self.sg_bns):
                sg = ops.lrelu(bn(conv(adj_s, sg, rel_s)))
            sg = self.encoder_sg_bn(sg)  # BN before flatten (model.py:148)
            sg_flat = sg.reshape(B * S, -1)
        sg_ = self.sg_lin1(sg_flat)
        z_mean_sg, z_std_sg = self.sg_lin_mean(sg_), self.sg_lin_std(sg_)

        return LatentStats(
            mean_sg=z_mean_sg.reshape(B, S, -1),
            logstd_sg=z_std_sg.reshape(B, S, -1),
            mean_s=z_mean_s,
            logstd_s=z_std_s,
            mean_g=z_mean_g,
            logstd_g=z_std_g,
        )

    # ------------------------------------------------------------------ #
    # Latent sampling (model.py:153-169)                                 #
    # ------------------------------------------------------------------ #
    def reparameterize(self, stats: LatentStats, key: jax.Array) -> Latents:
        """z = μ + ε·exp(logσ), ε~N(0,1) (model.py:153-161)."""
        k_s, k_sg, k_g = jax.random.split(key, 3)
        norm = lambda k, t: jax.random.normal(k, t.shape, t.dtype)
        z_s = stats.mean_s + norm(k_s, stats.mean_s) * jnp.exp(stats.logstd_s)
        z_sg = stats.mean_sg + norm(k_sg, stats.mean_sg) * jnp.exp(stats.logstd_sg)
        z_g = stats.mean_g + norm(k_g, stats.mean_g) * jnp.exp(stats.logstd_g)
        return Latents(z_sg=z_sg, z_s=z_s, z_g=z_g)

    def prior_latents(self, batch_size: int, num_samples: int, key: jax.Array) -> Latents:
        """z ~ N(0, I) (model.py:163-169)."""
        enc = self.cfg.encoder
        dt = jnp.dtype(self.cfg.compute_dtype)
        k_s, k_sg, k_g = jax.random.split(key, 3)
        return Latents(
            z_sg=jax.random.normal(
                k_sg, (batch_size, num_samples, enc.sg_latent_size), dt
            ),
            z_s=jax.random.normal(k_s, (batch_size, enc.s_latent_size), dt),
            z_g=jax.random.normal(k_g, (batch_size, enc.g_latent_size), dt),
        )

    # ------------------------------------------------------------------ #
    # Decoder (model.py:172-222)                                         #
    # ------------------------------------------------------------------ #
    def decode(self, latents: Latents) -> DecodedGraph:
        cfg = self.cfg
        dec = cfg.decoder
        N = cfg.num_nodes
        z_sg, z_s, z_g = latents.z_sg, latents.z_s, latents.z_g
        B, S = z_sg.shape[0], z_sg.shape[1]

        # per-branch projection to per-node states (model.py:177-180)
        zsg = self.d_sg_lin1(z_sg.reshape(B * S, -1)).reshape(
            B, S, N, dec.node_h_size
        )
        zsg = jnp.mean(zsg, axis=1)  # average over spanning-tree samples
        zs = self.d_s_lin1(z_s).reshape(B, N, dec.node_h_size)
        zg = self.d_g_lin1(z_g).reshape(B, N, dec.node_h_size)
        z_sg_g = jnp.concatenate([zsg, zg], axis=-1)

        # node-feature head (model.py:188-194)
        x = z_sg_g
        for conv, bn in zip(self.n_deconvs, self.d_bn_n):
            x = bn(conv(x))
        x = self.decoder_node_bn(x.reshape(B * N, -1))
        node_feat = jax.nn.sigmoid(self.d_n_lin2(x)).reshape(B, N, -1)

        # coordinate head (model.py:213-219) — decoded before the adjacency
        # head so its output can feed the edge_from_coords channel
        sp = jnp.concatenate([zsg, zs], axis=-1)
        for conv, bn in zip(self.s_deconvs, self.d_bn_s):
            sp = bn(conv(sp))
        coords = apply_coord_activation(
            cfg, self.d_s_lin2(sp.reshape(B * N, -1)), reference_linear=False
        ).reshape(B, N, -1)

        # adjacency head (model.py:196-208); cfg.remat recomputes the whole
        # [B,N,N,*] head from the small (z_sg_g, coords) inputs in backward
        head = (
            nn.remat(
                type(self)._adj_head,
                policy=ops.policy_from_config(cfg.remat, cfg.remat_policy),
            )
            if cfg.remat else type(self)._adj_head
        )
        adj_prob = head(self, z_sg_g, coords)
        adj = jnp.argmax(jax.nn.softmax(adj_prob, axis=-1), axis=-1)

        return DecodedGraph(adj=adj, adj_prob=adj_prob, coords=coords, node_feat=node_feat)

    def _adj_head(self, z_sg_g: jax.Array, coords: jax.Array) -> jax.Array:
        """Pairwise tile-concat + E2E stack + diag mask (model.py:196-208).
        The [B,N,N,2C] pairwise map is row-blocked on nodes under an ambient
        mesh (parallel/hints.py).

        When ``cfg.adj_factored_engaged`` (auto at large N) the first E2E
        layer runs in its separable lowering: the tile-concat map stays
        channel-separable through the per-channel BN+relu, so it is never
        materialized and the first layer's N³ contraction collapses to N²
        matmuls (E2E._separable; identical parameters and math)."""
        cfg, dec = self.cfg, self.cfg.decoder
        B, N = z_sg_g.shape[0], cfg.num_nodes
        if cfg.adj_factored_engaged and self.e_deconvs:
            C = z_sg_g.shape[-1]
            bn0 = self.d_bn_e[0]
            p = jax.nn.relu(bn0(z_sg_g, block=(0, C)))
            q = jax.nn.relu(bn0(z_sg_g, block=(C, 2 * C)))
            d = None
            if dec.edge_from_coords:
                dch = edge_distance_channel(cfg, coords, z_sg_g.dtype)
                d = jax.nn.relu(bn0(dch, block=(2 * C, 2 * C + dch.shape[-1])))
            t = self.e_deconvs[0](factors=(p, q, d))
            layers = zip(self.e_deconvs[1:], self.d_bn_e[1:])
        else:
            t1 = jnp.broadcast_to(z_sg_g[:, :, None, :], (B, N, N, z_sg_g.shape[-1]))
            t2 = jnp.broadcast_to(z_sg_g[:, None, :, :], (B, N, N, z_sg_g.shape[-1]))
            parts = [t1, t2]
            if dec.edge_from_coords:
                # corrected mode: decoded-coordinate pairwise distances as an
                # extra edge channel (spatial-network edges are distance-
                # dependent; the reference's head is latent-only)
                parts.append(edge_distance_channel(cfg, coords, t1.dtype))
            t = ops.tag(
                ops.shard_nodes(jnp.concatenate(parts, axis=-1), tag="dec.pair"),
                "dec.pair",
            )
            layers = zip(self.e_deconvs, self.d_bn_e)
        for e2e, bn in layers:
            t = bn(t)
            t = ops.tag(e2e(jax.nn.relu(t)), "dec.e2e")
        t = self.decoder_adj_bn(t)
        # Dense contracts the last axis at any rank, so the reference's
        # [B·N·N, C] flatten (model.py:203) is mathematically identity here —
        # and skipping it keeps the node axis sharded under the mesh (a
        # merge-reshape of a partitioned axis forces an all-gather)
        logits = ops.shard_nodes(self.d_e_lin2(jax.nn.relu(t)), tag="dec.logits")
        off_diag = 1.0 - jnp.eye(N, dtype=logits.dtype)
        prob1 = off_diag * logits[..., 1]
        prob0 = off_diag * logits[..., 0] + (1.0 - off_diag)
        return jnp.stack([prob0, prob1], axis=-1)

    def generate(
        self, key: jax.Array, num: int, num_samples: Optional[int] = None
    ) -> DecodedGraph:
        """Decode from the prior (reference test_generation, model.py:83-85)."""
        S = num_samples or self.cfg.sampling_num
        return self.decode(self.prior_latents(num, S, key))
