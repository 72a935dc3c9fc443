"""Model-level parity for the BASE (joint) model: JointSNDVAE's encoder,
decoder heads (on the same latent sample), and total cost match the
reference's model_joint.py run from /root/reference with identical weights
and inputs.

The reference's joint encoder consumes whatever tensors are fed to its
adj/rel/features placeholders and reshapes to [batch_size, -1]
(model_joint.py:78-85); here both implementations are fed the same
B-row truth tensors, so the formula itself is what is compared.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("tensorflow.compat.v1")

from snd_vae_tpu.compat.ref_harness import load_reference, restore_tensorflow_module  # noqa: E402
from snd_vae_tpu.compat.tf_import import map_reference_variables_joint  # noqa: E402
from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig  # noqa: E402
from snd_vae_tpu.data.graphbatch import GraphBatch  # noqa: E402
from snd_vae_tpu.losses import elbo_loss  # noqa: E402
from snd_vae_tpu.models import build_model  # noqa: E402
from snd_vae_tpu.models.joint import JointSNDVAE  # noqa: E402
from snd_vae_tpu.models.outputs import Latents, ModelOutput  # noqa: E402

B, N, F, D = 2, 5, 1, 2

JOINT_FLAGS = {
    "model_type": "base",
    "spatial_graph_conv_layers": 1,
    "sg_conv_hidden": [[4, 4, 4]],
    "sg_hidden_size": 8,
    "sg_latent_size": 4,
    "spatial_deconv_layers": 1,
    "s_d_channel": [4],
    "s_d_kernel_size": [3],
    "s_d_strides": [1],
    "graph_deconv_layers": 1,
    "n_d_channel": [4],
    "n_d_kernel_size": [3],
    "n_d_strides": [1],
    "e_d_hidden": [4],
    "node_h_size": 4,
    "batch_size": B,
    "decoder_batch_size": B,
    "sg_batch_size": B,
    "sg_decoder_batch_size": B,
    "sampling_num": 1,
    "num_feature": F,
    "spatial_dim": D,
    "type": "train",
    "dataset": "synthetic2",
    "num_edge_feature": 2,
}


def tiny_joint_cfg() -> Config:
    return Config(
        model_type="base",
        dataset="synthetic2",
        num_nodes=N,
        num_features=F,
        spatial_dim=D,
        sampling_num=1,
        encoder=EncoderConfig(
            sg_conv_hidden=((4, 4, 4),), sg_hidden_size=8, sg_latent_size=4,
        ),
        decoder=DecoderConfig(
            node_h_size=4, s_d_channels=(4,), s_d_kernel_sizes=(3,),
            s_d_strides=(1,), n_d_channels=(4,), n_d_kernel_sizes=(3,),
            n_d_strides=(1,), e_d_hidden=(4,),
        ),
        train=TrainConfig(batch_size=B),
    )


@pytest.fixture(scope="module")
def ref_joint_run(rng=np.random.default_rng(11)):
    ref = load_reference(dict(JOINT_FLAGS))
    tf = ref.tf

    adj = (rng.random((B, N, N)) < 0.5).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    feats = rng.random((B, N, F)).astype(np.float32)
    coords = rng.random((B, N, D)).astype(np.float32)
    rel = np.abs(rng.random((B, N, N, 1))).astype(np.float32)
    rel = (rel + rel.transpose(0, 2, 1, 3)) / 2

    with tf.Graph().as_default():
        ph = {
            "features": tf.placeholder(tf.float32, [B, N, F]),
            "spatial": tf.placeholder(tf.float32, [B, N, D]),
            "adj": tf.placeholder(tf.float32, [B, N, N]),
            "rel": tf.placeholder(tf.float32, [B, N, N, 1]),
            "adj_truth": tf.placeholder(tf.float32, [B, N, N]),
            "feature_truth": tf.placeholder(tf.float32, [B, N, F]),
            "spatial_truth": tf.placeholder(tf.float32, [B, N, D]),
            "rel_truth": tf.placeholder(tf.float32, [B, N, N, 1]),
            # decoder dropout is keep-prob semantics (model_joint.py:117)
            "dropout": tf.placeholder_with_default(1.0, shape=()),
            "global_iter": tf.placeholder_with_default(0.0, shape=()),
        }
        model = ref.model_joint.SGCNModelVAE(ph, F, N)
        opt = ref.optimizer.OptimizerVAE(
            preds_edge=model.generated_adj_prob,
            preds_node=model.generated_node_feat,
            preds_spatial=model.generated_spatial,
            labels_edge=ph["adj_truth"],
            labels_node=ph["feature_truth"],
            labels_spatial=ph["spatial_truth"],
            labels_rel=ph["rel_truth"],
            global_iter=ph["global_iter"],
            model=model, num_nodes=N, pos_weight=1.0, norm=1.0, beta=1.0,
        )
        feed = {
            ph["features"]: feats,
            ph["spatial"]: coords,
            ph["adj"]: adj,
            ph["rel"]: rel,
            ph["adj_truth"]: adj,
            ph["feature_truth"]: feats,
            ph["spatial_truth"]: coords,
            ph["rel_truth"]: rel,
        }
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            tf_vars = {v.name: sess.run(v) for v in tf.global_variables()}
            fetches = sess.run(
                {
                    "z_mean_sg": model.z_mean_sg,
                    "z_std_sg": model.z_std_sg,
                    "z_sg": model.z_sg,
                    "adj_prob": model.generated_adj_prob,
                    "coords": model.generated_spatial,
                    "node_feat": model.generated_node_feat,
                    "cost": opt.cost,
                    "kl_sg": opt.kl_sg,
                    "recon": [opt.adj_cost, opt.node_cost, opt.spatial_cost],
                },
                feed,
            )
    restore_tensorflow_module()
    return tf_vars, fetches, dict(adj=adj, feats=feats, coords=coords, rel=rel)


def _our_joint(tf_vars, data):
    cfg = tiny_joint_cfg()
    model = build_model(cfg)
    assert isinstance(model, JointSNDVAE)
    params = map_reference_variables_joint(tf_vars, cfg)
    batch = GraphBatch(
        adj=jnp.asarray(data["adj"]),
        features=jnp.asarray(data["feats"]),
        coords=jnp.asarray(data["coords"]),
        rel=jnp.asarray(data["rel"]),
    )
    stats = model.apply({"params": params}, batch, method=JointSNDVAE.encode)
    return cfg, model, params, batch, stats


def test_joint_encoder_posterior_matches(ref_joint_run):
    tf_vars, fetches, data = ref_joint_run
    _, _, _, _, stats = _our_joint(tf_vars, data)
    np.testing.assert_allclose(
        np.asarray(stats.mean_sg)[:, 0, :], fetches["z_mean_sg"],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stats.logstd_sg)[:, 0, :], fetches["z_std_sg"],
        rtol=1e-4, atol=1e-5,
    )


def test_joint_decoder_heads_match(ref_joint_run):
    tf_vars, fetches, data = ref_joint_run
    cfg, model, params, _, _ = _our_joint(tf_vars, data)
    latents = Latents(z_sg=jnp.asarray(fetches["z_sg"])[:, None, :])
    decoded = model.apply({"params": params}, latents, method=JointSNDVAE.decode)
    np.testing.assert_allclose(
        np.asarray(decoded.adj_prob), fetches["adj_prob"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(decoded.coords), fetches["coords"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(decoded.node_feat), fetches["node_feat"], rtol=1e-4, atol=1e-5
    )


def test_joint_total_cost_matches(ref_joint_run):
    tf_vars, fetches, data = ref_joint_run
    cfg, model, params, batch, stats = _our_joint(tf_vars, data)
    latents = Latents(z_sg=jnp.asarray(fetches["z_sg"])[:, None, :])
    decoded = model.apply({"params": params}, latents, method=JointSNDVAE.decode)
    out = ModelOutput(stats=stats, latents=latents, decoded=decoded)
    total, aux = elbo_loss(cfg, out, batch.adj, batch.features, batch.coords, 0.0)
    np.testing.assert_allclose(float(aux["sg_kl"]), fetches["kl_sg"], rtol=1e-4, atol=1e-6)
    adj_c, node_c, sp_c = fetches["recon"]
    np.testing.assert_allclose(float(aux["adj_loss"]), adj_c, rtol=1e-4)
    np.testing.assert_allclose(float(aux["node_loss"]), node_c, rtol=1e-4)
    np.testing.assert_allclose(float(aux["spatial_loss"]), sp_c, rtol=1e-4)
    np.testing.assert_allclose(float(total), fetches["cost"], rtol=1e-4)


K_EDGE, K_FEAT = 3, 4

SCENE_FLAGS = dict(JOINT_FLAGS)
SCENE_FLAGS.update({
    "dataset": "scene",
    "num_edge_feature": K_EDGE,
    "num_feature": K_FEAT,
    "spatial_dim": 3,
})


def tiny_scene_cfg() -> Config:
    base = tiny_joint_cfg()
    return base.with_(
        dataset="scene",
        num_features=K_FEAT,
        spatial_dim=3,
        decoder=base.decoder.__class__(
            **{**base.decoder.__dict__, "num_edge_feature": K_EDGE}
        ),
    )


@pytest.fixture(scope="module")
def ref_scene_run(rng=np.random.default_rng(13)):
    """Reference joint model with the scene branches active: K-way
    categorical edges (model_joint.py:173-176), softmax node classes
    (:140-142), linear coordinates (:118-119), node loss 0 and one-hot edge
    CE (optimizer.py:138-147)."""
    ref = load_reference(dict(SCENE_FLAGS))
    tf = ref.tf

    adj = rng.integers(0, K_EDGE, size=(B, N, N)).astype(np.float32)
    feats = np.eye(K_FEAT, dtype=np.float32)[
        rng.integers(0, K_FEAT, size=(B, N))
    ]
    coords = rng.standard_normal((B, N, 3)).astype(np.float32)
    rel = np.abs(rng.random((B, N, N, 1))).astype(np.float32)

    with tf.Graph().as_default():
        ph = {
            "features": tf.placeholder(tf.float32, [B, N, K_FEAT]),
            "spatial": tf.placeholder(tf.float32, [B, N, 3]),
            "adj": tf.placeholder(tf.float32, [B, N, N]),
            "rel": tf.placeholder(tf.float32, [B, N, N, 1]),
            "adj_truth": tf.placeholder(tf.float32, [B, N, N]),
            "feature_truth": tf.placeholder(tf.float32, [B, N, K_FEAT]),
            "spatial_truth": tf.placeholder(tf.float32, [B, N, 3]),
            "rel_truth": tf.placeholder(tf.float32, [B, N, N, 1]),
            "dropout": tf.placeholder_with_default(1.0, shape=()),
            "global_iter": tf.placeholder_with_default(0.0, shape=()),
        }
        model = ref.model_joint.SGCNModelVAE(ph, K_FEAT, N)
        opt = ref.optimizer.OptimizerVAE(
            preds_edge=model.generated_adj_prob,
            preds_node=model.generated_node_feat,
            preds_spatial=model.generated_spatial,
            labels_edge=ph["adj_truth"],
            labels_node=ph["feature_truth"],
            labels_spatial=ph["spatial_truth"],
            labels_rel=ph["rel_truth"],
            global_iter=ph["global_iter"],
            model=model, num_nodes=N, pos_weight=1.0, norm=1.0, beta=1.0,
        )
        feed = {
            ph["features"]: feats,
            ph["spatial"]: coords,
            ph["adj"]: adj,
            ph["rel"]: rel,
            ph["adj_truth"]: adj,
            ph["feature_truth"]: feats,
            ph["spatial_truth"]: coords,
            ph["rel_truth"]: rel,
        }
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            tf_vars = {v.name: sess.run(v) for v in tf.global_variables()}
            fetches = sess.run(
                {
                    "z_mean_sg": model.z_mean_sg,
                    "z_std_sg": model.z_std_sg,
                    "z_sg": model.z_sg,
                    "adj_prob": model.generated_adj_prob,
                    "node_feat_prob": model.generated_node_feat_prob,
                    "coords": model.generated_spatial,
                    "cost": opt.cost,
                    "kl_sg": opt.kl_sg,
                    "adj_cost": opt.adj_cost,
                    "spatial_cost": opt.spatial_cost,
                },
                feed,
            )
    restore_tensorflow_module()
    return tf_vars, fetches, dict(adj=adj, feats=feats, coords=coords, rel=rel)


def test_scene_joint_parity(ref_scene_run):
    tf_vars, fetches, data = ref_scene_run
    cfg = tiny_scene_cfg()
    model = build_model(cfg)
    params = map_reference_variables_joint(tf_vars, cfg)
    batch = GraphBatch(
        adj=jnp.asarray(data["adj"]),
        features=jnp.asarray(data["feats"]),
        coords=jnp.asarray(data["coords"]),
        rel=jnp.asarray(data["rel"]),
    )
    stats = model.apply({"params": params}, batch, method=JointSNDVAE.encode)
    np.testing.assert_allclose(
        np.asarray(stats.mean_sg)[:, 0, :], fetches["z_mean_sg"],
        rtol=1e-4, atol=1e-5,
    )
    latents = Latents(z_sg=jnp.asarray(fetches["z_sg"])[:, None, :])
    decoded = model.apply({"params": params}, latents, method=JointSNDVAE.decode)
    np.testing.assert_allclose(
        np.asarray(decoded.adj_prob).reshape(-1, K_EDGE), fetches["adj_prob"],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(decoded.node_feat_prob).reshape(-1, K_FEAT),
        fetches["node_feat_prob"], rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(decoded.coords), fetches["coords"], rtol=1e-4, atol=1e-5
    )
    out = ModelOutput(stats=stats, latents=latents, decoded=decoded)
    total, aux = elbo_loss(cfg, out, batch.adj, batch.features, batch.coords, 0.0)
    np.testing.assert_allclose(float(aux["adj_loss"]), fetches["adj_cost"], rtol=1e-4)
    assert float(aux["node_loss"]) == 0.0  # scene: node loss 0 (optimizer.py:146-147)
    np.testing.assert_allclose(float(aux["spatial_loss"]), fetches["spatial_cost"], rtol=1e-4)
    np.testing.assert_allclose(float(aux["sg_kl"]), fetches["kl_sg"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(total), fetches["cost"], rtol=1e-4)
