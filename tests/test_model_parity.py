"""Model-level parity: the full disentangled VAE forward pass and ELBO match
the reference implementation (its own code, run from /root/reference) with
identical weights and inputs.

This closes SURVEY §7 step 8 end-to-end: encoder posteriors, decoder heads
(on the same latent samples) and the total training cost agree to float32
tolerance — far inside the north star's 1% ELBO budget.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("tensorflow.compat.v1")

from snd_vae_tpu.compat import map_reference_variables  # noqa: E402
from snd_vae_tpu.compat.ref_harness import load_reference, restore_tensorflow_module  # noqa: E402
from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig  # noqa: E402
from snd_vae_tpu.data.graphbatch import GraphBatch  # noqa: E402
from snd_vae_tpu.losses import elbo_loss  # noqa: E402
from snd_vae_tpu.models import DisentangledSNDVAE  # noqa: E402
from snd_vae_tpu.models.outputs import Latents, ModelOutput  # noqa: E402

B, S, N, F, D = 2, 2, 5, 1, 2

TINY_FLAGS = {
    "spatial_conv_layers": 2,
    "s_channel": [4, 4],
    "s_kernel_size": [3, 3],
    "s_strides": [1, 1],
    "s_hidden_size": 8,
    "s_latent_size": 4,
    "graph_conv_layers": 1,
    "g_conv_hidden": [4],
    "g_hidden_size": 8,
    "g_latent_size": 4,
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
    "sampling_num": S,
    "num_feature": F,
    "spatial_dim": D,
    "type": "train",
    "model_type": "disentangled",
    "dataset": "synthetic2",
}


def tiny_cfg() -> Config:
    return Config(
        dataset="synthetic2",
        num_nodes=N,
        num_features=F,
        spatial_dim=D,
        sampling_num=S,
        encoder=EncoderConfig(
            s_channels=(4, 4), s_kernel_sizes=(3, 3), s_strides=(1, 1),
            s_hidden_size=8, s_latent_size=4,
            g_conv_hidden=(4,), g_hidden_size=8, g_latent_size=4,
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
def ref_run(rng=np.random.default_rng(7)):
    """Build the reference graph once, initialize, fetch weights + outputs."""
    ref = load_reference(dict(TINY_FLAGS))
    tf = ref.tf

    adj_truth = (rng.random((B, N, N)) < 0.5).astype(np.float32)
    adj_truth = np.triu(adj_truth, 1)
    adj_truth = adj_truth + adj_truth.transpose(0, 2, 1)
    feats = rng.random((B, N, F)).astype(np.float32)
    coords = rng.random((B, N, D)).astype(np.float32)
    rel = np.abs(rng.random((B, N, N, 1))).astype(np.float32)
    rel = (rel + rel.transpose(0, 2, 1, 3)) / 2
    # spanning-tree-sample tensors in b-major order (graph b's samples are
    # rows [b*S, (b+1)*S)) — the layout our model uses; the reference's
    # decoder reshape [B, S, N, h] (model.py:177) assumes exactly this
    adj_s = np.repeat(adj_truth, S, axis=0)
    feats_s = np.repeat(feats, S, axis=0)
    rel_s = np.repeat(rel, S, axis=0)

    with tf.Graph().as_default():
        placeholders = {
            "features": tf.placeholder(tf.float32, [B * S, N, F]),
            "spatial": tf.placeholder(tf.float32, [B * S, N, D]),
            "adj": tf.placeholder(tf.float32, [B * S, N, N]),
            "adj_truth": tf.placeholder(tf.float32, [B, N, N]),
            "feature_truth": tf.placeholder(tf.float32, [B, N, F]),
            "spatial_truth": tf.placeholder(tf.float32, [B, N, D]),
            "rel_truth": tf.placeholder(tf.float32, [B, N, N, 1]),
            "rel": tf.placeholder(tf.float32, [B * S, N, N, 1]),
            "dropout": tf.placeholder_with_default(0.0, shape=()),
            "global_iter": tf.placeholder_with_default(0.0, shape=()),
        }
        ref.FLAGS.sg_batch_size = B          # encoder() multiplies by S
        ref.FLAGS.sg_decoder_batch_size = B
        model = ref.model.SGCNModelVAE(placeholders, F, N)
        opt = ref.optimizer.OptimizerVAE(
            preds_edge=model.generated_adj_prob,
            preds_node=model.generated_node_feat,
            preds_spatial=model.generated_spatial,
            labels_edge=placeholders["adj_truth"],
            labels_node=placeholders["feature_truth"],
            labels_spatial=placeholders["spatial_truth"],
            labels_rel=placeholders["rel_truth"],
            global_iter=placeholders["global_iter"],
            model=model, num_nodes=N, pos_weight=1.0, norm=1.0, beta=1.0,
        )
        feed = {
            placeholders["features"]: feats_s,
            placeholders["spatial"]: coords_s_feed(coords, S),
            placeholders["adj"]: adj_s,
            placeholders["rel"]: rel_s,
            placeholders["adj_truth"]: adj_truth,
            placeholders["feature_truth"]: feats,
            placeholders["spatial_truth"]: coords,
            placeholders["rel_truth"]: rel,
        }
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            tf_vars = {v.name: sess.run(v) for v in tf.global_variables()}
            # persist a real tf.train.Saver checkpoint (the reference's
            # format, main.py:351-352) for the import round-trip test
            import tempfile

            ckpt_dir = tempfile.mkdtemp(prefix="ref_ckpt_")
            ckpt_path = tf.train.Saver().save(
                sess, ckpt_dir + "/model_dgt_global_0.ckpt"
            )
            fetches = sess.run(
                {
                    "z_mean_s": model.z_mean_s,
                    "z_std_s": model.z_std_s,
                    "z_mean_g": model.z_mean_g,
                    "z_std_g": model.z_std_g,
                    "z_mean_sg": model.z_mean_sg,
                    "z_std_sg": model.z_std_sg,
                    "z_s": model.z_s,
                    "z_g": model.z_g,
                    "z_sg": model.z_sg,
                    "adj_prob": model.generated_adj_prob,
                    "coords": model.generated_spatial,
                    "node_feat": model.generated_node_feat,
                    "cost": opt.cost,
                    "kls": [opt.kl_s, opt.kl_g, opt.kl_sg],
                    "recon": [opt.adj_cost, opt.node_cost, opt.spatial_cost],
                },
                feed,
            )
    restore_tensorflow_module()
    data = dict(adj_truth=adj_truth, feats=feats, coords=coords, rel=rel,
                ckpt_path=ckpt_path)
    return tf_vars, fetches, data


def coords_s_feed(coords, s):
    return np.repeat(coords, s, axis=0)


def _our_forward(tf_vars, data):
    cfg = tiny_cfg()
    model = DisentangledSNDVAE(cfg)
    params = map_reference_variables(tf_vars, cfg)
    batch = GraphBatch(
        adj=jnp.asarray(data["adj_truth"]),
        features=jnp.asarray(data["feats"]),
        coords=jnp.asarray(data["coords"]),
        rel=jnp.asarray(data["rel"]),
        adj_samples=jnp.asarray(
            np.repeat(data["adj_truth"], S, axis=0).reshape(B, S, N, N)
        ),
    )
    stats = model.apply(
        {"params": params}, batch, method=DisentangledSNDVAE.encode
    )
    return cfg, model, params, batch, stats


def test_param_tree_structure_matches(ref_run, key):
    """The mapped reference variables must exactly cover our param tree."""
    tf_vars, _, data = ref_run
    cfg, model, params, batch, _ = _our_forward(tf_vars, data)
    init = model.init(key, batch, key=key)["params"]
    want = jax.tree.map(lambda a: (a.shape), init)
    got = jax.tree.map(lambda a: (np.asarray(a).shape), params)
    assert jax.tree.structure(want) == jax.tree.structure(got)
    for (pw, sw), (pg, sg_) in zip(
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        assert sw == sg_, (pw, sw, sg_)


def test_encoder_posteriors_match(ref_run):
    tf_vars, fetches, data = ref_run
    _, _, _, _, stats = _our_forward(tf_vars, data)
    np.testing.assert_allclose(
        np.asarray(stats.mean_s), fetches["z_mean_s"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats.logstd_s), fetches["z_std_s"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats.mean_g), fetches["z_mean_g"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats.mean_sg).reshape(B * S, -1),
        fetches["z_mean_sg"], rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stats.logstd_sg).reshape(B * S, -1),
        fetches["z_std_sg"], rtol=2e-4, atol=2e-5,
    )


def test_decoder_heads_match_on_same_latents(ref_run):
    """Feed the reference's sampled z through OUR decoder: all three heads
    must reproduce the reference's generated tensors."""
    tf_vars, fetches, data = ref_run
    cfg, model, params, batch, _ = _our_forward(tf_vars, data)
    latents = Latents(
        z_sg=jnp.asarray(fetches["z_sg"]).reshape(B, S, -1),
        z_s=jnp.asarray(fetches["z_s"]),
        z_g=jnp.asarray(fetches["z_g"]),
    )
    decoded = model.apply(
        {"params": params}, latents, method=DisentangledSNDVAE.decode
    )
    np.testing.assert_allclose(
        np.asarray(decoded.adj_prob), fetches["adj_prob"], rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(decoded.coords), fetches["coords"], rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(decoded.node_feat), fetches["node_feat"], rtol=2e-3, atol=2e-4
    )


def test_total_cost_matches(ref_run):
    """Full ELBO parity on the same latent samples (north star: within 1%;
    achieved: float32 tolerance)."""
    tf_vars, fetches, data = ref_run
    cfg, model, params, batch, stats = _our_forward(tf_vars, data)
    latents = Latents(
        z_sg=jnp.asarray(fetches["z_sg"]).reshape(B, S, -1),
        z_s=jnp.asarray(fetches["z_s"]),
        z_g=jnp.asarray(fetches["z_g"]),
    )
    decoded = model.apply(
        {"params": params}, latents, method=DisentangledSNDVAE.decode
    )
    out = ModelOutput(stats=stats, latents=latents, decoded=decoded)
    total, aux = elbo_loss(
        cfg, out, batch.adj, batch.features, batch.coords, 0.0
    )
    np.testing.assert_allclose(float(total), fetches["cost"], rtol=1e-4)
    kl_s, kl_g, kl_sg = fetches["kls"]
    np.testing.assert_allclose(float(aux["spatial_kl"]), kl_s, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(aux["graph_kl"]), kl_g, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(aux["sg_kl"]), kl_sg, rtol=1e-4, atol=1e-6)
    adj_c, node_c, sp_c = fetches["recon"]
    np.testing.assert_allclose(float(aux["adj_loss"]), adj_c, rtol=1e-4)
    np.testing.assert_allclose(float(aux["node_loss"]), node_c, rtol=1e-4)
    np.testing.assert_allclose(float(aux["spatial_loss"]), sp_c, rtol=1e-4)


def test_checkpoint_import_roundtrip(ref_run):
    """load_tf_checkpoint reads a real tf.train.Saver file (the reference's
    persistence format) and produces the same param tree as mapping the live
    graph's variables — reference checkpoints are loadable for parity runs
    (SURVEY §5 checkpoint/resume)."""
    from snd_vae_tpu.compat import load_tf_checkpoint

    tf_vars, fetches, data = ref_run
    cfg = tiny_cfg()
    from_vars = map_reference_variables(tf_vars, cfg)
    from_ckpt = load_tf_checkpoint(data["ckpt_path"], cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        from_vars, from_ckpt,
    )
