"""Measure the TF reference implementation's training throughput.

Imports the reference modules from /root/reference (read-only) under a TF1
compatibility shim and times `sess.run([opt_op, loss])` at the synthetic2
operating point (N=25, batch 10 graphs x 10 spanning-tree samples,
main.py:173-217) on CPU — establishing the empirical baseline that
BASELINE.md calls for (the reference publishes no numbers).

This is a measurement harness only: the model/optimizer graphs are the
reference's own code, executed in place; the flag values mirror the
synthetic2 preset block (main.py:181-217).

Usage:  python benchmarks/tf_reference_baseline.py [--steps 20]
Prints one JSON line {"graphs_per_sec": ..., "step_time_s": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(steps: int = 20, warmup: int = 2):
    # TF1 shim: the reference uses graph-mode tf.app.flags / placeholders.
    # The installed TF2/Keras-3 lacks graph-mode `tf.layers.conv1d` and
    # graph-compatible `tf.keras.layers.BatchNormalization`; both are shimmed
    # with semantically identical TF1-style implementations (glorot-uniform
    # conv kernel + zero bias; BN frozen at init stats as in the reference's
    # training graphs — SURVEY §7 quirk 3) so the measured compute matches
    # what the original TF1 runtime executed.
    import types

    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()

    def _conv1d(inputs, filters, kernel_size, strides=1, name=None, padding="SAME"):
        with tf.variable_scope(name, default_name="conv1d"):
            k = int(kernel_size)
            cin = int(inputs.shape[-1])
            w = tf.get_variable(
                "kernel", [k, cin, int(filters)],
                initializer=tf.glorot_uniform_initializer(),
            )
            b = tf.get_variable(
                "bias", [int(filters)], initializer=tf.zeros_initializer()
            )
            out = tf.nn.conv1d(
                inputs, w, stride=int(strides), padding=str(padding).upper()
            )
            return out + b

    class _FrozenBN:
        _uid = [0]

        def __init__(self, name=None, **kw):
            if name is None:
                self._uid[0] += 1
                name = f"bn_{self._uid[0]}"
            self.name = name

        def __call__(self, x, training=None):
            c = int(x.shape[-1])
            with tf.variable_scope(self.name, reuse=tf.AUTO_REUSE):
                gamma = tf.get_variable(
                    "gamma", [c], initializer=tf.ones_initializer()
                )
                beta = tf.get_variable(
                    "beta", [c], initializer=tf.zeros_initializer()
                )
            return x * gamma * (1.0 / np.sqrt(1.0 + 1e-3)) + beta

    shim = types.ModuleType("tensorflow")
    shim.__getattr__ = lambda name: getattr(tf, name)
    shim.layers = types.SimpleNamespace(conv1d=_conv1d)
    shim.keras = types.SimpleNamespace(
        layers=types.SimpleNamespace(BatchNormalization=_FrozenBN)
    )
    sys.modules["tensorflow"] = shim
    sys.path.insert(0, "/root/reference")

    flags = tf.app.flags
    FLAGS = flags.FLAGS
    # synthetic2 preset values (reference main.py:39-103 defaults overridden
    # per main.py:181-217)
    f_int = flags.DEFINE_integer
    f_list = flags.DEFINE_list
    f_float = flags.DEFINE_float
    f_str = flags.DEFINE_string
    f_int("spatial_conv_layers", 3, "")
    flags.DEFINE_list("s_channel", [10, 10, 20], "")
    flags.DEFINE_list("s_kernel_size", [5, 5, 5], "")
    flags.DEFINE_list("s_strides", [1, 1, 1], "")
    f_int("s_hidden_size", 100, "")
    f_int("s_latent_size", 100, "")
    f_int("graph_conv_layers", 2, "")
    flags.DEFINE_list("g_conv_hidden", [10, 20], "")
    f_int("g_hidden_size", 100, "")
    f_int("g_latent_size", 100, "")
    f_int("spatial_graph_conv_layers", 2, "")
    flags.DEFINE_list("sg_conv_hidden", [], "")
    f_int("sg_hidden_size", 100, "")
    f_int("sg_latent_size", 100, "")
    f_int("spatial_deconv_layers", 3, "")
    flags.DEFINE_list("s_d_channel", [50, 20, 10], "")
    flags.DEFINE_list("s_d_kernel_size", [5, 5, 5], "")
    flags.DEFINE_list("s_d_strides", [1, 1, 1], "")
    f_int("graph_deconv_layers", 2, "")
    flags.DEFINE_list("n_d_channel", [50, 20, 10], "")
    flags.DEFINE_list("n_d_kernel_size", [5, 5, 5], "")
    flags.DEFINE_list("n_d_strides", [1, 1, 1], "")
    f_int("d_hidden_size", 20, "")
    flags.DEFINE_list("e_d_hidden", [50, 20, 10], "")
    f_int("node_h_size", 20, "")
    f_str("model_type", "disentangled", "")
    f_float("learning_rate", 0.0008, "")
    f_float("dropout", 1.0, "")
    f_int("batch_size", 10, "")
    f_int("decoder_batch_size", 10, "")
    f_int("sg_batch_size", 10, "")
    f_int("sg_decoder_batch_size", 10, "")
    f_int("num_feature", 1, "")
    f_int("spatial_dim", 2, "")
    f_str("type", "train", "")
    f_str("dataset", "synthetic2", "")
    f_int("sampling_num", 10, "")
    # the nested sg_conv_hidden list can't be expressed as a flat
    # DEFINE_list; patch the parsed value in after definition
    FLAGS.mark_as_parsed()
    FLAGS.sg_conv_hidden = [[20, 20, 20], [50, 50, 50]]

    import model as ref_model  # noqa: E402  (reference model.py)
    from optimizer import OptimizerVAE  # noqa: E402

    B, S, N, F, D = 10, 10, 25, 1, 2
    rng = np.random.default_rng(0)
    adj_truth = (rng.random((B, N, N)) < 0.15).astype(np.float32)
    adj_truth = np.triu(adj_truth, 1)
    adj_truth = adj_truth + adj_truth.transpose(0, 2, 1)
    feats = rng.random((B, N, F)).astype(np.float32)
    coords = rng.random((B, N, D)).astype(np.float32)
    rel = rng.random((B, N, N, 1)).astype(np.float32)
    adj_s = np.tile(adj_truth, (S, 1, 1))
    feats_s = np.tile(feats, (S, 1, 1))
    coords_s = np.tile(coords, (S, 1, 1))
    rel_s = np.tile(rel, (S, 1, 1, 1))

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
    model = ref_model.SGCNModelVAE(placeholders, F, N)
    opt = OptimizerVAE(
        preds_edge=model.generated_adj_prob,
        preds_node=model.generated_node_feat,
        preds_spatial=model.generated_spatial,
        labels_edge=placeholders["adj_truth"],
        labels_node=placeholders["feature_truth"],
        labels_spatial=placeholders["spatial_truth"],
        labels_rel=placeholders["rel_truth"],
        global_iter=placeholders["global_iter"],
        model=model,
        num_nodes=N,
        pos_weight=1.0,
        norm=1.0,
        beta=1.0,
    )
    feed = {
        placeholders["features"]: feats_s,
        placeholders["spatial"]: coords_s,
        placeholders["adj"]: adj_s,
        placeholders["rel"]: rel_s,
        placeholders["adj_truth"]: adj_truth,
        placeholders["feature_truth"]: feats,
        placeholders["spatial_truth"]: coords,
        placeholders["rel_truth"]: rel,
        placeholders["dropout"]: 1.0,
        placeholders["global_iter"]: 0.0,
    }
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        for _ in range(warmup):
            sess.run([opt.opt_op, opt.cost], feed_dict=feed)
        t0 = time.perf_counter()
        for _ in range(steps):
            _, loss = sess.run([opt.opt_op, opt.cost], feed_dict=feed)
        dt = time.perf_counter() - t0
    out = {
        "graphs_per_sec": round(steps * B / dt, 3),
        "step_time_s": round(dt / steps, 5),
        "final_loss": float(loss),
        "operating_point": {"B": B, "S": S, "N": N, "F": F, "D": D},
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()
    main(steps=args.steps)
