"""Trajectory-level ELBO parity (north star: within 1% of the TF reference).

Trains the LIVE reference (its own model.py/optimizer.py under the TF1 shim)
for a few epochs in lockstep with the JAX parity model — identical data
(tile-skew feed stream), identical initial weights, identical
reparameterization noise, TF1-formulation Adam — and asserts the per-epoch
cost trajectories stay inside the 1% budget (they land far inside it).

The full-scale experiment at the synthetic2 operating point lives in
benchmarks/trajectory_parity.py; this is its CPU-sized regression guard.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("tensorflow.compat.v1")

from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig  # noqa: E402
from snd_vae_tpu.data.loaders import load_dataset  # noqa: E402
from snd_vae_tpu.train import make_optimizer, tf1_adam  # noqa: E402

B, S, N, F, D = 2, 2, 5, 1, 2
G = 4          # graphs -> 2 batches/epoch
EPOCHS = 3
LR = 1e-3

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
    "learning_rate": LR,
    "dropout": 1.0,
}


def tiny_cfg() -> Config:
    return Config(
        dataset="synthetic2",
        num_nodes=N,
        num_features=F,
        spatial_dim=D,
        sampling_num=S,
        reproduce_pairing_skew=True,
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
        train=TrainConfig(batch_size=B, learning_rate=LR, seed=3),
    )


def test_tf1_adam_matches_manual_formula():
    """tf1_adam reproduces TF1 Adam's update exactly (eps outside the v bias
    correction) and measurably differs from optax.adam at sqrt(v) ~ eps."""
    import optax

    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    params = {"w": jnp.asarray([1.0, -2.0, 0.5])}
    grads = {"w": jnp.asarray([0.3, -0.1, 1e-7])}

    opt = tf1_adam(lr, b1, b2, eps)
    state = opt.init(params)
    m = v = np.zeros(3)
    p = np.asarray(params["w"], np.float64)
    for t in range(1, 4):
        updates, state = opt.update(grads, state)
        g = np.asarray(grads["w"], np.float64)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        want = -lr_t * m / (np.sqrt(v) + eps)
        np.testing.assert_allclose(
            np.asarray(updates["w"]), want, rtol=5e-5, atol=1e-9
        )
        p += want

    # the epsilon-placement difference is real for tiny gradients
    oax = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    ostate = oax.init(params)
    oupd, _ = oax.update(grads, ostate)
    tf_first, _ = tf1_adam(lr, b1, b2, eps).update(grads, tf1_adam(lr).init(params))
    gap = np.abs(np.asarray(oupd["w"]) - np.asarray(tf_first["w"]))
    assert gap[2] > 1e-4  # near-zero-grad coordinate: formulations diverge


def test_make_optimizer_dispatch():
    cfg = tiny_cfg()
    make_optimizer(cfg)  # default adam
    make_optimizer(cfg.with_(train=dataclasses.replace(cfg.train, optimizer="tf1-adam")))
    with pytest.raises(ValueError):
        make_optimizer(cfg.with_(train=dataclasses.replace(cfg.train, optimizer="sgd")))


def test_lockstep_trajectory_within_one_percent():
    from snd_vae_tpu.compat.lockstep import run_lockstep

    cfg = tiny_cfg()
    data = load_dataset(cfg, "train", num_graphs=G)
    res = run_lockstep(cfg, dict(TINY_FLAGS), data, epochs=EPOCHS, noise_seed=11)

    # trajectories actually move (the comparison is not vacuous)
    assert abs(res.tf_epoch[-1] - res.tf_epoch[0]) > 1e-4

    # north-star budget: per-epoch ELBO within 1% — and in practice
    # float32-tight
    assert res.max_epoch_rel_gap < 0.01, (res.tf_epoch, res.jax_epoch)
    assert res.max_epoch_rel_gap < 2e-3, (res.tf_epoch, res.jax_epoch)
