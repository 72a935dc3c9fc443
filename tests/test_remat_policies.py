"""Selective rematerialization (Config.remat_policy) is semantics-preserving:
loss and gradients are identical to the no-remat step for every policy, on
both model families.  (What the policies change is the backward tape's
residual set — measured on hardware in benchmarks/remat_frontier.py.)"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig
from snd_vae_tpu.data.loaders import load_dataset
from snd_vae_tpu.losses import elbo_loss
from snd_vae_tpu.models import build_model
from snd_vae_tpu.nn.ckpt import BIG_NAMES, policy_from_config


def _cfg(**over) -> Config:
    return Config(
        dataset="synthetic2",
        num_nodes=12,
        sampling_num=2,
        encoder=EncoderConfig(
            s_channels=(4, 4), s_kernel_sizes=(3, 3), s_strides=(1, 1),
            s_hidden_size=8, s_latent_size=4,
            g_conv_hidden=(4,), g_hidden_size=8, g_latent_size=4,
            sg_conv_hidden=((4, 4, 4),), sg_hidden_size=8, sg_latent_size=4,
        ),
        decoder=DecoderConfig(
            node_h_size=4, s_d_channels=(4,), s_d_kernel_sizes=(3,),
            s_d_strides=(1,), n_d_channels=(4,), n_d_kernel_sizes=(3,),
            n_d_strides=(1,), e_d_hidden=(4, 4),
        ),
        train=TrainConfig(batch_size=2),
    ).with_(**over)


def _loss_and_grads(cfg, batch, params=None):
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    if params is None:
        params = model.init(key, batch, key=key)["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, batch, key=key, deterministic_z=True)
        total, _ = elbo_loss(
            cfg, out, batch.adj, batch.features, batch.coords, 0.0
        )
        return total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return params, float(loss), grads


# "offload-big" was measured 400x slower than no-remat at N=1024 on the
# tunneled backend and deleted (BASELINE.md "Selective rematerialization")
POLICIES = [None, "recompute-big", "dots-no-batch"]


@pytest.mark.parametrize("family", ["disentangled", "base"])
@pytest.mark.parametrize("factored", [False, True])
def test_remat_policies_preserve_loss_and_grads(family, factored):
    cfg = _cfg(model_type=family)
    cfg = cfg.with_(decoder=dataclasses.replace(
        cfg.decoder, adj_head_factored=factored))
    batch = load_dataset(cfg, "train", num_graphs=2)
    params, base_loss, base_grads = _loss_and_grads(cfg, batch)
    for pol in POLICIES:
        c2 = cfg.with_(remat=True, remat_policy=pol)
        _, loss, grads = _loss_and_grads(c2, batch, params)
        assert loss == pytest.approx(base_loss, rel=1e-6), (pol, family)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            base_grads, grads,
        )


def test_remat_policy_3d_family():
    cfg = _cfg(dataset="protein", spatial_dim=3)
    cfg = cfg.with_(encoder=dataclasses.replace(
        cfg.encoder, sg_conv_hidden=((4, 4, 4, 4),)))
    batch = load_dataset(cfg, "train", num_graphs=2)
    params, base_loss, base_grads = _loss_and_grads(cfg, batch)
    for pol in POLICIES:
        c2 = cfg.with_(remat=True, remat_policy=pol)
        _, loss, grads = _loss_and_grads(c2, batch, params)
        assert loss == pytest.approx(base_loss, rel=1e-6), pol
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            base_grads, grads,
        )


@pytest.mark.parametrize("family", ["disentangled", "base"])
def test_blocked_motif_lowering_preserves_loss_and_grads(family):
    """Config.motif_block_rows (the blocked streamed lowering,
    nn/spatial_conv._blocked_nt) is a scheduling change only: loss and
    gradients match the monolithic step bit-for-bit tolerances."""
    cfg = _cfg(model_type=family)
    batch = load_dataset(cfg, "train", num_graphs=2)
    params, base_loss, base_grads = _loss_and_grads(cfg, batch)
    for block in (4, 6):
        c2 = cfg.with_(motif_block_rows=block)
        _, loss, grads = _loss_and_grads(c2, batch, params)
        assert loss == pytest.approx(base_loss, rel=1e-6), (block, family)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            base_grads, grads,
        )


def test_blocked_motif_composes_with_remat():
    """block_rows under Config.remat nests a checkpointed scan inside
    nn.remat — still semantics-preserving."""
    cfg = _cfg(motif_block_rows=4)
    batch = load_dataset(cfg, "train", num_graphs=2)
    params, base_loss, base_grads = _loss_and_grads(cfg.with_(motif_block_rows=None), batch)
    _, loss, grads = _loss_and_grads(
        cfg.with_(remat=True, remat_policy="recompute-big"), batch, params
    )
    assert loss == pytest.approx(base_loss, rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        base_grads, grads,
    )


def test_policy_from_config_resolution():
    assert policy_from_config(False, "recompute-big") is None
    assert policy_from_config(True, None) is None
    assert policy_from_config(True, "recompute-big") is not None
    assert policy_from_config(True, "dots-no-batch") is not None
    with pytest.raises(ValueError):
        policy_from_config(True, "bogus")
    with pytest.raises(ValueError):  # deleted policy must not silently noop
        policy_from_config(True, "offload-big")


def test_big_names_cover_tag_sites():
    """Every tag() call in the tree uses a registered name (a typo would
    silently exempt a residual from the policies)."""
    import re
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "snd_vae_tpu"
    used = set()
    call_re = re.compile(r"(?<![\w.])(?:ops\.)?tag\(")
    for f in root.rglob("*.py"):
        text = f.read_text()
        for m in call_re.finditer(text):
            if text[: m.start()].rstrip().endswith("def"):
                continue  # the definition in nn/ckpt.py
            # paren-match to the call's closing ')'
            depth, i = 1, m.end()
            while depth and i < len(text):
                depth += {"(": 1, ")": -1}.get(text[i], 0)
                i += 1
            inner = text[m.end() : i - 1]
            if not inner.strip():
                continue  # prose mention of "tag()" in a docstring
            name = re.search(r"""["']([a-z0-9._]+)["']\s*,?\s*$""", inner)
            assert name, f"could not parse tag() name in {f}: {inner[-80:]}"
            used.add(name.group(1))
    assert used, "expected tag() call sites"
    missing = used - set(BIG_NAMES)
    assert not missing, f"tag names not registered in BIG_NAMES: {missing}"
