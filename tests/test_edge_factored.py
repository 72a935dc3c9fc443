"""Separable (factored) first-layer E2E lowering — exactness proofs.

The decoders' first adjacency layer consumes a pairwise tile-concat map
``t[b,i,j] = [z[b,i], z[b,j], dist[b,i,j]]`` (reference model.py:196-198).
``E2E._separable`` computes that layer without materializing the map; these
tests prove it is the SAME function as the dense formula:

  * op level, float64: dense map through ``E2E.__call__`` vs the factor
    form, over kernel widths, with/without pairwise channels;
  * norm level: FrozenBatchNorm / BatchStatNorm applied per channel block
    equal the full-map application sliced;
  * model level: ``adj_head_factored`` True vs False give identical
    parameter trees, outputs, and gradients for both model families.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig
from snd_vae_tpu.data import loaders
from snd_vae_tpu.losses import elbo_loss
from snd_vae_tpu.models import DisentangledSNDVAE, JointSNDVAE
from snd_vae_tpu.nn.basic import BatchStatNorm, FrozenBatchNorm
from snd_vae_tpu.nn.edge_conv import E2E


def _dense_map(P, Q, D=None):
    B, N, _ = P.shape
    t1 = jnp.broadcast_to(P[:, :, None, :], (B, N, N, P.shape[-1]))
    t2 = jnp.broadcast_to(Q[:, None, :, :], (B, N, N, Q.shape[-1]))
    parts = [t1, t2] + ([D] if D is not None else [])
    return jnp.concatenate(parts, axis=-1)


@pytest.mark.parametrize("k_h", [6, 5, 3, 9])  # == N, odd < N, even-ish, > N
@pytest.mark.parametrize("with_d", [False, True])
def test_e2e_separable_matches_dense_f64(rng, k_h, with_d):
    with jax.enable_x64():
        B, N, C, O = 2, 6, 4, 5
        P = jnp.asarray(rng.normal(size=(B, N, C)))
        Q = jnp.asarray(rng.normal(size=(B, N, C)))
        D = jnp.asarray(rng.normal(size=(B, N, N, 2))) if with_d else None
        x = _dense_map(P, Q, D)
        e2e = E2E(O, k_h=k_h, use_matmul=False)
        v = e2e.init(jax.random.PRNGKey(0), x.astype(jnp.float32))
        v = jax.tree.map(lambda t: t.astype(jnp.float64), v)
        dense = e2e.apply(v, x)
        fact = e2e.apply(v, factors=(P, Q, D))
        np.testing.assert_allclose(
            np.asarray(fact), np.asarray(dense), rtol=1e-12, atol=1e-12
        )
        # ... and against the Toeplitz-matmul lowering too
        dense_mm = E2E(O, k_h=k_h, use_matmul=True).apply(v, x)
        np.testing.assert_allclose(
            np.asarray(fact), np.asarray(dense_mm), rtol=1e-10, atol=1e-10
        )


def test_e2e_init_via_factors_matches_dense_init(rng):
    """Param trees are identical whichever path creates them."""
    B, N, C, O = 2, 6, 4, 5
    P = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    Q = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    x = _dense_map(P, Q)
    e2e = E2E(O, k_h=N)
    v_dense = e2e.init(jax.random.PRNGKey(7), x)
    v_fact = e2e.init(jax.random.PRNGKey(7), factors=(P, Q, None))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_dense, v_fact,
    )


@pytest.mark.parametrize("norm_cls", [FrozenBatchNorm, BatchStatNorm])
def test_norm_block_application_matches_full_map(rng, norm_cls):
    """bn(map)[..., lo:hi] == bn(factor, block=(lo,hi)) for broadcast factors.

    For BatchStatNorm this rests on the block being constant along the
    broadcast axis (replication changes neither moment)."""
    with jax.enable_x64():
        B, N, C = 2, 5, 3
        P = jnp.asarray(rng.normal(size=(B, N, C)))
        Q = jnp.asarray(rng.normal(size=(B, N, C)))
        D = jnp.asarray(rng.normal(size=(B, N, N, 2)))
        x = _dense_map(P, Q, D)
        bn = norm_cls(features=2 * C + 2)
        v = bn.init(jax.random.PRNGKey(0), x)
        # non-trivial gamma/beta so the affine actually does something
        v = {"params": {
            "gamma": jnp.asarray(rng.normal(size=(2 * C + 2,))),
            "beta": jnp.asarray(rng.normal(size=(2 * C + 2,))),
        }}
        full = bn.apply(v, x)
        p_blk = bn.apply(v, P, block=(0, C))
        q_blk = bn.apply(v, Q, block=(C, 2 * C))
        d_blk = bn.apply(v, D, block=(2 * C, 2 * C + 2))
        np.testing.assert_allclose(
            np.asarray(full[:, :, 0, :C]), np.asarray(p_blk), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(full[:, 0, :, C:2 * C]), np.asarray(q_blk), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(full[..., 2 * C:]), np.asarray(d_blk), rtol=1e-12, atol=1e-12
        )


def _cfg(model_type="disentangled", *, factored, efc=False, parity=True):
    return Config(
        dataset="synthetic2",
        model_type=model_type,
        parity=parity,
        num_nodes=6,
        sampling_num=2,
        encoder=EncoderConfig(
            s_channels=(4,), s_kernel_sizes=(3,), s_strides=(1,),
            s_hidden_size=8, s_latent_size=4,
            g_conv_hidden=(4,), g_hidden_size=8, g_latent_size=4,
            sg_conv_hidden=((4, 4, 4),), sg_hidden_size=8, sg_latent_size=4,
        ),
        decoder=DecoderConfig(
            node_h_size=4, s_d_channels=(4,), s_d_kernel_sizes=(3,),
            s_d_strides=(1,), n_d_channels=(4,), n_d_kernel_sizes=(3,),
            n_d_strides=(1,), e_d_hidden=(4, 3),
            edge_from_coords=efc,
            adj_head_factored=factored,
        ),
        train=TrainConfig(batch_size=2, epochs=1),
    )


@pytest.mark.parametrize("model_type", ["disentangled", "base"])
@pytest.mark.parametrize("efc", [False, True])
@pytest.mark.parametrize("parity", [True, False])
def test_model_factored_head_equals_dense(key, model_type, efc, parity):
    """Same params, same outputs, same gradients — only the lowering differs."""
    cfg_d = _cfg(model_type, factored=False, efc=efc, parity=parity)
    cfg_f = _cfg(model_type, factored=True, efc=efc, parity=parity)
    batch = loaders.load_dataset(cfg_d, "train", num_graphs=4).slice_batch(0, 2)
    cls = DisentangledSNDVAE if model_type == "disentangled" else JointSNDVAE
    m_d, m_f = cls(cfg_d), cls(cfg_f)
    v_d = m_d.init(key, batch, key=key)
    v_f = m_f.init(key, batch, key=key)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_d, v_f,
    )

    out_d = m_d.apply(v_d, batch, key=key)
    out_f = m_f.apply(v_d, batch, key=key)
    np.testing.assert_allclose(
        np.asarray(out_f.decoded.adj_prob), np.asarray(out_d.decoded.adj_prob),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out_f.decoded.adj), np.asarray(out_d.decoded.adj)
    )

    def loss(m):
        def f(params):
            out = m.apply({"params": params}, batch, key=key)
            total, _ = elbo_loss(
                m.cfg, out, batch.adj, batch.features, batch.coords, 0.0
            )
            return total
        return f

    g_d = jax.grad(loss(m_d))(v_d["params"])
    g_f = jax.grad(loss(m_f))(v_d["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        g_d, g_f,
    )


def test_auto_engages_by_node_count():
    cfg_small = _cfg(factored=None)
    assert not cfg_small.adj_factored_engaged  # N=6 < 96
    cfg_forced = _cfg(factored=True)
    assert cfg_forced.adj_factored_engaged
    big = dataclasses.replace(cfg_small, num_nodes=128)
    assert big.adj_factored_engaged
