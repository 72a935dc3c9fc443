"""Model-level tests: shapes, determinism, mode entry points, loss wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig
from snd_vae_tpu.data import loaders
from snd_vae_tpu.losses import elbo_loss
from snd_vae_tpu.models import DisentangledSNDVAE, JointSNDVAE, build_model


def tiny_cfg(**kw) -> Config:
    base = dict(
        dataset="synthetic2",
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
            n_d_strides=(1,), e_d_hidden=(4,),
        ),
        train=TrainConfig(batch_size=2, epochs=1),
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def tiny_batch():
    cfg = tiny_cfg()
    return loaders.load_dataset(cfg, "train", num_graphs=4).slice_batch(0, 2)


def test_disentangled_shapes(tiny_batch, key):
    cfg = tiny_cfg()
    model = DisentangledSNDVAE(cfg)
    v = model.init(key, tiny_batch, key=key)
    out = model.apply(v, tiny_batch, key=key)
    B, N = 2, cfg.num_nodes
    assert out.decoded.adj.shape == (B, N, N)
    assert out.decoded.adj_prob.shape == (B, N, N, 2)
    assert out.decoded.coords.shape == (B, N, cfg.spatial_dim)
    assert out.decoded.node_feat.shape == (B, N, cfg.num_features)
    assert out.stats.mean_sg.shape == (B, cfg.sampling_num, 4)
    assert out.stats.mean_s.shape == (B, 4)
    assert out.stats.mean_g.shape == (B, 4)


def test_decoded_adj_has_zero_diagonal(tiny_batch, key):
    """The diag mask (model.py:185,205-207) forces class-0 on the diagonal."""
    cfg = tiny_cfg()
    model = DisentangledSNDVAE(cfg)
    v = model.init(key, tiny_batch, key=key)
    out = model.apply(v, tiny_batch, key=key)
    diag = np.diagonal(np.asarray(out.decoded.adj), axis1=1, axis2=2)
    assert (diag == 0).all()


def test_deterministic_z_is_reproducible(tiny_batch, key):
    cfg = tiny_cfg()
    model = DisentangledSNDVAE(cfg)
    v = model.init(key, tiny_batch, key=key)
    o1 = model.apply(v, tiny_batch, key=key, deterministic_z=True)
    o2 = model.apply(v, tiny_batch, key=jax.random.PRNGKey(42), deterministic_z=True)
    np.testing.assert_allclose(
        np.asarray(o1.decoded.coords), np.asarray(o2.decoded.coords)
    )


def test_coord_activation_option(tiny_batch, key):
    """coord_activation='linear' removes the sigmoid bound on the coordinate
    head ('auto' keeps the reference's sigmoid in the disentangled model);
    same params, same everything else."""
    cfg_auto = tiny_cfg()
    cfg_lin = cfg_auto.with_(decoder=cfg_auto.decoder.__class__(
        **{**cfg_auto.decoder.__dict__, "coord_activation": "linear"}
    ))
    m_auto = build_model(cfg_auto)
    m_lin = build_model(cfg_lin)
    p = m_auto.init(key, tiny_batch, key=key)
    out_auto = m_auto.apply(p, tiny_batch, key=key)
    out_lin = m_lin.apply(p, tiny_batch, key=key)
    ca = np.asarray(out_auto.decoded.coords, dtype=np.float64)
    cl = np.asarray(out_lin.decoded.coords, dtype=np.float64)
    assert (ca > 0).all() and (ca < 1).all()          # sigmoid-bounded
    np.testing.assert_allclose(1 / (1 + np.exp(-cl)), ca, rtol=1e-5, atol=1e-6)
    # other heads unchanged
    np.testing.assert_allclose(
        np.asarray(out_lin.decoded.adj_prob), np.asarray(out_auto.decoded.adj_prob)
    )


def test_prior_sampling(tiny_batch, key):
    cfg = tiny_cfg()
    model = DisentangledSNDVAE(cfg)
    v = model.init(key, tiny_batch, key=key)
    out = model.apply(v, tiny_batch, key=key, sample_prior=True)
    assert out.decoded.adj.shape[0] == 2
    gen = model.apply(v, key, 3, method=DisentangledSNDVAE.generate)
    assert gen.adj.shape == (3, cfg.num_nodes, cfg.num_nodes)


def test_joint_model(tiny_batch, key):
    cfg = tiny_cfg(model_type="base")
    model = JointSNDVAE(cfg)
    v = model.init(key, tiny_batch, key=key)
    out = model.apply(v, tiny_batch, key=key)
    assert out.stats.mean_s is None
    assert out.decoded.adj.shape == (2, cfg.num_nodes, cfg.num_nodes)
    total, aux = elbo_loss(cfg, out, tiny_batch.adj, tiny_batch.features, tiny_batch.coords)
    assert np.isfinite(float(total))
    assert "spatial_kl" not in aux  # base model logs only sg_kl (main.py:344-345)


def test_joint_model_training_dropout(tiny_batch, key):
    """dropout_keep<1 perturbs the joint model's training forward (encoder
    model_joint.py:81, spatial head :116, node head :139); keep=1 is exactly
    the deterministic path, and the disentangled model ignores the knob
    (its dropout sites are commented out, model.py:108,192,217)."""
    cfg = tiny_cfg(model_type="base")
    model = JointSNDVAE(cfg)
    v = model.init(key, tiny_batch, key=key)
    base = model.apply(v, tiny_batch, key=key, dropout_keep=1.0)
    dropped = model.apply(v, tiny_batch, key=key, dropout_keep=0.5)
    assert not np.allclose(
        np.asarray(base.decoded.coords), np.asarray(dropped.decoded.coords)
    )
    assert not np.allclose(
        np.asarray(base.stats.mean_sg), np.asarray(dropped.stats.mean_sg)
    )
    again = model.apply(v, tiny_batch, key=key, dropout_keep=1.0)
    np.testing.assert_array_equal(
        np.asarray(base.decoded.coords), np.asarray(again.decoded.coords)
    )

    dcfg = tiny_cfg()
    dmodel = DisentangledSNDVAE(dcfg)
    dv = dmodel.init(key, tiny_batch, key=key)
    d1 = dmodel.apply(dv, tiny_batch, key=key, dropout_keep=0.5)
    d2 = dmodel.apply(dv, tiny_batch, key=key, dropout_keep=1.0)
    np.testing.assert_array_equal(
        np.asarray(d1.decoded.coords), np.asarray(d2.decoded.coords)
    )


def test_pairing_skew_changes_sg_inputs(key):
    """With reproduce_pairing_skew the sg-branch consumes the reference's
    tile-skewed features/rel, changing the sg posterior but no other
    branch (the skew only affects the sampled-tree stream)."""
    cfg = tiny_cfg()
    batch = loaders.load_dataset(
        cfg.with_(reproduce_pairing_skew=True), "train", num_graphs=4
    ).slice_batch(0, 2)
    assert batch.feat_samples is not None
    model = DisentangledSNDVAE(cfg)
    v = model.init(key, batch, key=key)
    skewed = model.apply(v, batch, key=key, deterministic_z=True)
    unskewed = model.apply(
        v, batch.replace(feat_samples=None, rel_samples=None),
        key=key, deterministic_z=True,
    )
    # identical g/s branches, different sg posterior
    np.testing.assert_array_equal(
        np.asarray(skewed.stats.mean_g), np.asarray(unskewed.stats.mean_g)
    )
    np.testing.assert_array_equal(
        np.asarray(skewed.stats.mean_s), np.asarray(unskewed.stats.mean_s)
    )
    assert not np.allclose(
        np.asarray(skewed.stats.mean_sg), np.asarray(unskewed.stats.mean_sg)
    )


@pytest.mark.parametrize("model_type", ["disentangled", "base"])
def test_edge_from_coords_option(tiny_batch, key, model_type):
    """Corrected-mode edge_from_coords feeds decoded-coordinate distances to
    the adjacency head: same output shapes, different logits, default off
    (reference parity — the reference head is latent-only, model.py:196-198)."""
    cfg = tiny_cfg(model_type=model_type)
    cfg_on = cfg.with_(decoder=cfg.decoder.__class__(
        **{**cfg.decoder.__dict__, "edge_from_coords": True}
    ))
    model_on = build_model(cfg_on)
    v = model_on.init(key, tiny_batch, key=key)
    out_on = model_on.apply(v, tiny_batch, key=key, deterministic_z=True)
    N = cfg.num_nodes
    assert out_on.decoded.adj_prob.shape[:3] == (2, N, N)
    total, _ = elbo_loss(
        cfg_on, out_on, tiny_batch.adj, tiny_batch.features, tiny_batch.coords
    )
    assert np.isfinite(float(total))
    # the extra channel changes the head's parameter shapes vs parity mode
    model_off = build_model(cfg)
    v_off = model_off.init(key, tiny_batch, key=key)
    p_on = jax.tree.leaves(v["params"])
    p_off = jax.tree.leaves(v_off["params"])
    assert any(
        a.shape != b.shape for a, b in zip(p_on, p_off)
    )


@pytest.mark.parametrize("model_type", ["disentangled", "base"])
def test_efc_stop_grad(tiny_batch, key, model_type):
    """efc_stop_grad blocks the adjacency head's gradient into the
    coordinate head (same forward, but an adjacency-only loss no longer
    reaches the coordinate head's params — DecoderConfig.efc_stop_grad)."""
    cfg = tiny_cfg(model_type=model_type)
    mk = lambda sg: cfg.with_(decoder=cfg.decoder.__class__(
        **{**cfg.decoder.__dict__, "edge_from_coords": True,
           "efc_stop_grad": sg}
    ))
    cfg_coupled, cfg_sg = mk(False), mk(True)
    model_c, model_s = build_model(cfg_coupled), build_model(cfg_sg)
    v = model_c.init(key, tiny_batch, key=key)

    # decode from prior z (at init the posterior mean is ~0, putting every
    # sigmoid coordinate at exactly 0.5 — all pairwise diffs vanish and the
    # distance gradient is legitimately zero there; random z breaks the tie)
    out_c = model_c.apply(v, tiny_batch, key=key, sample_prior=True)
    out_s = model_s.apply(v, tiny_batch, key=key, sample_prior=True)
    # identical forward pass — stop_gradient is a no-op on values
    np.testing.assert_array_equal(
        np.asarray(out_c.decoded.adj_prob), np.asarray(out_s.decoded.adj_prob)
    )

    # adjacency-only loss: grad into the coordinate head's final dense
    def adj_loss(model):
        def f(params):
            out = model.apply(
                {**v, "params": params}, tiny_batch, key=key,
                sample_prior=True,
            )
            return jnp.sum(out.decoded.adj_prob ** 2)
        return jax.grad(f)(v["params"])

    g_c, g_s = adj_loss(model_c), adj_loss(model_s)
    gc = np.asarray(g_c["d_s_lin2"]["kernel"])
    gs = np.asarray(g_s["d_s_lin2"]["kernel"])
    assert np.abs(gc).max() > 0          # coupled: edge loss pulls on coords
    np.testing.assert_array_equal(gs, np.zeros_like(gs))  # stopped: it can't


@pytest.mark.parametrize(
    "mt", ["disentangled", "disentangled_C", "NED-VAE-IP", "beta-TCVAE"]
)
def test_loss_variants_finite(tiny_batch, key, mt):
    cfg = tiny_cfg(model_type=mt)
    model = build_model(cfg)
    v = model.init(key, tiny_batch, key=key)
    out = model.apply(v, tiny_batch, key=key)
    total, aux = elbo_loss(
        cfg, out, tiny_batch.adj, tiny_batch.features, tiny_batch.coords,
        global_iter=5.0,
    )
    assert np.isfinite(float(total))
    assert {"loss", "adj_loss", "node_loss", "spatial_loss", "sg_kl"} <= set(aux)
    if mt != "base":
        assert {"graph_kl", "spatial_kl"} <= set(aux)


def test_geo_gcn_variant(key):
    cfg = tiny_cfg(model_type="geoGCN")
    batch = loaders.load_dataset(cfg, "train", num_graphs=2)
    model = build_model(cfg)
    v = model.init(key, batch, key=key)
    out = model.apply(v, batch, key=key)
    # geoGCN reads the truth graph: no sample axis (model.py:141-144)
    assert out.stats.mean_sg.shape[1] == 1
    assert np.isfinite(np.asarray(out.decoded.coords)).all()


def test_pos_gcn_variant_2d(key):
    """posGCN on a 2D dataset: coords lift to the z=0 plane (the reference's
    tf.linalg.cross would error outright on 2D, layers.py:683-685)."""
    cfg = tiny_cfg(model_type="posGCN")
    batch = loaders.load_dataset(cfg, "train", num_graphs=2)
    model = build_model(cfg)
    v = model.init(key, batch, key=key)
    out = model.apply(v, batch, key=key)
    assert out.stats.mean_sg.shape[1] == 1
    assert np.isfinite(np.asarray(out.decoded.coords)).all()
    total, _ = elbo_loss(cfg, out, batch.adj, batch.features, batch.coords)
    assert np.isfinite(float(total))


def test_outputs_in_range(tiny_batch, key):
    """Sigmoid heads bound features and coordinates to (0,1)."""
    cfg = tiny_cfg()
    model = DisentangledSNDVAE(cfg)
    v = model.init(key, tiny_batch, key=key)
    out = model.apply(v, tiny_batch, key=key)
    c = np.asarray(out.decoded.coords)
    f = np.asarray(out.decoded.node_feat)
    assert (c > 0).all() and (c < 1).all()
    assert (f > 0).all() and (f < 1).all()


@pytest.mark.parametrize("model_type", ["disentangled", "base"])
def test_remat_matches_baseline(tiny_batch, key, model_type):
    """cfg.remat (jax.checkpoint over the motif convs + adjacency head) must
    change ONLY the backward-pass memory schedule: identical param structure,
    identical outputs, matching gradients."""
    cfg = tiny_cfg(model_type=model_type)
    cfg_r = cfg.with_(remat=True)
    model, model_r = build_model(cfg), build_model(cfg_r)
    v = model.init(key, tiny_batch, key=key)
    v_r = model_r.init(key, tiny_batch, key=key)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_r)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), v, v_r)

    def loss(m, params):
        out = m.apply({"params": params}, tiny_batch, key=key)
        total, _ = elbo_loss(
            cfg, out, tiny_batch.adj, tiny_batch.features, tiny_batch.coords,
            jnp.asarray(0.0),
        )
        return total

    l0, g0 = jax.value_and_grad(lambda p: loss(model, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(model_r, p))(v_r["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0, g1,
    )


def test_remat_matches_baseline_3d(key):
    """Same remat invariance for the fourth-order conv family (protein)."""
    cfg = tiny_cfg(
        dataset="protein", spatial_dim=3, num_nodes=5,
        encoder=EncoderConfig(
            s_channels=(4,), s_kernel_sizes=(3,), s_strides=(1,),
            s_hidden_size=8, s_latent_size=4,
            g_conv_hidden=(4,), g_hidden_size=8, g_latent_size=4,
            sg_conv_hidden=((3, 3, 3, 3),), sg_hidden_size=8, sg_latent_size=4,
        ),
    )
    batch = loaders.load_dataset(cfg, "train", num_graphs=2).slice_batch(0, 2)
    model = build_model(cfg)
    model_r = build_model(cfg.with_(remat=True))
    v = model.init(key, batch, key=key)
    out = model.apply(v, batch, key=key)
    out_r = model_r.apply(v, batch, key=key)
    np.testing.assert_allclose(
        np.asarray(out.decoded.adj_prob), np.asarray(out_r.decoded.adj_prob),
        rtol=1e-6,
    )
