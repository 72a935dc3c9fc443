"""Golden-value tests for the ELBO pieces — the closed-form formulas in
optimizer.py are the oracle spec (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from snd_vae_tpu import losses


def test_kl_matches_closed_form(rng):
    mean = rng.standard_normal((4, 6)).astype(np.float32)
    logstd = rng.standard_normal((4, 6)).astype(np.float32) * 0.3
    got = float(losses.kl_diag_gaussian(jnp.asarray(mean), jnp.asarray(logstd)))
    # optimizer.py:160: -(0.5)*mean(1 + 2logσ - μ² - exp(logσ)²)
    want = -0.5 * np.mean(1 + 2 * logstd - mean**2 - np.exp(logstd) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kl_zero_at_standard_normal():
    mean = jnp.zeros((3, 5))
    logstd = jnp.zeros((3, 5))
    assert abs(float(losses.kl_diag_gaussian(mean, logstd))) < 1e-6


def test_capacity_schedule():
    # optimizer.py:171 with C_max=100, C_stop_iter=100, C_step=20:
    # C = clip(100*20/100*floor(it/20), 0, 100) = clip(20*floor(it/20),0,100)
    c = losses.capacity_schedule(jnp.asarray(0.0), 100.0, 100.0, 20.0)
    assert float(c) == 0.0
    c = losses.capacity_schedule(jnp.asarray(25.0), 100.0, 100.0, 20.0)
    assert float(c) == 20.0
    c = losses.capacity_schedule(jnp.asarray(1000.0), 100.0, 100.0, 20.0)
    assert float(c) == 100.0


def test_edge_cross_entropy_matches_manual(rng):
    logits = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    adj = (rng.random((2, 4, 4)) < 0.5).astype(np.float32)
    got = float(losses.edge_cross_entropy(jnp.asarray(logits), jnp.asarray(adj)))
    # manual softmax CE vs [1-A, A]
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    labels = np.stack([1 - adj, adj], -1)
    want = -np.mean(np.sum(labels * np.log(p), -1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dip_regularizer_identity_cov(rng):
    """If latent means have identity covariance and zero mean, DIP ≈ 0."""
    z = rng.standard_normal((100_0, 4)).astype(np.float64)
    z = (z - z.mean(0)) / z.std(0)
    # whiten exactly
    cov = np.cov(z.T, bias=True)
    L = np.linalg.cholesky(cov)
    zw = z @ np.linalg.inv(L).T
    got = float(losses.dip_regularizer(jnp.asarray(zw), 10.0, 100.0))
    assert got < 1e-6


def test_total_correlation_matches_numpy(rng):
    z = rng.standard_normal((6, 3)).astype(np.float64)
    mean = rng.standard_normal((6, 3)).astype(np.float64) * 0.1
    logstd = rng.standard_normal((6, 3)).astype(np.float64) * 0.1
    with jax.enable_x64():
        got = float(
            losses.total_correlation(
                jnp.asarray(z), jnp.asarray(mean), jnp.asarray(logstd)
            )
        )
    # numpy oracle of optimizer.py:30-63
    logvar = 2 * logstd
    diff = z[:, None, :] - mean[None, :, :]
    log_prob = -0.5 * (
        diff**2 * np.exp(-logvar[None]) + logvar[None] + np.log(2 * np.pi)
    )

    def lse(a, axis):
        m = a.max(axis=axis, keepdims=True)
        return np.squeeze(m, axis) + np.log(np.exp(a - m).sum(axis=axis))

    log_qz_product = lse(log_prob, 1).sum(1)
    log_qz = lse(log_prob.sum(2), 1)
    want = np.mean(log_qz - log_qz_product)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_weighted_bce_matches_tf_formula(rng):
    logits2 = rng.standard_normal((2, 3, 3, 2)).astype(np.float64)
    adj = (rng.random((2, 3, 3)) < 0.4).astype(np.float64)
    pw, norm = 3.0, 0.7
    with jax.enable_x64():
        got = float(
            losses.edge_weighted_bce(jnp.asarray(logits2), jnp.asarray(adj), pw, norm)
        )
    l = logits2[..., 1] - logits2[..., 0]
    # tf.nn.weighted_cross_entropy_with_logits: (1-y)l + (1+(pw-1)y)log(1+e^-l)
    want = norm * np.mean((1 - adj) * l + (1 + (pw - 1) * adj) * np.log1p(np.exp(-l)))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_weighted_bce_auto_stats(rng):
    """With use_weighted_bce and no explicit stats, pos_weight/norm derive
    from the batch (the reference's main.py:246-247 formulas)."""
    from snd_vae_tpu.config import synthetic2_preset
    from snd_vae_tpu.models.outputs import DecodedGraph, ModelOutput

    cfg = synthetic2_preset()
    cfg = cfg.with_(loss=cfg.loss.__class__(
        **{**cfg.loss.__dict__, "use_weighted_bce": True}
    ))
    B, N = 2, 4
    logits2 = rng.standard_normal((B, N, N, 2)).astype(np.float32)
    adj = (rng.random((B, N, N)) < 0.4).astype(np.float32)
    node = rng.random((B, N, 1)).astype(np.float32)
    coords = rng.random((B, N, 2)).astype(np.float32)
    d = DecodedGraph(adj=np.argmax(logits2, -1).astype(np.float32),
                     adj_prob=jnp.asarray(logits2),
                     node_feat=jnp.asarray(node), coords=jnp.asarray(coords))
    out = ModelOutput(decoded=d, stats=None, latents=None)
    # under jit: the derived stats are traced scalars (a Python truthiness
    # check on them is the regression this guards against)
    rec_fn = jax.jit(lambda o, a, n, c: losses.reconstruction_losses(cfg, o, a, n, c))
    rec = rec_fn(out, jnp.asarray(adj), jnp.asarray(node), jnp.asarray(coords))
    n_pos = adj.sum()
    pw = (adj.size - n_pos) / n_pos
    nm = adj.size / (2 * (adj.size - n_pos))
    want = float(losses.edge_weighted_bce(jnp.asarray(logits2), jnp.asarray(adj), pw, nm))
    np.testing.assert_allclose(float(rec["adj_loss"]), want, rtol=1e-6)


def test_hierarchical_tc_runs(rng):
    f = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    out = losses.hierarchical_total_correlation(
        f((5, 2)), f((5, 2)), f((5, 2)),
        f((5, 3)), f((5, 3)), f((5, 3)),
        f((5, 4)), f((5, 4)), f((5, 4)),
    )
    assert np.isfinite(float(out))


def test_kl_between_gaussians_zero_same():
    v = losses.kl_between_gaussians(
        jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(2.0)
    )
    assert abs(float(v)) < 1e-7
