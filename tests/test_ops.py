"""Unit tests for the basic NN ops vs. small NumPy oracles (SURVEY §4: the
TF formulas in layers.py are the oracle spec)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snd_vae_tpu import nn as ops


def test_lrelu():
    x = jnp.asarray([-2.0, -0.5, 0.0, 1.5])
    np.testing.assert_allclose(
        np.asarray(ops.lrelu(x)), [-0.4, -0.1, 0.0, 1.5], atol=1e-7
    )


def test_dense_formula(rng, key):
    x = jnp.asarray(rng.standard_normal((4, 7)).astype(np.float32))
    mod = ops.Dense(5)
    p = mod.init(key, x)
    got = np.asarray(mod.apply(p, x))
    w = np.asarray(p["params"]["kernel"])
    b = np.asarray(p["params"]["bias"])
    np.testing.assert_allclose(got, np.asarray(x) @ w + b, rtol=1e-5, atol=1e-6)
    assert b.sum() == 0  # bias_start=0 (layers.py:571-572)


def test_graph_conv_formula(rng, key):
    adj = jnp.asarray((rng.random((2, 5, 5)) < 0.5).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 5, 3)).astype(np.float32))
    mod = ops.GraphConv(4)
    p = mod.init(key, adj, x)
    got = np.asarray(mod.apply(p, adj, x))
    w = np.asarray(p["params"]["kernel"])
    want = np.asarray(adj) @ (np.asarray(x) @ w)
    want = np.maximum(want, 0.2 * want)  # lrelu (layers.py:123)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_graph_conv_full_concats_channels(rng, key):
    adj = jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 4, 2)).astype(np.float32))
    mod = ops.GraphConvFull(5)
    p = mod.init(key, adj, x)
    got = np.asarray(mod.apply(p, adj, x))
    assert got.shape == (2, 4, 15)  # 3 channels x 5 features
    w = np.asarray(p["params"]["kernel"])
    xw = np.asarray(x) @ w
    for c in range(3):
        want = np.einsum("bnm,bmo->bno", np.asarray(adj)[..., c], xw)
        want = np.maximum(want, 0.2 * want)
        np.testing.assert_allclose(got[..., c * 5 : (c + 1) * 5], want, rtol=1e-4, atol=1e-5)


def test_conv1d_same_padding_shape(rng, key):
    x = jnp.asarray(rng.standard_normal((3, 10, 4)).astype(np.float32))
    mod = ops.Conv1D(6, kernel_size=5)
    p = mod.init(key, x)
    y = mod.apply(p, x)
    assert y.shape == (3, 10, 6)


def test_conv1d_matches_manual_conv(rng, key):
    """SAME 1-D conv oracle via np.correlate-style sliding window."""
    x = rng.standard_normal((1, 6, 1)).astype(np.float32)
    mod = ops.Conv1D(1, kernel_size=3)
    p = mod.init(key, jnp.asarray(x))
    w = np.asarray(p["params"]["kernel"])[:, 0, 0]  # [k]
    got = np.asarray(mod.apply(p, jnp.asarray(x)))[0, :, 0]
    pad = np.pad(x[0, :, 0], (1, 1))
    want = np.array([np.dot(pad[i : i + 3], w) for i in range(6)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_frozen_batch_norm_semantics(rng, key):
    """Frozen BN = gamma*x/sqrt(1+eps) + beta (SURVEY §7 quirk 3)."""
    x = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
    mod = ops.FrozenBatchNorm()
    p = mod.init(key, x)
    got = np.asarray(mod.apply(p, x))
    want = np.asarray(x) / np.sqrt(1.001)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_batch_stat_norm_normalizes(rng, key):
    x = jnp.asarray((rng.standard_normal((200, 3)) * 5 + 2).astype(np.float32))
    mod = ops.BatchStatNorm()
    p = mod.init(key, x)
    y = np.asarray(mod.apply(p, x))
    assert abs(y.mean()) < 1e-2
    assert abs(y.std() - 1) < 2e-2


def test_e2e_shares_transposed_weights(rng, key):
    """e2e (layers.py:431-450): row conv + column conv with the SAME kernel
    transposed and the SAME bias."""
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    mod = ops.E2E(3, k_h=4)
    p = mod.init(key, x)
    params = p["params"]
    assert set(params.keys()) == {"w1", "biases1"}  # single shared kernel+bias
    y = mod.apply(p, x)
    assert y.shape == (1, 4, 4, 3)
    # symmetric input -> symmetric output (row+col conv with shared weights)
    xs = (x + jnp.transpose(x, (0, 2, 1, 3))) / 2
    ys = np.asarray(mod.apply(p, xs))
    np.testing.assert_allclose(ys, np.transpose(ys, (0, 2, 1, 3)), rtol=2e-3, atol=2e-4)


def test_e2e_matmul_lowering_matches_conv(rng, key):
    """The Toeplitz-matmul lowering of E2E must equal the lax.conv lowering
    exactly (same math, different backend mapping) — values AND gradients,
    for odd and even widths (SAME pad_left = (k-1)//2 differs by parity)."""
    for n in (4, 5, 7, 8):
        x = jnp.asarray(rng.standard_normal((2, n, n, 3)).astype(np.float32))
        conv_mod = ops.E2E(4, k_h=n, use_matmul=False)
        mm_mod = ops.E2E(4, k_h=n, use_matmul=True)
        p = conv_mod.init(key, x)
        y_conv = np.asarray(conv_mod.apply(p, x))
        y_mm = np.asarray(mm_mod.apply(p, x))
        np.testing.assert_allclose(y_mm, y_conv, rtol=1e-5, atol=1e-5)

        def loss(fn):
            def f(params, inp):
                return jnp.sum(jnp.square(fn.apply(params, inp)))
            return f

        g_conv = jax.grad(loss(conv_mod))(p, x)
        g_mm = jax.grad(loss(mm_mod))(p, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            ),
            g_conv, g_mm,
        )


def test_e2e_auto_selection(rng, key):
    """Auto mode picks the matmul lowering by width but falls back to conv
    when the Toeplitz tensor would blow the byte budget."""
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))

    def lowering_of(mod):
        p = mod.init(key, x)
        jaxpr = str(jax.make_jaxpr(lambda v: mod.apply(p, v))(x))
        return ("dot_general" in jaxpr, "conv_general_dilated" in jaxpr)

    # width 6 >= threshold 4, tiny Mt -> matmul
    has_dot, has_conv = lowering_of(ops.E2E(3, k_h=6, matmul_threshold=4))
    assert has_dot and not has_conv
    # same, but Mt budget of 1 byte -> conv fallback
    has_dot, has_conv = lowering_of(
        ops.E2E(3, k_h=6, matmul_threshold=4, matmul_max_bytes=1)
    )
    assert has_conv
    # below threshold -> conv
    has_dot, has_conv = lowering_of(ops.E2E(3, k_h=6, matmul_threshold=100))
    assert has_conv


def test_e2n_shape(rng, key):
    x = jnp.asarray(rng.standard_normal((2, 5, 5, 3)).astype(np.float32))
    mod = ops.E2N(4, k_h=5)
    p = mod.init(key, x)
    assert mod.apply(p, x).shape == (2, 5, 1, 4)


def test_inner_product_decoder(rng):
    z = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
    got = np.asarray(ops.inner_product_decoder(z))
    want = np.einsum("bnd,bmd->bnm", np.asarray(z), np.asarray(z))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got, got.transpose(0, 2, 1), rtol=1e-5)


def test_graphite(rng, key):
    x = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
    r1 = jnp.asarray(rng.standard_normal((2, 4, 2)).astype(np.float32))
    r2 = jnp.asarray(rng.standard_normal((2, 4, 2)).astype(np.float32))
    mod = ops.Graphite(5)
    p = mod.init(key, x, r1, r2)
    got = np.asarray(mod.apply(p, x, r1, r2))
    w = np.asarray(p["params"]["Matrix"])
    xw = np.asarray(x) @ w
    mm = lambda a, b: np.einsum("bnm,bmo->bno", a, b)
    r1n, r2n = np.asarray(r1), np.asarray(r2)
    want = mm(r1n, mm(r1n.transpose(0, 2, 1), xw)) + mm(r2n, mm(r2n.transpose(0, 2, 1), xw))
    np.testing.assert_allclose(got, np.maximum(want, 0), rtol=1e-4, atol=1e-5)


def test_knn_dist_self_is_first_neighbor(rng):
    """The reference's D_adjust = D + rowmax(D) (layers.py:742-744) adds a
    per-row constant, which does NOT change the ordering — so self (distance
    sqrt(eps)) is always the first neighbor.  We reproduce that behavior."""
    x = jnp.asarray(rng.standard_normal((1, 8, 3)).astype(np.float32))
    d, idx = ops.knn_dist(x, top_k=3)
    assert d.shape == (1, 8, 3) and idx.shape == (1, 8, 3)
    for i in range(8):
        assert np.asarray(idx)[0, i, 0] == i
    # remaining neighbors are the true nearest others
    dist = np.linalg.norm(np.asarray(x)[0][:, None] - np.asarray(x)[0][None], axis=-1)
    for i in range(8):
        others = np.argsort(dist[i])[1:3]
        assert set(np.asarray(idx)[0, i, 1:]) == set(others)


def test_rbf_expand_peaks_at_centers():
    d = jnp.asarray([[[0.0, 10.0, 20.0]]])
    r = np.asarray(ops.rbf_expand(d, num_rbf=16))
    assert r.shape == (1, 1, 3, 16)
    assert r[0, 0, 0].argmax() == 0  # distance 0 -> first center
    assert r[0, 0, 2].argmax() == 15  # distance 20 -> last center


def test_positional_embedding_shape():
    idx = jnp.asarray(np.arange(12).reshape(1, 4, 3))
    e = np.asarray(ops.positional_embedding(idx, 16))
    assert e.shape == (1, 4, 3, 16)
    assert np.isfinite(e).all()


def test_quaternions_identity():
    r = jnp.broadcast_to(jnp.eye(3), (1, 2, 2, 3, 3))
    q = np.asarray(ops.quaternions(r))
    # identity rotation -> quaternion (0,0,0,1)
    np.testing.assert_allclose(q[..., 3], 1.0, atol=1e-6)
    np.testing.assert_allclose(q[..., :3], 0.0, atol=1e-6)


def test_gather_nodes(rng):
    nodes = jnp.asarray(rng.standard_normal((2, 5, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 5, (2, 5, 4)))
    got = np.asarray(ops.gather_nodes(nodes, idx))
    for b in range(2):
        for i in range(5):
            for k in range(4):
                np.testing.assert_allclose(
                    got[b, i, k], np.asarray(nodes)[b, np.asarray(idx)[b, i, k]]
                )


def test_geo_graph_conv_shape(rng, key):
    adj = jnp.asarray((rng.random((2, 5, 5)) < 0.5).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 5, 3)).astype(np.float32))
    rel = jnp.asarray(rng.random((2, 5, 5, 1)).astype(np.float32))
    mod = ops.GeoGraphConv(4)
    p = mod.init(key, adj, x, rel)
    assert mod.apply(p, adj, x, rel).shape == (2, 5, 4)


def test_struct_graph_conv_shape(rng, key):
    adj = jnp.asarray((rng.random((2, 8, 8)) < 0.5).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 8, 3)).astype(np.float32))
    coords = jnp.asarray(rng.standard_normal((2, 8, 3)).astype(np.float32))
    mod = ops.StructGraphConv(6, top_k=4)
    p = mod.init(key, adj, x, coords)
    out = mod.apply(p, adj, x, coords)
    assert out.shape == (2, 8, 6)
    assert np.isfinite(np.asarray(out)).all()
