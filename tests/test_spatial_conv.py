"""The factored spatial-motif convolutions must equal the reference's dense
materialization formula exactly (layers.py:143-198 / 200-277 / 279-359)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snd_vae_tpu.nn import (
    SpatialGraphConv,
    SpatialGraphConv3D,
    spatial_graph_conv,
    spatial_graph_conv_3d,
    spatial_graph_conv_3d_dense_oracle,
    spatial_graph_conv_dense_oracle,
)


def _random_graph(rng, B, N, F, R, p=0.4):
    adj = (rng.random((B, N, N)) < p).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + np.swapaxes(adj, 1, 2)
    x = rng.standard_normal((B, N, F)).astype(np.float32)
    rel = np.abs(rng.standard_normal((B, N, N, R))).astype(np.float32)
    rel = (rel + np.swapaxes(rel, 1, 2)) / 2
    return jnp.asarray(adj), jnp.asarray(x), jnp.asarray(rel)


def _as64(tree):
    return jax.tree.map(lambda t: jnp.asarray(np.asarray(t), jnp.float64), tree)


@pytest.mark.parametrize("F,R", [(1, 1), (3, 1), (2, 2)])
def test_sgconv_matches_dense_oracle(rng, key, F, R):
    """In float64 the factored form equals the literal reference formula to
    ~1e-12 — the factorization is algebraically exact, not approximate."""
    B, N = 2, 7
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv(hidden=(5, 4, 3))
    params = mod.init(key, adj, x, rel)
    with jax.enable_x64():
        p64, a64, x64, r64 = _as64((params["params"], adj, x, rel))
        got = spatial_graph_conv(a64, x64, r64, p64)
        want = spatial_graph_conv_dense_oracle(a64, x64, r64, p64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


def test_sgconv_weighted_adjacency(rng, key):
    """The factorization must also hold for non-binary adjacencies."""
    B, N, F, R = 2, 6, 2, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    adj = adj * jnp.asarray(rng.random((B, N, N)).astype(np.float32))
    adj = (adj + jnp.swapaxes(adj, 1, 2)) / 2
    mod = SpatialGraphConv(hidden=(4, 4, 4))
    params = mod.init(key, adj, x, rel)
    with jax.enable_x64():
        p64, a64, x64, r64 = _as64((params["params"], adj, x, rel))
        got = spatial_graph_conv(a64, x64, r64, p64)
        want = spatial_graph_conv_dense_oracle(a64, x64, r64, p64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("fully_connected", [False, True])
def test_sgconv3d_matches_dense_oracle(rng, key, fully_connected):
    B, N, F, R = 1, 5, 2, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv3D(hidden=(4, 3, 3, 2), fully_connected=fully_connected)
    params = mod.init(key, adj, x, rel)
    with jax.enable_x64():
        p64, a64, x64, r64 = _as64((params["params"], adj, x, rel))
        if fully_connected:
            rel_aug = jnp.concatenate([r64, a64[..., None]], axis=-1)
            got = spatial_graph_conv_3d(a64, x64, rel_aug, r64, p64, fully_connected=True)
            want = spatial_graph_conv_3d_dense_oracle(
                a64, x64, rel_aug, r64, p64, fully_connected=True
            )
        else:
            got = spatial_graph_conv_3d(a64, x64, r64, r64, p64, fully_connected=False)
            want = spatial_graph_conv_3d_dense_oracle(
                a64, x64, r64, r64, p64, fully_connected=False
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("block_rows", [2, 3, 6])
@pytest.mark.parametrize("fully_connected", [False, True])
def test_sgconv3d_blocked_matches_dense_oracle(rng, key, block_rows,
                                               fully_connected):
    """The fourth-order blocked streamed lowering (_blocked_nt_3d) must
    equal the literal reference formula (layers.py:200-277) in float64 —
    i-blocking is a scheduling change, not a reassociation."""
    B, N, F, R = 1, 6, 2, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv3D(hidden=(4, 3, 3, 2),
                             fully_connected=fully_connected)
    params = mod.init(key, adj, x, rel)
    with jax.enable_x64():
        p64, a64, x64, r64 = _as64((params["params"], adj, x, rel))
        if fully_connected:
            r_in = jnp.concatenate([r64, a64[..., None]], axis=-1)
        else:
            r_in = r64
        got = spatial_graph_conv_3d(a64, x64, r_in, r64, p64,
                                    fully_connected=fully_connected,
                                    block_rows=block_rows)
        want = spatial_graph_conv_3d_dense_oracle(
            a64, x64, r_in, r64, p64, fully_connected=fully_connected
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-9, atol=1e-12)


def test_sgconv3d_blocked_grad_matches_unblocked(rng, key):
    """Gradients through the checkpointed 3D scan body must match the
    monolithic path (same math, recomputed blockwise in backward)."""
    B, N, F, R = 1, 6, 1, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv3D(hidden=(4, 4, 4, 4))
    mod_blk = SpatialGraphConv3D(hidden=(4, 4, 4, 4), block_rows=3)
    params = mod.init(key, adj, x, rel)

    def loss(m, p):
        return jnp.sum(m.apply(p, adj, x, rel) ** 2)

    g = jax.grad(lambda p: loss(mod, p))(params)
    g_blk = jax.grad(lambda p: loss(mod_blk, p))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g, g_blk,
    )


def test_sgconv3d_blocked_rejects_nondivisor(rng, key):
    B, N, F, R = 1, 5, 1, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv3D(hidden=(3, 3, 3, 3), block_rows=4)
    with pytest.raises(ValueError, match="must divide"):
        mod.init(key, adj, x, rel)


@pytest.mark.parametrize("block_rows", [2, 4, 8])
def test_sgconv_blocked_matches_dense_oracle(rng, key, block_rows):
    """The blocked streamed lowering (lax.scan over i-row blocks,
    nn/spatial_conv._blocked_nt) must equal the literal reference formula in
    float64 — blocking is a scheduling change, not a reassociation."""
    B, N, F, R = 2, 8, 2, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv(hidden=(5, 4, 3))
    params = mod.init(key, adj, x, rel)
    with jax.enable_x64():
        p64, a64, x64, r64 = _as64((params["params"], adj, x, rel))
        got = spatial_graph_conv(a64, x64, r64, p64, block_rows=block_rows)
        want = spatial_graph_conv_dense_oracle(a64, x64, r64, p64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-9, atol=1e-12)


def test_sgconv_blocked_grad_matches_unblocked(rng, key):
    """Gradients through the checkpointed scan body must match the
    monolithic path (same math, recomputed blockwise in backward)."""
    B, N, F, R = 2, 8, 1, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv(hidden=(6, 6, 6))
    mod_blk = SpatialGraphConv(hidden=(6, 6, 6), block_rows=4)
    params = mod.init(key, adj, x, rel)

    def loss(m, p):
        return jnp.sum(m.apply(p, adj, x, rel) ** 2)

    g = jax.grad(lambda p: loss(mod, p))(params)
    g_blk = jax.grad(lambda p: loss(mod_blk, p))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g, g_blk,
    )


def test_sgconv_blocked_rejects_nondivisor(rng, key):
    B, N, F, R = 1, 6, 1, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv(hidden=(4, 4, 4), block_rows=4)  # 4 does not divide 6
    with pytest.raises(ValueError, match="must divide"):
        mod.init(key, adj, x, rel)


def test_sgconv_param_shapes_match_reference(key, rng):
    """Matrix shapes must mirror layers.py:158-169 for F features, R=1."""
    B, N, F, R = 1, 4, 3, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv(hidden=(20, 20, 20))
    params = mod.init(key, adj, x, rel)["params"]
    assert params["Matrix1"].shape == (3 * F + 2 * R + 1, 20)
    assert params["Matrix2"].shape == (2 * F + R + 20, 20)
    assert params["Matrix3"].shape == (F + 20, 20)


def test_sgconv_jit_and_grad(rng, key):
    B, N, F, R = 2, 6, 1, 1
    adj, x, rel = _random_graph(rng, B, N, F, R)
    mod = SpatialGraphConv(hidden=(8, 8, 8))
    params = mod.init(key, adj, x, rel)

    @jax.jit
    def loss(p):
        return jnp.sum(mod.apply(p, adj, x, rel) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)
    assert any(np.any(np.asarray(t) != 0) for t in flat)
