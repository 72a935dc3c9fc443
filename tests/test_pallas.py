"""Pallas kernel tests (interpret mode on CPU — the kernels compile to Mosaic
on real TPUs; interpret mode validates the block/grid logic and numerics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snd_vae_tpu.nn.pallas import (
    adj_matmul_reference,
    blocked_adj_matmul,
    fused_motif_combine,
    fused_motif_combine_reference,
)


def test_blocked_adj_matmul_matches_einsum(rng):
    adj = (rng.random((40, 40)) < 0.3).astype(np.float32)
    x = rng.standard_normal((40, 12)).astype(np.float32)
    got = blocked_adj_matmul(jnp.asarray(adj), jnp.asarray(x), interpret=True)
    want = adj_matmul_reference(jnp.asarray(adj), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_blocked_adj_matmul_multiblock(rng):
    """Shapes larger than one 128-tile exercise the k-accumulation loop."""
    adj = rng.standard_normal((200, 300)).astype(np.float32)
    x = rng.standard_normal((300, 150)).astype(np.float32)
    got = blocked_adj_matmul(jnp.asarray(adj), jnp.asarray(x), interpret=True)
    want = adj_matmul_reference(jnp.asarray(adj), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_blocked_adj_matmul_fused_lrelu(rng):
    adj = rng.standard_normal((30, 30)).astype(np.float32)
    x = rng.standard_normal((30, 20)).astype(np.float32)
    got = blocked_adj_matmul(jnp.asarray(adj), jnp.asarray(x), leak=0.2, interpret=True)
    want = adj_matmul_reference(jnp.asarray(adj), jnp.asarray(x), leak=0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_blocked_adj_matmul_batched(rng):
    adj = (rng.random((3, 20, 20)) < 0.4).astype(np.float32)
    x = rng.standard_normal((3, 20, 8)).astype(np.float32)
    got = blocked_adj_matmul(jnp.asarray(adj), jnp.asarray(x), interpret=True)
    want = adj_matmul_reference(jnp.asarray(adj), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sgconv_use_pallas_matches_default(rng, key):
    """SpatialGraphConv(use_pallas=True) must equal the einsum path, for
    values AND gradients (the custom VJP uses the reference backward)."""
    import jax.numpy as jnp
    from snd_vae_tpu.nn import SpatialGraphConv

    B, N, F, R = 2, 6, 2, 1
    adj = (rng.random((B, N, N)) < 0.4).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = jnp.asarray(adj + adj.transpose(0, 2, 1))
    x = jnp.asarray(rng.standard_normal((B, N, F)).astype(np.float32))
    rel = jnp.asarray(np.abs(rng.standard_normal((B, N, N, R))).astype(np.float32))

    ref_mod = SpatialGraphConv(hidden=(4, 4, 4), use_pallas=False)
    pal_mod = SpatialGraphConv(hidden=(4, 4, 4), use_pallas=True)
    params = ref_mod.init(key, adj, x, rel)
    y_ref = ref_mod.apply(params, adj, x, rel)
    y_pal = pal_mod.apply(params, adj, x, rel)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-4, atol=1e-5)

    g_ref = jax.grad(lambda p: float(0) + jnp.sum(ref_mod.apply(p, adj, x, rel) ** 2))(params)
    g_pal = jax.grad(lambda p: float(0) + jnp.sum(pal_mod.apply(p, adj, x, rel) ** 2))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        ),
        g_ref, g_pal,
    )


def test_fused_motif_combine_matches_reference(rng):
    B, N, h = 2, 10, 6
    adj = (rng.random((B, N, N)) < 0.4).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    a_i = rng.standard_normal((B, N, h)).astype(np.float32)
    d_ij = rng.standard_normal((B, N, N, h)).astype(np.float32)
    v_j = rng.standard_normal((B, N, h)).astype(np.float32)
    f_ik = rng.standard_normal((B, N, N, h)).astype(np.float32)
    bias = rng.standard_normal((h,)).astype(np.float32)
    got = fused_motif_combine(
        jnp.asarray(adj), jnp.asarray(a_i), jnp.asarray(d_ij),
        jnp.asarray(v_j), jnp.asarray(f_ik), jnp.asarray(bias),
        interpret=True,
    )
    want = fused_motif_combine_reference(
        jnp.asarray(adj), jnp.asarray(a_i), jnp.asarray(d_ij),
        jnp.asarray(v_j), jnp.asarray(f_ik), jnp.asarray(bias),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_force_pallas_override_scoped():
    """The Pallas path is retired from the model config (it lost at every
    measured shape); the bench-only force_pallas() override must engage it
    only inside its context."""
    from snd_vae_tpu.nn import spatial_conv

    assert not spatial_conv._FORCE_PALLAS
    with spatial_conv.force_pallas():
        assert spatial_conv._FORCE_PALLAS
        with spatial_conv.force_pallas():
            assert spatial_conv._FORCE_PALLAS
        assert spatial_conv._FORCE_PALLAS  # nesting restores the outer state
    assert not spatial_conv._FORCE_PALLAS


def test_config_has_no_pallas_knob():
    """VERDICT r3 item 8: the flagship model/config carries no Pallas knob."""
    import dataclasses

    from snd_vae_tpu.config import Config

    names = {f.name for f in dataclasses.fields(Config)}
    assert "use_pallas" not in names and "pallas_min_nodes" not in names
    assert not hasattr(Config, "pallas_engaged")
