"""Node-sharded large-graph path (BASELINE.json config 5): shard_map GCN over
the 8-device virtual mesh must match the dense single-device computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snd_vae_tpu.data import gcn_normalize
from snd_vae_tpu.nn import lrelu
from snd_vae_tpu.parallel import make_mesh
from snd_vae_tpu.parallel.large_graph import (
    ShardedGCNEncoder,
    shard_graph,
    sharded_gcn_normalize,
    sharded_graph_conv,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(1, 8)


def _graph(rng, n, f):
    adj = (rng.random((n, n)) < 0.1).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.T
    x = rng.standard_normal((n, f)).astype(np.float32)
    return adj, x


def test_sharded_conv_matches_dense(mesh, rng):
    n, f, h = 64, 5, 7
    adj, x = _graph(rng, n, f)
    w = rng.standard_normal((f, h)).astype(np.float32) * 0.1
    a_s, x_s = shard_graph(adj, x, mesh)
    got = np.asarray(sharded_graph_conv(a_s, x_s, jnp.asarray(w), mesh))
    want = np.asarray(lrelu(jnp.einsum("nm,mh->nh", jnp.asarray(adj),
                                       jnp.asarray(x) @ jnp.asarray(w))))
    np.testing.assert_allclose(got[:n], want, rtol=1e-4, atol=1e-5)


def test_sharded_conv_uneven_n(mesh, rng):
    """N not divisible by the mesh axis: shard_graph pads, results match."""
    n, f, h = 50, 3, 4
    adj, x = _graph(rng, n, f)
    w = rng.standard_normal((f, h)).astype(np.float32) * 0.1
    a_s, x_s = shard_graph(adj, x, mesh)
    assert a_s.shape[0] % 8 == 0
    got = np.asarray(sharded_graph_conv(a_s, x_s, jnp.asarray(w), mesh))[:n, :]
    want = np.asarray(lrelu(jnp.einsum("nm,mh->nh", jnp.asarray(adj),
                                       jnp.asarray(x) @ jnp.asarray(w))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_gcn_normalize_matches_dense(mesh, rng):
    n = 64
    adj, _ = _graph(rng, n, 1)
    a_s, _ = shard_graph(adj, np.zeros((n, 1), np.float32), mesh)
    got = np.asarray(sharded_gcn_normalize(a_s, mesh))[:n, :n]
    want = np.asarray(gcn_normalize(jnp.asarray(adj)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_encoder_end_to_end(mesh, rng, key):
    n, f = 128, 4
    adj, x = _graph(rng, n, f)
    enc = ShardedGCNEncoder(mesh, hidden=(8, 8))
    params = enc.init(key, f)
    a_s, x_s = shard_graph(adj, x, mesh)
    pooled = np.asarray(enc.apply(params, a_s, x_s))
    assert pooled.shape == (8,)
    # dense oracle
    h = jnp.asarray(x)
    for w in params:
        h = lrelu(jnp.einsum("nm,mh->nh", jnp.asarray(adj), h @ w))
    want = np.asarray(jnp.sum(h, axis=0) / n)
    np.testing.assert_allclose(pooled, want, rtol=1e-4, atol=1e-5)
