"""Golden parity tests: run the REFERENCE's own TF ops (imported from
/root/reference/layers.py under a TF1 compat shim) with weights copied from
our modules, and assert output equality.

This is the op-level half of the parity harness (SURVEY §7 step 8): if every
op matches on identical weights, ELBO parity follows from the loss-formula
tests in test_losses.py.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow.compat.v1")

from snd_vae_tpu import nn as ops  # noqa: E402


@pytest.fixture(scope="module")
def ref_layers():
    """Import /root/reference/layers.py under the TF1 shim.  The real
    tensorflow module is restored on teardown (later tests — e.g. orbax's
    find_spec("tensorflow") — must not see the spec-less shim)."""
    import importlib.machinery

    tf.disable_eager_execution()
    original = sys.modules.get("tensorflow")
    shim = types.ModuleType("tensorflow")
    shim.__getattr__ = lambda name: getattr(tf, name)
    shim.__spec__ = importlib.machinery.ModuleSpec("tensorflow", loader=None)
    sys.modules["tensorflow"] = shim
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        flags = tf.app.flags
        if "batch_size" not in flags.FLAGS:
            flags.DEFINE_integer("batch_size", 2, "")
    except Exception:
        pass
    import layers as ref

    yield ref
    if original is not None:
        sys.modules["tensorflow"] = original
    else:
        sys.modules.pop("tensorflow", None)


def test_graph_convolution_matches_reference(ref_layers, rng, key):
    B, N, F, O = 2, 6, 3, 4
    adj = (rng.random((B, N, N)) < 0.5).astype(np.float32)
    x = rng.standard_normal((B, N, F)).astype(np.float32)

    mod = ops.GraphConv(O)
    p = mod.init(key, jnp.asarray(adj), jnp.asarray(x))
    ours = np.asarray(mod.apply(p, jnp.asarray(adj), jnp.asarray(x)))
    w = np.asarray(p["params"]["kernel"])

    with tf.Graph().as_default():
        a = tf.placeholder(tf.float32, [B, N, N])
        xx = tf.placeholder(tf.float32, [B, N, F])
        y = ref_layers.GraphConvolution(a, xx, O, name="gcn_gold")
        assign = [
            tf.assign(v, w) for v in tf.global_variables() if v.name.endswith("w:0")
        ]
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            sess.run(assign)
            got = sess.run(y, {a: adj, xx: x})
    np.testing.assert_allclose(ours, got, rtol=1e-4, atol=1e-5)


def test_spatial_graph_convolution_matches_reference(ref_layers, rng, key):
    """The headline op: our factored formulation vs the reference's dense
    [B,N,N,N,h] materialization, identical weights (layers.py:143-198)."""
    B, N, F, R = 2, 5, 2, 1
    hidden = [4, 3, 3]
    adj = (rng.random((B, N, N)) < 0.5).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = (adj + adj.transpose(0, 2, 1)).astype(np.float32)
    x = rng.standard_normal((B, N, F)).astype(np.float32)
    rel = np.abs(rng.standard_normal((B, N, N, R))).astype(np.float32)

    mod = ops.SpatialGraphConv(tuple(hidden))
    p = mod.init(key, jnp.asarray(adj), jnp.asarray(x), jnp.asarray(rel))
    ours = np.asarray(mod.apply(p, jnp.asarray(adj), jnp.asarray(x), jnp.asarray(rel)))
    pp = {k: np.asarray(v) for k, v in p["params"].items()}

    with tf.Graph().as_default():
        a = tf.placeholder(tf.float32, [B, N, N])
        xx = tf.placeholder(tf.float32, [B, N, F])
        rr = tf.placeholder(tf.float32, [B, N, N, R])
        y = ref_layers.SpatialGraphConvolution(a, xx, rr, hidden, name="sg_gold")
        assigns = []
        for v in tf.global_variables():
            for name in ("Matrix1", "Matrix2", "Matrix3", "bias1", "bias2", "bias3"):
                if v.name.endswith(f"sg_gold/{name}:0"):
                    assigns.append(tf.assign(v, pp[name]))
        assert len(assigns) == 6
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            sess.run(assigns)
            got = sess.run(y, {a: adj, xx: x, rr: rel})
    np.testing.assert_allclose(ours, got, rtol=2e-3, atol=2e-4)


def test_spatial_graph_convolution_3d_matches_reference(ref_layers, rng, key):
    """Fourth-order variant vs layers.py:200-277 with identical weights."""
    B, N, F, R = 1, 4, 2, 1
    hidden = [3, 3, 3, 2]
    adj = (rng.random((B, N, N)) < 0.6).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = (adj + adj.transpose(0, 2, 1)).astype(np.float32)
    x = rng.standard_normal((B, N, F)).astype(np.float32)
    rel = np.abs(rng.standard_normal((B, N, N, R))).astype(np.float32)

    mod = ops.SpatialGraphConv3D(tuple(hidden))
    p = mod.init(key, jnp.asarray(adj), jnp.asarray(x), jnp.asarray(rel))
    ours = np.asarray(mod.apply(p, jnp.asarray(adj), jnp.asarray(x), jnp.asarray(rel)))
    pp = {k: np.asarray(v) for k, v in p["params"].items()}

    with tf.Graph().as_default():
        a = tf.placeholder(tf.float32, [B, N, N])
        xx = tf.placeholder(tf.float32, [B, N, F])
        rr = tf.placeholder(tf.float32, [B, N, N, R])
        y = ref_layers.SpatialGraphConvolution_3D(a, xx, rr, hidden, name="sg3_gold")
        assigns = []
        names = ["Matrix0", "Matrix1", "Matrix2", "Matrix3",
                 "bias0", "bias1", "bias2", "bias3"]
        for v in tf.global_variables():
            for name in names:
                if v.name.endswith(f"sg3_gold/{name}:0"):
                    assigns.append(tf.assign(v, pp[name]))
        assert len(assigns) == 8
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            sess.run(assigns)
            got = sess.run(y, {a: adj, xx: x, rr: rel})
    np.testing.assert_allclose(ours, got, rtol=2e-3, atol=2e-4)


def test_e2e_matches_reference(ref_layers, rng, key):
    """Edge-to-edge conv vs layers.py:431-450 (shared transposed kernel and
    bias, SAME padding)."""
    B, N, C, O = 2, 6, 3, 4
    x = rng.standard_normal((B, N, N, C)).astype(np.float32)

    mod = ops.E2E(O, k_h=N)
    p = mod.init(key, jnp.asarray(x))
    ours = np.asarray(mod.apply(p, jnp.asarray(x)))
    w1 = np.asarray(p["params"]["w1"])
    b1 = np.asarray(p["params"]["biases1"])

    with tf.Graph().as_default():
        xx = tf.placeholder(tf.float32, [B, N, N, C])
        y = ref_layers.e2e(xx, O, k_h=N, name="e2e_gold")
        assigns = []
        for v in tf.global_variables():
            if v.name.endswith("e2e_gold/w1:0"):
                assigns.append(tf.assign(v, w1))
            if v.name.endswith("e2e_gold/biases1:0"):
                assigns.append(tf.assign(v, b1))
        assert len(assigns) == 2
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            sess.run(assigns)
            got = sess.run(y, {xx: x})
    np.testing.assert_allclose(ours, got, rtol=1e-4, atol=1e-5)


def test_linear_matches_reference(ref_layers, rng, key):
    B, F, O = 5, 7, 3
    x = rng.standard_normal((B, F)).astype(np.float32)
    mod = ops.Dense(O)
    p = mod.init(key, jnp.asarray(x))
    ours = np.asarray(mod.apply(p, jnp.asarray(x)))
    w = np.asarray(p["params"]["kernel"])
    b = np.asarray(p["params"]["bias"])

    with tf.Graph().as_default():
        xx = tf.placeholder(tf.float32, [B, F])
        y = ref_layers.linear(xx, O, name="lin_gold")
        assigns = []
        for v in tf.global_variables():
            if v.name.endswith("lin_gold/Matrix:0"):
                assigns.append(tf.assign(v, w))
            if v.name.endswith("lin_gold/bias:0"):
                assigns.append(tf.assign(v, b))
        assert len(assigns) == 2
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            sess.run(assigns)
            got = sess.run(y, {xx: x})
    np.testing.assert_allclose(ours, got, rtol=1e-4, atol=1e-5)


def test_conv1d_same_matches_tf(rng, key):
    """Our Conv1D vs tf.nn.conv1d SAME semantics with shared weights."""
    B, L, C, O, K = 2, 9, 3, 4, 5
    x = rng.standard_normal((B, L, C)).astype(np.float32)
    mod = ops.Conv1D(O, kernel_size=K)
    p = mod.init(key, jnp.asarray(x))
    ours = np.asarray(mod.apply(p, jnp.asarray(x)))
    w = np.asarray(p["params"]["kernel"])
    b = np.asarray(p["params"]["bias"])

    with tf.Graph().as_default():
        xx = tf.placeholder(tf.float32, [B, L, C])
        y = tf.nn.conv1d(xx, tf.constant(w), stride=1, padding="SAME") + b
        with tf.Session() as sess:
            got = sess.run(y, {xx: x})
    np.testing.assert_allclose(ours, got, rtol=1e-4, atol=1e-5)


def test_inner_product_decoder_matches_reference(ref_layers, rng):
    B, N, D = 2, 5, 3
    z = rng.standard_normal((B, N, D)).astype(np.float32)
    ours = np.asarray(ops.inner_product_decoder(jnp.asarray(z)))
    with tf.Graph().as_default():
        zz = tf.placeholder(tf.float32, [B, N, D])
        layer = ref_layers.InnerProductDecoder(D)
        y = layer(zz)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            got = sess.run(y, {zz: z})
    np.testing.assert_allclose(ours, got, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_optimizer(ref_layers):
    """Import the reference's optimizer.py under the same TF1 shim (its
    regularizer formulas DIP / gaussian_log_density / total_correlation are
    self-contained TF functions, optimizer.py:7-63).  The reference uses
    ``np.math.pi`` (optimizer.py:24), an alias numpy 2 removed — restore it
    for the duration of the fixture."""
    import math

    had = hasattr(np, "math")
    if not had:
        np.math = math
    import optimizer as ref_opt

    yield ref_opt
    if not had and hasattr(np, "math"):
        del np.math


def test_dip_regularizer_matches_reference(ref_optimizer, rng):
    from snd_vae_tpu import losses

    mu = rng.standard_normal((16, 6)).astype(np.float32)
    ours = float(losses.dip_regularizer(jnp.asarray(mu), 10.0, 100.0))
    with tf.Graph().as_default():
        m = tf.placeholder(tf.float32, [16, 6])
        y = ref_optimizer.DIP(m, lambda_od=10.0, lambda_d=100.0)
        with tf.Session() as sess:
            got = sess.run(y, {m: mu})
    np.testing.assert_allclose(ours, got, rtol=1e-4)


def test_total_correlation_matches_reference(ref_optimizer, rng):
    from snd_vae_tpu import losses

    z = rng.standard_normal((16, 6)).astype(np.float32)
    mu = rng.standard_normal((16, 6)).astype(np.float32)
    logstd = (0.1 * rng.standard_normal((16, 6))).astype(np.float32)
    ours = float(losses.total_correlation(
        jnp.asarray(z), jnp.asarray(mu), jnp.asarray(logstd)))
    with tf.Graph().as_default():
        zz = tf.placeholder(tf.float32, [16, 6])
        mm = tf.placeholder(tf.float32, [16, 6])
        ss = tf.placeholder(tf.float32, [16, 6])
        y = ref_optimizer.total_correlation(zz, mm, ss)
        with tf.Session() as sess:
            got = sess.run(y, {zz: z, mm: mu, ss: logstd})
    np.testing.assert_allclose(ours, got, rtol=1e-4)


def test_geometric_stack_matches_reference(ref_layers, rng):
    """Golden parity for the posGCN geometric features that the reference can
    actually execute: dist (kNN), rbf expansion, positional embedding
    (layers.py:729-756).  The reference's orientations() is NOT runnable as
    committed — its gather_nodes calls tf.broadcast_to with -1 dims
    (layers.py:651), invalid in every TF version, so the posGCN orientation
    path crashes upstream; our implementation follows the documented intent
    (kNN-neighbor frames + quaternions) with float64 oracle tests in
    test_ops.py as the spec."""
    from snd_vae_tpu.nn import geometric as geo

    B, L, K = 2, 12, 6
    x = rng.standard_normal((B, L, 3)).astype(np.float32)

    d_ours, idx_ours = geo.knn_dist(jnp.asarray(x), top_k=K)
    rbf_ours = geo.rbf_expand(d_ours, 16)
    pe_ours = geo.positional_embedding(idx_ours, 16)

    with tf.Graph().as_default():
        xx = tf.constant(x)
        d_t, idx_t = ref_layers.dist(xx, top_k=K)
        rbf_t = ref_layers.rbf(d_t, 16)
        pe_t = ref_layers.positionalEmbedding(idx_t, 16)
        with tf.Session() as sess:
            d_g, idx_g, rbf_g, pe_g = sess.run([d_t, idx_t, rbf_t, pe_t])

    np.testing.assert_array_equal(np.asarray(idx_ours), idx_g)
    np.testing.assert_allclose(np.asarray(d_ours), d_g, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rbf_ours), rbf_g, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pe_ours), pe_g, rtol=1e-4, atol=1e-5)


def test_reference_gather_nodes_is_broken(ref_layers, rng):
    """Pin the divergence note above: the reference's gather_nodes raises on
    any input (tf.broadcast_to with -1 dims, layers.py:651), so there is no
    reference output to match for orientations/quaternions."""
    x = rng.standard_normal((2, 8, 3)).astype(np.float32)
    with tf.Graph().as_default():
        xx = tf.constant(x)
        _, idx_t = ref_layers.dist(xx, top_k=4)
        with pytest.raises(Exception):
            out = ref_layers.gather_nodes(xx, idx_t)
            with tf.Session() as sess:
                sess.run(out)
