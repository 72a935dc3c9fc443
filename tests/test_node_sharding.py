"""Node-sharded flagship model: the motif conv + E2E decoder run with their
activations actually partitioned over the mesh's 'model' axis.

The reference is single-device (main.py:34-37); SURVEY §5 targets "the node
dimension sharded across the mesh" for the O(N³) op at layers.py:143-198.
These tests assert (a) the hinted activations really carry a 'model'-sharded
PartitionSpec at compile time (via the parallel.hints inspection hook — a
loss match alone would also pass if XLA silently all-gathered everything),
(b) sharded outputs match the single-device program, and (c) the full
disentangled model steps at a node count far beyond the reference's N=50.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig
from snd_vae_tpu.data import loaders
from snd_vae_tpu.parallel import hints
from snd_vae_tpu.parallel import mesh as pmesh
from snd_vae_tpu.train import init_state, make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _collect_shardings():
    seen = {}

    def cb(tag, sharding):
        seen.setdefault(tag, []).append(sharding)

    return seen, cb


@pytest.fixture
def inspect_hints():
    seen, cb = _collect_shardings()
    hints._INSPECT = cb
    yield seen
    hints._INSPECT = None


def _node_axis_partitioned(s) -> bool:
    """True if the reported sharding splits the node axis (axis 1).

    The compile-time callback may hand back a NamedSharding (check its spec
    for the 'model' axis) or a resolved GSPMDSharding like
    ``{devices=[2,4,1,1]<=[8]}`` (check the axis-1 partition count)."""
    import re

    spec = getattr(s, "spec", None)
    if spec is not None:
        return len(spec) > 1 and spec[1] is not None and "model" in str(spec[1])
    m = re.search(r"devices=\[([\d,]+)\]", str(s))
    if m:
        dims = [int(x) for x in m.group(1).split(",")]
        return len(dims) > 1 and dims[1] > 1
    return False


def _sharded_specs(seen):
    return {
        tag: [str(s) for s in shardings if _node_axis_partitioned(s)]
        for tag, shardings in seen.items()
    }


def tiny_cfg(num_nodes=16, **kw) -> Config:
    base = dict(
        dataset="synthetic2",
        num_nodes=num_nodes,
        sampling_num=2,
        encoder=EncoderConfig(
            s_channels=(8,), s_kernel_sizes=(3,), s_strides=(1,),
            s_hidden_size=16, s_latent_size=8,
            g_conv_hidden=(8,), g_hidden_size=16, g_latent_size=8,
            sg_conv_hidden=((8, 8, 8),), sg_hidden_size=16, sg_latent_size=8,
        ),
        decoder=DecoderConfig(
            node_h_size=8, s_d_channels=(8,), s_d_kernel_sizes=(3,),
            s_d_strides=(1,), n_d_channels=(8,), n_d_kernel_sizes=(3,),
            n_d_strides=(1,), e_d_hidden=(8,),
        ),
        train=TrainConfig(batch_size=4, epochs=1),
    )
    base.update(kw)
    return Config(**base)


def test_motif_conv_activations_partitioned(inspect_hints):
    """Under an ambient (data, model) mesh, the factored motif conv's
    [B,N,N,h] intermediates and the N³ product are 'model'-sharded on the
    node axis, and the loss matches the meshless program exactly."""
    cfg = tiny_cfg(num_nodes=16)
    batch = loaders.load_dataset(cfg, "train", num_graphs=4)
    model, state = init_state(cfg, batch)

    def fwd(params, batch):
        out = model.apply({"params": params}, batch, deterministic_z=True,
                          key=jax.random.PRNGKey(0))
        return jnp.sum(out.decoded.adj_prob) + jnp.sum(out.decoded.coords)

    ref = jax.jit(fwd)(state.params, batch)  # no mesh: hints are identity
    assert not _sharded_specs(inspect_hints)  # nothing inspected meshless

    mesh = pmesh.make_mesh(2, 4)
    with jax.set_mesh(mesh):
        got = jax.jit(fwd)(state.params, batch)

    sharded = _sharded_specs(inspect_hints)
    # every motif-conv hint site reports a 'model'-partitioned spec
    # the rank-R reassociation (nn/spatial_conv.py) removed the e/f/s/t
    # pairwise tensors; the surviving [B,N,N,·] sites are d_ij, the masked
    # R-channel contraction rf, and the level sums
    for tag in ("sgc.d_ij", "sgc.rf", "sgc.m3_sum", "sgc.m2_sum"):
        assert sharded.get(tag), f"{tag} not partitioned: {sharded}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)


def test_sharded_train_step_matches_single_device():
    """One full train step (fwd+ELBO+bwd+Adam) on the flagship model under
    the mesh matches the single-device step: same loss, same updated
    parameters (within reduction-order tolerance)."""
    cfg = tiny_cfg(num_nodes=12)
    batch = loaders.load_dataset(cfg, "train", num_graphs=4)
    model, state0 = init_state(cfg, batch)
    step = make_train_step(cfg, model, make_optimizer(cfg))
    state_ref, aux_ref = step(state0, batch, jnp.asarray(0.0))

    mesh = pmesh.make_mesh(2, 4)
    _, state1 = init_state(cfg, batch)  # fresh (donated buffers)
    sbatch = pmesh.shard_graphbatch(batch, mesh)
    step2 = make_train_step(cfg, model, make_optimizer(cfg))
    with jax.set_mesh(mesh):
        state_mesh, aux_mesh = step2(state1, sbatch, jnp.asarray(0.0))

    np.testing.assert_allclose(
        float(aux_mesh["loss"]), float(aux_ref["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        jax.device_get(state_ref.params), jax.device_get(state_mesh.params),
    )


def test_sharded_train_step_with_remat_matches_single_device():
    """cfg.remat (jax.checkpoint over the motif convs + adjacency head)
    composes with the ambient-mesh sharding hints: the rematerialized
    blocks contain with_sharding_constraint sites, and the sharded remat
    step must still match the meshless non-remat step."""
    cfg = tiny_cfg(num_nodes=12, remat=True)
    batch = loaders.load_dataset(cfg, "train", num_graphs=4)
    model, state0 = init_state(cfg, batch)
    step = make_train_step(cfg, model, make_optimizer(cfg))
    state_ref, aux_ref = step(state0, batch, jnp.asarray(0.0))

    mesh = pmesh.make_mesh(2, 4)
    _, state1 = init_state(cfg, batch)
    sbatch = pmesh.shard_graphbatch(batch, mesh)
    step2 = make_train_step(cfg, model, make_optimizer(cfg))
    with jax.set_mesh(mesh):
        state_mesh, aux_mesh = step2(state1, sbatch, jnp.asarray(0.0))

    np.testing.assert_allclose(
        float(aux_mesh["loss"]), float(aux_ref["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        jax.device_get(state_ref.params), jax.device_get(state_mesh.params),
    )


def test_e2e_toeplitz_path_partitioned(inspect_hints):
    """The E2E decoder's matmul lowering keeps its [B,N,N,C] maps node-
    sharded (row conv comm-free; column conv reduce-scatters)."""
    from snd_vae_tpu.nn import E2E

    mesh = pmesh.make_mesh(1, 8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 4)),
                    jnp.float32)
    mod = E2E(features=4, k_h=32, use_matmul=True)
    v = mod.init(jax.random.PRNGKey(0), x)

    ref = jax.jit(lambda p, t: mod.apply(p, t))(v, x)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, t: mod.apply(p, t))(v, x)

    sharded = _sharded_specs(inspect_hints)
    assert sharded.get("e2e.in") and sharded.get("e2e.out")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_e2e_separable_path_partitioned(inspect_hints):
    """The factored first-E2E lowering keeps its [B,N,N,O] output node-
    sharded (the N² einsums and 1-D convs feed a row-blocked map)."""
    from snd_vae_tpu.nn import E2E

    mesh = pmesh.make_mesh(1, 8)
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.normal(size=(2, 32, 4)), jnp.float32)
    Q = jnp.asarray(rng.normal(size=(2, 32, 4)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    mod = E2E(features=4, k_h=32)
    v = mod.init(jax.random.PRNGKey(0), factors=(P, Q, D))

    ref = jax.jit(lambda p, a, b, d: mod.apply(p, factors=(a, b, d)))(v, P, Q, D)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, a, b, d: mod.apply(p, factors=(a, b, d)))(
            v, P, Q, D
        )

    sharded = _sharded_specs(inspect_hints)
    assert sharded.get("e2e.sep"), f"factored output not partitioned: {sharded}"
    assert sharded.get("e2e.sepD"), f"distance map not partitioned: {sharded}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_large_n_flagship_step_on_mesh():
    """The full disentangled model — motif encoder + three-headed decoder —
    steps at N=1024 (20x the reference's largest N=50, layers.py:200-277
    memory wall) on the virtual mesh with node-sharded activations."""
    cfg = tiny_cfg(
        num_nodes=1024,
        sampling_num=1,
        encoder=EncoderConfig(
            s_channels=(4,), s_kernel_sizes=(3,), s_strides=(1,),
            s_hidden_size=8, s_latent_size=8,
            g_conv_hidden=(4,), g_hidden_size=8, g_latent_size=8,
            sg_conv_hidden=((4, 4, 4),), sg_hidden_size=8, sg_latent_size=8,
        ),
        decoder=DecoderConfig(
            node_h_size=2, s_d_channels=(2,), s_d_kernel_sizes=(3,),
            s_d_strides=(1,), n_d_channels=(2,), n_d_kernel_sizes=(3,),
            n_d_strides=(1,), e_d_hidden=(2,),
        ),
        train=TrainConfig(batch_size=1, epochs=1),
    )
    batch = loaders.load_dataset(cfg, "train", num_graphs=1)
    mesh = pmesh.make_mesh(1, 8)
    model, state = init_state(cfg, batch)
    step = make_train_step(cfg, model, make_optimizer(cfg))
    sbatch = pmesh.shard_graphbatch(batch, mesh)
    with jax.set_mesh(mesh):
        state, aux = step(state, sbatch, jnp.asarray(0.0))
    assert np.isfinite(float(aux["loss"]))
