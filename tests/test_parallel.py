"""Multi-device tests on the virtual 8-device CPU mesh: data-parallel batch
sharding + tensor-parallel kernel sharding must compile, run, and agree with
the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig
from snd_vae_tpu.data import loaders
from snd_vae_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_graphbatch,
    shard_params,
)
from snd_vae_tpu.train import TrainState, init_state, make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def tiny_cfg(batch_size=8) -> Config:
    return Config(
        dataset="synthetic2",
        num_nodes=6,
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
        train=TrainConfig(batch_size=batch_size, epochs=1),
    )


def test_make_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(16, 2)


def test_param_shardings_assigns_model_axis():
    mesh = make_mesh(2, 4)
    params = {
        "big": jnp.zeros((64, 512)),    # shardable: 512 % 4 == 0
        "small": jnp.zeros((3,)),       # too small -> replicated
    }
    sh = param_shardings(params, mesh, min_size=1024)
    assert "model" in str(sh["big"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()


def test_dp_train_step_matches_single_device():
    """A data-parallel step over a 4x1 mesh must equal the single-device
    step bit-for-bit (same params, same key, deterministic math)."""
    cfg = tiny_cfg(batch_size=8)
    batch = loaders.load_dataset(cfg, "train", num_graphs=8).slice_batch(0, 8)
    model, state0 = init_state(cfg, batch)
    step = make_train_step(cfg, model, make_optimizer(cfg))

    # single device
    s1, aux1 = step(state0, batch, jnp.asarray(0.0))
    loss1 = float(aux1["loss"])

    # data-parallel: same initial params, batch sharded over 'data'
    mesh = make_mesh(4, 1)
    model2, state2 = init_state(cfg, batch)  # same seed -> same init
    sharded_batch = shard_graphbatch(batch, mesh)
    state2 = TrainState(
        params=shard_params(state2.params, mesh, min_size=1 << 30),  # replicate
        opt_state=shard_params(state2.opt_state, mesh, min_size=1 << 30),
        step=state2.step,
        key=state2.key,
    )
    step2 = make_train_step(cfg, model2, make_optimizer(cfg))
    s2, aux2 = step2(state2, sharded_batch, jnp.asarray(0.0))
    loss2 = float(aux2["loss"])
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)


def test_tp_sharded_params_run():
    """Tensor-parallel: wide kernels sharded over 'model' still produce the
    same loss (XLA inserts the collectives)."""
    cfg = tiny_cfg(batch_size=4)
    batch = loaders.load_dataset(cfg, "train", num_graphs=4).slice_batch(0, 4)
    model, state = init_state(cfg, batch)
    step = make_train_step(cfg, model, make_optimizer(cfg))
    _, aux_ref = step(state, batch, jnp.asarray(0.0))

    mesh = make_mesh(2, 4)
    model2, state2 = init_state(cfg, batch)
    state2 = TrainState(
        params=shard_params(state2.params, mesh, min_size=128),
        opt_state=shard_params(state2.opt_state, mesh, min_size=128),
        step=state2.step,
        key=state2.key,
    )
    batch2 = shard_graphbatch(batch, mesh)
    step2 = make_train_step(cfg, model2, make_optimizer(cfg))
    _, aux_tp = step2(state2, batch2, jnp.asarray(0.0))
    np.testing.assert_allclose(
        float(aux_ref["loss"]), float(aux_tp["loss"]), rtol=1e-4
    )


def test_dryrun_multichip_entry():
    """The driver's multichip dry run must pass on the virtual mesh."""
    import importlib.util, os, sys

    spec = importlib.util.spec_from_file_location(
        "_graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_distributed_module_surface():
    """Multi-host plumbing (SURVEY §7 item 7): the initialize wrapper is
    importable, idempotent-guarded, and env-driven; single-process identity
    checks hold without touching a coordinator."""
    import inspect

    from snd_vae_tpu.parallel import distributed

    sig = inspect.signature(distributed.initialize_distributed)
    assert set(sig.parameters) == {
        "coordinator_address", "num_processes", "process_id"
    }
    # single-process semantics (no cluster): primary, one process
    assert distributed.is_primary()
    assert jax.process_count() == 1
    # the idempotence guard reads jax's distributed global state
    from jax._src import distributed as _dist

    assert _dist.global_state.client is None  # nothing initialized in-suite
