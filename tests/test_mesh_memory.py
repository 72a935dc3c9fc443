"""The node-sharded mesh path's memory claim, proven with compiler numbers
(VERDICT r2 item 3): at real flagship widths, the per-device peak temp
memory (XLA buffer assignment, ``compiled.memory_analysis()``) of one full
optimization step over a model-axis mesh must be a small fraction of the
single-device peak — the [B,S,N,N,h] residuals actually partition instead of
silently all-gathering.

N=256 keeps the CPU compile affordable; the measured ratio is N-stable
(0.138 at N=256, 0.134 at N=512, see BASELINE.md "mesh memory") because the
N² residual families dominate at every MXU-scale N.  The full-width table at
N=512-1024 lives in benchmarks/mesh_memory.py output.
"""

import jax
import jax.numpy as jnp
import pytest

from snd_vae_tpu.config import synthetic2_preset
from snd_vae_tpu.data import loaders
from snd_vae_tpu.parallel import mesh as pmesh
from snd_vae_tpu.train import TrainState, init_state, make_optimizer, make_train_step


@pytest.mark.slow
def test_node_sharded_per_device_temp_below_quarter():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
        num_nodes=256, sampling_num=2
    )
    cfg = cfg.with_(train=cfg.train.__class__(batch_size=2))
    batch = loaders.load_dataset(cfg, "train", num_graphs=2)
    model, state = init_state(cfg, batch)
    step = make_train_step(cfg, model, make_optimizer(cfg))
    gi = jnp.asarray(0.0)

    single = step.lower(state, batch, gi).compile().memory_analysis()

    mesh = pmesh.make_mesh(1, 8, jax.devices()[:8])
    b = pmesh.shard_graphbatch(batch, mesh)
    st = TrainState(
        params=pmesh.shard_params(state.params, mesh, min_size=256),
        opt_state=pmesh.shard_params(state.opt_state, mesh, min_size=256),
        step=state.step, key=state.key,
    )
    with jax.set_mesh(mesh):
        sharded = step.lower(st, b, gi).compile().memory_analysis()

    ratio = sharded.temp_size_in_bytes / max(single.temp_size_in_bytes, 1)
    # the claim: 8-way node sharding cuts the per-device residual footprint
    # by far more than 4x (measured 7.3x; leave headroom for compiler drift)
    assert ratio < 0.25, (
        f"sharded per-device temp {sharded.temp_size_in_bytes / 2**20:.0f} MiB "
        f"vs single {single.temp_size_in_bytes / 2**20:.0f} MiB (ratio {ratio:.3f})"
    )
    # and the batch/param arguments shard too (data + wide params)
    assert sharded.argument_size_in_bytes < single.argument_size_in_bytes / 2
