"""True multi-process distributed execution (SURVEY §7 item 7: multi-host
via jax.distributed).  Two OS processes each call initialize_distributed,
see the GLOBAL device set (2 local CPU devices each -> 4 global), build the
same ('data',) mesh, and run one data-parallel train step of the flagship
model — the same program a real multi-host TPU pod runs over DCN.

The workers run as subprocesses because jax.distributed.initialize is
once-per-process; the test asserts both workers computed the identical
finite loss (the psum'd gradients keep the replicas in lockstep).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["SND_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
from snd_vae_tpu.parallel.distributed import initialize_distributed, is_primary
idx = initialize_distributed("localhost:%PORT%", 2, pid)
assert idx == pid and is_primary() == (pid == 0)
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

import jax.numpy as jnp
from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig
from snd_vae_tpu.data import loaders
from snd_vae_tpu.parallel import mesh as pmesh
from snd_vae_tpu.train import init_state, make_optimizer, make_train_step

cfg = Config(
    dataset="synthetic2", num_nodes=6, sampling_num=2,
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
    train=TrainConfig(batch_size=4, epochs=1),
)

# same seed everywhere -> identical host data on every process, which is
# what device_put onto a global sharding requires
batch = loaders.load_dataset(cfg, "train", num_graphs=4).slice_batch(0, 4)
model, state = init_state(cfg, batch)

mesh = pmesh.make_mesh(4, 1, jax.devices())
batch = pmesh.shard_graphbatch(batch, mesh)
train_step = make_train_step(cfg, model, make_optimizer(cfg))
with jax.set_mesh(mesh):
    state, aux = train_step(state, batch, jnp.asarray(0.0))
loss = float(jax.device_get(aux["loss"].addressable_data(0))) if hasattr(
    aux["loss"], "addressable_data") else float(aux["loss"])
print(f"WORKERLOSS {pid} {loss:.10f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel_step(tmp_path):
    import socket

    with socket.socket() as s:  # ephemeral port: avoids TIME_WAIT flakes
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("%PORT%", str(port)))
    env = dict(os.environ)
    env["SND_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the conftest CPU bootstrap must not leak: workers configure themselves
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode())

    losses = {}
    for o in outs:
        for ln in o.splitlines():
            if ln.startswith("WORKERLOSS"):
                _, pid, val = ln.split()
                losses[int(pid)] = float(val)
    assert set(losses) == {0, 1}
    assert np.isfinite(losses[0])
    assert losses[0] == losses[1]  # replicas stay in lockstep via psum
