"""Per-device memory footprint of the node-sharded mesh path (VERDICT r2
item 3): prove with compiler numbers that the in-model sharding hints
(parallel/hints.py) shrink the [B,S,N,N,h] backward residuals ~mesh-linearly
at REAL model widths, instead of silently all-gathering.

Method: AOT-compile ONE full optimization step (fwd + ELBO + bwd + Adam — the
same step the trainer jits) for the flagship synthetic2-width model at large
N, once on a single device and once over an n-device mesh with the node axis
on 'model', and read ``compiled.memory_analysis().temp_size_in_bytes`` — the
XLA buffer assignment's peak temp pool, i.e. the activation/residual
footprint (arguments = params+data are reported separately).

Runs on the virtual-CPU backend so an 8-device mesh is available (the CPU
and TPU compilers share the GSPMD partitioner; the *ratio* sharded/replicated
is the structural claim).  Usage:

    python benchmarks/mesh_memory.py [--n 1024] [--devices 8] [--model-axis 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--model-axis", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--sampling", type=int, default=2)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", default=None)
    args = ap.parse_args()
    # mirror the CLI: a policy implies remat (policy_from_config returns None
    # when remat=False, which would silently measure the no-remat program
    # while the output JSON records the policy name)
    if args.remat_policy is not None:
        args.remat = True

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from snd_vae_tpu.config import synthetic2_preset
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.parallel import mesh as pmesh
    from snd_vae_tpu.train import (
        TrainState, init_state, make_optimizer, make_train_step,
    )

    cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
        num_nodes=args.n, sampling_num=args.sampling,
        remat=args.remat, remat_policy=args.remat_policy,
    )
    cfg = cfg.with_(train=cfg.train.__class__(batch_size=args.batch))
    batch = loaders.load_dataset(cfg, "train", num_graphs=args.batch)
    model, state = init_state(cfg, batch)
    step = make_train_step(cfg, model, make_optimizer(cfg))
    gi = jnp.asarray(0.0)

    def stats(mesh):
        if mesh is not None:
            b = pmesh.shard_graphbatch(batch, mesh)
            st = TrainState(
                params=pmesh.shard_params(state.params, mesh, min_size=256),
                opt_state=pmesh.shard_params(state.opt_state, mesh, min_size=256),
                step=state.step, key=state.key,
            )
            with jax.set_mesh(mesh):
                compiled = step.lower(st, b, gi).compile()
        else:
            compiled = step.lower(state, batch, gi).compile()
        ma = compiled.memory_analysis()
        return {
            "temp_bytes": int(ma.temp_size_in_bytes),
            "arg_bytes": int(ma.argument_size_in_bytes),
            "out_bytes": int(ma.output_size_in_bytes),
        }

    single = stats(None)
    data_ax = args.devices // args.model_axis
    mesh = pmesh.make_mesh(data_ax, args.model_axis,
                           jax.devices()[: args.devices])
    sharded = stats(mesh)

    ratio = sharded["temp_bytes"] / max(single["temp_bytes"], 1)
    print(json.dumps({
        "bench": "mesh_memory", "n": args.n,
        "batch_graphs": args.batch, "sampling": args.sampling,
        "remat": args.remat, "remat_policy": args.remat_policy,
        "mesh": f"{data_ax}x{args.model_axis}",
        "single_temp_mib": round(single["temp_bytes"] / 2**20, 1),
        "sharded_temp_mib_per_dev": round(sharded["temp_bytes"] / 2**20, 1),
        "temp_ratio": round(ratio, 4),
        "single_arg_mib": round(single["arg_bytes"] / 2**20, 1),
        "sharded_arg_mib_per_dev": round(sharded["arg_bytes"] / 2**20, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
