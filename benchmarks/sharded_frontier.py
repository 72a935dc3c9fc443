"""Quantify the node-sharded frontier program with compiled evidence
(VERDICT r3 item 2): the claim "past the single-chip frontier, shard nodes
over the mesh" must rest on per-device compute/memory/communication numbers
from the compiled program, not on memory footprint alone.

Method: AOT-compile ONE full optimization step (fwd + ELBO + bwd + Adam — the
same step the trainer jits) at frontier N over an 8-device virtual-CPU mesh
with the node axis on 'model' (the CPU and TPU compilers share the GSPMD
partitioner, so the partitioning, the collectives, and the per-device buffer
assignment are the structural claim).  For each N record:

  * ``memory_analysis()``  — per-device temp/argument/output pools;
  * ``cost_analysis()``    — per-device flops and HBM bytes accessed;
  * collective traffic     — every all-reduce / all-gather / reduce-scatter /
    collective-permute / all-to-all op in the compiled HLO with its output
    shape, summed to per-device ICI bytes;

and derive a predicted sharded step time on v5e hardware as

  max( flops/dev ÷ sustained MXU rate,
       HBM bytes/dev ÷ 819 GB/s,
       ICI bytes/dev ÷ ICI bandwidth )

using the *measured* post-rank-R sustained rate at the largest clean
single-chip shape (N=1024: see BASELINE.md "Frontier, post-rank-R") rather
than the 197 TF/s peak — the prediction should inherit the program's real
MXU efficiency, not assume speed-of-light.  Compare against the measured
serialized single-chip step where one exists (N=1536: 8.0 s).

Usage:
    python benchmarks/sharded_frontier.py [--n 1536 2048 2800] [--devices 8]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e hardware constants (override via env for other parts).
HBM_BW = float(os.environ.get("SND_HBM_BW", 819e9))        # bytes/s
# v5e ICI: 1600 Gbps aggregate per chip (4 links, 2D torus) ≈ 200 GB/s.
ICI_BW = float(os.environ.get("SND_ICI_BW", 200e9))        # bytes/s
# Sustained MXU rate of THIS program family at the largest clean single-chip
# shape (N=1024 post-rank-R: 318 ms/step — BASELINE.md); recomputed from the
# measured row via --sustained-tflops if the frontier moves.
SUSTAINED_TFLOPS = float(os.environ.get("SND_SUSTAINED_TFLOPS", 80.0))

_DTYPE_BYTES = {
    "pred": 0.125, "s4": 0.5, "u4": 0.5,
    "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string, incl. tuple shapes."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += int(n * _DTYPE_BYTES[dtype])
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of every collective op in the compiled HLO, by kind.

    The compiled module is post-SPMD-partitioning, so shapes are already
    per-device; each op line looks like
      ``%x = bf16[2,192,1536,32]{...} all-gather(...)``.
    """
    out = {k: 0 for k in _COLLECTIVES}
    count = {k: 0 for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*)\s+([a-z0-9\-]+)", s)
        if not m:
            continue
        op = m.group(2)
        # match collective op names incl. -start/-done variants (sum only
        # the -start, which carries the transferred shape)
        for kind in _COLLECTIVES:
            if op == kind or op == kind + "-start":
                out[kind] += _shape_bytes(m.group(1))
                count[kind] += 1
                break
    return {"bytes": out, "count": count,
            "total_bytes": sum(out.values()), "total_ops": sum(count.values())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[1536, 2048, 2800])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--model-axis", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--sampling", type=int, default=2)
    ap.add_argument("--sustained-tflops", type=float, default=SUSTAINED_TFLOPS)
    args = ap.parse_args()

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

    data_ax = args.devices // args.model_axis
    mesh = pmesh.make_mesh(data_ax, args.model_axis,
                           jax.devices()[: args.devices])

    for n in args.n:
        cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
            num_nodes=n, sampling_num=args.sampling,
        )
        cfg = cfg.with_(train=cfg.train.__class__(batch_size=args.batch))
        batch = loaders.load_dataset(cfg, "train", num_graphs=args.batch)
        model, state = init_state(cfg, batch)
        step = make_train_step(cfg, model, make_optimizer(cfg))
        gi = jnp.asarray(0.0)

        b = pmesh.shard_graphbatch(batch, mesh)
        st = TrainState(
            params=pmesh.shard_params(state.params, mesh, min_size=256),
            opt_state=pmesh.shard_params(state.opt_state, mesh, min_size=256),
            step=state.step, key=state.key,
        )
        with jax.set_mesh(mesh):
            compiled = step.lower(st, b, gi).compile()

        ma = compiled.memory_analysis()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        hbm_bytes = float(cost.get("bytes accessed", 0.0))
        coll = collective_bytes(compiled.as_text())

        t_compute = flops / (args.sustained_tflops * 1e12)
        t_hbm = hbm_bytes / HBM_BW
        t_ici = coll["total_bytes"] / ICI_BW
        predicted = max(t_compute, t_hbm, t_ici)

        print(json.dumps({
            "bench": "sharded_frontier", "n": n,
            "mesh": f"{data_ax}x{args.model_axis}",
            "batch_graphs": args.batch, "sampling": args.sampling,
            "temp_gib_per_dev": round(ma.temp_size_in_bytes / 2**30, 3),
            "arg_gib_per_dev": round(ma.argument_size_in_bytes / 2**30, 3),
            "flops_per_dev": flops,
            "hbm_bytes_per_dev": hbm_bytes,
            "ici_bytes_per_dev": coll["total_bytes"],
            "collective_ops": coll["count"],
            "collective_bytes": coll["bytes"],
            "pred_compute_s": round(t_compute, 4),
            "pred_hbm_s": round(t_hbm, 4),
            "pred_ici_s": round(t_ici, 4),
            "pred_step_s": round(predicted, 4),
            "sustained_tflops_assumed": args.sustained_tflops,
        }), flush=True)


if __name__ == "__main__":
    main()
