"""Full-scale trajectory-level ELBO parity vs the LIVE TF reference.

Runs the lockstep experiment (compat/lockstep.py) at the reference's
synthetic2 operating point — N=25, B=10 graphs x S=10 spanning trees,
lr=0.0008 (main.py:173-217) — for K epochs on identical data, identical
initial weights, identical reparameterization noise, and TF1-formulation
Adam, then reports per-epoch cost pairs and the relative gap.

The TF side is the reference's own model.py/optimizer.py imported from
/root/reference (session loop shape of main.py:301-353); the JAX side is the
parity-mode model replaying the same stream.  Both run on CPU in one process
(TF has no TPU here; JAX is switched in-process, CLAUDE.md "Environment
gotchas").

Usage:  python benchmarks/trajectory_parity.py [--epochs 12] [--graphs 200]
Writes benchmarks/trajectory_parity_results.json and prints a markdown table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--graphs", type=int, default=200)
    ap.add_argument("--noise-seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "trajectory_parity_results.json"))
    args = ap.parse_args()

    from snd_vae_tpu.compat.lockstep import run_lockstep
    from snd_vae_tpu.config import synthetic2_preset
    from snd_vae_tpu.data.loaders import load_dataset

    cfg = synthetic2_preset(reproduce_pairing_skew=True)
    # the ref_harness defaults ARE the synthetic2 flag block; pin the loop
    # hyperparameters explicitly anyway
    flags = {
        "learning_rate": cfg.train.learning_rate,
        "batch_size": cfg.train.batch_size,
        "decoder_batch_size": cfg.train.batch_size,
        "sg_batch_size": cfg.train.batch_size,
        "sg_decoder_batch_size": cfg.train.batch_size,
        "sampling_num": cfg.sampling_num,
        "num_feature": cfg.num_features,
        "spatial_dim": cfg.spatial_dim,
        "type": "train",
        "model_type": "disentangled",
        "dataset": "synthetic2",
        "dropout": 1.0,
    }

    data = load_dataset(cfg, "train", num_graphs=args.graphs)
    print(f"data: {data.batch_size} graphs, N={data.num_nodes}, "
          f"S={data.num_samples}; {args.epochs} epochs x "
          f"{data.batch_size // cfg.train.batch_size} batches")

    t0 = time.time()
    res = run_lockstep(cfg, flags, data, epochs=args.epochs,
                       noise_seed=args.noise_seed)
    dt = time.time() - t0

    rel = np.abs(res.jax_epoch - res.tf_epoch) / np.abs(res.tf_epoch)
    print("\n| epoch | TF reference cost | JAX parity cost | rel gap |")
    print("|---|---|---|---|")
    for e in range(args.epochs):
        print(f"| {e + 1} | {res.tf_epoch[e]:.6f} | {res.jax_epoch[e]:.6f} "
              f"| {rel[e]:.2e} |")
    print(f"\nmax epoch rel gap: {res.max_epoch_rel_gap:.3e}  "
          f"(final: {res.final_epoch_rel_gap:.3e})  "
          f"budget: 1e-2  wall: {dt:.0f}s")

    payload = {
        "epochs": args.epochs,
        "graphs": args.graphs,
        "noise_seed": args.noise_seed,
        "tf_epoch_costs": res.tf_epoch.tolist(),
        "jax_epoch_costs": res.jax_epoch.tolist(),
        "epoch_rel_gap": rel.tolist(),
        "max_epoch_rel_gap": res.max_epoch_rel_gap,
        "final_epoch_rel_gap": res.final_epoch_rel_gap,
        "wall_s": dt,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")
    ok = res.max_epoch_rel_gap < 0.01
    print("PASS: within 1%" if ok else "FAIL: outside 1%")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
