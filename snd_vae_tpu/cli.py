"""CLI experiment driver.

Mirrors the reference's ``main.py`` surface — run types
``train / test_reconstruct / test_generation / test_disentangle / sample``
(main.py:90, 283-499) and the ``__main__`` sweep over types x models
(main.py:502-525) — on top of the functional Trainer/model API.

Usage:
  python -m snd_vae_tpu.cli --dataset synthetic2 --model-type disentangled \
      --type train --epochs 50
  python -m snd_vae_tpu.cli --type sweep          # the reference __main__
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import jax
import numpy as np

from . import config as cfg_mod
from .config import Config
from .data import loaders
from .evaluate import (
    disentangle_evaluation,
    edge_presence_scores,
    generation_evaluation,
    reconstruct_evaluation,
)
from .models import build_model
from .models import traversal as trav
from .train import Trainer, init_state, make_eval_step
from .visualize import (
    visualize_latent_embedding,
    visualize_reconstruct,
    visualize_traverse,
)


def _build_cfg(args) -> Config:
    cfg = cfg_mod.preset(args.dataset)
    over = {}
    if args.model_type:
        over["model_type"] = args.model_type
    train_over = {}
    if args.epochs is not None:
        train_over["epochs"] = args.epochs
    if getattr(args, "resample_trees_every", 0):
        train_over["resample_trees_every"] = args.resample_trees_every
    if getattr(args, "eval_every", 0):
        train_over["eval_every"] = args.eval_every
    if getattr(args, "best_metric", None):
        train_over["best_metric"] = args.best_metric
    if getattr(args, "scan_unroll", 1) != 1:
        train_over["scan_unroll"] = args.scan_unroll
    if train_over:
        over["train"] = cfg.train.__class__(**{**cfg.train.__dict__, **train_over})
    if args.dataset_path:
        over["dataset_path"] = args.dataset_path
    if over:
        cfg = cfg.with_(**over)
    if args.beta is not None:
        cfg = cfg.with_(loss=cfg.loss.__class__(**{**cfg.loss.__dict__, "beta": args.beta}))
    if getattr(args, "bf16", False):
        cfg = cfg.with_(compute_dtype="bfloat16")
    if getattr(args, "remat", False):
        cfg = cfg.with_(remat=True)
    if getattr(args, "remat_policy", None):
        cfg = cfg.with_(remat=True, remat_policy=args.remat_policy)
    if getattr(args, "motif_block_rows", None):
        cfg = cfg.with_(motif_block_rows=args.motif_block_rows)
    if getattr(args, "coord_activation", "auto") != "auto":
        cfg = cfg.with_(decoder=cfg.decoder.__class__(
            **{**cfg.decoder.__dict__, "coord_activation": args.coord_activation}
        ))
    if getattr(args, "dp", 1) != 1 or getattr(args, "tp", 1) != 1:
        cfg = cfg.with_(mesh=cfg.mesh.__class__(data=args.dp, model=args.tp))
    if getattr(args, "pairing_skew", False):
        cfg = cfg.with_(reproduce_pairing_skew=True)
    if getattr(args, "normalize_coords", False):
        cfg = cfg.with_(normalize_coords=True)
    if getattr(args, "scene_node_loss", False):
        cfg = cfg.with_(loss=cfg.loss.__class__(
            **{**cfg.loss.__dict__, "scene_node_loss": True}
        ))
    lat_over = {
        k: getattr(args, k)
        for k in ("s_latent_size", "g_latent_size", "sg_latent_size")
        if getattr(args, k, None) is not None
    }
    if lat_over:
        cfg = cfg.with_(encoder=cfg.encoder.__class__(
            **{**cfg.encoder.__dict__, **lat_over}
        ))
    if getattr(args, "quality", False):
        # applied before the explicit knobs below so e.g. --beta still wins
        cfg = cfg_mod.apply_quality_overrides(cfg)
        if args.beta is not None:
            cfg = cfg.with_(loss=cfg.loss.__class__(
                **{**cfg.loss.__dict__, "beta": args.beta}
            ))
    return cfg


def run_train(
    cfg: Config,
    workdir: str,
    epochs: Optional[int] = None,
    per_step: bool = False,
    profile: bool = False,
    epoch_chunk: int = 1,
) -> Dict[str, float]:
    # persist the fully-resolved config next to the logs: the reference's
    # runs are irreproducible (flags mutated at runtime, main.py:136-241,
    # model.py:100-101); here every knob of the run is one JSON artifact
    import dataclasses

    cfg_path = os.path.join(
        workdir, cfg.train.log_dir,
        f"config_{cfg.dataset}_{cfg.model_type}.json",
    )
    os.makedirs(os.path.dirname(cfg_path), exist_ok=True)
    with open(cfg_path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    batch = loaders.load_dataset(cfg, "train")
    mesh = None
    if cfg.mesh.data * cfg.mesh.model > 1:
        from .parallel import mesh as pmesh

        mesh = pmesh.mesh_from_config(cfg.mesh)
    eval_batch = (
        loaders.load_dataset(cfg, "test") if cfg.train.eval_every > 0 else None
    )
    trainer = Trainer(cfg, batch, mesh=mesh, workdir=workdir,
                      eval_batch=eval_batch)
    profile_dir = os.path.join(workdir, "profile") if profile else None
    return trainer.run(epochs=epochs, per_step=per_step, profile_dir=profile_dir,
                       epoch_chunk=epoch_chunk)


def _restore_for_eval(cfg: Config, workdir: str):
    from .checkpoint import Checkpointer

    batch = loaders.load_dataset(cfg, "test")
    model, state = init_state(cfg, batch)
    ckpt_dir = os.path.join(
        workdir, cfg.train.checkpoint_dir, f"{cfg.dataset}_{cfg.model_type}"
    )
    ck = Checkpointer(ckpt_dir)
    if ck.latest_step() is not None:
        state = ck.restore(state, cfg.train.restore_epoch)
    else:
        print(
            f"WARNING: no checkpoint under {ckpt_dir}; evaluating an "
            "untrained model (run --type train first)",
            flush=True,
        )
    return batch, model, state


def run_test_reconstruct(cfg: Config, workdir: str) -> Dict[str, float]:
    """Posterior-mean reconstruction + latent dumps + metrics
    (main.py:374-426)."""
    batch, model, state = _restore_for_eval(cfg, workdir)
    eval_step = make_eval_step(cfg, model)
    B = cfg.train.batch_size
    G = batch.batch_size
    outs, zs, zgs, zsgs = [], [], [], []
    for i in range(max(G // B, 1)):
        b = batch.slice_batch(i * B, B)
        out = eval_step(state.params, b)
        outs.append(jax.device_get(out.decoded))
        if out.stats.mean_s is not None:
            zs.append(np.asarray(out.stats.mean_s))
            zgs.append(np.asarray(out.stats.mean_g))
        # sg averaged over samples as the reference does (main.py:407)
        zsgs.append(np.asarray(out.stats.mean_sg).mean(axis=1))
    gen_adj = np.concatenate([o.adj for o in outs])
    gen_nodes = np.concatenate([o.node_feat for o in outs])
    gen_spatial = np.concatenate([o.coords for o in outs])
    adj_scores = np.concatenate([edge_presence_scores(o.adj_prob) for o in outs])

    qdir = os.path.join(workdir, "qualitative_evaluation", cfg.dataset)
    os.makedirs(qdir, exist_ok=True)
    vt = cfg.model_type
    np.save(os.path.join(qdir, f"{vt}_z_sg.npy"), np.concatenate(zsgs))
    if zs:
        np.save(os.path.join(qdir, f"{vt}_z_s.npy"), np.concatenate(zs))
        np.save(os.path.join(qdir, f"{vt}_z_g.npy"), np.concatenate(zgs))

    n_eval = len(gen_adj)
    results = reconstruct_evaluation(
        gen_adj, gen_nodes, gen_spatial,
        np.asarray(batch.adj)[:n_eval],
        np.asarray(batch.features)[:n_eval],
        np.asarray(batch.coords)[:n_eval],
        cfg.dataset, adj_scores=adj_scores,
        node_categorical=outs[0].node_feat_prob is not None,
    )
    if batch.factors is not None and zs:
        z_s, z_g, z_sg = (np.concatenate(zs), np.concatenate(zgs),
                          np.concatenate(zsgs))
        results.update(
            disentangle_evaluation(
                z_s, z_g, z_sg, np.asarray(batch.factors)[:n_eval], cfg.dataset,
            )
        )
        z_all = np.concatenate([z_s, z_g, z_sg], axis=1)
        visualize_latent_embedding(
            z_all, np.asarray(batch.factors)[: len(z_all)],
            save_path=os.path.join(
                workdir, "figures", f"latent_{cfg.dataset}.png"
            ),
        )
    fig = visualize_reconstruct(
        5, np.asarray(batch.adj), np.asarray(batch.features),
        np.asarray(batch.coords), gen_adj, gen_nodes, gen_spatial,
        save_path=os.path.join(workdir, "figures", f"reconstruct_{cfg.dataset}.png"),
    )
    return results


def run_test_generation(
    cfg: Config, workdir: str, num_generate: Optional[int] = None
) -> Dict[str, float]:
    """Decode-from-prior + graph-statistic metrics (main.py:428-469).

    Samples ``num_generate`` graphs (default 100 — graph-statistic MMDs over
    a handful of graphs are noise; the reference decodes its whole test set,
    main.py:428-469) in fixed-size batches so one decode dispatch stays small
    and every chunk reuses one compiled program.
    """
    batch, model, state = _restore_for_eval(cfg, workdir)
    key = jax.random.PRNGKey(cfg.train.seed + 1)
    num = num_generate or max(100, cfg.train.batch_size)
    chunk = min(num, max(cfg.train.batch_size, 25))

    decoded = []
    for i in range((num + chunk - 1) // chunk):
        decoded.append(jax.device_get(model.apply(
            {"params": state.params}, jax.random.fold_in(key, i), chunk,
            method=type(model).generate,
        )))
    gen_adj = np.concatenate([np.asarray(d.adj) for d in decoded])[:num]
    gen_nodes = np.concatenate([np.asarray(d.node_feat) for d in decoded])[:num]
    gen_spatial = np.concatenate([np.asarray(d.coords) for d in decoded])[:num]
    return generation_evaluation(
        gen_adj, gen_nodes, gen_spatial,
        np.asarray(batch.adj), np.asarray(batch.features), np.asarray(batch.coords),
        cfg.dataset,
    )


def run_test_disentangle(
    cfg: Config,
    workdir: str,
    mode: str = "generation",
    group: str = "sg",
    dim: int = 0,
) -> str:
    """Latent traversal + grid figure (main.py:473-497).

    ``mode``:
      * ``generation`` — the reference's simultaneous 3-group sweep
        (traverse_generation, model.py:267-324); disentangled models only.
      * ``single`` — one dimension of one group (traverse, model.py:232-265).
      * ``latent`` — every dimension of every group (traverse_latent,
        model.py:326-358).
    The base/joint model always uses its single-latent sweep
    (traverse_joint, model_joint.py:192-206) regardless of ``mode``.
    """
    batch, model, state = _restore_for_eval(cfg, workdir)
    qdir = os.path.join(workdir, "qualitative_evaluation")
    V = cfg.visualize_length
    if not cfg.is_disentangled:
        z_sg = np.load(
            os.path.join(qdir, cfg.dataset, f"{cfg.model_type}_z_sg.npy")
        ).reshape(-1, cfg.encoder.sg_latent_size)
        latents = trav.traverse_joint(cfg, z_sg, dim)
        # decode only the swept block (the reference decodes the full static
        # grid, model_joint.py:203; the other rows are untouched anchors)
        d = min(dim, cfg.encoder.sg_latent_size - 1)
        latents = jax.tree.map(lambda z: z[d * V : d * V + V], latents)
        rows = 1
    else:
        z_s, z_g, z_sg = trav.load_saved_latents(cfg, qdir, cfg.model_type)
        if mode == "generation":
            latents = trav.traverse_generation(cfg, z_s, z_g, z_sg)
            rows = 3
        elif mode == "single":
            latents = trav.traverse(cfg, z_s, z_g, z_sg, group, dim)
            rows = 1
        elif mode == "latent":
            latents = trav.traverse_latent(cfg, z_s, z_g, z_sg)
            enc = cfg.encoder
            rows = enc.s_latent_size + enc.g_latent_size + enc.sg_latent_size
        else:
            raise ValueError(f"unknown traverse mode {mode!r}")
    decoded = model.apply(
        {"params": state.params}, latents, method=type(model).decode
    )
    path = os.path.join(workdir, "figures", f"traverse_{cfg.dataset}.png")
    # denormalization mirrors main.py:492-497 (x120 features, x600 coords)
    visualize_traverse(
        np.asarray(decoded.adj), np.asarray(decoded.node_feat) * 120,
        np.asarray(decoded.coords) * 600, rows, V, cfg.dataset,
        save_path=path,
    )
    return path


def run_sweep(cfg: Config, workdir: str, epochs: Optional[int] = None) -> Dict:
    """The reference __main__ sweep (main.py:502-525)."""
    results = {"generation": {}, "reconstruct": {}}
    run_train(cfg, workdir, epochs=epochs)
    results["reconstruct"][cfg.model_type] = run_test_reconstruct(cfg, workdir)
    results["generation"][cfg.model_type] = run_test_generation(cfg, workdir)
    print(json.dumps(results, indent=2, default=float))
    return results


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SND-VAE TPU experiment driver")
    p.add_argument("--dataset", default="synthetic2", choices=list(cfg_mod.PRESETS))
    p.add_argument("--model-type", default=None, choices=list(cfg_mod.MODEL_TYPES))
    p.add_argument(
        "--type", default="train",
        choices=["train", "test_reconstruct", "test_generation",
                 "test_disentangle", "sample", "sweep"],
    )
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--num-generate", type=int, default=None, dest="num_generate",
                   help="graphs to generate with --type sample (default: "
                        "batch_size) or --type test_generation (default: 100)")
    p.add_argument("--beta", type=float, default=None)
    p.add_argument("--dataset-path", default=None)
    p.add_argument("--workdir", default=".")
    p.add_argument("--quality", action="store_true",
                   help="apply the recommended quality operating point "
                        "(beta=0.1, weighted-BCE edge loss, edge-from-coords "
                        "distance channel, bf16 — BASELINE.md quality sweep); "
                        "explicit flags like --beta still override")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (f32 master params and ELBO)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the motif convs and the pairwise "
                        "adjacency head in backward (jax.checkpoint) — "
                        "trades ~one extra forward of those blocks for the "
                        "dominant activation HBM, raising trainable N")
    p.add_argument("--motif-block-rows", type=int, default=None,
                   dest="motif_block_rows",
                   help="blocked streamed lowering of the third-order motif "
                        "conv: stream the level-3 pairwise tensors one "
                        "i-row block of this size at a time (must divide "
                        "num_nodes; single-chip memory lever for N>=1536 — "
                        "see Config.motif_block_rows)")
    p.add_argument("--remat-policy", default=None, dest="remat_policy",
                   choices=["recompute-big", "dots-no-batch"],
                   help="selective remat policy over the checkpoint_name-"
                        "tagged N^2 intermediates (implies --remat; see "
                        "Config.remat_policy)")
    p.add_argument("--resample-trees-every", type=int, default=0,
                   dest="resample_trees_every",
                   help="re-draw spanning-tree samples every k epochs "
                        "(corrected-mode augmentation; 0 = reference "
                        "behavior, trees frozen at load)")
    p.add_argument("--pairing-skew", action="store_true", dest="pairing_skew",
                   help="reproduce the reference's spanning-tree/feature "
                        "tile-skew pairing (main.py:307-309 vs :132) for "
                        "data-pipeline parity runs")
    p.add_argument("--s-latent-size", type=int, default=None,
                   dest="s_latent_size",
                   help="spatial-branch latent width (reference flag "
                        "s_latent_size, main.py:47)")
    p.add_argument("--g-latent-size", type=int, default=None,
                   dest="g_latent_size",
                   help="topology-branch latent width (main.py:52)")
    p.add_argument("--sg-latent-size", type=int, default=None,
                   dest="sg_latent_size",
                   help="joint-branch latent width (main.py:57)")
    p.add_argument("--scene-node-loss", action="store_true",
                   dest="scene_node_loss",
                   help="corrected mode: train scene's shape head with "
                        "categorical CE (the reference zeroes scene's node "
                        "cost, optimizer.py:146-147)")
    p.add_argument("--normalize-coords", action="store_true",
                   dest="normalize_coords",
                   help="affinely map coordinates to the unit box using the "
                        "train split's bounds (corrected-mode fix for raw "
                        "protein/mnist coordinate scales; metrics are then "
                        "in normalized units)")
    p.add_argument("--coord-activation", default="auto", dest="coord_activation",
                   choices=["auto", "linear", "sigmoid"],
                   help="coordinate-head activation; 'linear' is the "
                        "corrected-mode fix for mnist's +10-shifted coords")
    p.add_argument("--eval-every", type=int, default=0, dest="eval_every",
                   help="score the held-out split every k epochs during "
                        "training and keep the best checkpoint by "
                        "--best-metric (0 = reference behavior: no "
                        "in-training eval, main.py:283-356)")
    p.add_argument("--best-metric", default=None, dest="best_metric",
                   help="held-out metric watched for best-checkpoint "
                        "tracking (default edge_auc; prefix '-' to "
                        "minimize, e.g. -spatial_mse)")
    p.add_argument("--per-step", action="store_true", dest="per_step",
                   help="per-batch dispatch instead of the epoch scan")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the second epoch")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh size (graphs sharded over 'data')")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size (wide kernels over 'model')")
    p.add_argument("--epoch-chunk", type=int, default=1, dest="epoch_chunk",
                   help="epochs per device dispatch (amortizes dispatch latency)")
    p.add_argument("--scan-unroll", type=int, default=1, dest="scan_unroll",
                   help="unroll factor of the per-batch scan in the epoch "
                        "programs; 4 wins ~3%% at latency-bound toy shapes "
                        "(benchmarks/scan_unroll_bench.py) at a compile-time "
                        "cost — leave 1 for MXU-scale N")
    p.add_argument("--traverse-mode", default="generation", dest="traverse_mode",
                   choices=["generation", "single", "latent"],
                   help="test_disentangle sweep: 3-group 'generation' "
                        "(model.py:267-324), one-dim 'single' "
                        "(model.py:232-265), or all-dims 'latent' "
                        "(model.py:326-358)")
    p.add_argument("--traverse-group", default="sg", dest="traverse_group",
                   choices=["s", "g", "sg"],
                   help="latent group for --traverse-mode single")
    p.add_argument("--traverse-dim", type=int, default=0, dest="traverse_dim",
                   help="latent dimension for --traverse-mode single and the "
                        "base model's single-latent sweep")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize before "
                        "any backend touch (coordinator/env-driven; "
                        "auto-detected on TPU pod slices)")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="force the jax backend.  'cpu' runs the whole CLI on "
                        "host CPU (set in-process — env vars are too late "
                        "once sitecustomize has imported jax); 'auto' keeps "
                        "the default backend (the TPU when available)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.platform == "cpu":
        # must precede the first backend touch; backend init is lazy, so an
        # in-process config update still wins over the sitecustomize import
        jax.config.update("jax_platforms", "cpu")

    if args.distributed:
        from .parallel.distributed import initialize_distributed

        pid = initialize_distributed()
        print(f"distributed: process {pid}/{jax.process_count()}", flush=True)

    from .utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = _build_cfg(args)
    if args.type == "train":
        out = run_train(cfg, args.workdir, epochs=args.epochs,
                        per_step=args.per_step, profile=args.profile,
                        epoch_chunk=args.epoch_chunk)
    elif args.type == "test_reconstruct":
        out = run_test_reconstruct(cfg, args.workdir)
    elif args.type == "test_generation":
        out = run_test_generation(cfg, args.workdir,
                                  num_generate=args.num_generate)
    elif args.type == "test_disentangle":
        out = run_test_disentangle(cfg, args.workdir, mode=args.traverse_mode,
                                   group=args.traverse_group,
                                   dim=args.traverse_dim)
    elif args.type == "sample":
        _, model, state = _restore_for_eval(cfg, args.workdir)
        num = args.num_generate or cfg.train.batch_size
        decoded = model.apply(
            {"params": state.params}, jax.random.PRNGKey(cfg.train.seed), num,
            method=type(model).generate,
        )
        gen_dir = os.path.join(args.workdir, "generated",
                               f"{cfg.dataset}_{cfg.model_type}")
        os.makedirs(gen_dir, exist_ok=True)
        for name, arr in (("adj", decoded.adj), ("coords", decoded.coords),
                          ("node_feat", decoded.node_feat)):
            np.save(os.path.join(gen_dir, f"{name}.npy"),
                    np.asarray(arr, dtype=np.float32))
        out = {"num_generated": int(num), "dir": gen_dir,
               "adj_shape": list(np.asarray(decoded.adj).shape)}
    else:
        out = run_sweep(cfg, args.workdir, epochs=args.epochs)
    print(json.dumps(out, default=float) if not isinstance(out, str) else out)
    return out


if __name__ == "__main__":
    main()
