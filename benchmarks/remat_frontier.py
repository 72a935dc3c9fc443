"""Selective-remat shootout in the spill regime (VERDICT r2 items 2+4).

Measures the full train step (bf16, B=2, S=2, separable E2E auto-on,
device_get fences — the frontier_2048.py protocol) at N in the spill regime
under each rematerialization mode, plus the fused Pallas motif kernel
(``--pallas``) at the shapes it was built for:

    python benchmarks/remat_frontier.py <n> <variant> [pallas] \
        [--motif-block-rows B]
    variant ∈ none | full | recompute-big | dots-no-batch
    (offload-big was measured here at 136.4 s/step vs 0.34 s no-remat at
    N=1024 on 2026-08-20 and deleted from the policy set)
    append 'pallas' to engage fused_motif_combine (e.g. "full pallas");
    --motif-block-rows engages the blocked streamed motif lowering
    (nn/spatial_conv.py::_blocked_nt, mirrors cli.py:354-360) — the
    round-4 structural countermove to the N>=1536 schedule serialization,
    measured here (VERDICT r4 item 1).

One variant per process so a RESOURCE_EXHAUSTED or worker crash doesn't take
the matrix down; the persistent compile cache absorbs recompiles.
Context at round 2 (BASELINE.md "HBM frontier"): N=1024 no-remat =
334.6 ms/step; N=1536/2048 needed remat and ran 12.4/29.4 s/step.  Measured
round 3 (BASELINE.md "Frontier, post-rank-R"): N=1024 none 318.1,
recompute-big +2.2%; N=1536 fits WITHOUT remat at 7 998 ms and
recompute-big moves it -0.5% — the residual gap is XLA's memory-pressure
schedule serialization, not tape size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from snd_vae_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from snd_vae_tpu.config import synthetic2_preset
from snd_vae_tpu.data import loaders
from snd_vae_tpu.train import (
    init_state, make_epoch_step, make_optimizer, make_train_step, rebatch,
)


def main() -> None:
    argv = list(sys.argv[1:])
    block_rows = None
    if "--motif-block-rows" in argv:
        i = argv.index("--motif-block-rows")
        block_rows = int(argv[i + 1])
        del argv[i : i + 2]
    # --single-step: time bare make_train_step dispatches (one device_get
    # fence per step) instead of the 2-batch epoch scan.  The blocked motif
    # lowering already nests a checkpointed lax.scan inside the step; adding
    # the epoch scan on top gives the remote compiler a scan-in-scan program
    # that did not finish compiling in 40 min at N=1536 (measured 2026-08-20)
    # — the same pathology BASELINE.md records for nested multi-epoch scans.
    # At frontier shapes the ~100 ms fetch RTT is <2% of an 8 s step, so
    # per-step fencing is honest here.
    single_step = "--single-step" in argv
    if single_step:
        argv.remove("--single-step")
    n = int(argv[0]) if len(argv) > 0 else 1024
    variant = argv[1] if len(argv) > 1 else "none"
    pallas = len(argv) > 2 and argv[2] == "pallas"
    remat = variant != "none"
    policy = None if variant in ("none", "full") else variant

    print(json.dumps({"backend": jax.default_backend(), "n": n,
                      "variant": variant, "pallas": pallas,
                      "motif_block_rows": block_rows}), flush=True)
    # single-step batches (2 graphs per epoch-step dispatch) keep every
    # dispatch bounded; reps=2 except at shapes near the worker's ~60 s
    # dispatch tolerance
    reps = 1 if n >= 2048 else 2
    # normalize_coords tames the coordinate terms, but the recorded loss at
    # these shapes is NOT the signal: node features stay raw-scale (up to
    # ~120), and with node-sums over N>=1536 nodes the untrained-init
    # encoder statistics overflow float range, so the init loss reads
    # inf/NaN (measured 2026-08-19: N=1536 loss NaN with normalize_coords
    # on AND off; N=1024 a finite-but-huge 3.2e24).  ms_per_step is the
    # metric; correctness at these shapes is pinned separately by the
    # float64 oracles and the f32 parity path.  The transform is host-side
    # — the compiled program and step time are unaffected either way.
    cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
        num_nodes=n, sampling_num=2, remat=remat, remat_policy=policy,
        normalize_coords=True, motif_block_rows=block_rows,
    )
    if pallas:
        # the kernel is retired from the model config (VERDICT r3 item 8);
        # the bench-only override keeps this variant reproducible
        from snd_vae_tpu.nn import spatial_conv

        spatial_conv._FORCE_PALLAS = True
    cfg = cfg.with_(train=cfg.train.__class__(batch_size=2))
    data = loaders.load_dataset(cfg, "train", num_graphs=2 * reps)
    batched = rebatch(data, 2)
    model, state = init_state(cfg, data)

    if single_step:
        import jax.numpy as jnp

        step = make_train_step(cfg, model, make_optimizer(cfg))
        one = jax.tree.map(lambda x: x[0], batched)
        gi = jnp.asarray(0.0)
        state, aux = step(state, one, gi)
        jax.device_get(aux["loss"])      # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            state, aux = step(state, one, gi)
            jax.device_get(aux["loss"])  # per-step fence (<2% of the step)
        loss = float(jax.device_get(aux["loss"]))
        dt = (time.perf_counter() - t0) / reps
    else:
        step = make_epoch_step(cfg, model, make_optimizer(cfg))
        state, aux = step(state, batched)
        jax.device_get(aux["loss"])          # compile + warm
        t0 = time.perf_counter()
        state, aux = step(state, batched)
        loss = float(jax.device_get(aux["loss"])[-1])
        dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "bench": "remat_frontier", "n": n, "variant": variant,
        "pallas": pallas, "motif_block_rows": block_rows,
        "single_step": single_step, "batch_graphs": 2,
        "ms_per_step": round(dt * 1e3, 2),
        "graphs_per_sec": round(2.0 / dt, 2),
        "loss": round(loss, 5),
    }), flush=True)


if __name__ == "__main__":
    main()
