"""Inner-scan unroll factor at the reference operating point (bf16).

opt_variants.py showed the toy-shape (N=25) step is latency-bound on its
sequential kernel chain — each of the ~20 steps/epoch is ~1 ms of tiny ops
dispatched one-by-one by the While loop.  ``TrainConfig.scan_unroll``
replicates the step body inside the loop so XLA schedules across step
boundaries (per-iteration loop overhead amortizes; adjacent steps'
independent ops — batch cast, RNG, loss reductions — can interleave with
the previous step's critical path even though the param chain itself is
sequential).

Same honest fence as bench.py: per-chunk device_get of the epoch losses
(block_until_ready is not a fence on this backend — BASELINE.md).

Run from /root/repo:  python benchmarks/scan_unroll_bench.py [unrolls...]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax

from snd_vae_tpu.config import synthetic2_preset
from snd_vae_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from snd_vae_tpu.data import loaders
from snd_vae_tpu.train import (
    init_state,
    make_multi_epoch_step,
    make_optimizer,
    rebatch,
)

NUM_GRAPHS = 200
EPOCH_CHUNK = 100
MEASURE_CHUNKS = 2


def measure(unroll: int) -> float:
    cfg = synthetic2_preset(compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, scan_unroll=unroll)
    )
    B = cfg.train.batch_size
    data = loaders.load_dataset(cfg, "train", num_graphs=NUM_GRAPHS)
    batched = rebatch(data, B)
    model, state = init_state(cfg, data)
    step = make_multi_epoch_step(cfg, model, make_optimizer(cfg))

    t0 = time.perf_counter()
    state, aux = step(state, batched, EPOCH_CHUNK)  # warmup/compile
    jax.device_get(aux["loss"])
    compile_s = time.perf_counter() - t0

    nb = batched.adj.shape[0]
    t0 = time.perf_counter()
    for _ in range(MEASURE_CHUNKS):
        state, aux = step(state, batched, EPOCH_CHUNK)
        jax.device_get(aux["loss"])
    dt = time.perf_counter() - t0
    gps = MEASURE_CHUNKS * EPOCH_CHUNK * nb * B / dt
    print(
        json.dumps(
            {
                "unroll": unroll,
                "graphs_per_sec": round(gps, 1),
                "ms_per_epoch": round(1e3 * dt / (MEASURE_CHUNKS * EPOCH_CHUNK), 3),
                "warmup_s": round(compile_s, 1),
                "final_loss": float(aux["loss"][-1]),
            }
        ),
        flush=True,
    )
    return gps


if __name__ == "__main__":
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    for u in unrolls:
        measure(u)
