"""Single-chip frontier probe: full train step at N=1536/2048 (separable E2E).

With the separable first-layer adjacency E2E (nn/edge_conv.py::E2E._separable)
the decoder never materializes the [B,N,N,2C] map, so the activation
footprint is O(N^2 h) and N=2048 — 40x the reference's maximum (N=50, its
dense [N,N,N,h] intermediate would be ~2.7 PB) — fits one v5e chip.  Same
protocol as large_graph_bench.bench_full_train_factored (bf16, B=2, S=2,
device_get fences).  Run manually: ``python benchmarks/frontier_2048.py``.
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
from snd_vae_tpu.train import init_state, make_epoch_step, make_optimizer, rebatch


def main() -> None:
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    # Measured 2026-08-18: N=1536 without remat RESOURCE_EXHAUSTEDs the
    # 16 GB chip (the backward tape's [B*S,N,N,h] residuals), so the probe
    # takes n/remat from argv — ``frontier_2048.py 1536 remat``.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    remat = len(sys.argv) > 2 and sys.argv[2] == "remat"
    reps = 2
    cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
        num_nodes=n, sampling_num=2, remat=remat,
    )
    cfg = cfg.with_(train=cfg.train.__class__(batch_size=2))
    data = loaders.load_dataset(cfg, "train", num_graphs=2 * reps)
    batched = rebatch(data, 2)
    model, state = init_state(cfg, data)
    step = make_epoch_step(cfg, model, make_optimizer(cfg))

    state, aux = step(state, batched)
    jax.device_get(aux["loss"])          # compile + warm
    t0 = time.perf_counter()
    state, aux = step(state, batched)
    jax.device_get(aux["loss"])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "bench": "frontier", "n": n, "batch_graphs": 2,
        "adj_head_factored": "auto(on)", "remat": remat,
        "ms_per_step": round(dt * 1e3, 2),
        "graphs_per_sec": round(2.0 / dt, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
