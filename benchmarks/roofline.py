"""Roofline placement of the full train step: how close is the hot path to
the hardware's speed of light?

For each N, compiles the complete optimization step (fwd+ELBO+bwd+Adam,
bf16), reads analytic FLOPs and bytes-accessed from XLA's cost analysis,
measures the real step time with the chained-scan fence (BASELINE.md
"Timing-fence pitfall"), and reports

  * operational intensity  OI = flops / bytes  (flops per HBM byte)
  * attainable             min(PEAK, OI * BW)  (the roofline)
  * achieved               flops / time
  * roofline %             achieved / attainable

so a low MFU at a bandwidth-bound shape is judged against the memory
roofline, not the MXU peak.  v5e: 197 TFLOP/s bf16, ~819 GB/s HBM
(override with SND_PEAK_FLOPS / SND_HBM_BW).

Run from /root/repo:  python benchmarks/roofline.py [N ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from snd_vae_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from snd_vae_tpu.config import synthetic2_preset
from snd_vae_tpu.data import loaders
from snd_vae_tpu.train import init_state, make_optimizer, make_train_step

PEAK = float(os.environ.get("SND_PEAK_FLOPS", 197e12))
HBM_BW = float(os.environ.get("SND_HBM_BW", 819e9))


def _cfg(n: int):
    cfg = synthetic2_preset(compute_dtype="bfloat16")
    return cfg.with_(
        num_nodes=n, sampling_num=2,
        train=cfg.train.__class__(**{**cfg.train.__dict__, "batch_size": 2}),
    )


def measure(n: int, reps: int) -> dict:
    cfg = _cfg(n)
    batch = loaders.load_dataset(cfg, "train", num_graphs=cfg.train.batch_size)
    batch = batch.slice_batch(0, cfg.train.batch_size)
    model, state = init_state(cfg, batch)
    step = make_train_step(cfg, model, make_optimizer(cfg))

    cost = step.lower(state, batch, jnp.asarray(0.0)).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))

    @jax.jit
    def chain(st):
        def body(c, _):
            c, aux = step(c, batch, jnp.asarray(0.0))
            return c, aux["loss"]

        return jax.lax.scan(body, st, None, length=reps)

    st, losses = chain(state)
    jax.device_get(losses)  # compile + warm
    t0 = time.perf_counter()
    st, losses = chain(st)
    jax.device_get(losses)
    dt = (time.perf_counter() - t0) / reps

    oi = flops / byts if byts else float("inf")
    attainable = min(PEAK, oi * HBM_BW)
    achieved = flops / dt
    return {
        "N": n,
        "flops_per_step": flops,
        "bytes_per_step": byts,
        "ms_per_step": round(dt * 1e3, 3),
        "oi_flops_per_byte": round(oi, 2),
        "bound": "compute" if oi * HBM_BW >= PEAK else "memory",
        "mfu": round(achieved / PEAK, 4),
        "roofline_pct": round(100 * achieved / attainable, 2),
    }


def main():
    ns = [int(a) for a in sys.argv[1:]] or [25, 100, 256, 512]
    for n in ns:
        reps = max(3, min(50, int(2.0 / (1e-4 * n))))  # keep dispatches short
        r = measure(n, reps)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
