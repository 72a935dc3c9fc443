"""Benchmark: graphs/sec/chip for the full training step (fwd+ELBO+bwd+Adam)
at the reference operating point — synthetic2 preset, N=25, batch=10 graphs x
10 spanning-tree samples (reference main.py:169-217, BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` compares against the TF1-CPU reference throughput measured
once at the same operating point (see BASELINE.md; the reference publishes no
numbers, so the baseline is established empirically).  Set the environment
variable SND_BASELINE_GRAPHS_PER_SEC to override.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from snd_vae_tpu.config import synthetic2_preset
from snd_vae_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
from snd_vae_tpu.data import loaders
from snd_vae_tpu.models import build_model
from snd_vae_tpu.train import init_state, make_optimizer, make_train_step

# Empirical TF-reference baseline in graphs/sec (train step, same operating
# point), measured on this host's CPU with the reference's own graphs via
# benchmarks/tf_reference_baseline.py — see BASELINE.md for the recorded
# measurement (4.42 graphs/s, 2.26 s/step).
DEFAULT_BASELINE_GRAPHS_PER_SEC = float(
    os.environ.get("SND_BASELINE_GRAPHS_PER_SEC", "4.42")
)

NUM_GRAPHS = 200      # dataset size -> 20 batches per epoch at B=10
SAMPLE_BATCH = 100    # decode-from-prior batch for the "+ sample" metric
SAMPLE_REPS = 200     # chained decodes per timed dispatch
EPOCH_CHUNK = 250     # epochs per dispatch (amortizes the per-dispatch and
                      # per-fetch host round-trips to ~1% of chunk time)
MEASURE_CHUNKS = 2    # 500 measured epochs total

# v5e peak: 197 TFLOP/s bf16 MXU (the bench's compute dtype).  MFU is
# reported against this so perf is judged vs the hardware ceiling, not only
# vs the 1-core TF-CPU baseline.
PEAK_FLOPS = float(os.environ.get("SND_PEAK_FLOPS", 197e12))


def _program_flops(jitted, *args, **kw) -> float:
    """Analytic FLOPs of one compiled dispatch via XLA's cost analysis
    (client-side HLO pass; 0.0 if the backend can't report it)."""
    try:
        cost = jitted.lower(*args, **kw).compile().cost_analysis()
        if isinstance(cost, list):  # per-device list on some backends
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception as e:  # analysis is best-effort; the metric is optional
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0


def _run():
    from snd_vae_tpu.train import make_multi_epoch_step, rebatch

    # bfloat16 compute with f32 master params and f32 ELBO accumulation —
    # the standard TPU mixed-precision mode; measured 1.8x over f32 at this
    # operating point (BASELINE.md records both).  scan_unroll=8: the N=25
    # step is occupancy-bound on its chain of ~445 microsecond kernels
    # (BASELINE.md "The graded-point MFU gap"), so unrolling the batch scan
    # lets XLA schedule across step boundaries.  Pre-rank-R the peak was 4
    # (8 regressed — live range too big); the rank-R reassociation shrank
    # the live range and 8 now wins: 16,479 vs 16,206 graphs/s measured
    # 2026-08-20 (benchmarks/scan_unroll_bench.py).
    import dataclasses

    cfg = synthetic2_preset(compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, scan_unroll=8)
    )
    B = cfg.train.batch_size  # 10 graphs x sampling_num=10 trees
    data = loaders.load_dataset(cfg, "train", num_graphs=NUM_GRAPHS)
    batched = rebatch(data, B)
    model, state = init_state(cfg, data)
    multi_epoch_step = make_multi_epoch_step(cfg, model, make_optimizer(cfg))

    # warmup / compile — EPOCH_CHUNK whole epochs (fwd+ELBO+bwd+Adam x
    # num_batches x epochs) are one nested lax.scan program; data, train
    # state, and the epoch counter stay device-resident between dispatches.
    #
    # TIMING FENCE: on the tunneled TPU backend jax.block_until_ready
    # resolves without awaiting remote execution (measured: 4 chunks
    # "block" in 8 ms, then a device_get absorbs a 33 s backlog), so the
    # only honest fence is fetching the values to the host.  Every timed
    # iteration ends with a device_get of the per-epoch losses.
    state, aux = multi_epoch_step(state, batched, EPOCH_CHUNK)
    jax.device_get(aux["loss"])

    nb = batched.adj.shape[0]
    t0 = time.perf_counter()
    for _ in range(MEASURE_CHUNKS):
        state, aux = multi_epoch_step(state, batched, EPOCH_CHUNK)
        jax.device_get(aux["loss"])  # host fetch per chunk: honest fence
    dt = time.perf_counter() - t0

    # analytic FLOPs of ONE optimization step, AFTER timing (the AOT lower/
    # compile path may not share the dispatch cache).  The step program is
    # analyzed instead of the chunk: XLA's cost analysis does not multiply
    # While-loop bodies by trip count, so the scan program under-reports by
    # the number of steps per chunk.
    from snd_vae_tpu.train import make_train_step

    step = make_train_step(cfg, model, make_optimizer(cfg))
    one = jax.tree.map(lambda x: x[0], batched)
    step_flops = _program_flops(step, state, one, jnp.asarray(0.0))

    graphs_per_sec = MEASURE_CHUNKS * EPOCH_CHUNK * nb * B / dt
    record = {
        "metric": "train_graphs_per_sec_per_chip",
        "value": round(graphs_per_sec, 2),
        "unit": "graphs/s",
        "vs_baseline": round(graphs_per_sec / DEFAULT_BASELINE_GRAPHS_PER_SEC, 2),
    }

    # the north star's "+ sample" half: decode-from-prior throughput at the
    # same operating point (reference test_generation, main.py:428-469).
    # Chained inside one lax.scan program with a scalar reduction carried out
    # (DCE-proof) and fetched once — the honest fence on this backend.
    def _sample_many(params, key):
        def body(c, k):
            g = model.apply({"params": params}, k, SAMPLE_BATCH,
                            method=type(model).generate)
            s = (jnp.sum(g.adj_prob.astype(jnp.float32))
                 + jnp.sum(g.coords.astype(jnp.float32)))
            return c + s, None
        tot, _ = jax.lax.scan(body, jnp.float32(0),
                              jax.random.split(key, SAMPLE_REPS))
        return tot

    sample_fn = jax.jit(_sample_many)
    k0 = jax.random.key(0)
    jax.device_get(sample_fn(state.params, k0))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(sample_fn(state.params, jax.random.key(1)))
    sample_dt = time.perf_counter() - t0
    record["sample_graphs_per_sec"] = round(
        SAMPLE_REPS * SAMPLE_BATCH / sample_dt, 2
    )
    if step_flops > 0:
        total_flops = step_flops * MEASURE_CHUNKS * EPOCH_CHUNK * nb
        mfu = total_flops / dt / PEAK_FLOPS
        record["mfu"] = round(mfu, 5)
        print(
            f"mfu={mfu:.5f} ({total_flops / dt / 1e12:.3f} "
            f"TFLOP/s of {PEAK_FLOPS / 1e12:.0f} peak; "
            f"{step_flops:.3e} flops/step)",
            file=sys.stderr,
        )
    print(json.dumps(record))


def main(attempts: int = 3, retry_wait_s: float = 240.0,
         attempt_timeout_s: float = 900.0):
    """The tunneled TPU worker occasionally crashes/restarts (BASELINE.md
    "mnist caveats"); a crash mid-bench would otherwise record a failure for
    the whole round.  Outages surface two ways: as exceptions
    (jax.errors.JaxRuntimeError or transport errors from the remote plugin)
    or as an indefinite HANG (submissions neither complete nor fail while the
    tunnel restarts).  A hang can't be interrupted in-process — the backend
    blocks in a C call, so signal handlers never run — so each attempt is a
    watchdog-bounded subprocess: on timeout it is killed and retried after
    letting the worker come back.  Device buffers are lost either way; each
    attempt rebuilds from scratch."""
    import subprocess

    for attempt in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--once"],
                stdout=subprocess.PIPE, timeout=attempt_timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            out = proc.stdout.decode()
            lines = [l for l in out.splitlines() if l.startswith("{")]
            if proc.returncode == 0 and lines:
                print(lines[-1])  # stdout stays exactly one JSON line
                return
            err = f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            err = f"hang (> {attempt_timeout_s:.0f}s watchdog)"
        except (KeyboardInterrupt, SystemExit):
            raise
        if attempt == attempts - 1:
            raise RuntimeError(f"bench failed after {attempts} attempts: {err}")
        # stderr only: stdout must stay exactly one JSON line
        print(f"bench attempt {attempt + 1} failed ({err}); "
              f"retrying in {retry_wait_s:.0f}s", file=sys.stderr, flush=True)
        time.sleep(retry_wait_s)


if __name__ == "__main__":
    if "--once" in sys.argv:
        _run()
    else:
        main()
