"""Large-N scaling benchmark (BASELINE.json config 5; SURVEY §5).

The reference caps out at N=50: its spatial-motif conv materializes
O(N³)–O(N⁴) tensors (reference layers.py:143-277) and there is no
multi-device or blocked path.  This benchmark measures the two TPU-native
large-N building blocks on real hardware:

  1. GCN neighbor aggregation ``lrelu(A @ (X W))`` at N up to 8192 —
     XLA dense dot vs the blocked Pallas kernel (nn/pallas/blocked_spmm.py),
     reported in TFLOP/s.
  2. The factored third-order SpatialGraphConv at N up to 512 (B=1) —
     impossible for the reference's dense formula (at N=512, h0=32 the
     [N,N,N,h] intermediate alone is 512³·32·4 B ≈ 17 TB); the factored
     form needs O(N²·h) memory and runs on one chip.

Prints one JSON line per configuration.  Not the driver benchmark
(bench.py is); run manually: ``python benchmarks/large_graph_bench.py``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snd_vae_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from snd_vae_tpu.nn.basic import lrelu
from snd_vae_tpu.nn.pallas import blocked_adj_matmul
from snd_vae_tpu.nn.spatial_conv import SpatialGraphConv

H = 128
REPS = 20


def _rand_graph(key, n: int, density: float = 0.01):
    ka, kx = jax.random.split(key)
    adj = (jax.random.uniform(ka, (n, n)) < density).astype(jnp.float32)
    adj = jnp.maximum(adj, adj.T)
    x = jax.random.normal(kx, (n, H), jnp.float32)
    return adj, x


def _time_chained(make_step, init_carry, *operands, iters: int = 50) -> float:
    """Honest per-op timing over a high-latency tunnel: run ``iters``
    data-dependent repetitions of the op inside ONE jit program (lax.scan),
    fetch a scalar once, and divide.  jax.block_until_ready resolves without
    awaiting remote execution on this backend, and the ~100 ms fetch
    round-trip would swamp a sub-ms op if fenced per repetition.  Operands
    are jit ARGUMENTS, not closure constants — embedding a 256 MB adjacency
    as a program constant overflows the remote-compile request."""

    @jax.jit
    def program(c0, *ops):
        def body(c, _):
            return make_step(c, *ops), None
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return jax.tree.map(jnp.sum, c) if not hasattr(c, "sum") else jnp.sum(c)

    jax.device_get(program(init_carry, *operands))   # compile + warm
    t0 = time.perf_counter()
    jax.device_get(program(init_carry, *operands))   # one fetch fences all
    total = time.perf_counter() - t0
    return total / iters


def bench_aggregation():
    w = jax.random.normal(jax.random.PRNGKey(1), (H, H), jnp.float32) * 0.02

    for n in (1024, 2048, 4096, 8192):
        adj, x = _rand_graph(jax.random.PRNGKey(n), n)
        flops = 2 * n * n * H + 2 * n * H * H

        def xla_step(c, a, x0):
            return lrelu(a @ (c @ w)) * 1e-3 + x0

        def pallas_step(c, a, x0):
            return blocked_adj_matmul(a, c @ w, leak=0.2) * 1e-3 + x0

        for tag, step in (("xla", xla_step), ("pallas", pallas_step)):
            dt = _time_chained(step, x, adj, x)
            print(json.dumps({
                "bench": "gcn_aggregation", "impl": tag, "n": n,
                "ms": round(dt * 1e3, 3),
                "tflops": round(flops / dt / 1e12, 2),
            }), flush=True)


def bench_spatial_conv():
    conv = SpatialGraphConv((32, 32, 32))
    for n in (128, 256, 512):
        key = jax.random.PRNGKey(n)
        adj, _ = _rand_graph(key, n, density=4.0 / n)
        adj = adj[None]
        x = jax.random.normal(key, (1, n, 4), jnp.float32)
        rel = jax.random.normal(key, (1, n, n, 1), jnp.float32)
        params = conv.init(key, adj, x, rel)

        def step(c, a, x0, r):
            out = conv.apply(params, a, x0 + c * 1e-20, r)
            return jnp.sum(out) * 1e-12  # scalar carry keeps the data dependence

        dt = _time_chained(step, jnp.zeros(()), adj, x, rel)
        dense_bytes = n ** 3 * 32 * 4  # the reference's [N,N,N,h0] intermediate
        print(json.dumps({
            "bench": "spatial_graph_conv_factored", "n": n,
            "ms": round(dt * 1e3, 3),
            "graphs_per_sec": round(1.0 / dt, 1),
            "reference_dense_intermediate_GB": round(dense_bytes / 2**30, 1),
        }), flush=True)


def bench_full_train():
    """FULL training step (3-branch model, fwd+ELBO+bwd+Adam) at N far beyond
    the reference's cap — training, not just the isolated op.  bf16 compute,
    B=2 graphs x S=2 spanning trees.  Timed as one multi-epoch scan (nb=1)
    fenced by fetching the per-epoch losses; chunks stay well under the
    tunneled worker's ~60 s single-dispatch tolerance (BASELINE.md)."""
    from snd_vae_tpu.config import synthetic2_preset
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.train import (
        init_state, make_epoch_step, make_optimizer, rebatch,
    )

    # reps chained as one EPOCH over reps batches (single-level scan; the
    # nested multi-epoch program compiles pathologically slowly remotely at
    # these shapes: >50 min for N=100, vs minutes for the epoch program)
    for n, reps in ((100, 30), (256, 15), (512, 6)):
        cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
            num_nodes=n, sampling_num=2,
        )
        cfg = cfg.with_(train=cfg.train.__class__(batch_size=2))
        data = loaders.load_dataset(cfg, "train", num_graphs=2 * reps)
        batched = rebatch(data, 2)        # [reps, 2, ...]
        model, state = init_state(cfg, data)
        step = make_epoch_step(cfg, model, make_optimizer(cfg))

        state, aux = step(state, batched)
        jax.device_get(aux["loss"])          # compile + warm
        t0 = time.perf_counter()
        state, aux = step(state, batched)
        jax.device_get(aux["loss"])          # one fetch fences all reps
        dt = (time.perf_counter() - t0) / reps
        row = {
            "bench": "full_train_step", "n": n, "batch_graphs": 2,
            "ms_per_step": round(dt * 1e3, 2),
            "graphs_per_sec": round(2.0 / dt, 1),
        }
        flops = _step_flops(cfg, model, state, batched)
        if flops > 0:
            row["flops_per_step"] = flops
            row["mfu"] = round(flops / dt / PEAK_FLOPS, 4)
        print(json.dumps(row), flush=True)


# v5e bf16 MXU peak; see bench.py
PEAK_FLOPS = float(os.environ.get("SND_PEAK_FLOPS", 197e12))


def _step_flops(cfg, model, state, batched) -> float:
    """Analytic FLOPs of one optimization step via XLA cost analysis of the
    per-step program (the scan program under-reports: While bodies are not
    multiplied by trip count)."""
    from snd_vae_tpu.train import make_optimizer, make_train_step

    try:
        pstep = make_train_step(cfg, model, make_optimizer(cfg))
        one = jax.tree.map(lambda x: x[0], batched)
        cost = pstep.lower(state, one, jnp.asarray(0.0)).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0


def bench_full_train_pallas():
    """Same full-train protocol with the fused Pallas motif kernel engaged
    via the bench-only nn.spatial_conv.force_pallas() override (the kernel is
    retired from the model config — it lost at every measured shape, and the
    rank-R main path no longer materializes the f_ik tensor it consumes).
    Kept so the crossover experiment stays reproducible."""
    from snd_vae_tpu.config import synthetic2_preset
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.nn import spatial_conv
    from snd_vae_tpu.train import (
        init_state, make_epoch_step, make_optimizer, rebatch,
    )

    with spatial_conv.force_pallas():
        for n, reps in ((256, 15), (512, 6)):
            cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
                num_nodes=n, sampling_num=2,
            )
            cfg = cfg.with_(train=cfg.train.__class__(batch_size=2))
            data = loaders.load_dataset(cfg, "train", num_graphs=2 * reps)
            batched = rebatch(data, 2)
            model, state = init_state(cfg, data)
            step = make_epoch_step(cfg, model, make_optimizer(cfg))

            state, aux = step(state, batched)
            jax.device_get(aux["loss"])
            t0 = time.perf_counter()
            state, aux = step(state, batched)
            jax.device_get(aux["loss"])
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "bench": "full_train_step_pallas", "n": n, "batch_graphs": 2,
                "ms_per_step": round(dt * 1e3, 2),
                "graphs_per_sec": round(2.0 / dt, 1),
            }), flush=True)


def bench_full_train_factored():
    """Full-train protocol comparing the adjacency head's dense first-E2E
    lowering against the separable one (DecoderConfig.adj_head_factored;
    nn/edge_conv.py::E2E._separable).  Same parameters, same math — the
    separable form collapses the first layer's O(B N^3 C O) contraction to
    O(B N^2 C O) and never materializes the [B,N,N,2C] tile-concat map (the
    decoder's widest intermediate and the N=1024 spill driver)."""
    from snd_vae_tpu.config import synthetic2_preset
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.train import (
        init_state, make_epoch_step, make_optimizer, rebatch,
    )

    shapes = ((100, 30), (256, 15), (512, 6), (1024, 2))
    for n, reps in shapes:
        for factored in (False, True):
            cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
                num_nodes=n, sampling_num=2,
            )
            cfg = cfg.with_(
                train=cfg.train.__class__(batch_size=2),
                decoder=dataclasses.replace(
                    cfg.decoder, adj_head_factored=factored
                ),
            )
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
            row = {
                "bench": "full_train_factored", "n": n, "batch_graphs": 2,
                "adj_head_factored": factored,
                "ms_per_step": round(dt * 1e3, 2),
                "graphs_per_sec": round(2.0 / dt, 1),
            }
            flops = _step_flops(cfg, model, state, batched)
            if flops > 0:
                row["flops_per_step"] = flops
                row["mfu"] = round(flops / dt / PEAK_FLOPS, 4)
            print(json.dumps(row), flush=True)


def bench_full_train_remat():
    """Full-train protocol at and beyond the single-chip HBM frontier, with
    and without cfg.remat (jax.checkpoint over the motif convs + the whole
    pairwise adjacency head).  The saved residuals of those blocks are the
    memory ceiling at large N — [B,N,N,h]-scale tensors on the backward tape
    — so rematerializing them should raise the max trainable N per chip for
    ~one extra forward of those blocks.  Rows report ms/step or "oom"."""
    from snd_vae_tpu.config import synthetic2_preset
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.train import (
        init_state, make_epoch_step, make_optimizer, rebatch,
    )

    for n, reps in ((512, 6), (768, 4), (1024, 3)):
        for remat in (False, True):
            cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
                num_nodes=n, sampling_num=2, remat=remat,
            )
            cfg = cfg.with_(train=cfg.train.__class__(batch_size=2))
            data = loaders.load_dataset(cfg, "train", num_graphs=2 * reps)
            batched = rebatch(data, 2)
            model, state = init_state(cfg, data)
            step = make_epoch_step(cfg, model, make_optimizer(cfg))
            row = {"bench": "full_train_step_remat", "n": n,
                   "batch_graphs": 2, "remat": remat}
            try:
                state, aux = step(state, batched)
                jax.device_get(aux["loss"])          # compile + warm
                t0 = time.perf_counter()
                state, aux = step(state, batched)
                jax.device_get(aux["loss"])          # one fetch fences all
                dt = (time.perf_counter() - t0) / reps
                row["ms_per_step"] = round(dt * 1e3, 2)
                row["graphs_per_sec"] = round(2.0 / dt, 1)
            except Exception as e:                   # OOM is a data point
                msg = str(e)
                if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                    row["oom"] = True
                else:
                    row["error"] = msg[:200]
            print(json.dumps(row), flush=True)


def bench_full_train_3d():
    """FULL 3D-family training step (fourth-order factored conv, protein
    preset architecture) at N beyond the reference's cap.  The reference's
    dense form materializes [B,N,N,N,N,h] (layers.py:200-277): at N=128/h=10
    that is ≈10.7 GB per graph per layer (43 GB for this B·S=4 batch, before
    the backward) — beyond a 16 GB chip; the factored form is O(B·N³·h)
    (nn/spatial_conv.py) and runs comfortably."""
    from snd_vae_tpu.config import protein_preset
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.train import (
        init_state, make_epoch_step, make_optimizer, rebatch,
    )

    for n, reps in ((64, 20), (128, 8)):
        _one_3d_row(n, reps, block_rows=None)


def bench_full_train_3d_blocked():
    """The fourth-order blocked streamed lowering (_blocked_nt_3d,
    Config.motif_block_rows) at and past the 3D family's measured range:
    the O(B·N³·h0) m4_sum is the 3D frontier's live-set driver, and
    i-blocking bounds it to one [B,block,N,N,h0] slab per scan iteration.
    Monolithic vs blocked at each N."""
    for n, reps, blocks in ((128, 8, (64,)), (192, 4, (64, 96)),
                            (256, 2, (64, 128))):
        _one_3d_row(n, reps, block_rows=None)
        for b in blocks:
            _one_3d_row(n, reps, block_rows=b)


def _one_3d_row(n: int, reps: int, block_rows=None):
    from snd_vae_tpu.config import protein_preset
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.train import (
        init_state, make_epoch_step, make_optimizer, rebatch,
    )

    cfg = protein_preset(compute_dtype="bfloat16").with_(
        num_nodes=n, sampling_num=2, motif_block_rows=block_rows,
    )
    cfg = cfg.with_(train=cfg.train.__class__(batch_size=2))
    data = loaders.load_dataset(cfg, "train", num_graphs=2 * reps)
    batched = rebatch(data, 2)        # [reps, 2, ...]
    model, state = init_state(cfg, data)
    step = make_epoch_step(cfg, model, make_optimizer(cfg))
    row = {"bench": "full_train_step_3d", "n": n, "batch_graphs": 2,
           "motif_block_rows": block_rows,
           "reference_dense_intermediate_GB_per_graph": round(
               n**4 * 10 * 4 / 2**30, 2
           )}
    try:
        state, aux = step(state, batched)
        jax.device_get(aux["loss"])          # compile + warm
        t0 = time.perf_counter()
        state, aux = step(state, batched)
        jax.device_get(aux["loss"])
        dt = (time.perf_counter() - t0) / reps
        row["ms_per_step"] = round(dt * 1e3, 2)
        row["graphs_per_sec"] = round(2.0 / dt, 1)
    except Exception as e:                   # OOM is a data point here
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
            row["oom"] = True
        else:
            row["error"] = msg[:200]
    print(json.dumps(row), flush=True)


def bench_sampling():
    """Decode-from-prior throughput across N (the north star's "+ sample"
    half at scale — reference test_generation, main.py:428-469; VERDICT r4
    item 4).  The bench.py:125-149 pattern hoisted to large N: SAMPLE_REPS
    decodes chained inside one lax.scan with a DCE-proof scalar reduction
    carried out and fetched once (the only honest fence on this backend).
    bf16; the separable E2E head auto-engages at N >= 96, so it carries the
    decode at every shape here."""
    from snd_vae_tpu.config import synthetic2_preset
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.train import init_state

    # (n, decode batch, chained reps) — batch shrinks with the [Bd,N,N,2]
    # adjacency decode so each timed dispatch stays seconds-scale, far under
    # the tunnel's ~60 s kill threshold.
    for n, bd, reps in ((100, 100, 50), (256, 32, 30), (512, 8, 20),
                        (1024, 2, 10)):
        cfg = synthetic2_preset(compute_dtype="bfloat16").with_(
            num_nodes=n, sampling_num=2,
        )
        cfg = cfg.with_(train=cfg.train.__class__(batch_size=2))
        data = loaders.load_dataset(cfg, "train", num_graphs=2)
        model, state = init_state(cfg, data)

        def _sample_many(params, key):
            def body(c, k):
                g = model.apply({"params": params}, k, bd,
                                method=type(model).generate)
                s = (jnp.sum(g.adj_prob.astype(jnp.float32))
                     + jnp.sum(g.coords.astype(jnp.float32)))
                return c + s, None
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, reps))
            return tot

        sample_fn = jax.jit(_sample_many)
        jax.device_get(sample_fn(state.params, jax.random.key(0)))  # compile
        t0 = time.perf_counter()
        jax.device_get(sample_fn(state.params, jax.random.key(1)))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "bench": "sampling", "n": n, "decode_batch": bd, "reps": reps,
            "ms_per_decode": round(dt / reps * 1e3, 3),
            "graphs_per_sec": round(reps * bd / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    benches = {
        "aggregation": bench_aggregation,
        "spatial_conv": bench_spatial_conv,
        "full_train": bench_full_train,
        "full_train_pallas": bench_full_train_pallas,
        "full_train_factored": bench_full_train_factored,
        "full_train_remat": bench_full_train_remat,
        "full_train_3d": bench_full_train_3d,
        "full_train_3d_blocked": bench_full_train_3d_blocked,
        "sampling": bench_sampling,
    }
    wanted = sys.argv[1:] or list(benches)
    for name in wanted:
        benches[name]()
