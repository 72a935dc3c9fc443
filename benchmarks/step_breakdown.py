"""Where does the train-step time go at the reference operating point?

Times stripped-down variants of the fused train step (synthetic2 preset,
B=10 graphs x S=10 trees, N=25, bf16) with the honest chained-scan fence
(BASELINE.md "Timing-fence pitfall"): each variant runs REPS iterations
inside one lax.scan program and is fenced by fetching the result.

Variants:
  full        fwd + ELBO + bwd + Adam         (the bench.py inner step)
  fwd_elbo    fwd + ELBO only (no grad)
  fwd_only    model forward only
  encode      the three encoder branches
  dec         decoder heads from fixed latents
  adam        optimizer.update + apply on the real gradient pytree

Run from /root/repo:  python benchmarks/step_breakdown.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from snd_vae_tpu.config import synthetic2_preset
from snd_vae_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from snd_vae_tpu.data import loaders
from snd_vae_tpu.losses import elbo_loss
from snd_vae_tpu.train import init_state, make_optimizer, rebatch
from snd_vae_tpu.utils.tree import cast_float_leaves

REPS = 200


def timed_scan(fn, init, label, results):
    """Chain REPS applications of fn inside one scan; fence with device_get."""

    @jax.jit
    def prog(x):
        def body(c, _):
            return fn(c), ()

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    out = prog(init)
    jax.device_get(jax.tree.leaves(out)[0])  # compile + warm
    t0 = time.perf_counter()
    out = prog(init)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / REPS
    results[label] = dt * 1e3
    print(f"{label:10s} {dt * 1e3:8.3f} ms/iter")
    return out


def main():
    cfg = synthetic2_preset(compute_dtype="bfloat16")
    B = cfg.train.batch_size
    data = loaders.load_dataset(cfg, "train", num_graphs=B)
    batch = data.slice_batch(0, B)
    model, state = init_state(cfg, data)
    opt = make_optimizer(cfg)

    cd = jnp.dtype(cfg.compute_dtype)
    params_c = cast_float_leaves(state.params, cd)
    batch_c = cast_float_leaves(batch, cd)
    key = jax.random.PRNGKey(0)

    results = {}

    # full fused step (state evolves so the loop isn't dead code)
    def full(carry):
        params, opt_state, k = carry
        k, sk = jax.random.split(k)

        def loss_fn(p):
            pc = cast_float_leaves(p, cd)
            out = model.apply({"params": pc}, batch_c, key=sk)
            total, _ = elbo_loss(
                cfg, out, batch.adj, batch.features, batch.coords, 0.0
            )
            return total

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, k

    timed_scan(full, (state.params, state.opt_state, key), "full", results)

    # forward + ELBO (loss value feeds the carry so nothing is DCE'd)
    def fwd_elbo(carry):
        acc, k = carry
        k, sk = jax.random.split(k)
        out = model.apply({"params": params_c}, batch_c, key=sk)
        total, _ = elbo_loss(cfg, out, batch.adj, batch.features, batch.coords, 0.0)
        return acc + total, k

    timed_scan(fwd_elbo, (jnp.zeros(()), key), "fwd_elbo", results)

    def fwd_only(carry):
        acc, k = carry
        k, sk = jax.random.split(k)
        out = model.apply({"params": params_c}, batch_c, key=sk)
        return acc + jnp.sum(out.decoded.coords.astype(jnp.float32)), k

    timed_scan(fwd_only, (jnp.zeros(()), key), "fwd_only", results)

    # encoder in isolation
    def encode(carry):
        acc = carry
        stats = model.apply({"params": params_c}, batch_c, method=type(model).encode)
        return acc + jnp.sum(stats.mean_sg.astype(jnp.float32))

    timed_scan(encode, jnp.zeros(()), "encode", results)

    # decoder from fixed latents
    from snd_vae_tpu.models.outputs import Latents

    S = cfg.sampling_num
    latents = Latents(
        z_sg=jnp.zeros((B, S, cfg.encoder.sg_latent_size), cd),
        z_s=jnp.zeros((B, cfg.encoder.s_latent_size), cd),
        z_g=jnp.zeros((B, cfg.encoder.g_latent_size), cd),
    )

    def dec(carry):
        acc = carry
        out = model.apply({"params": params_c}, latents, method=type(model).decode)
        return acc + jnp.sum(out.coords.astype(jnp.float32))

    timed_scan(dec, jnp.zeros(()), "dec", results)

    # Adam alone on the real gradient pytree
    def loss_fn(p):
        pc = cast_float_leaves(p, cd)
        out = model.apply({"params": pc}, batch_c, key=key)
        total, _ = elbo_loss(cfg, out, batch.adj, batch.features, batch.coords, 0.0)
        return total

    grads = jax.grad(loss_fn)(state.params)

    def adam(carry):
        params, opt_state = carry
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state

    timed_scan(adam, (state.params, state.opt_state), "adam", results)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
