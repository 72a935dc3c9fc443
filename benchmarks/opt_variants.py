"""Full-train-step variants at the reference operating point (bf16).

Isolates the overhead suspects found by step_breakdown.py:

  base        the production step (per-leaf Adam, per-step param cast, RNG split)
  flat        optax.flatten(adam) -- one fused elementwise update over a single
              flat vector instead of ~8 tiny ops per param leaf (identical math)
  no_cast     params kept bf16 end-to-end (bounds the mixed-precision cast cost;
              NOT semantics-preserving -- informational only)
  no_rng      fixed epsilon instead of per-step split+normal (bounds RNG cost;
              informational only)

Same chained-scan + device_get fence as step_breakdown.py; all variants share
the per-iter scan/RTT offset so DIFFERENCES are the signal.

Run from /root/repo:  python benchmarks/opt_variants.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from snd_vae_tpu.config import synthetic2_preset
from snd_vae_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from snd_vae_tpu.data import loaders
from snd_vae_tpu.losses import elbo_loss
from snd_vae_tpu.train import init_state
from snd_vae_tpu.utils.tree import cast_float_leaves

REPS = 200


def timed_scan(fn, init, label, results):
    @jax.jit
    def prog(x):
        def body(c, _):
            return fn(c), ()

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    out = prog(init)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = prog(init)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / REPS
    results[label] = dt * 1e3
    print(f"{label:10s} {dt * 1e3:8.3f} ms/iter")


def main():
    cfg = synthetic2_preset(compute_dtype="bfloat16")
    B = cfg.train.batch_size
    data = loaders.load_dataset(cfg, "train", num_graphs=B)
    batch = data.slice_batch(0, B)
    model, state = init_state(cfg, data)
    cd = jnp.dtype(cfg.compute_dtype)
    batch_c = cast_float_leaves(batch, cd)
    key = jax.random.PRNGKey(0)
    lr = cfg.train.learning_rate

    results = {}

    def make_loss(params_caster, eps_key):
        def loss_fn(p, sk):
            pc = params_caster(p)
            out = model.apply({"params": pc}, batch_c, key=sk)
            total, _ = elbo_loss(cfg, out, batch.adj, batch.features, batch.coords, 0.0)
            return total

        return loss_fn

    cast = lambda p: cast_float_leaves(p, cd)
    loss_fn = make_loss(cast, None)

    # --- base: production semantics -------------------------------------
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state0 = opt.init(state.params)

    def base(carry):
        params, opt_state, k = carry
        k, sk = jax.random.split(k)
        grads = jax.grad(loss_fn)(params, sk)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, k

    timed_scan(base, (state.params, opt_state0, key), "base", results)

    # --- flat: optax.flatten(adam), identical math -----------------------
    fopt = optax.flatten(optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))
    fopt_state0 = fopt.init(state.params)

    def flat(carry):
        params, opt_state, k = carry
        k, sk = jax.random.split(k)
        grads = jax.grad(loss_fn)(params, sk)
        updates, opt_state = fopt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, k

    timed_scan(flat, (state.params, fopt_state0, key), "flat", results)

    # --- no_cast: params bf16 end-to-end (informational) ----------------
    params_bf = cast_float_leaves(state.params, cd)
    loss_bf = make_loss(lambda p: p, None)
    bopt_state0 = opt.init(params_bf)

    def no_cast(carry):
        params, opt_state, k = carry
        k, sk = jax.random.split(k)
        grads = jax.grad(loss_bf)(params, sk)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, k

    timed_scan(no_cast, (params_bf, bopt_state0, key), "no_cast", results)

    # --- no_rng: deterministic z (informational) -------------------------
    def loss_nornk(p):
        pc = cast(p)
        out = model.apply({"params": pc}, batch_c, key=key, deterministic_z=True)
        total, _ = elbo_loss(cfg, out, batch.adj, batch.features, batch.coords, 0.0)
        return total

    nopt_state0 = opt.init(state.params)

    def no_rng(carry):
        params, opt_state = carry
        grads = jax.grad(loss_nornk)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    timed_scan(no_rng, (state.params, nopt_state0), "no_rng", results)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
