"""Numeric check of fused_motif_combine on the REAL TPU against the XLA
oracle, in f32 and bf16 at N=40/256.

The CPU unit tests (tests/test_pallas.py) exercise only interpret mode; the
Mosaic hardware path has its own lowering constraints (16-bit minor-dim
reshapes, dynamic-slice alignment proofs) that this script regression-checks
on the actual chip.  Run: python benchmarks/pallas_tpu_check.py"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from snd_vae_tpu.nn.pallas.blocked_spmm import (fused_motif_combine, fused_motif_combine_reference)

for dtype in (jnp.float32, jnp.bfloat16):
    for N in (40, 256):
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 5)
        B, h = 2, 16
        adj = (jax.random.uniform(ks[0], (B, N, N)) < 0.1).astype(dtype)
        adj = jnp.triu(adj, 1); adj = adj + adj.transpose(0, 2, 1)
        a_i = jax.random.normal(ks[1], (B, N, h), dtype)
        d_ij = jax.random.normal(ks[2], (B, N, N, h), dtype)
        v_j = jax.random.normal(ks[3], (B, N, h), dtype)
        f_ik = jax.random.normal(ks[4], (B, N, N, h), dtype)
        bias = jnp.zeros((h,), dtype)
        got = np.asarray(jax.device_get(fused_motif_combine(adj, a_i, d_ij, v_j, f_ik, bias)), np.float32)
        want = np.asarray(jax.device_get(fused_motif_combine_reference(adj, a_i, d_ij, v_j, f_ik, bias)), np.float32)
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        print(f"dtype={dtype.__name__} N={N}: rel_err={err:.2e}", flush=True)
        assert err < (1e-5 if dtype == jnp.float32 else 2e-2), "MISMATCH"
print("pallas TPU numeric check ok")
