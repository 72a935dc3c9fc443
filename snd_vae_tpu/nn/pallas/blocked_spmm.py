"""Pallas TPU kernels for the graph aggregation hot path — EXPERIMENTAL.

Status (measured, BASELINE.md "Pallas" / "Large-N scaling"): XLA's native
lowerings win at every shape tried — plain ``A @ X`` is bandwidth-bound and
XLA's dot matches the roofline at N=2048-8192; the fused motif kernel pads
the models' narrow hidden widths (20-50) to the 128-lane tile and loses
~7% end-to-end at N=256/512.  The round-3 rank-R reassociation
(nn/spatial_conv.py) additionally removed the f_ik tensor the motif kernel
consumes from the main path, so engaging it now costs an extra O(B·N²·h)
materialization.  The kernels stay as a bench/test-only experimentation
surface (op-level ``use_pallas=`` args and the
``nn.spatial_conv.force_pallas()`` override — there is no model config knob)
with their oracles and hardware tests; they are NOT part of the recommended
large-graph design (parallel/large_graph.py).

Two kernels:

  * ``blocked_adj_matmul`` — tiled ``A @ X`` (the GCN neighbor aggregation,
    reference layers.py:122) with an optionally fused leaky-ReLU epilogue.
    Blocks of A stream HBM->VMEM tile by tile and accumulate in a VMEM
    scratch in f32, so the op scales to node counts far beyond what a single
    [N,N] VMEM residency allows — the building block of the large-N sharded
    encoder (BASELINE.json config 5).

  * ``fused_motif_combine`` — the third-order motif combine of the factored
    SpatialGraphConv (layers.py:143-181 reformulated; see
    nn/spatial_conv.py):
        out[i,j,:] = A[i,j] * ( deg[j]*(a'[i]+d[i,j]) + v[j]
                                 + Σ_k A[j,k]·f[i,k,:] )
    computed per i-tile entirely in VMEM, so the O(N³)-FLOP term's
    [N,N,h] intermediate never round-trips HBM.

Both have XLA-einsum reference implementations used as oracles and as the
fallback on non-TPU backends / small shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# Blocked A @ X with fused activation
# ---------------------------------------------------------------------------

def _adj_matmul_kernel(a_ref, x_ref, o_ref, acc_ref, *, n_k: int, leak):
    """Grid (i, j, k): accumulate A[i-tile, k-tile] @ X[k-tile, j-tile]."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], x_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:]
        if leak is not None:
            acc = jnp.maximum(acc, leak * acc)
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "block_h", "leak", "interpret")
)
def blocked_adj_matmul(
    adj: jnp.ndarray,
    x: jnp.ndarray,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    block_h: int = 128,
    leak: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """[N,M] @ [M,H] (single graph) or batched via vmap.  ``leak`` fuses a
    leaky-ReLU epilogue (leak=0.2 reproduces lrelu, layers.py:112-113).

    Default blocks adapt to N: (256, 1024) for N>=2048 measured fastest on
    v5e (0.98 ms at N=8192 vs 1.95 ms with 128x128 blocks; XLA's native dot
    is still ~20% faster for a PLAIN A@X — this kernel earns its keep via
    the fused epilogue and VMEM-resident composition, see
    fused_motif_combine)."""
    if block_n is None:
        block_n = 256 if adj.shape[-2] >= 2048 else 128
    if block_k is None:
        block_k = 1024 if adj.shape[-1] >= 2048 else 128
    if adj.ndim == 3:
        fn = functools.partial(
            blocked_adj_matmul, block_n=block_n, block_k=block_k,
            block_h=block_h, leak=leak, interpret=interpret,
        )
        return jax.vmap(fn)(adj, x)

    n, m = adj.shape
    m2, h = x.shape
    assert m == m2, (adj.shape, x.shape)
    a_p = _pad_to(_pad_to(adj, 0, block_n), 1, block_k)
    x_p = _pad_to(_pad_to(x, 0, block_k), 1, block_h)
    N, M = a_p.shape
    H = x_p.shape[1]
    n_k = M // block_k

    out = pl.pallas_call(
        functools.partial(_adj_matmul_kernel, n_k=n_k, leak=leak),
        grid=(N // block_n, H // block_h, n_k),
        in_specs=[
            pl.BlockSpec((block_n, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_h), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, block_h), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_n, block_h), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * H,
            bytes_accessed=(N * M + M * H + N * H) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, x_p)
    return out[:n, :h]


def adj_matmul_reference(adj: jnp.ndarray, x: jnp.ndarray, leak: Optional[float] = None):
    """XLA fallback / oracle."""
    out = jnp.einsum("...nm,...mh->...nh", adj, x,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if leak is not None:
        out = jnp.maximum(out, leak * out)
    return out


# ---------------------------------------------------------------------------
# Fused third-order motif combine
# ---------------------------------------------------------------------------

def _motif_kernel(adj_ref, rows_ref, f_ref, a_ref, d_ref, v_ref, deg_ref,
                  o_ref, *, bi: int):
    """One i-tile (full j range) of the motif combine.

    Block shapes (leading singleton batch axis dropped via [0]):
      adj_ref  [1, N, N]    full adjacency
      rows_ref [1, bi, N]   the SAME adjacency, blocked along i — the i-tile's
                            mask rows A[i, :] with a static in-block index
                            (a dynamic row slice of adj_ref fails Mosaic
                            lowering at bf16: "cannot statically prove that
                            index ... is a multiple of 8")
      f_ref    [1, bi, N, h] f[i,k,:] for the i-tile
      a_ref    [1, bi, h]   a'[i] = a[i] + bias
      d_ref    [1, bi, N, h] d[i,j,:]
      v_ref    [1, N, h]    v[j]
      deg_ref  [1, N, 1]    deg[j] (kept 2D for VMEM layout)
      o_ref    [1, bi, N, h]
    """
    # accumulate in f32 regardless of the input dtype: better numerics, and
    # Mosaic cannot lower the row-vector [N] -> [N,1] reshape below for
    # 16-bit types ("insertion of minor dim ... only supported for 32-bit
    # types" at bf16 — hit at N=256 on v5e)
    adj = adj_ref[0]                                 # [N, N] (input dtype)
    v = v_ref[0].astype(jnp.float32)                 # [N, h]
    deg = deg_ref[0].astype(jnp.float32)             # [N, 1]
    for ii in range(bi):        # static unroll over the i-tile
        # wf[j, h] = Σ_k A[j,k] · f[i,k,h]
        wf = jnp.dot(adj, f_ref[0, ii], preferred_element_type=jnp.float32)
        a_d = (a_ref[0, ii][None, :] + d_ref[0, ii]).astype(jnp.float32)
        combine = deg * a_d + v + wf
        # mask by the i-th adjacency row A[i, j] (static index ii)
        row = rows_ref[0, ii, :].astype(jnp.float32)[:, None]
        o_ref[0, ii] = (row * combine).astype(o_ref.dtype)


def _auto_interpret() -> bool:
    """Pallas TPU kernels only compile on TPU backends (incl. the tunneled
    'axon' platform); everywhere else fall back to interpret mode."""
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("block_i", "interpret"))
def fused_motif_combine(
    adj: jnp.ndarray,
    a_i: jnp.ndarray,
    d_ij: jnp.ndarray,
    v_j: jnp.ndarray,
    f_ik: jnp.ndarray,
    bias: jnp.ndarray,
    block_i: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched motif combine:
    out[b,i,j,h] = A[b,i,j]*(deg[b,j]*(a_i[b,i,h]+d_ij[b,i,j,h]+bias[h])
                             + v_j[b,j,h] + Σ_k A[b,j,k]·f_ik[b,i,k,h]).

    N is padded to the f32 sublane/lane tile (8, 128); padded nodes have
    zero adjacency so their contributions vanish under the A[i,j] mask."""
    if interpret is None:
        interpret = _auto_interpret()
    B, N0, _ = adj.shape
    h0 = a_i.shape[-1]
    a_p = _pad_to(_pad_to(adj, 1, 128), 2, 128)
    N = a_p.shape[1]
    ai_p = _pad_to(_pad_to(a_i + bias, 1, block_i), 2, 128)
    d_p = _pad_to(_pad_to(_pad_to(d_ij, 1, block_i), 2, 128), 3, 128)
    v_p = _pad_to(_pad_to(v_j, 1, 128), 2, 128)
    f_p = _pad_to(_pad_to(_pad_to(f_ik, 1, block_i), 2, 128), 3, 128)
    H = ai_p.shape[-1]
    NI = ai_p.shape[1]
    deg = jnp.sum(a_p, axis=-1, keepdims=True)  # [B, N, 1]

    out = pl.pallas_call(
        functools.partial(_motif_kernel, bi=block_i),
        grid=(B, NI // block_i),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            # the same adjacency again, blocked along i: the i-tile's mask rows
            pl.BlockSpec((1, block_i, N), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_i, N, H), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_i, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_i, N, H), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_i, N, H), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NI, N, H), f_ik.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * NI * N * N * H,
            bytes_accessed=4 * B * (N * N + 3 * NI * N * H + N * H),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, a_p, f_p, ai_p, d_p, v_p, deg)
    return out[:, :N0, :N0, :h0]


def fused_motif_combine_reference(adj, a_i, d_ij, v_j, f_ik, bias):
    """XLA oracle for the motif combine."""
    deg = jnp.sum(adj, axis=-1)
    wf = jnp.einsum("bjk,bikh->bijh", adj, f_ik,
                    preferred_element_type=jnp.float32).astype(f_ik.dtype)
    out = (
        deg[:, None, :, None] * (a_i[:, :, None] + d_ij + bias)
        + v_j[:, None, :]
        + wf
    )
    return adj[..., None] * out


# ---------------------------------------------------------------------------
# Differentiable entry point: Pallas forward, XLA-derived backward
# ---------------------------------------------------------------------------

@jax.custom_vjp
def motif_combine(adj, a_i, d_ij, v_j, f_ik, bias):
    """Differentiable motif combine: the Pallas kernel on the forward pass,
    with the backward pass taken from the (mathematically identical) XLA
    reference formula — pallas_call has no automatic transpose rule, and the
    reference's VJP is itself plain matmuls that XLA fuses well."""
    return fused_motif_combine(adj, a_i, d_ij, v_j, f_ik, bias)


def _motif_fwd(adj, a_i, d_ij, v_j, f_ik, bias):
    out = fused_motif_combine(adj, a_i, d_ij, v_j, f_ik, bias)
    return out, (adj, a_i, d_ij, v_j, f_ik, bias)


def _motif_bwd(res, g):
    primals = res
    _, vjp = jax.vjp(fused_motif_combine_reference, *primals)
    return vjp(g)


motif_combine.defvjp(_motif_fwd, _motif_bwd)
