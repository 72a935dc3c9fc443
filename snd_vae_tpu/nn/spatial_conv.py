"""Spatial-motif graph convolutions — the framework's hot ops.

The reference's ``SpatialGraphConvolution`` (layers.py:143-198) materializes
``[B,N,N,N,·]`` tensors of node-feature / relation triples, pushes them
through a dense layer, and contracts against the 2-hop motif mask
``adj_3d[i,j,k] = A[i,j]·A[j,k]`` — O(B·N³·h) compute *and memory*.  The
fourth-order ``SpatialGraphConvolution_3D`` (layers.py:200-277) does the same
one order higher at O(B·N⁴·h).

TPU-native reformulation
------------------------
Leaky-ReLU is elementwise, so it distributes over the feature concat, and the
first dense layer is a block matrix product over the concat slices.  The
masked motif sum therefore factors exactly into per-node terms, per-pair
terms, and two chained masked matmuls:

  m3_sum[i,j] = A[i,j] ⊙ ( deg[j]·(aᵢ + bⱼ + d_ij + bias)
                           + (A @ c)[j]                 # neighbor features
                           + Σ_k A[j,k]·e[j,k]          # masked row-sum
                           + Σ_k A[j,k]·f[i,k] )        # the N³ matmul

with a = φ(x)@M1[0:F], b = φ(x)@M1[F:2F], c = φ(x)@M1[2F:3F],
d/e/f = φ(rel)@M1-slices, φ = lrelu.  This is numerically identical to the
reference formula (block-matmul identity) but needs only O(B·N²·h) memory,
and every contraction is a batched matmul the MXU executes directly.

Rank-R reassociation (round 3).  Every masked node-sum over a term that is
LINEAR in its R-channel input contracts against that input FIRST, with the
R→h weight matmul applied to the contracted result:

  Σ_k A[j,k]·(φ(rel)[i,k,:]@M1f) = (Σ_k A[j,k]·φ(rel)[i,k,:])@M1f

so the single O(B·N³·h) term becomes an O(B·N³·R) contraction — for R=1 a
pure batched [N,N]x[N,N] matmul with no narrow-h lane padding — plus an
O(B·N²·R·h) projection, an h/R-fold FLOP cut on the dominant term.  The
same identity (linearity in the WEIGHTS, so it also applies to the
nonlinear φ(m3_sum) slice) collapses the entire level-2 pair sum to per-
node contractions; the e/f/s/t pairwise tensors are never materialized.
The fourth-order variant factors identically one level deeper — its
O(B·N³·h0·h1) φ(m4_sum) projection reorders to an O(B·N³·h0) masked sum
followed by an O(B·N²·h0·h1) matmul, and the [B,N,N,N,h1] t_ijk tensor
(previously the 3D path's largest) disappears.  All reassociations are
exact in exact arithmetic; the float64 oracle tests pin them at rtol 1e-9.

Blocked streamed lowering (rounds 4-5).  ``block_rows`` streams the
pairwise tensors one i-row block at a time under a checkpointed
``lax.scan`` (``_blocked_nt``; fourth-order: ``_blocked_nt_3d``), bounding
the live set to a small multiple of one [B,block,N,(N,)h] slab by
construction.  i-blocking does not reassociate any sum (the j/k/p
reductions are row-local), so the result is float64-oracle equal to the
dense reference formula.  Measured on the v5e (BASELINE.md, 2026-08-20):
for the third-order family it is a MEMORY lever only — at N=1536 it bounds
the live set but moves the 8 s step -0.6% (the slowdown there is intrinsic
to the single-chip shape; the throughput lever is the node-sharded mesh) —
while for the fourth-order 3D family it is a measured throughput WIN
(-21%/-19% at N=192/256, block 64).

Dense oracle implementations that replicate the reference's materialization
literally are provided for testing (``*_dense_oracle``); the unit tests
assert exact agreement.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as inits
from .basic import lrelu
from .ckpt import tag
from ..parallel.hints import shard_nodes


def _f32(x):
    return x.astype(jnp.float32)


# Bench/test-only override: engage the retired fused Pallas motif kernel in a
# FULL model without any model-config plumbing (the kernel lost at every
# measured shape and post-rank-R would add an O(B·N²·h) f_ik materialization,
# so the flagship carries no knob for it — VERDICT r3 item 8).  Used by
# benchmarks/large_graph_bench.py::bench_full_train_pallas to keep the
# crossover experiment reproducible.
_FORCE_PALLAS = False


class force_pallas:
    """Context manager: route every spatial_graph_conv through the fused
    Pallas kernel.  Experimentation surface only — never used by the models
    or the CLI."""

    def __enter__(self):
        global _FORCE_PALLAS
        self._prev = _FORCE_PALLAS
        _FORCE_PALLAS = True

    def __exit__(self, *exc):
        global _FORCE_PALLAS
        _FORCE_PALLAS = self._prev


def _acc_dtype(dt):
    """MXU accumulation dtype: f32 for low-precision inputs, the input dtype
    otherwise (keeps float64 oracle tests exact)."""
    return jnp.float32 if dt in (jnp.bfloat16, jnp.float16) else dt



# ---------------------------------------------------------------------------
# Third-order (2D datasets) — reference layers.py:143-198
# ---------------------------------------------------------------------------

class SpatialGraphConv(nn.Module):
    """Third-order spatial-motif conv, factored form.

    Args at call: adj [B,N,N], x [B,N,F], rel [B,N,N,R].
    Params mirror the reference exactly:
      Matrix1 [3F+3R, h0], Matrix2 [2F+R+h0, h1], Matrix3 [F+h1, h2]
    (for R=1 these are the reference's 3F+2R+1 / 2F+h0+R / F+h1 shapes,
    layers.py:158-169), biases init to ``bias_start``.
    Output [B,N,h2], linear (the model applies lrelu after BN, model.py:146).
    """

    hidden: Tuple[int, int, int]
    stddev: float = 0.02
    bias_start: float = 0.0
    use_pallas: bool = False
    block_rows: Optional[int] = None

    @nn.compact
    def __call__(self, adj: jnp.ndarray, x: jnp.ndarray, rel: jnp.ndarray) -> jnp.ndarray:
        F, R = x.shape[-1], rel.shape[-1]
        h0, h1, h2 = self.hidden
        m1 = self.param("Matrix1", inits.normal(self.stddev), (3 * F + 3 * R, h0))
        b1 = self.param("bias1", nn.initializers.constant(self.bias_start), (h0,))
        m2 = self.param("Matrix2", inits.normal(self.stddev), (2 * F + R + h0, h1))
        b2 = self.param("bias2", nn.initializers.constant(self.bias_start), (h1,))
        m3 = self.param("Matrix3", inits.normal(self.stddev), (F + h1, h2))
        b3 = self.param("bias3", nn.initializers.constant(self.bias_start), (h2,))
        return spatial_graph_conv(
            adj, x, rel, dict(Matrix1=m1, bias1=b1, Matrix2=m2, bias2=b2,
                              Matrix3=m3, bias3=b3),
            use_pallas=self.use_pallas,
            block_rows=self.block_rows,
        )


def spatial_graph_conv(adj, x, rel, params, use_pallas: bool = False,
                       block_rows: Optional[int] = None) -> jnp.ndarray:
    """Functional factored third-order conv (see module docstring).

    Rank-R reassociation (round 3): every [B,N,N,h] tensor that is LINEAR in
    φ(rel) — the e/f slices at level 3 and the s slice at level 2 — has its
    masked node-sum contracted against the R-channel φ(rel) FIRST, with the
    tiny R→h weight matmul applied to the contracted result:

        Σ_k A[j,k]·(φ(rel)[i,k,:] @ M1f)  =  (Σ_k A[j,k]·φ(rel)[i,k,:]) @ M1f

    Exact by linearity (float64-oracle-tested), and the dominant N³
    contraction drops from O(B·N³·h) to O(B·N³·R) — for R=1 a pure batched
    [N,N]x[N,N] matmul with no narrow-h lane padding — while the e_jk, f_ik,
    s_ij, t_ij residuals are never materialized.  The same reassociation
    collapses the level-2 sum: Σ_j A[i,j]·(φ(m3)[i,j,:] @ M2t) contracts the
    masked j-sum over φ(m3_sum) before the h0→h1 matmul.  Only m3_sum and
    d_ij remain at [B,N,N,·] (the lrelu between levels blocks factoring
    through m3_sum; d_ij sits inside the mask additively)."""
    F, R = x.shape[-1], rel.shape[-1]
    m1, b1 = params["Matrix1"], params["bias1"]
    m2, b2 = params["Matrix2"], params["bias2"]
    m3, b3 = params["Matrix3"], params["bias3"]
    dt = x.dtype
    acc = _acc_dtype(dt)
    use_pallas = use_pallas or _FORCE_PALLAS

    phi_x = lrelu(x)          # [B,N,F]
    phi_r = lrelu(rel)        # [B,N,N,R]
    dot = lambda t, w: jnp.einsum(
        "...f,fo->...o", t, w, preferred_element_type=acc
    ).astype(dt)

    # --- level 3: masked motif sum --------------------------------------
    a_i = dot(phi_x, m1[0:F])               # φ(x_i)@M1a      [B,N,h0]
    b_j = dot(phi_x, m1[F : 2 * F])         # φ(x_j)@M1b      [B,N,h0]
    # neighbour sums of the raw inputs, reused across levels
    # (Σ_k A[j,k]·φ(x_k) and Σ_k A[j,k]·φ(rel)[j,k,:])
    nx = jnp.einsum("bjk,bkf->bjf", adj, phi_x,
                    preferred_element_type=acc).astype(dt)      # [B,N,F]
    nr = jnp.einsum("bjk,bjkr->bjr", adj, phi_r,
                    preferred_element_type=acc).astype(dt)      # [B,N,R]

    deg = jnp.sum(adj, axis=-1)                          # [B,N]
    neigh_c = dot(nx, m1[2 * F : 3 * F])                 # Σ_k A[j,k]·c_k
    ve = dot(nr, m1[3 * F + R : 3 * F + 2 * R])          # Σ_k A[j,k]·e_jk
    if block_rows is not None and not use_pallas:
        # blocked streamed lowering (see _blocked_nt): produce and consume
        # the level-3 pairwise tensors one i-row block at a time under
        # lax.scan, so the live set is bounded by the block size by
        # construction and XLA never enters the memory-pressure serialized
        # regime measured at N>=1536 (BASELINE.md "Frontier, post-rank-R").
        nt = _blocked_nt(adj, phi_r, a_i, b_j, neigh_c + ve, deg, m1, b1,
                         F, R, block_rows, acc, dt)
    else:
        # d_ij is additive inside the mask, so it stays pairwise ([B,N,N,h0],
        # node-sharding hint: first node axis over the mesh's 'model' axis)
        d_ij = tag(shard_nodes(dot(phi_r, m1[3 * F : 3 * F + R]),
                               tag="sgc.d_ij"), "sgc.d_ij")
        if use_pallas:
            # fused Pallas kernel: the N³ matmul + combine + mask in one VMEM
            # pass (nn/pallas/blocked_spmm.py); j-only terms fold into v_j.
            # The kernel consumes the pre-projected f_ik (the pre-reassociation
            # formulation — identical values)
            from .pallas import motif_combine

            f_ik = shard_nodes(dot(phi_r, m1[3 * F + 2 * R :]), tag="sgc.f_ik")
            v_combined = deg[..., None] * b_j + neigh_c + ve
            m3_sum = motif_combine(adj, a_i, d_ij, v_combined, f_ik, b1)
        else:
            # the N³ term: Σ_k A[j,k]·f[i,k] with f = φ(rel)@M1f, reassociated —
            # contract the mask against the R-channel φ(rel) (a square batched
            # matmul for R=1), then project R→h0.  Comm-free under node sharding
            # (adj replicated, rf/output row-blocked on i).
            rf = tag(shard_nodes(
                jnp.einsum("bjk,bikr->bijr", adj, phi_r,
                           preferred_element_type=acc).astype(dt),
                tag="sgc.rf"), "sgc.rf")                     # [B,N,N,R]
            wf = tag(dot(rf, m1[3 * F + 2 * R :]), "sgc.wf")  # [B,N,N,h0]
            m3_sum = (
                deg[:, None, :, None] * (a_i[:, :, None] + b_j[:, None, :] + d_ij + b1)
                + (neigh_c + ve)[:, None, :]
                + wf
            )
            m3_sum = adj[..., None] * m3_sum                 # A[i,j] mask  [B,N,N,h0]
            m3_sum = tag(shard_nodes(m3_sum, tag="sgc.m3_sum"), "sgc.m3_sum")
        nt = jnp.einsum("bij,bijh->bih", adj, lrelu(m3_sum),
                        preferred_element_type=acc).astype(dt)  # [B,N,h0]

    # --- level 2: masked pair sum, fully reassociated --------------------
    #   m2_sum[i] = Σ_j A[i,j]·(p_i + q_j + s_ij + t_ij + b2)
    # with s = φ(rel)@M2s and t = φ(m3_sum)@M2t: contract the masked j-sum
    # against φ(rel) (= nr, reused) and φ(m3_sum) first, then project.
    p_i = dot(phi_x, m2[0:F])                            # [B,N,h1]
    nq = dot(nx, m2[F : 2 * F])                          # Σ_j A[i,j]·q_j
    m2_sum = (
        deg[..., None] * (p_i + b2)
        + nq
        + dot(nr, m2[2 * F : 2 * F + R])
        + dot(nt, m2[2 * F + R :])
    )
    m2_sum = shard_nodes(m2_sum, tag="sgc.m2_sum")

    # --- level 1: per-node update ---------------------------------------
    out = (
        dot(phi_x, m3[0:F])
        + dot(lrelu(m2_sum), m3[F:])
        + b3
    )
    return out


def _blocked_nt(adj, phi_r, a_i, b_j, neigh_j, deg, m1, b1, F, R,
                block_rows: int, acc, dt) -> jnp.ndarray:
    """Blocked streamed level-3: nt[i] = Σ_j A[i,j]·φ(m3_sum[i,j]) computed
    one i-row block at a time under ``lax.scan``.

    Identical arithmetic to the unblocked rank-R path (the j/k sums are
    row-local, so i-blocking does not reassociate anything — float64-oracle
    tested), but the [B,Nb,N,·] pairwise tensors (d_ij / rf / wf / m3_sum)
    live only inside one checkpointed scan iteration: the forward saves only
    the [B,Nb,h0] block outputs and the backward recomputes each block's
    internals in turn, so the program's live set is a small multiple of one
    block by construction.  Measured at N=1536 (BASELINE.md "Round-5
    verdict on the blocked streamed lowering"): the bounded live set moves
    the step -0.6% — the N>=1536 slowdown is intrinsic to the single-chip
    shape, not memory pressure, so for the third-order family this is a
    memory lever for configs that genuinely OOM, not a throughput lever;
    the node-sharded mesh path (unblocked form with shard_nodes hints) is
    the measured throughput escape."""
    B, N = adj.shape[0], adj.shape[1]
    if N % block_rows != 0:
        raise ValueError(
            f"motif block_rows={block_rows} must divide num_nodes={N}"
        )
    nb = N // block_rows
    h0 = m1.shape[1]
    m1_d = m1[3 * F : 3 * F + R]
    m1_f = m1[3 * F + 2 * R :]

    dot = lambda t, w: jnp.einsum(
        "...f,fo->...o", t, w, preferred_element_type=acc
    ).astype(dt)

    # block the i axis: [B,N,...] -> [nb, B, block_rows, ...]
    blk = lambda t: jnp.moveaxis(
        t.reshape((t.shape[0], nb, block_rows) + t.shape[2:]), 1, 0
    )
    xs = (blk(phi_r), blk(a_i), blk(adj))

    def body(carry, inp):
        pr, ai, adjb = inp      # [B,Nb,N,R], [B,Nb,h0], [B,Nb,N]
        d_ij = dot(pr, m1_d)                                  # [B,Nb,N,h0]
        rf = jnp.einsum("bjk,bikr->bijr", adj, pr,
                        preferred_element_type=acc).astype(dt)  # [B,Nb,N,R]
        wf = dot(rf, m1_f)                                    # [B,Nb,N,h0]
        m3 = (
            deg[:, None, :, None] * (ai[:, :, None] + b_j[:, None, :] + d_ij + b1)
            + neigh_j[:, None, :]
            + wf
        )
        m3 = adjb[..., None] * m3
        nt_blk = jnp.einsum("bij,bijh->bih", adjb, lrelu(m3),
                            preferred_element_type=acc).astype(dt)
        return carry, nt_blk

    _, nts = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), None, xs
    )                                                          # [nb,B,Nb,h0]
    return jnp.moveaxis(nts, 0, 1).reshape(B, N, h0)


def spatial_graph_conv_dense_oracle(adj, x, rel, params) -> jnp.ndarray:
    """Literal re-materialization of the reference formula
    (layers.py:143-198) for correctness testing.  O(B·N³·h) memory —
    only for tiny shapes."""
    B, N, F = x.shape
    R = rel.shape[-1]
    m1, b1 = params["Matrix1"], params["bias1"]
    m2, b2 = params["Matrix2"], params["bias2"]
    m3, b3 = params["Matrix3"], params["bias3"]

    xi = jnp.broadcast_to(x[:, :, None, None, :], (B, N, N, N, F))
    xj = jnp.broadcast_to(x[:, None, :, None, :], (B, N, N, N, F))
    xk = jnp.broadcast_to(x[:, None, None, :, :], (B, N, N, N, F))
    rij = jnp.broadcast_to(rel[:, :, :, None, :], (B, N, N, N, R))
    rjk = jnp.broadcast_to(rel[:, None, :, :, :], (B, N, N, N, R))
    rik = jnp.broadcast_to(rel[:, :, None, :, :], (B, N, N, N, R))
    m3_in = jnp.concatenate([xi, xj, xk, rij, rjk, rik], axis=-1)
    m3t = jnp.einsum("bijkf,fh->bijkh", lrelu(m3_in), m1) + b1
    adj3 = adj[:, :, :, None] * adj[:, None, :, :]
    m3_sum = jnp.einsum("bijkh,bijk->bijh", m3t, adj3)

    xi2 = jnp.broadcast_to(x[:, :, None, :], (B, N, N, F))
    xj2 = jnp.broadcast_to(x[:, None, :, :], (B, N, N, F))
    m2_in = jnp.concatenate([xi2, xj2, rel, m3_sum], axis=-1)
    m2t = jnp.einsum("bijf,fh->bijh", lrelu(m2_in), m2) + b2
    m2_sum = jnp.einsum("bijh,bij->bih", m2t, adj)

    m1_in = jnp.concatenate([x, m2_sum], axis=-1)
    return jnp.einsum("bif,fh->bih", lrelu(m1_in), m3) + b3


# ---------------------------------------------------------------------------
# Fourth-order (3D datasets: protein/mnist) — reference layers.py:200-277
# ---------------------------------------------------------------------------

class SpatialGraphConv3D(nn.Module):
    """Fourth-order spatial-motif conv, factored to O(B·N³·h) memory.

    Params mirror the reference (layers.py:210-225):
      Matrix0 [4F+5R, h0], Matrix1 [3F+2R+h0+R, h1], Matrix2 [2F+R+h1, h2],
      Matrix3 [F+h2, h3]  (for R=1: the 4F+3R+2 / 3F+2R+h0+1 / ... shapes).
    ``fully_connected=True`` gives the `_full` variant (layers.py:279-359):
    masks replaced by all-ones and rel:=concat(rel, adj).
    """

    hidden: Tuple[int, int, int, int]
    stddev: float = 0.02
    bias_start: float = 0.0
    fully_connected: bool = False
    block_rows: Optional[int] = None

    @nn.compact
    def __call__(self, adj: jnp.ndarray, x: jnp.ndarray, rel: jnp.ndarray) -> jnp.ndarray:
        if self.fully_connected:
            dis = rel
            rel = jnp.concatenate([rel, adj[..., None]], axis=-1)
        else:
            dis = rel
        F = x.shape[-1]
        R = rel.shape[-1]
        Rd = dis.shape[-1]
        h0, h1, h2, h3 = self.hidden
        m0 = self.param("Matrix0", inits.normal(self.stddev), (4 * F + 3 * R + 2 * Rd, h0))
        b0 = self.param("bias0", nn.initializers.constant(self.bias_start), (h0,))
        m1 = self.param("Matrix1", inits.normal(self.stddev), (3 * F + 2 * R + h0 + Rd, h1))
        b1 = self.param("bias1", nn.initializers.constant(self.bias_start), (h1,))
        m2 = self.param("Matrix2", inits.normal(self.stddev), (2 * F + R + h1, h2))
        b2 = self.param("bias2", nn.initializers.constant(self.bias_start), (h2,))
        m3 = self.param("Matrix3", inits.normal(self.stddev), (F + h2, h3))
        b3 = self.param("bias3", nn.initializers.constant(self.bias_start), (h3,))
        params = dict(Matrix0=m0, bias0=b0, Matrix1=m1, bias1=b1,
                      Matrix2=m2, bias2=b2, Matrix3=m3, bias3=b3)
        return spatial_graph_conv_3d(
            adj, x, rel, dis, params, fully_connected=self.fully_connected,
            block_rows=self.block_rows,
        )


def spatial_graph_conv_3d(adj, x, rel, dis, params, fully_connected=False,
                          block_rows: Optional[int] = None) -> jnp.ndarray:
    """Functional factored fourth-order conv.

    ``rel`` feeds the chain relations (r_ij, r_jk, r_kp); ``dis`` feeds the
    skip distances (d_ik, d_ip) — identical arrays for the standard variant,
    distinct for the `_full` variant (layers.py:287-289).

    ``block_rows`` engages the blocked streamed lowering one order deeper
    than the third-order op's (_blocked_nt): the O(B·N³·h0) ``m4_sum`` —
    the 3D family's largest live tensor — and every level-4/3 pairwise
    tensor are produced and consumed one i-row block at a time under a
    checkpointed ``lax.scan`` (``_blocked_nt_3d``), bounding the live set
    to ~[B,block,N,N,h0] by construction.  i-blocking reassociates nothing
    (the j/k/p reductions are row-local), so it is float64-oracle equal to
    the dense reference formula (layers.py:200-277).
    """
    B, N, F = x.shape
    R = rel.shape[-1]
    Rd = dis.shape[-1]
    m0, b0 = params["Matrix0"], params["bias0"]
    m1, b1 = params["Matrix1"], params["bias1"]
    m2, b2 = params["Matrix2"], params["bias2"]
    m3, b3 = params["Matrix3"], params["bias3"]
    h0 = m0.shape[1]
    dt = x.dtype

    if fully_connected:
        mask = jnp.ones_like(adj)
    else:
        mask = adj
    deg = jnp.sum(mask, axis=-1)  # [B,N]
    acc = _acc_dtype(dt)

    phi_x = lrelu(x)
    phi_r = lrelu(rel)
    phi_d = lrelu(dis)
    dot = lambda t, w: jnp.einsum(
        "...f,fo->...o", t, w, preferred_element_type=acc
    ).astype(dt)

    # neighbour sums of the raw inputs, reused at every level (the rank-R
    # reassociation — see spatial_graph_conv: masked node-sums contract
    # against the R-channel inputs BEFORE the tiny R→h weight matmuls;
    # exact by linearity, float64-oracle-tested):
    #   mx[b,k,:]    = Σ_p mask[k,p]·φ(x_p)
    #   nr4[b,k,:]   = Σ_p mask[k,p]·φ(rel)[k,p,:]
    #   nd4[b,i,k,:] = Σ_p mask[k,p]·φ(dis)[i,p,:]   (the N³ contraction,
    #                  O(B·N³·Rd) instead of O(B·N³·h))
    mx = jnp.einsum("bkp,bpf->bkf", mask, phi_x,
                    preferred_element_type=acc).astype(dt)      # [B,N,F]
    nr4 = jnp.einsum("bkp,bkpr->bkr", mask, phi_r,
                     preferred_element_type=acc).astype(dt)     # [B,N,R]

    # weight slices (reference column order, layers.py:210-225)
    o = 0
    m0_a = m0[o : o + F]; o += F                     # x_i
    m0_b = m0[o : o + F]; o += F                     # x_j
    m0_c = m0[o : o + F]; o += F                     # x_k
    m0_p = m0[o : o + F]; o += F                     # x_p  (applied to mx)
    m0_u = m0[o : o + R]; o += R                     # r_ij
    m0_v = m0[o : o + R]; o += R                     # r_jk
    m0_w = m0[o : o + R]; o += R                     # r_kp (applied to nr4)
    m0_y = m0[o : o + Rd]; o += Rd                   # d_ik
    m0_z = m0[o : o + Rd]; o += Rd                   # d_ip (applied to nd4)
    o = 0
    m1_ci = m1[o : o + F]; o += F                    # x_i
    m1_cj = m1[o : o + F]; o += F                    # x_j
    m1_ck = m1[o : o + F]; o += F                    # x_k  (applied to mx)
    m1_gij = m1[o : o + R]; o += R                   # r_ij
    m1_gjk = m1[o : o + R]; o += R                   # r_jk (applied to nr4)
    m1_gik = m1[o : o + Rd]; o += Rd                 # d_ik (applied to nd4)
    w_m4 = m1[o:]                                    # φ(m4_sum) slice  [h0,h1]

    # --- level 4: Σ_p mask4[i,j,k,p]·(φ(concat)@M0 + b0), factored ------
    # m4_sum[i,j,k] = mask[i,j]·mask[j,k]·(deg[k]·(aᵢ+aⱼ+u_ij+a_k+v_jk+y_ik+b0)
    #                                       + P[k] + Vw[k] + Wz[i,k])
    a_i = dot(phi_x, m0_a)
    a_j = dot(phi_x, m0_b)
    a_k = dot(phi_x, m0_c)
    P = dot(mx, m0_p)                                # Σ_p M[k,p]·a_p   [B,N,h0]
    Vw = dot(nr4, m0_w)                              # Σ_p M[k,p]·w_kp  [B,N,h0]
    v_jk = dot(phi_r, m0_v)                                             # [B,N,N,h0]
    beta_jk = deg[:, None, :, None] * (a_j[:, :, None] + v_jk)          # [B,N,N,h0]
    gamma_k = deg[..., None] * (a_k + b0) + P + Vw                      # [B,N,h0]
    # level-3 per-node/pair pieces shared by both lowerings
    c_i = dot(phi_x, m1_ci)
    c_j = dot(phi_x, m1_cj)
    neigh_ck = dot(mx, m1_ck)                        # Σ_k M[j,k]·c_k
    vg = dot(nr4, m1_gjk)                            # Σ_k M[j,k]·g_jk

    if block_rows is not None:
        # blocked streamed lowering (see _blocked_nt_3d): the O(B·N³·h0)
        # m4_sum and every i-indexed pairwise tensor live only inside one
        # checkpointed scan iteration.
        nt = _blocked_nt_3d(
            mask, phi_r, phi_d, a_i, c_i, beta_jk, gamma_k, c_j,
            neigh_ck + vg, deg, m0_u, m0_y, m0_z, m1_gij, m1_gik, w_m4,
            b0, b1, block_rows, acc, dt,
        )                                                      # [B,N,h1]
    else:
        nd4 = tag(shard_nodes(
            jnp.einsum("bkp,bipr->bikr", mask, phi_d,
                       preferred_element_type=acc).astype(dt),
            tag="sgc3d.nd4"), "sgc3.nd4")                       # [B,N,N,Rd]
        u_ij = dot(phi_r, m0_u)                                 # [B,N,N,h0]
        y_ik = dot(phi_d, m0_y)                                 # [B,N,N,h0]
        Wz = dot(nd4, m0_z)                          # Σ_p M[k,p]·z_ip  [B,N,N,h0]
        alpha_ik = deg[:, None, :, None] * (a_i[:, :, None] + y_ik) + Wz

        m4_sum = (
            deg[:, None, None, :, None] * u_ij[:, :, :, None, :]
            + alpha_ik[:, :, None, :, :]
            + beta_jk[:, None, :, :, :]
            + gamma_k[:, None, None, :, :]
        )                                                               # [B,N,N,N,h0]
        mask3 = mask[:, :, :, None] * mask[:, None, :, :]               # [i,j]·[j,k]
        m4_sum = m4_sum * mask3[..., None]
        # the O(N³·h) tensor dominates 3D-family memory; row-block it on i
        # over the mesh's 'model' axis (identity without an ambient mesh)
        m4_sum = tag(shard_nodes(m4_sum, tag="sgc3d.m4_sum"), "sgc3.m4_sum")

        # --- level 3: Σ_k mask3[i,j,k]·(φ(concat(x_i,x_j,x_k,r_ij,r_jk,
        #     d_ik,m4_sum))@M1 + b1).  The φ(m4_sum) slice is nonlinear in
        #     m4_sum, but its masked k-sum still contracts BEFORE the h0→h1
        #     weight matmul (linearity in the weights):
        #     Σ_k M[j,k]·(φ(m4)[i,j,k,:]@W) = (Σ_k M[j,k]·φ(m4)[i,j,k,:])@W
        #     — the [B,N,N,N,h1] t_ijk tensor (the 3D path's largest) is
        #     never materialized.
        tm = tag(jnp.einsum("bijkh,bjk->bijh", lrelu(m4_sum), mask,
                            preferred_element_type=acc).astype(dt),
                 "sgc3.tm")                          # Σ_k M[j,k]·φ(m4)  [B,N,N,h0]
        t_sum = dot(tm, w_m4)                                           # [B,N,N,h1]
        g_ij = dot(phi_r, m1_gij)
        wg = dot(nd4, m1_gik)                        # Σ_k M[j,k]·g_ik   [B,N,N,h1]

        m3_sum = (
            deg[:, None, :, None] * (c_i[:, :, None] + c_j[:, None, :] + g_ij + b1)
            + (neigh_ck + vg)[:, None, :]
            + wg
            + t_sum
        )
        m3_sum = mask[..., None] * m3_sum                               # [B,N,N,h1]
        m3_sum = tag(shard_nodes(m3_sum, tag="sgc3d.m3_sum"), "sgc3.m3_sum")
        nt = jnp.einsum("bij,bijh->bih", mask, lrelu(m3_sum),
                        preferred_element_type=acc).astype(dt)  # [B,N,h1]

    # --- level 2: fully reassociated as in the third-order op ------------
    o = 0
    p_i = dot(phi_x, m2[o : o + F]); o += F
    m2_q = m2[o : o + F]; o += F                     # x_j  (applied to mx)
    m2_s = m2[o : o + R]; o += R                     # r_ij (applied to nr4)
    m2_t = m2[o:]                                    # φ(m3_sum) slice
    m2_sum = (
        deg[..., None] * (p_i + b2)
        + dot(mx, m2_q)
        + dot(nr4, m2_s)
        + dot(nt, m2_t)
    )

    # --- level 1 ---------------------------------------------------------
    return dot(phi_x, m3[0:F]) + dot(lrelu(m2_sum), m3[F:]) + b3


def _blocked_nt_3d(mask, phi_r, phi_d, a_i, c_i, beta_jk, gamma_k, c_j,
                   neigh_j, deg, m0_u, m0_y, m0_z, m1_gij, m1_gik, w_m4,
                   b0, b1, block_rows: int, acc, dt) -> jnp.ndarray:
    """Blocked streamed levels 4+3 of the fourth-order conv:
    nt[i] = Σ_j mask[i,j]·φ(m3_sum[i,j]) computed one i-row block at a time
    under ``lax.scan`` — the third-order ``_blocked_nt`` pattern one level
    deeper (VERDICT r4 weak #7).

    Identical arithmetic to the unblocked rank-R path (every j/k/p reduction
    is i-row-local, so i-blocking reassociates nothing — float64-oracle
    tested); the O(B·N³·h0) ``m4_sum`` — the 3D family's largest live tensor
    — plus nd4/Wz/y_ik/u_ij/wg/g_ij/tm/m3_sum exist only as one
    [B,Nb,N,(N,)·] slab inside a checkpointed scan iteration, so the live
    set is bounded by the block size by construction.  Only the [B,N,N,h0]
    beta_jk (i-independent) stays resident across iterations.  Single-chip
    lever; the node-sharded mesh path uses the unblocked form with
    shard_nodes hints instead."""
    B, N = mask.shape[0], mask.shape[1]
    if N % block_rows != 0:
        raise ValueError(
            f"motif block_rows={block_rows} must divide num_nodes={N}"
        )
    nb = N // block_rows
    h1 = w_m4.shape[1]

    dot = lambda t, w: jnp.einsum(
        "...f,fo->...o", t, w, preferred_element_type=acc
    ).astype(dt)

    # block the i axis: [B,N,...] -> [nb, B, block_rows, ...]
    blk = lambda t: jnp.moveaxis(
        t.reshape((t.shape[0], nb, block_rows) + t.shape[2:]), 1, 0
    )
    xs = (blk(phi_r), blk(phi_d), blk(a_i), blk(c_i), blk(mask))

    def body(carry, inp):
        pr, pd, ai, ci, mb = inp  # [B,Nb,N,R],[B,Nb,N,Rd],[B,Nb,h0],[B,Nb,h1],[B,Nb,N]
        # level 4, i-block rows
        nd4 = jnp.einsum("bkp,bipr->bikr", mask, pd,
                         preferred_element_type=acc).astype(dt)  # [B,Nb,N,Rd]
        u_ij = dot(pr, m0_u)                                     # [B,Nb,N,h0]
        y_ik = dot(pd, m0_y)                                     # [B,Nb,N,h0]
        Wz = dot(nd4, m0_z)                                      # [B,Nb,N,h0]
        alpha_ik = deg[:, None, :, None] * (ai[:, :, None] + y_ik) + Wz
        m4 = (
            deg[:, None, None, :, None] * u_ij[:, :, :, None, :]
            + alpha_ik[:, :, None, :, :]
            + beta_jk[:, None, :, :, :]
            + gamma_k[:, None, None, :, :]
        )                                                        # [B,Nb,N,N,h0]
        mask3 = mb[:, :, :, None] * mask[:, None, :, :]          # [iblk,j]·[j,k]
        m4 = m4 * mask3[..., None]
        # level 3, i-block rows
        tm = jnp.einsum("bijkh,bjk->bijh", lrelu(m4), mask,
                        preferred_element_type=acc).astype(dt)   # [B,Nb,N,h0]
        t_sum = dot(tm, w_m4)                                    # [B,Nb,N,h1]
        g_ij = dot(pr, m1_gij)
        wg = dot(nd4, m1_gik)
        m3 = (
            deg[:, None, :, None] * (ci[:, :, None] + c_j[:, None, :] + g_ij + b1)
            + neigh_j[:, None, :]
            + wg
            + t_sum
        )
        m3 = mb[..., None] * m3                                  # [B,Nb,N,h1]
        nt_blk = jnp.einsum("bij,bijh->bih", mb, lrelu(m3),
                            preferred_element_type=acc).astype(dt)
        return carry, nt_blk

    _, nts = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), None, xs
    )                                                            # [nb,B,Nb,h1]
    return jnp.moveaxis(nts, 0, 1).reshape(B, N, h1)


def spatial_graph_conv_3d_dense_oracle(adj, x, rel, dis, params, fully_connected=False):
    """Literal reference formula (layers.py:200-277 / 279-359) — O(B·N⁴·h)
    memory, tiny shapes only; used as the unit-test oracle."""
    B, N, F = x.shape
    R = rel.shape[-1]
    Rd = dis.shape[-1]
    m0, b0 = params["Matrix0"], params["bias0"]
    m1, b1 = params["Matrix1"], params["bias1"]
    m2, b2 = params["Matrix2"], params["bias2"]
    m3, b3 = params["Matrix3"], params["bias3"]
    mask = jnp.ones_like(adj) if fully_connected else adj

    bc = jnp.broadcast_to
    xi = bc(x[:, :, None, None, None, :], (B, N, N, N, N, F))
    xj = bc(x[:, None, :, None, None, :], (B, N, N, N, N, F))
    xk = bc(x[:, None, None, :, None, :], (B, N, N, N, N, F))
    xp = bc(x[:, None, None, None, :, :], (B, N, N, N, N, F))
    rij = bc(rel[:, :, :, None, None, :], (B, N, N, N, N, R))
    rjk = bc(rel[:, None, :, :, None, :], (B, N, N, N, N, R))
    rkp = bc(rel[:, None, None, :, :, :], (B, N, N, N, N, R))
    dik = bc(dis[:, :, None, :, None, :], (B, N, N, N, N, Rd))
    dip = bc(dis[:, :, None, None, :, :], (B, N, N, N, N, Rd))
    m4_in = jnp.concatenate([xi, xj, xk, xp, rij, rjk, rkp, dik, dip], axis=-1)
    m4 = jnp.einsum("bijkpf,fh->bijkph", lrelu(m4_in), m0) + b0
    mask4 = (
        mask[:, :, :, None, None] * mask[:, None, :, :, None] * mask[:, None, None, :, :]
    )
    m4_sum = jnp.einsum("bijkph,bijkp->bijkh", m4, mask4)

    xi3 = bc(x[:, :, None, None, :], (B, N, N, N, F))
    xj3 = bc(x[:, None, :, None, :], (B, N, N, N, F))
    xk3 = bc(x[:, None, None, :, :], (B, N, N, N, F))
    rij3 = bc(rel[:, :, :, None, :], (B, N, N, N, R))
    rjk3 = bc(rel[:, None, :, :, :], (B, N, N, N, R))
    dik3 = bc(dis[:, :, None, :, :], (B, N, N, N, Rd))
    m3_in = jnp.concatenate([xi3, xj3, xk3, rij3, rjk3, dik3, m4_sum], axis=-1)
    m3t = jnp.einsum("bijkf,fh->bijkh", lrelu(m3_in), m1) + b1
    mask3 = mask[:, :, :, None] * mask[:, None, :, :]
    m3_sum = jnp.einsum("bijkh,bijk->bijh", m3t, mask3)

    xi2 = bc(x[:, :, None, :], (B, N, N, F))
    xj2 = bc(x[:, None, :, :], (B, N, N, F))
    m2_in = jnp.concatenate([xi2, xj2, rel, m3_sum], axis=-1)
    m2t = jnp.einsum("bijf,fh->bijh", lrelu(m2_in), m2) + b2
    m2_sum = jnp.einsum("bijh,bij->bih", m2t, mask)

    m1_in = jnp.concatenate([x, m2_sum], axis=-1)
    return jnp.einsum("bif,fh->bih", lrelu(m1_in), m3) + b3
