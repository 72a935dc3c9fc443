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
and every contraction is a batched matmul the MXU executes directly.  The
single O(B·N³·h) term (Σ_k A[j,k]·f[i,k]) is one dense [N·h, N] x [N, N]
matmul per batch element.  The fourth-order variant factors the same way one
level deeper, dropping memory from O(N⁴) to O(N³) (the φ(m4_sum) term is
genuinely third-order because the nonlinearity blocks further factoring).

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
        )


def spatial_graph_conv(adj, x, rel, params, use_pallas: bool = False) -> jnp.ndarray:
    """Functional factored third-order conv (see module docstring)."""
    F, R = x.shape[-1], rel.shape[-1]
    m1, b1 = params["Matrix1"], params["bias1"]
    m2, b2 = params["Matrix2"], params["bias2"]
    m3, b3 = params["Matrix3"], params["bias3"]
    h0 = m1.shape[1]
    dt = x.dtype

    phi_x = lrelu(x)          # [B,N,F]
    phi_r = lrelu(rel)        # [B,N,N,R]
    dot = lambda t, w: jnp.einsum(
        "...f,fo->...o", t, w, preferred_element_type=_acc_dtype(dt)
    ).astype(dt)

    # --- level 3: masked motif sum --------------------------------------
    a_i = dot(phi_x, m1[0:F])               # φ(x_i)@M1a      [B,N,h0]
    b_j = dot(phi_x, m1[F : 2 * F])         # φ(x_j)@M1b      [B,N,h0]
    c_k = dot(phi_x, m1[2 * F : 3 * F])     # φ(x_k)@M1c      [B,N,h0]
    # the [B,N,N,h] tensors carry node-sharding hints (first node axis over
    # the mesh's 'model' axis; identity without an ambient mesh) so the i-
    # row-blocked N³ contraction below stays partitioned under GSPMD
    d_ij = tag(shard_nodes(dot(phi_r, m1[3 * F : 3 * F + R]), tag="sgc.d_ij"),
               "sgc.d_ij")
    e_jk = tag(shard_nodes(dot(phi_r, m1[3 * F + R : 3 * F + 2 * R]),
                           tag="sgc.e_jk"), "sgc.e_jk")
    f_ik = tag(shard_nodes(dot(phi_r, m1[3 * F + 2 * R :]), tag="sgc.f_ik"),
               "sgc.f_ik")

    deg = jnp.sum(adj, axis=-1)                          # [B,N]
    neigh_c = jnp.einsum("bjk,bkh->bjh", adj, c_k,
                         preferred_element_type=_acc_dtype(dt)).astype(dt)
    ve = jnp.einsum("bjk,bjkh->bjh", adj, e_jk,
                    preferred_element_type=_acc_dtype(dt)).astype(dt)
    if use_pallas:
        # fused Pallas kernel: the N³ matmul + combine + mask in one VMEM
        # pass (nn/pallas/blocked_spmm.py); j-only terms fold into v_j
        from .pallas import motif_combine

        v_combined = deg[..., None] * b_j + neigh_c + ve
        m3_sum = motif_combine(adj, a_i, d_ij, v_combined, f_ik, b1)
    else:
        # the N³ term as a dense matmul: Σ_k A[j,k]·f[i,k] — comm-free under
        # node sharding (adj replicated, f_ik/output row-blocked on i)
        wf = tag(jnp.einsum("bjk,bikh->bijh", adj, f_ik,
                            preferred_element_type=_acc_dtype(dt)).astype(dt),
                 "sgc.wf")
        m3_sum = (
            deg[:, None, :, None] * (a_i[:, :, None] + b_j[:, None, :] + d_ij + b1)
            + (neigh_c + ve)[:, None, :]
            + wf
        )
        m3_sum = adj[..., None] * m3_sum                 # A[i,j] mask  [B,N,N,h0]
        m3_sum = tag(shard_nodes(m3_sum, tag="sgc.m3_sum"), "sgc.m3_sum")

    # --- level 2: masked pair sum ---------------------------------------
    p_i = dot(phi_x, m2[0:F])                            # [B,N,h1]
    q_j = dot(phi_x, m2[F : 2 * F])                      # [B,N,h1]
    s_ij = tag(shard_nodes(dot(phi_r, m2[2 * F : 2 * F + R]), tag="sgc.s_ij"),
               "sgc.s_ij")                               # [B,N,N,h1]
    t_ij = tag(shard_nodes(dot(lrelu(m3_sum), m2[2 * F + R :]),
                           tag="sgc.t_ij"), "sgc.t_ij")  # [B,N,N,h1]

    pair = q_j[:, None, :] + s_ij + t_ij + b2            # j-dependent part
    m2_sum = (
        deg[..., None] * (p_i)                           # Σ_j A[i,j]·p_i
        + jnp.einsum("bij,bijh->bih", adj, pair,
                     preferred_element_type=_acc_dtype(dt)).astype(dt)
    )
    m2_sum = shard_nodes(m2_sum, tag="sgc.m2_sum")

    # --- level 1: per-node update ---------------------------------------
    out = (
        dot(phi_x, m3[0:F])
        + dot(lrelu(m2_sum), m3[F:])
        + b3
    )
    return out


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
            adj, x, rel, dis, params, fully_connected=self.fully_connected
        )


def spatial_graph_conv_3d(adj, x, rel, dis, params, fully_connected=False) -> jnp.ndarray:
    """Functional factored fourth-order conv.

    ``rel`` feeds the chain relations (r_ij, r_jk, r_kp); ``dis`` feeds the
    skip distances (d_ik, d_ip) — identical arrays for the standard variant,
    distinct for the `_full` variant (layers.py:287-289).
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

    phi_x = lrelu(x)
    phi_r = lrelu(rel)
    phi_d = lrelu(dis)
    dot = lambda t, w: jnp.einsum(
        "...f,fo->...o", t, w, preferred_element_type=_acc_dtype(dt)
    ).astype(dt)

    # --- level 4: Σ_p mask4[i,j,k,p]·(φ(concat)@M0 + b0), factored ------
    o = 0
    a_i = dot(phi_x, m0[o : o + F]); o += F          # x_i
    a_j = dot(phi_x, m0[o : o + F]); o += F          # x_j
    a_k = dot(phi_x, m0[o : o + F]); o += F          # x_k
    a_p = dot(phi_x, m0[o : o + F]); o += F          # x_p
    u_ij = dot(phi_r, m0[o : o + R]); o += R         # r_ij
    v_jk = dot(phi_r, m0[o : o + R]); o += R         # r_jk
    w_kp = dot(phi_r, m0[o : o + R]); o += R         # r_kp
    y_ik = dot(phi_d, m0[o : o + Rd]); o += Rd       # d_ik
    z_ip = dot(phi_d, m0[o : o + Rd]); o += Rd       # d_ip

    P = jnp.einsum("bkp,bph->bkh", mask, a_p,
                   preferred_element_type=_acc_dtype(dt)).astype(dt)      # Σ_p M[k,p]·a_p
    Vw = jnp.einsum("bkp,bkph->bkh", mask, w_kp,
                    preferred_element_type=_acc_dtype(dt)).astype(dt)     # Σ_p M[k,p]·w_kp
    Wz = jnp.einsum("bkp,biph->bikh", mask, z_ip,
                    preferred_element_type=_acc_dtype(dt)).astype(dt)     # Σ_p M[k,p]·z_ip

    # m4_sum[i,j,k] = mask[i,j]·mask[j,k]·(deg[k]·(aᵢ+aⱼ+u_ij+a_k+v_jk+y_ik+b0)
    #                                       + P[k] + Vw[k] + Wz[i,k])
    alpha_ik = deg[:, None, :, None] * (a_i[:, :, None] + y_ik) + Wz   # [B,N,N,h0]
    beta_jk = deg[:, None, :, None] * (a_j[:, :, None] + v_jk)          # [B,N,N,h0]
    gamma_k = deg[..., None] * (a_k + b0) + P + Vw                      # [B,N,h0]

    m4_sum = (
        deg[:, None, None, :, None] * u_ij[:, :, :, None, :]
        + alpha_ik[:, :, None, :, :]
        + beta_jk[:, None, :, :, :]
        + gamma_k[:, None, None, :, :]
    )                                                                   # [B,N,N,N,h0]
    mask3 = mask[:, :, :, None] * mask[:, None, :, :]                   # [i,j]·[j,k]
    m4_sum = m4_sum * mask3[..., None]
    # the O(N³·h) tensor dominates 3D-family memory; row-block it on i over
    # the mesh's 'model' axis (identity without an ambient mesh)
    m4_sum = tag(shard_nodes(m4_sum, tag="sgc3d.m4_sum"), "sgc3.m4_sum")

    # --- level 3: Σ_k mask3[i,j,k]·(φ(concat(x_i,x_j,x_k,r_ij,r_jk,d_ik,
    #              m4_sum))@M1 + b1).  φ(m4_sum) blocks factoring over k for
    #              its own slice, so that term is a genuine masked [N³] sum;
    #              everything else factors as in the third-order op.
    o = 0
    c_i = dot(phi_x, m1[o : o + F]); o += F
    c_j = dot(phi_x, m1[o : o + F]); o += F
    c_k2 = dot(phi_x, m1[o : o + F]); o += F
    g_ij = dot(phi_r, m1[o : o + R]); o += R
    g_jk = dot(phi_r, m1[o : o + R]); o += R
    g_ik = dot(phi_d, m1[o : o + Rd]); o += Rd
    w_m4 = m1[o:]                                                        # [h0,h1]

    t_ijk = tag(jnp.einsum("bijkh,hg->bijkg", lrelu(m4_sum), w_m4,
                           preferred_element_type=_acc_dtype(dt)).astype(dt),
                "sgc3.t_ijk")
    # inner sum over k uses mask[j,k] only; the outer mask[i,j] is applied
    # once below (exact also for weighted adjacencies)
    t_sum = tag(jnp.einsum("bijkg,bjk->bijg", t_ijk, mask,
                           preferred_element_type=_acc_dtype(dt)).astype(dt),
                "sgc3.t_sum")

    neigh_ck = jnp.einsum("bjk,bkh->bjh", mask, c_k2,
                          preferred_element_type=_acc_dtype(dt)).astype(dt)
    vg = jnp.einsum("bjk,bjkh->bjh", mask, g_jk,
                    preferred_element_type=_acc_dtype(dt)).astype(dt)
    wg = tag(jnp.einsum("bjk,bikh->bijh", mask, g_ik,
                        preferred_element_type=_acc_dtype(dt)).astype(dt),
             "sgc3.wg")

    m3_sum = (
        deg[:, None, :, None] * (c_i[:, :, None] + c_j[:, None, :] + g_ij + b1)
        + (neigh_ck + vg)[:, None, :]
        + wg
        + t_sum
    )
    m3_sum = mask[..., None] * m3_sum                                    # [B,N,N,h1]
    m3_sum = tag(shard_nodes(m3_sum, tag="sgc3d.m3_sum"), "sgc3.m3_sum")

    # --- level 2 ---------------------------------------------------------
    o = 0
    p_i = dot(phi_x, m2[o : o + F]); o += F
    q_j = dot(phi_x, m2[o : o + F]); o += F
    s_ij = tag(shard_nodes(dot(phi_r, m2[o : o + R]), tag="sgc3d.s_ij"),
               "sgc3.s_ij"); o += R
    t_ij = tag(shard_nodes(dot(lrelu(m3_sum), m2[o:]), tag="sgc3d.t_ij"),
               "sgc3.t_ij")

    pair = q_j[:, None, :] + s_ij + t_ij + b2
    m2_sum = deg[..., None] * p_i + jnp.einsum(
        "bij,bijh->bih", mask, pair, preferred_element_type=_acc_dtype(dt)
    ).astype(dt)

    # --- level 1 ---------------------------------------------------------
    return dot(phi_x, m3[0:F]) + dot(lrelu(m2_sum), m3[F:]) + b3


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
