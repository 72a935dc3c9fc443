"""Edge/node conv ops (BrainNetCNN-style) and their transposed counterparts.

Rebuilds layers.py's conv-op family on ``lax.conv_general_dilated`` /
``lax.conv_transpose``:

  * ``E2E``   — edge-to-edge: a 1xN conv plus the same weights transposed to
                Nx1, shared bias, summed (layers.py:431-450).  Decoder
                adjacency head.
  * ``E2N``   — edge-to-node 1xN VALID conv (layers.py:452-461)
  * ``N2N``   — node-to-node 1xk VALID conv (layers.py:412-420)
  * ``N2GAdj``— node-to-graph Nx1 VALID conv (layers.py:463-471)
  * ``DeN2G`` / ``DeE2N`` / ``DeN2N`` / ``DeE2E`` — conv2d_transpose
                counterparts (layers.py:473-564)
  * ``N2GPool`` / ``G2NBroadcast`` — the diag-masked pooling pair
                (layers.py:362-396)

Inputs are [B, H, W, C] (NHWC) like the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as inits
from ..parallel.hints import MODEL_AXIS, _ambient_axes, shard_nodes


def _conv2d(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)


def _acc_dtype(dt):
    return jnp.float32 if dt in (jnp.bfloat16, jnp.float16) else dt


def _toeplitz_weights(w, width: int, dtype):
    """Expand a 1-D SAME-conv kernel into its Toeplitz contraction tensor.

    ``w`` is ``[k_h, C, O]``; returns ``Mt [width, width, C, O]`` with
    ``Mt[t, j] = w[t - j + pad_left]`` (zero outside the kernel), where
    ``pad_left = (k_h-1)//2`` matches SAME padding at stride 1.  A width-k_h
    window conv over a width-``width`` map is then exactly
    ``out[b,i,j,o] = Σ_{t,c} x[b,i,t,c]·Mt[t,j,c,o]``.
    """
    k_h = w.shape[0]
    pl = (k_h - 1) // 2
    idx = pl + jnp.arange(width)[:, None] - jnp.arange(width)[None, :]  # [t, j]
    valid = (idx >= 0) & (idx < k_h)
    g = jnp.take(w, jnp.clip(idx, 0, k_h - 1), axis=0)  # [W, W, C, O]
    return jnp.where(valid[..., None, None], g, jnp.zeros((), w.dtype)).astype(dtype)


def _conv2d_transpose(x, w, padding):
    # tf.nn.conv2d_transpose(filter=[h,w,out,in]) == lax.conv_transpose with
    # kernel [h,w,in,out] and transpose_kernel=True semantics.
    return jax.lax.conv_transpose(
        x, w, strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    ).astype(x.dtype)


class E2E(nn.Module):
    """Edge-to-edge conv (layers.py:431-450): row conv + column conv with the
    spatially transposed *same* weights and *same* bias, summed.

    Three numerically identical lowerings:

      * small maps — ``lax.conv`` directly (the reference's tf.nn.conv2d
        semantics; fine when the window is small);
      * large maps (width ≥ ``matmul_threshold``, or ``use_matmul=True``) —
        ONE dot_general against the Toeplitz expansion of the kernel
        (``_toeplitz_weights``).  A width-N SAME window over a width-N map is
        a ~75%-dense banded contraction, which XLA's conv lowering executes
        at a few TFLOP/s on TPU while the equivalent
        ``[B·N, N·C] @ [N·C, N·O]`` matmul runs at MXU rates: measured
        347 ms → ~17 ms for the decoder adjacency head at N=512
        (BASELINE.md).  Same FLOPs, same result — only the lowering changes.
      * **separable inputs** (``factors=(P, Q, D)``) — when the input map is
        a pairwise tile-concat ``t[b,i,j] = [P[b,i], Q[b,j], D[b,i,j]]``
        (exactly what the decoders' first adjacency layer consumes,
        model.py:196-198: every per-channel op between the concat and the
        E2E preserves the structure), the O(B·N³·C·O) contraction collapses
        algebraically: the window sum over a channel constant along the
        window is (Σ_t K[t,j])·P — one O(B·N²·C·O) matmul against the
        per-position kernel sums — and the cross term is a plain length-N
        1-D conv.  Only the genuinely pairwise channels ``D`` (e.g. the
        edge_from_coords distance channel, 1 of ~80 channels) keep the N³
        conv.  An N-fold FLOP cut on the widest decoder layer, and the
        [B,N,N,2C] input map is never materialized.
    """

    features: int
    k_h: int
    stddev: float = 0.02
    use_matmul: Optional[bool] = None   # None = auto by width
    # crossover measured on v5e: conv wins at N=64 (2.68 vs 2.84 ms/step),
    # matmul wins at N=100 (6.68 vs 7.63) and grows to 3.6x by N=512
    matmul_threshold: int = 96
    # auto mode falls back to conv when the Toeplitz tensor would exceed
    # this (it is O(W²·C·O) — ~1 GB at N=512/C=40/O=50 bf16 but 4.2 GB at
    # N=1024, which would crowd out the activations on a 16 GB chip)
    matmul_max_bytes: int = 2 << 30

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray] = None,
        *,
        factors: Optional[Tuple] = None,
    ) -> jnp.ndarray:
        if x is None and factors is None:
            raise ValueError("E2E needs a dense map x or factors=(P, Q, D)")
        if factors is not None:
            if x is not None:
                raise ValueError(
                    "pass either a dense map or factors, not both"
                )
            P, Q, D = factors
            c_in = P.shape[-1] + Q.shape[-1] + (
                D.shape[-1] if D is not None else 0
            )
        else:
            c_in = x.shape[-1]
        w1 = self.param(
            "w1", inits.truncated_normal(self.stddev),
            (1, self.k_h, c_in, self.features),
        )
        b1 = self.param("biases1", inits.zeros, (self.features,))
        if factors is not None:
            return self._separable(P, Q, D, w1, b1)
        if self.use_matmul is not None:
            matmul = self.use_matmul
        else:
            mt_bytes = (
                x.shape[2] ** 2 * x.shape[-1] * self.features * x.dtype.itemsize
            )
            matmul = (
                x.shape[2] >= self.matmul_threshold
                and mt_bytes <= self.matmul_max_bytes
            )
            # under a node-sharding mesh the Toeplitz expansion defeats the
            # point: mt is O(N²·C·O) and weight-derived, so every device
            # holds a full replica (measured: the dominant per-device temp
            # at N=512 on the 1x8 mesh).  The conv lowering computes the
            # same values with no N² weight tensor; auto mode prefers it
            # whenever a 'model' mesh axis is ambient.
            if matmul and MODEL_AXIS in _ambient_axes():
                matmul = False
        if matmul:
            # the Toeplitz expansion is built from the width and reused to
            # contract the height axis for the column conv (and the byte
            # budget above is width-based), so the lowering requires square
            # maps — true for every adjacency head; anything else must take
            # the conv path
            if x.shape[1] != x.shape[2]:
                raise ValueError(
                    f"E2E matmul lowering requires square maps, got "
                    f"H={x.shape[1]} W={x.shape[2]}; pass use_matmul=False"
                )
            acc = _acc_dtype(x.dtype)
            # node-sharding hint: row-block the [B,N,N,C] map on its first
            # node axis over the mesh's 'model' axis (identity without an
            # ambient mesh).  The row conv is then comm-free; the column conv
            # contracts the sharded axis, which XLA lowers to a local matmul
            # + reduce-scatter over ICI.
            x = shard_nodes(x, tag="e2e.in")
            mt = _toeplitz_weights(w1[0], x.shape[2], x.dtype)  # [t,j,C,O]
            # row conv: contract the width axis of x against t
            conv1 = jnp.einsum(
                "bitc,tjco->bijo", x, mt, preferred_element_type=acc
            ).astype(x.dtype) + b1
            # column conv (transposed kernel [k_h,1]): same Mt along height
            conv2 = jnp.einsum(
                "btjc,tico->bijo", x, mt, preferred_element_type=acc
            ).astype(x.dtype) + b1
            return shard_nodes(conv1 + conv2, tag="e2e.out")
        conv1 = _conv2d(x, w1, "SAME") + b1
        conv2 = _conv2d(x, jnp.transpose(w1, (1, 0, 2, 3)), "SAME") + b1
        return conv1 + conv2

    def _separable(self, P, Q, D, w1, b1):
        """E2E over the *implicit* map t[b,i,j] = [P[b,i], Q[b,j], D[b,i,j]].

        Exactly ``__call__(concat([bcast(P), bcast(Q), D], -1))`` — proven
        equal in float64 by tests/test_edge_factored.py — without building
        the [B,N,N,cP+cQ] map.  Derivation: the row conv's window sum over a
        channel that is constant along the window (the P block) collapses to
        ``P[b,i,:] @ S[j]`` where ``S[j,c,o] = Σ_{k∈window(j)} w[k,c,o]``
        (per-position kernel sums, O(N·C·O)); its sum over the Q block is a
        plain SAME 1-D conv of Q broadcast over rows; and symmetrically for
        the column conv.  Cost drops from O(B·N³·(cP+cQ)·O) to
        O(B·N²·(cP+cQ)·O); only D (the genuinely pairwise channels) keeps
        its N³ conv.
        """
        W = P.shape[1]
        if Q.shape[1] != W:
            raise ValueError(
                f"separable E2E factor node axes disagree: P {P.shape} "
                f"vs Q {Q.shape}"
            )
        k_h = self.k_h
        pl = (k_h - 1) // 2
        cP, cQ = P.shape[-1], Q.shape[-1]
        dt = P.dtype
        acc = _acc_dtype(dt)
        # per-position kernel window sums via a cumulative sum, accumulated
        # at least in f32 (a bf16 cumsum over k_h terms would reassociate
        # too coarsely; f64 params stay f64 for the oracle tests)
        w = w1[0].astype(_acc_dtype(w1.dtype))              # [k_h, C, O]
        ar = jnp.arange(W)
        lo = jnp.maximum(0, pl - ar)                        # first valid tap
        hi = jnp.minimum(k_h - 1, W - 1 - ar + pl)          # last valid tap
        cs = jnp.concatenate([jnp.zeros_like(w[:1]), jnp.cumsum(w, axis=0)], 0)
        S = (jnp.take(cs, hi + 1, axis=0) - jnp.take(cs, lo, axis=0)).astype(dt)
        SP, SQ = S[:, :cP], S[:, cP:cP + cQ]
        wP = w1[0, :, :cP].astype(dt)                       # [k_h, cP, O]
        wQ = w1[0, :, cP:cP + cQ].astype(dt)

        # node-sharding: constrain the FACTORS, not just the result — GSPMD
        # propagates shardings forward from producers, so an output-only
        # constraint leaves the f32 accumulation chain below replicated
        # (measured: the dominant per-device temp on the 1x8 mesh; hinting P
        # pins every bijo-shaped add to the i-row-blocked layout)
        P = shard_nodes(P, tag="e2e.sepP")
        # row conv  = P[b,i]·SP[j] + conv1d(Q)[b,j]
        # col conv  = conv1d(P)[b,i] + Q[b,j]·SQ[i]
        y = jnp.einsum("bic,jco->bijo", P, SP, preferred_element_type=acc)
        y = y + jnp.einsum("bjc,ico->bijo", Q, SQ, preferred_element_type=acc)
        nwc = ("NWC", "WIO", "NWC")
        convQ = jax.lax.conv_general_dilated(
            Q, wQ, (1,), "SAME", dimension_numbers=nwc
        ).astype(acc)
        convP = jax.lax.conv_general_dilated(
            P, wP, (1,), "SAME", dimension_numbers=nwc
        ).astype(acc)
        y = y + convQ[:, None, :, :] + convP[:, :, None, :]
        if D is not None:
            wD = w1[0:1, :, cP + cQ:, :].astype(dt)         # [1, k_h, d, O]
            Dx = shard_nodes(D, tag="e2e.sepD")
            y = y + _conv2d(Dx, wD, "SAME").astype(acc)
            y = y + _conv2d(Dx, jnp.transpose(wD, (1, 0, 2, 3)), "SAME").astype(acc)
        y = (y + 2.0 * b1.astype(acc)).astype(dt)
        return shard_nodes(y, tag="e2e.sep")


class E2N(nn.Module):
    """Edge-to-node 1xN VALID conv (layers.py:452-461): [B,N,N,C]->[B,N,1,F]."""

    features: int
    k_h: int = 50
    stddev: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "w", inits.truncated_normal(self.stddev),
            (1, self.k_h, x.shape[-1], self.features),
        )
        b = self.param("biases", inits.zeros, (self.features,))
        return _conv2d(x, w, "VALID") + b


class N2N(nn.Module):
    """Node-to-node 1xk VALID conv (layers.py:412-420)."""

    features: int
    k_h: int
    stddev: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "w", inits.truncated_normal(self.stddev),
            (1, self.k_h, x.shape[-1], self.features),
        )
        b = self.param("bias", inits.zeros, (self.features,))
        return _conv2d(x, w, "VALID") + b


class N2GAdj(nn.Module):
    """Node-to-graph Nx1 VALID conv (layers.py:463-471); returns (out, w)."""

    features: int
    stddev: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = self.param(
            "w", inits.truncated_normal(self.stddev), (x.shape[1], 1, 1, 1)
        )
        b = self.param("biases", inits.zeros, (self.features,))
        return _conv2d(x, w, "VALID") + b, w


class DeN2G(nn.Module):
    """Transposed node-to-graph conv (layers.py:473-488)."""

    out_spatial: Tuple[int, int]  # (H, W) of the output
    k_h: int
    features: int = 1
    stddev: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w", inits.normal(self.stddev), (self.out_spatial[0], 1, 1, 1))
        b = self.param("biases", inits.zeros, (self.features,))
        return _conv2d_transpose(x, w, "VALID") + b


class DeN2N(nn.Module):
    """Transposed node-to-node conv (layers.py:518-534)."""

    features: int
    k_h: int
    stddev: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "w", inits.normal(self.stddev), (1, self.k_h, self.features, x.shape[-1])
        )
        b = self.param("biases1", inits.zeros, (self.features,))
        return _conv2d_transpose(x, w, "VALID") + b


class DeE2N(nn.Module):
    """Transposed edge-to-node conv (layers.py:490-516): deconv of the input
    plus deconv of its spatial transpose with transposed weights, shared bias."""

    features: int
    k_h: int
    stddev: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w1 = self.param(
            "w1", inits.normal(self.stddev), (1, self.k_h, self.features, x.shape[-1])
        )
        b1 = self.param("biases1", inits.zeros, (self.features,))
        d1 = _conv2d_transpose(x, w1, "VALID") + b1
        d2 = _conv2d_transpose(
            jnp.transpose(x, (0, 2, 1, 3)), jnp.transpose(w1, (1, 0, 2, 3)), "VALID"
        ) + b1
        return d1 + d2


class DeE2E(nn.Module):
    """Transposed edge-to-edge conv (layers.py:536-564): row/column sums of
    the input deconvolved back to full edge maps, averaged."""

    features: int
    k_h: int
    stddev: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x1 = jnp.sum(x, axis=1).reshape(B, self.k_h, 1, C)
        x2 = jnp.sum(x, axis=2).reshape(B, 1, self.k_h, C)
        w1 = self.param(
            "w1", inits.normal(self.stddev), (1, self.k_h, self.features, C)
        )
        b1 = self.param("biases1", inits.zeros, (self.features,))
        d1 = _conv2d_transpose(x1, w1, "VALID") + b1
        d2 = _conv2d_transpose(x2, jnp.transpose(w1, (1, 0, 2, 3)), "VALID") + b1
        return (d1 + d2) / 2.0


class N2GPool(nn.Module):
    """Node->graph pooling with a diag mask (layers.py:362-379)."""

    input_dim: int
    hidden: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weights", inits.glorot_trunc(), (self.input_dim, self.hidden))
        eye = jnp.eye(self.input_dim, dtype=x.dtype)
        y = jnp.einsum("io,bot->bit", w.astype(x.dtype), x,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return jax.nn.relu(y * eye[None, : y.shape[1], : y.shape[2]])


class G2NBroadcast(nn.Module):
    """Graph->node broadcast (layers.py:381-396)."""

    input_dim: int
    hidden: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weights", inits.glorot_trunc(), (self.hidden, self.input_dim))
        y = jnp.einsum("ho,bot->bht", w.astype(x.dtype), x,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return jax.nn.relu(y)
