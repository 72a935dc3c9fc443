"""Basic NN ops: activations, dense, 1-D conv, normalization, dropout.

Rebuilds the reference primitives with exact formula parity:

  * ``lrelu``      — leaky ReLU with leak 0.2 (layers.py:112-113)
  * ``Dense``      — ``linear``: XW+b, W~N(0, 0.02), b=0 (layers.py:566-576)
  * ``Conv1D``     — ``tf.layers.conv1d(..., padding='SAME')`` as used by the
                     model heads (model.py:122, 191, 216): glorot-uniform
                     kernel, zero bias, no activation
  * ``FrozenBatchNorm`` — Keras BatchNormalization invoked without a
                     ``training`` flag in TF1 graph mode (model.py:41-71,
                     107-148): moving stats stay at init (mean 0, var 1), so
                     the layer is an affine y = γ·x/sqrt(1+ε) + β with
                     trainable γ, β and Keras' ε=1e-3.  This is the reference
                     parity mode (SURVEY §7 quirk 3).
  * ``BatchStatNorm`` — the corrected alternative: normalizes with the
                     current batch statistics (no running averages needed in
                     a functional setting).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as inits


def lrelu(x: jnp.ndarray, leak: float = 0.2) -> jnp.ndarray:
    """Leaky ReLU, max(x, leak*x) (layers.py:112-113)."""
    return jnp.maximum(x, leak * x)


class Dense(nn.Module):
    """The reference's ``linear`` (layers.py:566-576): XW + b over the last axis.

    The reference flattens to 2-D first; operating on the last axis of any
    rank is equivalent and avoids reshapes.
    """

    features: int
    stddev: float = 0.02
    bias_start: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("kernel", inits.normal(self.stddev), (x.shape[-1], self.features))
        b = self.param(
            "bias", nn.initializers.constant(self.bias_start), (self.features,)
        )
        dt = self.dtype or x.dtype
        y = jnp.dot(x.astype(dt), w.astype(dt), preferred_element_type=jnp.float32)
        return (y + b).astype(dt)


class Conv1D(nn.Module):
    """``tf.layers.conv1d`` with SAME padding (model.py:122,191,216).

    Kernel [k, in, out] with glorot-uniform init, zero bias, linear output.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [..., L, C]; fold leading axes into batch for lax.conv
        w = self.param(
            "kernel", inits.glorot_uniform(), (self.kernel_size, x.shape[-1], self.features)
        )
        b = self.param("bias", inits.zeros, (self.features,))
        dt = self.dtype or x.dtype
        lead = x.shape[:-2]
        xb = x.reshape((-1,) + x.shape[-2:]).astype(dt)
        y = jax.lax.conv_general_dilated(
            xb,
            w.astype(dt),
            window_strides=(self.stride,),
            padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = (y + b).astype(dt)
        return y.reshape(lead + y.shape[1:])


class FrozenBatchNorm(nn.Module):
    """Keras BN with moving stats frozen at init (parity mode).

    y = gamma * x / sqrt(1 + eps) + beta, trainable gamma/beta, over the last
    axis — exactly what the reference's BN layers compute in TF1 graph mode
    without ``training=True`` (SURVEY §7 quirk 3).

    ``features`` fixes the parameter width up front; ``block=(lo, hi)`` then
    applies the layer to an input that represents only channels [lo, hi) of
    the full width — how the decoders' factored adjacency head normalizes
    the tile-concat map's channel blocks without materializing the map
    (nn/edge_conv.py::E2E._separable).  Per-channel affine, so block
    application is trivially exact.
    """

    epsilon: float = 1e-3
    features: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, block: Optional[Tuple[int, int]] = None
    ) -> jnp.ndarray:
        c = self.features if self.features is not None else x.shape[-1]
        gamma = self.param("gamma", inits.ones, (c,))
        beta = self.param("beta", inits.zeros, (c,))
        if block is not None:
            lo, hi = block
            if hi - lo != x.shape[-1]:
                raise ValueError(
                    f"block {block} width {hi - lo} != input channels "
                    f"{x.shape[-1]} (shape {x.shape})"
                )
            gamma, beta = gamma[lo:hi], beta[lo:hi]
        scale = gamma * jax.lax.rsqrt(jnp.asarray(1.0 + self.epsilon, x.dtype))
        return x * scale + beta


class BatchStatNorm(nn.Module):
    """Corrected batch norm: normalize with current batch statistics over all
    axes but the last, trainable gamma/beta.  Stateless (functional) variant
    for the non-parity mode.

    ``block`` as in FrozenBatchNorm.  Block application is exact here too:
    the factored head's channel blocks are constant along the broadcast node
    axis, so their mean/variance over the factor's own axes equal the
    statistics over the full [B,N,N] map (averaging a value replicated N
    times changes neither moment).
    """

    epsilon: float = 1e-3
    features: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, block: Optional[Tuple[int, int]] = None
    ) -> jnp.ndarray:
        c = self.features if self.features is not None else x.shape[-1]
        gamma = self.param("gamma", inits.ones, (c,))
        beta = self.param("beta", inits.zeros, (c,))
        if block is not None:
            lo, hi = block
            if hi - lo != x.shape[-1]:
                raise ValueError(
                    f"block {block} width {hi - lo} != input channels "
                    f"{x.shape[-1]} (shape {x.shape})"
                )
            gamma, beta = gamma[lo:hi], beta[lo:hi]
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * gamma + beta


def make_norm(
    parity: bool = True, epsilon: float = 1e-3, features: Optional[int] = None
) -> nn.Module:
    if parity:
        return FrozenBatchNorm(epsilon=epsilon, features=features)
    return BatchStatNorm(epsilon=epsilon, features=features)


def dropout(
    x: jnp.ndarray, keep_prob: float, key: Optional[jax.Array], deterministic: bool
) -> jnp.ndarray:
    """Inverted dropout with a keep-probability, matching tf.nn.dropout
    semantics used at model_joint.py:81,116 (the reference's ``dropout`` flag
    is a keep-prob, main.py:77)."""
    if deterministic or keep_prob >= 1.0 or key is None:
        return x
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)
