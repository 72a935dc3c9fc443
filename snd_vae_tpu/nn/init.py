"""Weight initializers matching the reference's TF1 initializers.

  * ``normal(0.02)``        — tf.random_normal_initializer(stddev=0.02), used
                              by ``linear`` and the SGConv matrices
                              (layers.py:566-576, 158-169)
  * ``truncated_normal(0.02)`` — tf.truncated_normal_initializer, used by
                              GraphConvolution / conv ops (layers.py:118, 434)
  * ``glorot_trunc(0.1)``   — weight_variable_glorot actually returns
                              truncated normal stddev=0.1 (initializations.py:4-12)
  * ``glorot_uniform``      — tf.layers.conv1d's default kernel initializer
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import random


def normal(stddev: float = 0.02):
    return nn.initializers.normal(stddev)


def truncated_normal(stddev: float = 0.02):
    # TF truncates at 2 sigma and rescales; jax truncated_normal matches the
    # resample-outside-2-sigma semantics when given lower/upper of +-2.
    def init(key, shape, dtype=jnp.float32):
        return random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev

    return init


def glorot_trunc(stddev: float = 0.1):
    """The reference's mis-named glorot helper (truncated normal σ=0.1)."""
    return truncated_normal(stddev)


glorot_uniform = nn.initializers.glorot_uniform
zeros = nn.initializers.zeros
ones = nn.initializers.ones
