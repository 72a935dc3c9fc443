"""Small pytree utilities shared across the trainer and losses."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_float_leaves(tree, dtype):
    """Cast every floating-point array leaf of a pytree to ``dtype``; leave
    integer/bool/None leaves untouched.  Used both for the bf16 forward cast
    (train._compute_cast) and the f32 ELBO cast (losses.elbo_loss) so the two
    stay in sync."""
    dt = jnp.dtype(dtype)

    def cast(t):
        if hasattr(t, "dtype") and jnp.issubdtype(t.dtype, jnp.floating):
            return t.astype(dt)
        return t

    return jax.tree.map(cast, tree)
