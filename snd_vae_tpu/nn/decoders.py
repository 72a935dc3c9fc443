"""Latent-to-graph decode ops.

  * ``inner_product_decoder`` — batched Z·Zᵀ edge decoder (layers.py:400-410;
    VGAE heritage, named first-class in the north-star spec).  The reference
    layer takes an ``act`` argument but never applies it (layers.py:407-410),
    so this returns raw logits; apply ``jax.nn.sigmoid`` at the call site.
  * ``Graphite`` — low-rank two-factor propagation decoder (layers.py:591-604).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as inits


def inner_product_decoder(z: jnp.ndarray) -> jnp.ndarray:
    """[..., N, D] latents -> [..., N, N] edge logits Z Zᵀ."""
    return jnp.einsum(
        "...nd,...md->...nm", z, z, preferred_element_type=jnp.float32
    ).astype(z.dtype)


class Graphite(nn.Module):
    """Graphite propagation (layers.py:591-604):
    act(R1 (R1ᵀ (XW)) + R2 (R2ᵀ (XW)))."""

    features: int
    stddev: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray, recon_1: jnp.ndarray, recon_2: jnp.ndarray) -> jnp.ndarray:
        w = self.param("Matrix", inits.normal(self.stddev), (x.shape[-1], self.features))
        xw = jnp.einsum("bnf,fo->bno", x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        mm = lambda a, b: jnp.einsum(
            "bnm,bmo->bno", a, b, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        y = mm(recon_1, mm(jnp.swapaxes(recon_1, -1, -2), xw)) + mm(
            recon_2, mm(jnp.swapaxes(recon_2, -1, -2), xw)
        )
        return jax.nn.relu(y)
