"""Latent-traversal grids (reference model.py:232-358, model_joint.py:192-206).

The reference builds traversal batches by loading saved posterior latents
from ``./qualitative_evaluation/*.npy`` and sweeping one (or three) latent
dimensions over fixed ranges inside the graph-build; here the grid
construction is pure NumPy returning `Latents` to feed ``model.decode`` —
no build-time mode dispatch, no FLAGS.decoder_batch_size mutation
(model.py:261,321).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..config import Config
from .outputs import Latents

# the reference's sweep ranges (model.py:245-256, 281-290)
TRAVERSE_RANGES = {
    "s": (-100.0, 20.0, 4.0),     # model.py:247
    "g": (-60.0, 60.0, 4.0),      # model.py:250
    "sg": (-30.0, 30.0, 2.0),     # model.py:254
}
GENERATION_RANGES = {
    "s": (-20.0, 20.0, 2.0),      # model.py:283
    "g": (-1.0, 1.0, 0.1),        # model.py:285
    "sg": (-10.0, 10.0, 1.0),     # model.py:288
}


def load_saved_latents(
    cfg: Config, directory: str = "./qualitative_evaluation", vae_type: str = "disentangled"
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load the z dumps written by the reconstruct pass
    (main.py:411-416 / model.py:235-237)."""
    d = os.path.join(directory, cfg.dataset)
    z_s = np.load(os.path.join(d, f"{vae_type}_z_s.npy")).reshape(-1, cfg.encoder.s_latent_size)
    z_g = np.load(os.path.join(d, f"{vae_type}_z_g.npy")).reshape(-1, cfg.encoder.g_latent_size)
    z_sg = np.load(os.path.join(d, f"{vae_type}_z_sg.npy")).reshape(-1, cfg.encoder.sg_latent_size)
    return z_s, z_g, z_sg


def _base_grid(cfg: Config, z_s, z_g, z_sg):
    """Replicate each anchor latent V times per dimension (model.py:235-242):
    rows [1·length : 2·length] of the saved dumps, tiled.  The reference
    crashes when the dump holds fewer than 2·length rows; here anchor rows
    wrap around modulo the dump size."""
    V = cfg.visualize_length
    enc = cfg.encoder
    length = enc.g_latent_size + enc.s_latent_size + enc.sg_latent_size

    def pick(z, L):
        z = np.asarray(z).reshape(-1, L)
        idx = (np.arange(length) + length) % max(len(z), 1)
        return z[idx][:, None, :]

    z_s = np.tile(pick(z_s, enc.s_latent_size), [1, V, 1]).reshape(-1, enc.s_latent_size)
    z_g = np.tile(pick(z_g, enc.g_latent_size), [1, V, 1]).reshape(-1, enc.g_latent_size)
    z_sg = np.tile(pick(z_sg, enc.sg_latent_size), [1, V, 1]).reshape(-1, enc.sg_latent_size)
    return z_s, z_g, z_sg


def _sweep(lo, hi, step, V):
    return np.arange(lo, hi, step)[:V]


def traverse(
    cfg: Config, z_s, z_g, z_sg, group_type: str, fix_dim: int
) -> Latents:
    """Single-group single-dimension sweep (model.py:232-265)."""
    V = cfg.visualize_length
    enc = cfg.encoder
    z_s, z_g, z_sg = _base_grid(cfg, z_s, z_g, z_sg)
    rang = _sweep(*TRAVERSE_RANGES[group_type], V)

    if group_type == "s":
        base = 0
        z = z_s
    elif group_type == "g":
        base = enc.s_latent_size * V
        z = z_g
    else:
        base = (enc.s_latent_size + enc.g_latent_size) * V
        z = z_sg
    sl = slice(fix_dim * V + base, fix_dim * V + V + base)
    z[sl, fix_dim] = rang
    z_s, z_g, z_sg = z_s[sl], z_g[sl], z_sg[sl]
    return Latents(
        z_sg=z_sg[:, None, :].astype(np.float32),
        z_s=z_s.astype(np.float32),
        z_g=z_g.astype(np.float32),
    )


def traverse_generation(
    cfg: Config, z_s, z_g, z_sg, dims: Optional[Tuple[int, int, int]] = None
) -> Latents:
    """Simultaneous three-group sweep used by test_disentangle
    (model.py:267-324, synthetic2 composition; dims default to the
    reference's dim_a=77, dim_b=48, dim_c=171 at main.py:482)."""
    V = cfg.visualize_length
    enc = cfg.encoder
    a, b, c = dims or cfg.traverse_dims
    # the reference defaults (77,48,171) assume synthetic1's latent sizes
    # (main.py:482); clamp to the configured dims so every preset works
    a = min(a, enc.s_latent_size - 1)
    b = min(b, enc.g_latent_size - 1)
    c = min(c, enc.sg_latent_size - 1)
    z_s, z_g, z_sg = _base_grid(cfg, z_s, z_g, z_sg)

    z_s[a * V : a * V + V, a] = _sweep(*GENERATION_RANGES["s"], V)
    base_g = enc.s_latent_size * V
    z_g[b * V + base_g : b * V + V + base_g, b] = _sweep(*GENERATION_RANGES["g"], V)
    base_sg = (enc.s_latent_size + enc.g_latent_size) * V
    z_sg[c * V + base_sg : c * V + V + base_sg, c] = _sweep(*GENERATION_RANGES["sg"], V)

    # synthetic2 visualization composition (model.py:292-305): three rows —
    # (s sweep, g sweep, sg sweep), each picking the matching slices
    sl_a = slice(a * V, a * V + V)
    sl_b = slice(b * V + base_g, b * V + V + base_g)
    sl_c = slice(c * V + base_sg, c * V + V + base_sg)

    z_s1 = np.concatenate([z_s[sl_a], z_s[sl_c], z_s[sl_c]])
    z_g1 = np.concatenate([z_g[sl_c], z_g[sl_b], z_g[sl_c]])
    z_sg1 = np.concatenate([z_sg[sl_a], z_sg[sl_b], z_sg[sl_c]])
    return Latents(
        z_sg=z_sg1[:, None, :].astype(np.float32),
        z_s=z_s1.astype(np.float32),
        z_g=z_g1.astype(np.float32),
    )


def traverse_joint(cfg: Config, z_sg, fix_dim: int) -> Latents:
    """Single-latent traversal for the base/joint model
    (model_joint.py:192-206): sweep one dimension of z_sg over
    arange(-2, 2, 4/V)."""
    V = cfg.visualize_length
    L = cfg.encoder.sg_latent_size
    length = L
    z = np.asarray(z_sg).reshape(-1, L)
    idx = (np.arange(length) + length) % max(len(z), 1)
    z = np.tile(z[idx][:, None, :], [1, V, 1]).reshape(-1, L)
    fix_dim = min(fix_dim, L - 1)
    rang = np.arange(-2.0, 2.0, 4.0 / V)[:V]
    z[fix_dim * V : fix_dim * V + V, fix_dim] = rang
    return Latents(z_sg=z[:, None, :].astype(np.float32))


def traverse_latent(cfg: Config, z_s, z_g, z_sg) -> Latents:
    """Sweep every dimension of every group (model.py:326-358)."""
    V = cfg.visualize_length
    enc = cfg.encoder
    z_s, z_g, z_sg = _base_grid(cfg, z_s, z_g, z_sg)
    rang = _sweep(-10.0, 10.0, 2.0, V)  # model.py:341,344
    for dim in range(enc.s_latent_size):
        z_s[dim * V : dim * V + V, dim] = rang
    base = enc.s_latent_size * V
    for dim in range(enc.g_latent_size):
        z_g[dim * V + base : dim * V + V + base, dim] = rang
    base = (enc.s_latent_size + enc.g_latent_size) * V
    for dim in range(enc.sg_latent_size):
        z_sg[dim * V + base : dim * V + V + base, dim] = rang
    return Latents(
        z_sg=z_sg[:, None, :].astype(np.float32),
        z_s=z_s.astype(np.float32),
        z_g=z_g.astype(np.float32),
    )
