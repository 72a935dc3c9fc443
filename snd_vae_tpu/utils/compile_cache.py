"""Persistent XLA compilation cache.

Remote/tunneled TPU compiles are expensive (minutes for the scan-based
trainer programs) and jit caches are per-process, so every CLI invocation —
train, resume, each eval mode — used to recompile from scratch.  Pointing
JAX's persistent compilation cache at a directory makes recompiles
cross-process cache hits.  The reference has no analog (TF1 rebuilds its
graph per run, main.py:512).
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "SND_COMPILE_CACHE", os.path.expanduser("~/.cache/snd_vae_tpu/xla")
)


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> str:
    """Enable JAX's persistent compilation cache (idempotent).  Returns the
    cache directory.  Set SND_COMPILE_CACHE=0 to disable."""
    if cache_dir in ("0", "", "off"):
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    redirecting = jax.config.jax_compilation_cache_dir not in (None, cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if redirecting:
        # the cache object is created lazily and pinned to the directory it
        # first initialized with; updating the config alone leaves writes
        # going to the old directory.  reset_cache is private jax API — if an
        # upgrade moves it, a stale cache directory is degraded behavior, not
        # an error.
        try:
            from jax._src.compilation_cache import reset_cache
        except ImportError:
            import warnings

            warnings.warn(
                "jax._src.compilation_cache.reset_cache unavailable; "
                "compilation cache may keep writing to the previous directory"
            )
        else:
            reset_cache()
    return cache_dir
