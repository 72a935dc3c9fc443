"""Ambient-mesh sharding hints for in-model activation partitioning.

The reference has no model parallelism (single device, main.py:34-37).  Here
the flagship model's large activations — the motif conv's [B,N,N,h]
intermediates (layers.py:143-198) and the E2E decoder's [B,N,N,C] maps
(layers.py:431-450) — carry ``with_sharding_constraint`` hints that partition
the leading node axis over the mesh's ``model`` axis, so GSPMD keeps them
distributed instead of silently all-gathering per device.  XLA inserts the
collectives (an all-gather of the small [B,N,h] j-indexed terms, a
reduce-scatter for the E2E column conv) and they ride ICI.

The hints resolve against the *ambient* mesh (``jax.set_mesh``): without an
active mesh, or when the mesh lacks the named axis, they are identity — the
same model code runs single-chip, under pjit-style GSPMD, and in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

# canonical axis names of the 2-D ('data', 'model') mesh (parallel/mesh.py)
DATA_AXIS = "data"
MODEL_AXIS = "model"


def _ambient_axes():
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:
        return ()
    if mesh is None or getattr(mesh, "empty", True):
        return ()
    return tuple(mesh.axis_names)


def constrain(x, *spec):
    """``with_sharding_constraint(x, P(*spec))`` against the ambient mesh.

    Axis names absent from the ambient mesh are dropped from the spec (so a
    'data'-only mesh still shards the batch axis), and the call is identity
    when no mesh is active or nothing remains to shard.
    """
    axes = _ambient_axes()
    if not axes:
        return x
    cleaned = []
    for s in spec:
        if s is None or s in axes:
            cleaned.append(s)
        elif isinstance(s, (tuple, list)):
            kept = tuple(a for a in s if a in axes)
            cleaned.append(kept if kept else None)
        else:
            cleaned.append(None)
    if all(s is None for s in cleaned):
        return x
    return jax.lax.with_sharding_constraint(x, P(*cleaned))


# test/debug hook: when set to a callable, every shard_nodes site reports
# (tag, sharding) of its constrained activation at compile time via
# jax.debug.inspect_array_sharding — how the suite proves activations are
# actually partitioned rather than silently all-gathered.
_INSPECT = None


def shard_nodes(x, batch_axes: int = 1, tag: str = ""):
    """Hint: partition ``x``'s first node axis over 'model' (and its leading
    batch axes over 'data').  ``x`` is [B..., N, ...]; only the node axis at
    position ``batch_axes`` is sharded."""
    spec = [DATA_AXIS] + [None] * (batch_axes - 1) + [MODEL_AXIS]
    spec += [None] * (x.ndim - len(spec))
    out = constrain(x, *spec)
    if _INSPECT is not None and _ambient_axes():
        jax.debug.inspect_array_sharding(
            out, callback=lambda s, t=tag or "activation": _INSPECT(t, s)
        )
    return out
