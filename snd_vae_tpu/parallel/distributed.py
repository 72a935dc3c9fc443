"""Multi-host (DCN) initialization.

The reference is strictly single-process (one GPU, main.py:34-37).  The
TPU-native framework scales across hosts the JAX way: every process calls
``jax.distributed.initialize`` before any backend touch, then builds the SAME
global ``('data', 'model')`` mesh over ``jax.devices()`` (all processes'
devices) and runs the identical pjit program — XLA routes data-parallel
gradient psums over DCN between hosts and keeps model-axis collectives on
ICI within a host's slice (SURVEY §7 construction item 7).

On a TPU pod slice all arguments are auto-detected from the environment; on
CPU/GPU clusters pass coordinator/process info explicitly or via the
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID environment
variables.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Call ``jax.distributed.initialize`` (idempotent) and return this
    process's id.

    Must run before the first backend initialization.  Arguments default to
    the JAX_* environment variables; on TPU pod slices everything can be
    auto-detected and all three may stay None.
    """
    try:  # private module: the only initialized-check across jax versions
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except (ImportError, AttributeError):  # module or attrs moved in a
        already = False  # future jax: rely on initialize() raising if doubled
    if already:
        return jax.process_index()

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
