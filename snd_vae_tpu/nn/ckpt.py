"""Selective rematerialization: named checkpoint tags + policies.

``Config.remat`` wraps the motif convs and the adjacency head in
``nn.remat`` (save only module boundaries, recompute ALL internals — the
all-or-nothing mode).  The HBM ceiling at large N, though, is specifically
the O(B·N²·h) intermediates inside those modules (BASELINE.md "Frontier
probe": the backward tape's [B·S,N,N,h] residuals), while their O(B·N·h)
internals are cheap to keep.  Tagging every N²-scale intermediate with
``jax.ad_checkpoint.checkpoint_name`` lets ``Config.remat_policy`` pick a
point between the extremes:

  * ``recompute-big`` — save everything EXCEPT the named N² tensors
    (jax.checkpoint_policies.save_anything_except_these_names): the big
    residuals are dropped exactly as in full remat, but the backward pass
    recomputes only their producers instead of the whole module.
  * ``dots-no-batch`` — jax.checkpoint_policies.checkpoint_dots_with_no_
    batch_dims_saveable: the classic save-small-matmuls policy.

An ``offload-big`` policy (save the named tensors to HOST memory via
save_and_offload_only_these_names) existed through round 4; it was measured
at N=1024 on 2026-08-20 at 136.4 s/step vs 0.34 s no-remat — the tunneled
worker's device<->host path is ~400x too slow for per-step residual
traffic — and deleted (BASELINE.md "Selective rematerialization").

Tags are identity outside a ``jax.checkpoint`` region, so the hot ops carry
them unconditionally.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.ad_checkpoint

# Every N²-scale (or larger) intermediate in the hot path carries one of
# these names.  Keep in sync with the tag() call sites (guarded at runtime by
# the assert in tag() and by tests/test_remat_policies.py's repo scan):
#   spatial_conv.spatial_graph_conv      — d_ij / rf / wf / m3_sum (the
#     post-rank-R residual set; the e/f/s/t pairwise tensors of the original
#     factoring are no longer materialized)
#   spatial_conv.spatial_graph_conv_3d   — nd4 / m4_sum / tm / m3_sum
#   models *._adj_head / edge_conv.E2E   — the pairwise map + E2E layer outs
# The bench-only Pallas branch's f_ik ([B,N,N,h]) is INTENTIONALLY untagged:
# the fused kernel's custom VJP consumes it in backward, so a policy dropping
# it would force a recompute the kernel cannot express; that branch is never
# reachable from model config (nn/spatial_conv.force_pallas is bench-only).
# Likewise the blocked streamed lowering (spatial_conv._blocked_nt) carries
# no tags: its pairwise tensors live only inside a checkpointed scan body
# that already drops and recomputes them per block.
BIG_NAMES = (
    "sgc.d_ij", "sgc.rf", "sgc.wf", "sgc.m3_sum",
    "sgc3.nd4", "sgc3.m4_sum", "sgc3.tm", "sgc3.m3_sum",
    "dec.pair", "dec.e2e",
)


def tag(x, name: str):
    """Mark ``x`` as a named rematerialization candidate (identity outside a
    checkpoint region).  ``name`` must be in BIG_NAMES so the policies below
    see every site — enforced here (trace-time only, free at runtime) so a
    dynamically-constructed call site cannot silently exempt a residual."""
    assert name in BIG_NAMES, (
        f"tag name {name!r} not registered in nn.ckpt.BIG_NAMES — the remat "
        "policies would silently miss this residual"
    )
    return jax.ad_checkpoint.checkpoint_name(x, name)


def policy_from_config(remat: bool, remat_policy: Optional[str]):
    """Resolve (Config.remat, Config.remat_policy) to a jax.checkpoint
    policy, or None for the save-nothing default of plain remat."""
    if not remat or remat_policy is None:
        return None
    cp = jax.checkpoint_policies
    if remat_policy == "recompute-big":
        return cp.save_anything_except_these_names(*BIG_NAMES)
    if remat_policy == "dots-no-batch":
        return cp.checkpoint_dots_with_no_batch_dims
    raise ValueError(
        f"unknown remat_policy {remat_policy!r}; "
        "expected recompute-big | dots-no-batch"
    )
