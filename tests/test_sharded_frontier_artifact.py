"""The sharded-frontier claim must stay backed by recorded compiler
evidence (VERDICT r4 item 2): "past the single-chip frontier, shard nodes
over the mesh" rests on benchmarks/sharded_frontier.py's AOT numbers —
per-device temp memory, flops, HBM bytes, and per-kind collective ICI bytes
of ONE full optimization step compiled over the 8-device mesh at frontier N.

A live N=1536 compile takes ~28 min on this 1-core host (measured
2026-08-20), so the suite guards the RECORDED artifact
(benchmarks/results/sharded_frontier_r5.jsonl, committed) instead of
recompiling: the rows must exist, be structurally complete, and the
per-device temp must sit far below the v5e's 16 GiB.  The live-compile
guard on the same claim runs at N=256 in test_mesh_memory.py (the ratio is
N-stable); re-run the benchmark and refresh the artifact if the sharding
design changes.
"""

import json
import os

import pytest

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "results", "sharded_frontier_r5.jsonl",
)


def _rows():
    if not os.path.exists(ARTIFACT):
        pytest.fail(
            "sharded-frontier artifact missing: run "
            "`python benchmarks/sharded_frontier.py` (one --n per "
            "invocation, background) and commit the output to "
            f"{ARTIFACT}"
        )
    rows = {}
    with open(ARTIFACT) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                r = json.loads(line)
                if r.get("bench") == "sharded_frontier":
                    rows[r["n"]] = r
    return rows


def test_frontier_rows_recorded():
    rows = _rows()
    assert 1536 in rows, "the N=1536 frontier row (the measured 8 s " \
        "single-chip comparison point) must be recorded"


def test_n1536_per_device_temp_far_below_chip():
    r = _rows()[1536]
    # the single-chip N=1536 program lives at the 16 GiB ceiling (the
    # serialized-schedule regime); the 8-way sharded step must sit far
    # below it — the headroom IS the claim.
    assert r["temp_gib_per_dev"] < 8.0, r["temp_gib_per_dev"]
    assert r["arg_gib_per_dev"] < 2.0


def test_n1536_row_structurally_complete():
    r = _rows()[1536]
    assert r["flops_per_dev"] > 0
    assert r["hbm_bytes_per_dev"] > 0
    assert r["ici_bytes_per_dev"] > 0, "a comm-free 'sharded' step means " \
        "the partitioner replicated instead of sharding"
    assert sum(r["collective_ops"].values()) > 0
    assert r["pred_step_s"] > 0
