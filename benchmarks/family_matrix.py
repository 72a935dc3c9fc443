"""End-to-end model-family matrix on real hardware.

Drives every model family / dataset / loss variant the reference supports
through the actual CLI (train + generation eval where meaningful) and prints
one summary JSON line per family.  This is the e2e counterpart of the unit
suite: it proves each family compiles, trains, checkpoints, and evaluates on
the TPU — the reference's own sweep only ever exercises
dataset=synthetic/model_type=disentangled (main.py:502-525).

Run from /root/repo:  python benchmarks/family_matrix.py [epochs]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

FAMILIES = [
    # (label, dataset, model_type, run generation eval?)
    ("disentangled/synthetic1", "synthetic1", "disentangled", True),
    ("base-joint/synthetic2", "synthetic2", "base", True),
    ("disentangled_C/synthetic2", "synthetic2", "disentangled_C", False),
    ("NED-VAE-IP/synthetic2", "synthetic2", "NED-VAE-IP", False),
    ("beta-TCVAE/synthetic2", "synthetic2", "beta-TCVAE", False),
    ("geoGCN/synthetic2", "synthetic2", "geoGCN", False),
    ("posGCN/synthetic2", "synthetic2", "posGCN", False),
    ("disentangled-3D/protein", "protein", "disentangled", True),
    ("disentangled-3D/mnist", "mnist", "disentangled", False),
    ("base-joint/scene", "scene", "base", False),
]

# mnist: f32 (its +10-shifted coordinates make bf16 KLs diverge) and small
# epoch chunks (its ~2 s/epoch x chunk must stay under the tunneled worker's
# ~60 s single-dispatch tolerance) — BASELINE.md "mnist caveats".
SPECIAL = {"mnist": {"bf16": False, "chunk_cap": 5}}


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    from snd_vae_tpu import cli

    results = {}
    for label, dataset, model_type, do_gen in FAMILIES:
        workdir = tempfile.mkdtemp(prefix=f"fam_{dataset}_{model_type}_")
        special = SPECIAL.get(dataset, {})
        chunk = min(max(epochs // 2, 1), special.get("chunk_cap", epochs))
        argv = [
            "--dataset", dataset, "--model-type", model_type,
            "--type", "train", "--epochs", str(epochs),
            "--epoch-chunk", str(chunk),
            "--workdir", workdir,
        ] + ([] if special.get("bf16") is False else ["--bf16"])
        t0 = time.time()
        try:
            means = cli.main(argv)
            row = {"train_s": round(time.time() - t0, 1),
                   "loss": round(float(means["loss"]), 4)}
            if "adj_acc" in means:
                row["adj_acc"] = round(float(means["adj_acc"]), 4)
            if do_gen:
                gen = cli.main([
                    "--dataset", dataset, "--model-type", model_type,
                    "--type", "test_generation", "--workdir", workdir,
                ])
                row["degree_mmd"] = round(float(gen["degree_mmd"]), 4)
                row["density_gen"] = round(float(gen["density_gen"]), 4)
            row["ok"] = True
        except Exception as e:  # keep the matrix going; report the failure
            row = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        results[label] = row
        print(f"FAMILY {label}: {json.dumps(row)}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
