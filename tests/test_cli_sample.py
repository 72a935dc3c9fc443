"""CLI sample-mode artifacts (reference 'sample' build mode, model.py:88-90,
which decodes and discards; here generation persists for downstream use)."""

import json
import os

import numpy as np


def test_sample_mode_saves_npy(tmp_path):
    from snd_vae_tpu import cli

    out = cli.main([
        "--dataset", "synthetic2", "--type", "sample",
        "--num-generate", "4", "--workdir", str(tmp_path),
    ])
    gen_dir = out["dir"]
    assert out["num_generated"] == 4
    adj = np.load(os.path.join(gen_dir, "adj.npy"))
    coords = np.load(os.path.join(gen_dir, "coords.npy"))
    feats = np.load(os.path.join(gen_dir, "node_feat.npy"))
    assert adj.shape == (4, 25, 25)
    assert coords.shape == (4, 25, 2)
    assert feats.shape[:2] == (4, 25)
    assert set(np.unique(adj)).issubset({0.0, 1.0})
    assert np.isfinite(coords).all()
