"""Metrics logging — the reconstruction of the reference's missing
``utils.utils.LossesLogger`` (imported at main.py:25, used at main.py:278-280
and main.py:353 as ``losses_logger.log(epoch, storer)`` where ``storer`` maps
loss-name -> list of per-batch values).

Writes both a human-readable text log (the reference's observable behavior:
per-epoch means appended to ``train_loss_{dataset}_{model_type}.txt``) and a
machine-readable JSONL stream for tooling.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Mapping, Sequence, Union

Number = Union[int, float]


class LossesLogger:
    def __init__(self, path: str):
        self.path = path
        self.jsonl_path = os.path.splitext(path)[0] + ".jsonl"
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        # fresh file per run, like a fresh logging.FileHandler
        with open(self.path, "w") as f:
            f.write("epoch,loss,value\n")
        with open(self.jsonl_path, "w"):
            pass

    def log(self, epoch: int, storer: Mapping[str, Sequence[Number]]) -> Dict[str, float]:
        """Append per-epoch means of each loss list; returns the means."""
        means = {k: float(sum(v)) / max(len(v), 1) for k, v in storer.items()}
        with open(self.path, "a") as f:
            for k, v in means.items():
                f.write(f"{epoch},{k},{v}\n")
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"epoch": epoch, "time": time.time(), **means}) + "\n")
        return means
