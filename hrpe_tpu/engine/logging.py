"""Experiment logging: directories + TensorBoard + config provenance.

Ref parity: lib/utils/utils.py:51-61 `create_logger` — experiment dir with
ckpt/ + log/, a TensorBoard writer, and the config YAML copied in as
config.yaml so test-time can reconstruct it (scripts/test.py:279-350).
TensorBoard writing uses torch.utils.tensorboard (torch-cpu is present);
falls back to a JSONL scalar log when unavailable.
"""

from __future__ import annotations

import json
import os
import shutil


class ScalarWriter:
    """TensorBoard writer with JSONL fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        else:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n"
            )
            self._jsonl.flush()

    def flush(self):
        if self._tb is not None:
            self._tb.flush()


def create_logger(exp_name: str, config_path: str | None, root: str = "experiments"):
    """Returns (save_dir, ckpt_dir, log_dir, writer)."""
    save_dir = os.path.join(root, exp_name)
    ckpt_dir = os.path.join(save_dir, "ckpt")
    log_dir = os.path.join(save_dir, "log")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    if config_path and os.path.exists(config_path):
        shutil.copy(config_path, os.path.join(save_dir, "config.yaml"))
    return save_dir, ckpt_dir, log_dir, ScalarWriter(log_dir)


class AverageMeter:
    """Running mean (torchnet AverageValueMeter equivalent)."""

    def __init__(self):
        self.sum = 0.0
        self.n = 0

    def add(self, v, k: int = 1):
        self.sum += float(v) * k
        self.n += k

    @property
    def mean(self):
        return self.sum / max(self.n, 1)
