"""Run-dir metrics logging and experiment provenance.

Equivalent of the reference `Logger` (`/root/reference/core/models/ff-raft/
train.py:29-87`): running means flushed every SUM_FREQ=100 steps, per-run
directory with a config snapshot, validation results appended. TensorBoard
is optional (torch's SummaryWriter when available); the primary sink is a
JSONL stream that survives headless TPU pods.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import shutil
import time
from typing import Dict, Optional


class MetricsLogger:
    SUM_FREQ = 100

    def __init__(self, log_dir: str, config_path: Optional[str] = None,
                 name: str = "run"):
        ts = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
        self.log_dir = os.path.join(log_dir, f"{ts}_{name}")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(os.path.join(self.log_dir, "checkpoints"), exist_ok=True)
        if config_path and os.path.exists(config_path):
            shutil.copyfile(config_path, os.path.join(self.log_dir, "config.yaml"))

        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        self._running: Dict[str, float] = {}
        self.total_steps = 0
        self._t0 = time.time()

        self.logger = logging.getLogger(f"focusflow.{name}")
        self.logger.setLevel(logging.INFO)
        fh = logging.FileHandler(os.path.join(self.log_dir, "train.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
        self.logger.addHandler(fh)

        self._tb = None
        try:  # optional TensorBoard
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=self.log_dir)
        except Exception:
            pass

    def push(self, metrics: Dict[str, float]) -> None:
        self.total_steps += 1
        for k, v in metrics.items():
            self._running[k] = self._running.get(k, 0.0) + float(v)
        if self.total_steps % self.SUM_FREQ == self.SUM_FREQ - 1:
            means = {k: v / self.SUM_FREQ for k, v in self._running.items()}
            dt = time.time() - self._t0
            means["steps_per_sec"] = self.SUM_FREQ / max(dt, 1e-9)
            self.write_dict(means, prefix="train/")
            self._running = {}
            self._t0 = time.time()

    def write_dict(self, results: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": self.total_steps, **{prefix + k: v for k, v in results.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        self.logger.info(json.dumps(rec))
        if self._tb is not None:
            for k, v in results.items():
                self._tb.add_scalar(prefix + k, v, self.total_steps)

    def info(self, msg: str) -> None:
        self.logger.info(msg)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
