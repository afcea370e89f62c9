"""Metric logging: tee stdout, JSONL metrics, optional TensorBoard/W&B.

Observability parity with the reference (SURVEY.md §5: wandb via
accelerate.init_trackers, python logging file handlers, stdout Tee,
train.py:59-76). All writers degrade gracefully when a backend is absent
(zero-egress environments run JSONL-only).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class Tee:
    """Mirror stdout to a file (reference train.py:59-76)."""

    def __init__(self, path: str):
        self.file = open(path, 'a')
        self.stdout = sys.stdout
        sys.stdout = self

    def write(self, data):
        self.file.write(data)
        self.stdout.write(data)

    def flush(self):
        self.file.flush()
        self.stdout.flush()

    def close(self):
        sys.stdout = self.stdout
        self.file.close()


class MetricLogger:
    """JSONL always; TensorBoard / wandb when importable and requested."""

    def __init__(self, output_dir: str, use_tensorboard: bool = True,
                 use_wandb: bool = False, project: str = 'fitv2_tpu',
                 run_name: Optional[str] = None):
        os.makedirs(output_dir, exist_ok=True)
        self.jsonl = open(os.path.join(output_dir, 'metrics.jsonl'), 'a')
        self.tb = None
        self.wandb = None
        if use_tensorboard:
            try:
                from flax.metrics import tensorboard
                self.tb = tensorboard.SummaryWriter(
                    os.path.join(output_dir, 'tb'))
            except ImportError:
                pass
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb.init(project=project, name=run_name,
                                        dir=output_dir)
            except Exception:
                self.wandb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {'step': step, 'time': time.time(), **metrics}
        self.jsonl.write(json.dumps(rec) + '\n')
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.scalar(k, v, step)
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def close(self) -> None:
        self.jsonl.close()
        if self.tb is not None:
            self.tb.flush()
        if self.wandb is not None:
            self.wandb.finish()
