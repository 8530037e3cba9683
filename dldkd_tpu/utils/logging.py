"""Logging + metrics writers.

Mirrors the reference's observability surface (SURVEY.md S5.5): stderr
logging with a file handler (`performance.log`), an append-only
train.log.txt, and per-step scalars. Scalars go to a JSONL file always, and
to TensorBoard when torch is importable (torch is CPU-only in this image and
used for nothing else on this path).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def setup_logging(results_dir: Optional[str] = None,
                  name: str = "performance") -> logging.Logger:
    logging.basicConfig(
        format="%(asctime)s.%(msecs)03d:%(levelname)s:%(name)s - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S", level=logging.INFO)
    logger = logging.getLogger("dldkd_tpu")
    if results_dir:
        os.makedirs(results_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(results_dir, f"{name}.log"))
        fh.setFormatter(logging.Formatter(
            "%(asctime)s:%(levelname)s:%(name)s - %(message)s"))
        logger.addHandler(fh)
    return logger


class MetricsWriter:
    """Per-step scalar sink: metrics.jsonl (+ TensorBoard if available)."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, tag_values: Dict[str, float], step: int) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in tag_values.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in tag_values.items():
                self._tb.add_scalar(k, float(v), step)

    def flush(self):
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()
