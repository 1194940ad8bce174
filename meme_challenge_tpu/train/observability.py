"""Observability: scalar logging + device profiling.

Parity: reference utils/utils.py:25-60 (TensorBoard scalars: Train/Loss,
Train/F1..., Validation/*, Stats/time_per_train_iter, Stats/learning_rate,
Stats/time_validation — same scalar names here) and SURVEY.md §5's aux
subsystems. Two sinks:

- **TensorBoard** via torch's SummaryWriter when available (the reference's
  sink; torch ships in this image),
- **JSONL** always (``scalars.jsonl`` — cheap, grep-able, no deps).

Profiling: ``profile_trace`` wraps a block in ``jax.profiler`` traces — the
TPU-native replacement for the reference's wall-clock-only instrumentation
(train_template.py:372-384).
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Iterable, Optional, Tuple

logger = logging.getLogger("meme_challenge_tpu.observability")


class ScalarWriter:
    """Fan-out scalar writer (TensorBoard + JSONL)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl_path = os.path.join(log_dir, "scalars.jsonl")
        self._jsonl = open(self._jsonl_path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception as e:  # tensorboard optional
                logger.info("TensorBoard writer unavailable (%s); "
                            "JSONL only.", e)

    def add_scalar(self, name: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"name": name, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)

    def add_scalars(self, triples: Iterable[Tuple[str, int, float]]) -> None:
        for name, step, value in triples:
            self.add_scalar(name, value, step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace around a block (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
