"""Observability: tensorboard scalars/images + jax.profiler hooks.

The reference logs via tensorboardX when importable
(train_mesh_gaussian.py:25-29,176-211: per-iter losses, eval PSNR +
sample renders, opacity histogram, point counts); profiling is absent
there (SURVEY.md §5.1) — here `profile_trace` wraps `jax.profiler.trace`
as a first-class hook.
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


class TrainLogger:
    """Thin tensorboardX wrapper that degrades to stdout-only."""

    def __init__(self, model_path: str, enabled: bool = True):
        self.writer = None
        if enabled:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(os.path.join(model_path, "tb"))
            except Exception:
                print("[log] tensorboardX unavailable: stdout only")

    def scalars(self, step: int, values: dict) -> None:
        if self.writer is None:
            return
        for k, v in values.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def image(self, step: int, tag: str, chw) -> None:
        if self.writer is None:
            return
        self.writer.add_image(tag, np.clip(np.asarray(chw), 0, 1), step)

    def histogram(self, step: int, tag: str, values) -> None:
        if self.writer is None:
            return
        self.writer.add_histogram(tag, np.asarray(values), step)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Rolling per-step wall-clock stats for progress reporting."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: list[float] = []
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean_ms(self) -> float:
        return 1e3 * (sum(self.times) / max(len(self.times), 1))
