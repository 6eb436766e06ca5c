"""Training observability (SURVEY.md §5).

The reference's only telemetry is a print every 50 steps and sample
grids (histoGAN/histoGAN.py:1093-1105). Here: a JSONL metrics log with
step time / imgs-per-sec, and optional jax.profiler trace capture.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class MetricsLogger:
    """Appends one JSON object per logged step to <dir>/metrics.jsonl."""

    def __init__(self, log_dir, name: str, every: int = 50,
                 imgs_per_step: Optional[int] = None):
        self.path = Path(log_dir) / name / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.every = every
        self.imgs_per_step = imgs_per_step
        self._last_time: Optional[float] = None
        self._last_step: Optional[int] = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        now = time.perf_counter()
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if self._last_time is not None and step > self._last_step:
            dt = (now - self._last_time) / (step - self._last_step)
            row["step_time_s"] = round(dt, 5)
            if self.imgs_per_step:
                row["imgs_per_sec"] = round(self.imgs_per_step / dt, 2)
        self._last_time = now
        self._last_step = step
        if step % self.every == 0:
            with self.path.open("a") as f:
                f.write(json.dumps(row) + "\n")


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+count)."""

    def __init__(self, trace_dir, start: int, count: int = 5):
        self.trace_dir = str(trace_dir)
        self.start = start
        self.stop = start + count
        self._active = False

    def step(self, step: int) -> None:
        import jax

        if step == self.start and not self._active:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
