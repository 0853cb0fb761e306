"""Tracing / profiling hooks (absent from the reference — SURVEY §5.1).

* ``StepTimer`` — wall-clock per-step timing with EMA + percentile summary
  (the reference's ``verbose_time`` flag existed but was never read,
  utils/pipeline.py:17).
* ``trace`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace for a window of steps.
* ``device_memory_stats`` — HBM usage snapshot per device.
"""

from __future__ import annotations

import contextlib
import time

import jax

from vast_tpu.logger import LOGGER


class StepTimer:
    def __init__(self, smooth: float = 0.95):
        self._last = None
        self._ema = None
        self._smooth = smooth
        self._history: list[float] = []

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._ema = dt if self._ema is None else (
                self._ema * self._smooth + dt * (1 - self._smooth))
            self._history.append(dt)
            if len(self._history) > 10000:
                del self._history[:5000]
        self._last = now
        return dt

    @property
    def ema_s(self) -> float | None:
        return self._ema

    def summary(self) -> dict:
        if not self._history:
            return {}
        hist = sorted(self._history)
        n = len(hist)
        return {
            "steps": n,
            "mean_s": sum(hist) / n,
            "p50_s": hist[n // 2],
            "p90_s": hist[int(n * 0.9)],
            "max_s": hist[-1],
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace window -> TensorBoard trace in log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOGGER.info("profiler trace written to %s", log_dir)


def device_memory_stats() -> dict:
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
