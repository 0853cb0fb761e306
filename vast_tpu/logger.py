"""Logging + running metrics.

Reference behaviors reproduced: single global logger, rank-0-only file
logging (utils/logger.py:7-14, utils/initialize.py:24-28), EMA loss meter
(utils/logger.py:18-33).
"""

import logging
import os

_LOG_FMT = "%(asctime)s - %(levelname)s - %(name)s -   %(message)s"
_DATE_FMT = "%m/%d/%Y %H:%M:%S"
logging.basicConfig(format=_LOG_FMT, datefmt=_DATE_FMT, level=logging.INFO)
LOGGER = logging.getLogger("vast_tpu")


def add_log_to_file(log_path: str) -> None:
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    fh = logging.FileHandler(log_path)
    fh.setFormatter(logging.Formatter(_LOG_FMT, _DATE_FMT))
    LOGGER.addHandler(fh)


def disable_logging() -> None:
    """Silence non-primary hosts (reference: utils/logger.py NoOp pattern)."""
    LOGGER.setLevel(logging.ERROR)


class RunningMeter:
    """Exponential-moving-average meter for losses (smooth=0.99)."""

    def __init__(self, name: str = "", val: float | None = None, smooth: float = 0.99):
        self._name = name
        self._smooth = smooth
        self._val = val

    def __call__(self, value: float) -> None:
        val = (
            value
            if self._val is None
            else self._val * self._smooth + value * (1 - self._smooth)
        )
        if val == float("inf") or val != val:  # inf / nan guard
            return
        self._val = val

    def __str__(self) -> str:
        return f"{self._name}: {self._val:.4f}"

    @property
    def val(self) -> float | None:
        return self._val

    @property
    def name(self) -> str:
        return self._name


class NoOp:
    """Absorbs any call; used on non-primary processes (utils/tool.py:3)."""

    def __getattr__(self, name):
        return self.noop

    def noop(self, *args, **kwargs):
        return
