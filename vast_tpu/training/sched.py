"""LR schedules (reference: utils/sched.py — ratio of peak LR)."""

from __future__ import annotations

import math


def warmup_linear(x: float, warmup_ratio: float) -> float:
    if x < warmup_ratio:
        return x / warmup_ratio
    return max((x - 1.0) / (warmup_ratio - 1.0), 0.0)


def warmup_cosine(x: float, warmup_ratio: float) -> float:
    if x < warmup_ratio:
        return x / warmup_ratio
    return 0.5 * (1.0 + math.cos(math.pi * x))


def warmup_constant(x: float, warmup_ratio: float) -> float:
    if x < warmup_ratio:
        return x / warmup_ratio
    return 1.0


SCHEDULES = {
    "warmup_linear": warmup_linear,
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
}


def get_lr_ratio(global_step: int, num_train_steps: int, scheduler: str,
                 warmup_ratio: float) -> float:
    """Ratio of peak LR at ``global_step`` (utils/sched.py:22-31)."""
    x = global_step / max(num_train_steps, 1)
    return SCHEDULES[scheduler](x, warmup_ratio)


def make_optax_schedule(num_train_steps: int, scheduler: str,
                        warmup_ratio: float):
    """jnp-traced version for optax (same piecewise math)."""
    import jax.numpy as jnp

    def fn(count):
        x = count / max(num_train_steps, 1)
        w = warmup_ratio
        warm = x / w
        if scheduler == "warmup_linear":
            rest = jnp.maximum((x - 1.0) / (w - 1.0), 0.0)
        elif scheduler == "warmup_cosine":
            rest = 0.5 * (1.0 + jnp.cos(jnp.pi * x))
        elif scheduler == "warmup_constant":
            rest = jnp.ones_like(x)
        else:
            raise ValueError(scheduler)
        return jnp.where(x < w, warm, rest)

    return fn
