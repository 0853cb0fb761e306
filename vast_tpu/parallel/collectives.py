"""Host-level gathers for evaluation (replaces utils/distributed.py's
pickle-based ``all_gather_list`` / ragged ``ddp_allgather``).

Single-process runs are identity. Multi-host runs use
``jax.experimental.multihost_utils.process_allgather`` — arrays gather
directly; Python object lists travel as utf-8 JSON padded to the max
length across hosts (the reference used pickled byte tensors over NCCL,
utils/distributed.py:98-114).
"""

from __future__ import annotations

import json

import numpy as np

import jax


def gather_array(x: np.ndarray) -> np.ndarray:
    """Concatenate a per-host array along axis 0 across hosts."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(np.asarray(x))
    return np.concatenate(list(out), axis=0) if out.ndim > x.ndim else out


def gather_list(items: list) -> list:
    """Concatenate a per-host list of JSON-serializable items across hosts."""
    if jax.process_count() == 1:
        return list(items)
    from jax.experimental import multihost_utils

    payload = json.dumps(items).encode("utf-8")
    n = np.asarray([len(payload)], np.int32)
    max_len = int(multihost_utils.process_allgather(n).max())
    buf = np.zeros(max_len, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    bufs = multihost_utils.process_allgather(buf)
    lens = multihost_utils.process_allgather(n).reshape(-1)
    out: list = []
    for row, ln in zip(bufs, lens):
        out.extend(json.loads(bytes(row[: int(ln)]).decode("utf-8")))
    return out
