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


def host_rows(x) -> np.ndarray:
    """This host's batch rows of a jit output, as numpy.

    Single-process (and plain numpy) passes through. On pods, jitted
    eval programs consume GLOBAL batches (shard_batch assembles them
    with make_array_from_process_local_data), so their outputs span
    processes and ``np.asarray`` would raise ("jax.Array that spans
    non-addressable devices"). The addressable shards are exactly this
    host's rows — in local order, matching the host-local inputs that
    produced them — so ``gather_array(host_rows(x))`` reassembles the
    global order the id lists use. Shards replicated across mesh axes
    (fsdp/tp) dedup by their batch offset.
    """
    if isinstance(x, np.ndarray) or jax.process_count() == 1:
        return np.asarray(x)
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    return assemble_addressable_rows(
        [(s.index, s.data) for s in x.addressable_shards],
        x.shape, x.dtype)


def assemble_addressable_rows(shards, shape, dtype) -> np.ndarray:
    """Reassemble this host's rows from (index, data) shards.

    Shards replicated across mesh axes (fsdp/tp) dedup by index. When an
    output is also sharded over a NON-batch dim (e.g. a tp split
    propagated into an unpinned head output), each row group's fragments
    are tiled back together from their slice indices — keeping only one
    fragment per row offset would silently truncate features."""
    groups: dict = {}
    for idx, data in shards:
        rows = ((idx[0].start or 0, idx[0].stop if idx[0].stop is not None
                 else shape[0]) if idx else (0, shape[0]))
        key = tuple(
            (sl.start or 0, sl.stop if sl.stop is not None else shape[1 + i])
            for i, sl in enumerate(idx[1:]))
        groups.setdefault(rows, {}).setdefault(key, data)
    blocks = []
    for rows in sorted(groups):
        group = groups[rows]
        first = np.asarray(next(iter(group.values())))
        if first.shape[1:] == tuple(shape[1:]):
            blocks.append(first)
            continue
        fragments = sorted(group.items())
        block = np.empty((first.shape[0],) + tuple(shape[1:]), dtype)
        filled = 0
        for key, data in fragments:
            data = np.asarray(data)
            block[(slice(None),) + tuple(slice(a, b) for a, b in key)] = data
            filled += data.size
        if filled != block.size:
            raise ValueError(
                "host_rows: addressable shards do not tile the non-batch "
                f"dims of {tuple(shape)} (covered {filled}/{block.size} "
                "elements)")
        blocks.append(block)
    return np.concatenate(blocks, axis=0)


def gather_array(x: np.ndarray) -> np.ndarray:
    """Concatenate a per-host array along axis 0 across hosts.

    Per-host row counts may differ (eval shards trimmed of their
    padded_tail duplicates): rows are padded to the cross-host max for
    the allgather and each host's true count sliced back out — the
    ragged-gather semantics of the reference's ``ddp_allgather``
    (utils/distributed.py:133-151)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    counts = multihost_utils.process_allgather(
        np.asarray([x.shape[0]], np.int32)).reshape(-1)
    m = int(counts.max())
    if x.shape[0] < m:
        pad = [(0, m - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(x, pad)
    rows = multihost_utils.process_allgather(x)  # (hosts, m, ...)
    return np.concatenate([r[: int(c)] for r, c in zip(rows, counts)],
                          axis=0)


def sum_across_hosts(x: np.ndarray) -> np.ndarray:
    """Elementwise sum of a per-host array across hosts (identity on a
    single host). Combines disjoint partial results — e.g. each host's
    stride of the rerank score matrix (evaluation_mm.rerank_scores),
    where off-stride cells are zero.

    Chunked along axis 0 so the allgather materializes at most ~64 MB
    per host at a time — a full (hosts, n_text, n_cond) stack of a
    large retrieval matrix on a big pod would otherwise spike memory
    by hosts x matrix."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    row_bytes = max(x[0:1].nbytes, 1) if x.shape[0] else 1
    rows = max(1, (64 << 20) // row_bytes)
    out = np.empty_like(x)
    for s in range(0, x.shape[0], rows):
        out[s:s + rows] = multihost_utils.process_allgather(
            x[s:s + rows]).sum(axis=0)
    return out


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
