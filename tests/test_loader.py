"""BatchLoader host sharding + eval batch alignment.

The SPMD invariant: on a pod, every host must enter the same jitted
programs with the same shapes the same number of times. BatchLoader pads
eval index shards to a common length (recording ``padded_tail``), and
evaluation's ``_full_batches`` repeat-pads the final ragged batch to the
loader batch size. Together: exactly-once coverage after the drivers drop
``padded_tail`` duplicates, equal batch counts/shapes across hosts.
Replaces the reference's uneven DistributedSampler_wopadding + ragged
pickle gathers (utils/distributed.py:133-165), which only work because
torch DDP eval is not a collective program.
"""

import numpy as np
import pytest

from vast_tpu.data.loader import BatchLoader
from vast_tpu.evaluation.evaluation_mm import _full_batches


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i

    def collate(self, samples):
        return {"x": np.asarray(samples), "ids": [f"id{s}" for s in samples]}


@pytest.mark.parametrize("n,hosts,bs", [(17, 4, 3), (16, 4, 4), (5, 4, 2),
                                        (3, 4, 2), (10, 1, 3)])
def test_eval_shards_align_and_cover(n, hosts, bs):
    loaders = [BatchLoader(_DS(n), bs, shuffle=False, drop_last=False,
                           num_workers=1, host_id=h, num_hosts=hosts)
               for h in range(hosts)]
    per_host = [list(ld) for ld in loaders]
    # equal batch counts AND equal per-position batch shapes across hosts
    assert len({len(b) for b in per_host}) == 1
    assert all(len(b) == len(loaders[0]) for b in per_host)
    for step in range(len(per_host[0])):
        assert len({p[step]["x"].shape for p in per_host}) == 1
    # exactly-once coverage after dropping each host's padded_tail
    seen = []
    for ld, batches in zip(loaders, per_host):
        rows = np.concatenate([b["x"] for b in batches])
        assert ld.padded_tail >= 0
        seen += list(rows[: len(rows) - ld.padded_tail])
    assert sorted(seen) == list(range(n))


def test_full_batches_pads_final_and_reports_valid():
    ld = BatchLoader(_DS(7), 3, shuffle=False, drop_last=False,
                     num_workers=1)
    out = list(_full_batches(ld))
    assert [nv for _, nv, _nt in out] == [3, 3, 1]
    # no text arrays here: n_valid_txt mirrors n_valid
    assert [nt for _, _nv, nt in out] == [3, 3, 1]
    # every batch now has the full static shape; list fields padded too
    assert all(b["x"].shape == (3,) for b, _, _ in out)
    assert all(len(b["ids"]) == 3 for b, _, _ in out)
    # padding repeats the last row, and valid rows are untouched
    last, nv, _ = out[-1]
    assert list(last["x"]) == [6, 6, 6] and nv == 1
    # concatenated valid rows reproduce the dataset exactly
    rows = np.concatenate([b["x"][:nv] for b, nv, _ in out])
    assert list(rows) == list(range(7))


def test_train_loader_drop_last_counts_unchanged():
    ld = BatchLoader(_DS(17), 3, shuffle=True, drop_last=True,
                     num_workers=1, host_id=1, num_hosts=4)
    batches = list(ld)
    assert len(batches) == len(ld) == (17 // 4) // 3
    assert ld.padded_tail == 0


class _RaisingDS(_DS):
    def collate(self, samples):
        raise ValueError("collate boom")


def test_producer_exception_propagates_not_hangs():
    """A dying producer thread must surface its exception to the
    consumer, not leave it blocked on queue.get() forever (a silent
    pod-wide hang)."""
    ld = BatchLoader(_RaisingDS(6), 3, shuffle=False, drop_last=False,
                     num_workers=1)
    with pytest.raises(ValueError, match="collate boom"):
        list(ld)


def test_stream_producer_exception_propagates():
    from vast_tpu.data.loader import StreamBatchLoader

    class BadStream:
        def __iter__(self):
            yield {"x": 1}
            raise RuntimeError("stream boom")

        def collate(self, samples):
            return samples

    with pytest.raises(RuntimeError, match="stream boom"):
        list(StreamBatchLoader(BadStream(), batch_size=1))


def test_metaloader_zero_ratio_still_sampled():
    """A dataset whose derived step ratio floors to 0 keeps one sampling
    slot (and an all-zero pool must not crash rng.choice)."""
    from vast_tpu.data.loader import MetaLoader

    class Tiny:
        def __iter__(self):
            while True:
                yield {"x": 0}

    ml = MetaLoader({"a": (Tiny(), 0), "b": (Tiny(), 0)})
    names = {name for name, _ in zip(
        (nb[0] for nb in iter(ml)), range(20))}
    assert names == {"a", "b"}
