"""Tar-shard streaming dataset (webdataset equivalent)."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from tests.helpers import TINY_MODEL_CFG_JSON
from vast_tpu.config import EasyDict
from vast_tpu.data.src_dataset import SrcIndexedDataset
from vast_tpu.data.tokenizer import tiny_tokenizer


def make_shard(path, n, start=0, corrupt_one=False):
    from PIL import Image

    rs = np.random.RandomState(start)
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"img{i:05d}"
            buf = io.BytesIO()
            Image.fromarray(
                (rs.rand(40, 40, 3) * 255).astype(np.uint8)).save(
                    buf, format="JPEG")
            data = buf.getvalue()
            if corrupt_one and i == start:
                data = b"garbage"
            info = tarfile.TarInfo(key + ".jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"a man in the park {i}".encode()
            info = tarfile.TarInfo(key + ".txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))


def make_args():
    return EasyDict({
        "model_cfg": dict(TINY_MODEL_CFG_JSON),
        "run_cfg": {"seed": 0},
    })


def test_streams_samples_across_shards(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_shard(str(shard_dir / "s0.tar"), 3, 0)
    make_shard(str(shard_dir / "s1.tar"), 3, 3)
    d_cfg = {"type": "srcindexed", "training": False, "name": "laion",
             "txt": str(shard_dir), "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    samples = list(ds)
    assert len(samples) == 6
    s = samples[0]
    assert s["vision_frames"].shape[0] == 1
    assert s["vision_frames"].dtype == np.uint8
    assert "man" in s["raw_captions"]


def test_warn_and_continue_on_corrupt(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_shard(str(shard_dir / "s0.tar"), 3, 0, corrupt_one=True)
    d_cfg = {"type": "srcindexed", "training": False, "name": "laion",
             "txt": str(shard_dir), "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    samples = list(ds)
    assert len(samples) == 2  # corrupt sample skipped, not fatal


def test_host_sharding(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for i in range(4):
        make_shard(str(shard_dir / f"s{i}.tar"), 1, i)
    d_cfg = {"type": "srcindexed", "training": False, "name": "laion",
             "txt": str(shard_dir), "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 1}
    a = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer(),
                          host_id=0, num_hosts=2)
    b = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer(),
                          host_id=1, num_hosts=2)
    ids_a = {s["id"] for s in a}
    ids_b = {s["id"] for s in b}
    assert not ids_a & ids_b
    assert len(ids_a | ids_b) == 4
