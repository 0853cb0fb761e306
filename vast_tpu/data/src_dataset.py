"""Tar-shard streaming dataset (reference: data/IndexSrc.py, webdataset).

Streams (id, image/video bytes, caption) records from ``.tar`` shards with
warn-and-continue error policy (IndexSrc.py:140-144). Implemented on
``tarfile`` directly — no webdataset dependency. Shards are sharded across
hosts by index; an infinite iterator reshuffles shard order per epoch.
"""

from __future__ import annotations

import io
import json
import os
import random
import tarfile

import numpy as np

from vast_tpu.logger import LOGGER


class SrcIndexedDataset:
    """Iterable over samples from tar shards (laion-style: .jpg + .txt)."""

    def __init__(self, d_cfg, args, tokenizer, host_id: int = 0,
                 num_hosts: int = 1):
        src = d_cfg["txt"] if "txt" in d_cfg else d_cfg["vision"]
        if os.path.isdir(src):
            self.shards = sorted(
                os.path.join(src, f) for f in os.listdir(src)
                if f.endswith(".tar"))
        else:
            self.shards = [src]
        self.shards = self.shards[host_id::num_hosts]
        self.d_cfg = d_cfg
        self.tokenizer = tokenizer
        self.cfg = args.model_cfg
        self.training = d_cfg.get("training", True)
        self._rng = random.Random(args.run_cfg.get("seed", 50) + host_id)
        from vast_tpu.data.vision import _load_image, _resize_short_side
        self._resize = _resize_short_side
        self.host_size = int(args.model_cfg.vision_resolution * 1.15)

    def __iter__(self):
        shards = list(self.shards)
        while True:
            if self.training:
                self._rng.shuffle(shards)
            for shard in shards:
                yield from self._iter_shard(shard)
            if not self.training:
                return

    def _iter_shard(self, shard):
        try:
            tf = tarfile.open(shard)
        except Exception as e:
            LOGGER.warning("bad shard %s: %s", shard, e)
            return
        with tf:
            current: dict = {}
            cur_key = None
            for member in tf:
                if not member.isfile():
                    continue
                key, ext = os.path.splitext(os.path.basename(member.name))
                if cur_key is not None and key != cur_key and current:
                    s = self._build(cur_key, current)
                    if s is not None:
                        yield s
                    current = {}
                cur_key = key
                try:
                    current[ext.lstrip(".")] = tf.extractfile(member).read()
                except Exception as e:  # warn_and_continue
                    LOGGER.warning("bad member %s: %s", member.name, e)
            if current and cur_key is not None:
                s = self._build(cur_key, current)
                if s is not None:
                    yield s

    def _build(self, key, parts):
        try:
            from PIL import Image
            sample = {"id": key}
            if "jpg" in parts or "jpeg" in parts or "png" in parts:
                raw = parts.get("jpg") or parts.get("jpeg") or parts.get("png")
                img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"),
                                 np.uint8)
                sample["vision_frames"] = self._resize(img, self.host_size)[None]
            if "txt" in parts:
                cap = parts["txt"].decode("utf-8", "replace").strip()
                sample["raw_captions"] = cap
                sample["ids_txt"] = [key]
            elif "json" in parts:
                meta = json.loads(parts["json"])
                cap = meta.get("caption", "")
                sample["raw_captions"] = cap
                sample["ids_txt"] = [key]
            return sample if "raw_captions" in sample else None
        except Exception as e:  # warn_and_continue (IndexSrc.py:140)
            LOGGER.warning("bad sample %s: %s", key, e)
            return None

    # reuse AnnoIndexedDataset's collate layout
    def collate(self, samples):
        from vast_tpu.data.anno_dataset import AnnoIndexedDataset
        return AnnoIndexedDataset.collate(self, samples)  # type: ignore
