"""Tar-shard streaming dataset (reference: data/IndexSrc.py, webdataset).

Streams (id, image/video bytes, caption) records from ``.tar`` shards with
warn-and-continue error policy (IndexSrc.py:140-144). Implemented on
``tarfile`` directly — no webdataset dependency.

Parity surface vs the reference pipeline:
  - shard source: a directory of tars, a single ``.tar``, or a JSON list
    of tar paths (IndexSrc.py:150-156)
  - members: jpg/jpeg/png images OR mp4/webm/mkv/avi videos; video members
    get split-segment frame sampling exactly like the anno path
    (IndexSrc.py:104-110 via decord; here the native in-memory decoder)
  - captions: in-tar ``.txt``/``.json`` members (laion400m layout,
    IndexSrc.py:170-171), ``txt_format='json'`` one-big-dict lookup
    (IndexSrc.py:72-73,119-120), or ``txt_format='dir'`` per-prefix
    sidecar JSON files (IndexSrc.py:121-131)
  - sample-level shuffling: a ~1000-slot replacement buffer matching
    webdataset's ``.shuffle(1000)`` (IndexSrc.py:170), on top of per-epoch
    shard-order shuffling

Shards are sharded across hosts by index; an infinite iterator reshuffles
shard order per epoch when training.
"""

from __future__ import annotations

import io
import json
import os
import random
import tarfile

import numpy as np

from vast_tpu.logger import LOGGER

_VIDEO_EXTS = ("mp4", "webm", "mkv", "avi", "mov")
_IMAGE_EXTS = ("jpg", "jpeg", "png")


def _resolve_shards(src: str) -> list[str]:
    """Directory of tars / single .tar / JSON list of tar paths
    (IndexSrc.py:150-156)."""
    if os.path.isdir(src):
        return sorted(os.path.join(src, f) for f in os.listdir(src)
                      if f.endswith(".tar"))
    if src.endswith(".json"):
        with open(src) as f:
            return list(json.load(f))
    return [src]


class SrcIndexedDataset:
    """Iterable over samples from tar shards (image or video members)."""

    def __init__(self, d_cfg, args, tokenizer, host_id: int = 0,
                 num_hosts: int = 1):
        # when txt_format routes captions elsewhere, "txt" is the caption
        # source and "vision" holds the shards; legacy layout (captions
        # inside the tar) accepts either key as the shard source
        self.txt_format = d_cfg.get("txt_format", "tar")
        if self.txt_format in ("json", "dir"):
            shard_src = d_cfg["vision"]
        else:
            shard_src = d_cfg.get("vision") or d_cfg["txt"]
        self.shards = _resolve_shards(shard_src)[host_id::num_hosts]
        self.captions = None
        self.caption_dir = None
        if self.txt_format == "json":  # one dict: id -> caption(s)
            with open(d_cfg["txt"]) as f:
                self.captions = json.load(f)
        elif self.txt_format == "dir":  # per-prefix sidecar JSON files
            self.caption_dir = d_cfg["txt"]
        self.d_cfg = d_cfg
        self.tokenizer = tokenizer
        self.cfg = args.model_cfg
        self.training = d_cfg.get("training", True)
        self.vision_format = d_cfg.get("vision_format", "image_rawimage")
        self.sample_num = d_cfg.get("vision_sample_num", 1)
        # webdataset .shuffle(1000) equivalent (IndexSrc.py:170)
        self.shuffle_buffer = d_cfg.get(
            "shuffle_buffer", 1000 if d_cfg.get("training", True) else 0)
        self._rng = random.Random(args.run_cfg.get("seed", 50) + host_id)
        from vast_tpu.data.vision import _resize_short_side
        self._resize = _resize_short_side
        # same rule as VisionMapper (data/vision.py): training decodes at
        # ~1.15x the model resolution for device random-crop margin; eval
        # decodes at exactly the model resolution (canonical
        # Resize+CenterCrop in one bilinear stage, less wire traffic)
        self.host_size = (int(args.model_cfg.vision_resolution * 1.15)
                          if self.training
                          else int(args.model_cfg.vision_resolution))
        # packed-YUV420 wire format (see data/vision.py VisionMapper):
        # native-runtime decode only; image members of mixed tars are
        # host-packed so the stream stays one format
        self.pixel_format = d_cfg.get("pixel_format", "rgb")
        if self.pixel_format == "yuv420":
            from vast_tpu.data.vision import _native_runtime
            nat = _native_runtime()
            if nat is None or not nat.media_available():
                LOGGER.warning("%s: pixel_format yuv420 needs the native "
                               "runtime; falling back to rgb",
                               d_cfg.get("name", "src"))
                self.pixel_format = "rgb"
            elif self.host_size % 2:
                self.host_size += 1  # YUV420 planes need even dims

    @property
    def out_key(self) -> str:
        return ("vision_frames_yuv" if self.pixel_format == "yuv420"
                else "vision_frames")

    def __iter__(self):
        it = self._iter_ordered()
        if not (self.training and self.shuffle_buffer > 1):
            yield from it
            return
        # replacement-buffer shuffle: fill N slots, then for each incoming
        # sample emit a random occupant and take its slot (webdataset's
        # .shuffle(N) semantics — bounded memory, approximate uniformity)
        buf: list = []
        for s in it:
            if len(buf) < self.shuffle_buffer:
                buf.append(s)
                continue
            j = self._rng.randrange(len(buf))
            buf[j], s = s, buf[j]
            yield s
        self._rng.shuffle(buf)
        yield from buf

    def _iter_ordered(self):
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
                    current[ext.lstrip(".").lower()] = \
                        tf.extractfile(member).read()
                except Exception as e:  # warn_and_continue
                    LOGGER.warning("bad member %s: %s", member.name, e)
            if current and cur_key is not None:
                s = self._build(cur_key, current)
                if s is not None:
                    yield s

    def _lookup_caption(self, key: str):
        """Caption by id from the external txt source (IndexSrc.py:119-131);
        None when this id has no caption (sample is then skipped)."""
        if self.captions is not None:  # txt_format == 'json'
            cap = self.captions.get(key)
        elif self.caption_dir is not None:  # txt_format == 'dir'
            # per-prefix files: <txt>/<id[:5]>.json holding either
            # {'<id[:5]>/<id>': [caps]} or {'<id>': [caps]}
            p = os.path.join(self.caption_dir, key[:5] + ".json")
            if not os.path.exists(p):
                return None
            with open(p) as f:
                files = json.load(f)
            cap = files.get(key[:5] + "/" + key, files.get(key))
        else:
            return None
        if isinstance(cap, list):
            cap = self._rng.choice(cap) if cap else None
        return cap

    def _build(self, key, parts):
        try:
            sample = {"id": key}
            video_raw = next((parts[e] for e in _VIDEO_EXTS if e in parts),
                             None)
            image_raw = next((parts[e] for e in _IMAGE_EXTS if e in parts),
                             None)
            # reference selects the member suffix from vision_format
            # (IndexSrc.py:163-166); mixed tars resolve the same way
            if video_raw is not None and (
                    self.vision_format.startswith("video")
                    or image_raw is None):
                from vast_tpu.data.vision import decode_video_bytes
                sample[self.out_key] = decode_video_bytes(
                    video_raw, self.sample_num, self.training,
                    self.host_size, self._rng,
                    yuv=self.pixel_format == "yuv420")
            elif image_raw is not None:
                from PIL import Image
                img = np.asarray(
                    Image.open(io.BytesIO(image_raw)).convert("RGB"),
                    np.uint8)
                # _resize_short_side already center-crops to a
                # host_size x host_size square — exactly the packed-plane
                # geometry (t*t*3//2) the yuv wire needs
                img = self._resize(img, self.host_size)
                if self.pixel_format == "yuv420":
                    from vast_tpu.data.vision import rgb_to_yuv420_packed
                    sample[self.out_key] = rgb_to_yuv420_packed(img)[None]
                else:
                    sample["vision_frames"] = img[None]
            # caption priority mirrors the reference: an explicit
            # txt_format lookup unconditionally overrides any in-tar txt
            # member (IndexSrc.py:119-120); the tar member is only the
            # fallback when the lookup misses the key
            cap = None
            if self.txt_format in ("json", "dir"):
                cap = self._lookup_caption(key)
            if cap is None and "txt" in parts:
                cap = parts["txt"].decode("utf-8", "replace").strip()
            if cap is None and "json" in parts:
                # laion-layout per-sample .json metadata; also the
                # fallback when an external lookup misses a key whose
                # caption lives in the tar member
                meta = json.loads(parts["json"])
                cap = meta.get("caption", "")
            if cap is None:
                return None
            sample["raw_captions"] = cap
            sample["ids_txt"] = [key]
            return sample if self.out_key in sample else None
        except Exception as e:  # warn_and_continue (IndexSrc.py:140)
            LOGGER.warning("bad sample %s: %s", key, e)
            return None

    # reuse AnnoIndexedDataset's collate layout
    def collate(self, samples):
        from vast_tpu.data.anno_dataset import AnnoIndexedDataset
        return AnnoIndexedDataset.collate(self, samples)  # type: ignore
