"""Host-side vision reading (decode only — numeric work happens on device).

Reference equivalent: data/vision_mapper.py, which decoded AND transformed
on CPU workers. Here hosts only decode to uint8 at a fixed host resolution;
resize/crop/flip/normalize run on device (ops/image.py). Supported
``vision_format`` values match the reference: ``image_rawimage``,
``video_frame`` (frame directories), ``video_rawvideo`` (requires decord
or ffmpeg — gated, absent in this image).

Frame sampling reproduces utils/tool.py:12 ``split()`` + random-in-segment
(train) / center (eval) selection (vision_mapper.py:144-148).
"""

from __future__ import annotations

import os
import random

import numpy as np

from vast_tpu.logger import LOGGER

try:  # PIL is the fallback image decode path
    from PIL import Image
    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False

_NATIVE = None
_NATIVE_TRIED = False


def _native_runtime():
    """The C++ decode runtime (runtime/), or None if unavailable."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            import runtime as native
            if native.available():
                _NATIVE = native
        except Exception:
            _NATIVE = None
    return _NATIVE


def split_even(items, n: int):
    """Chunk ``items`` into n contiguous near-even pieces (utils/tool.py:12)."""
    k, m = divmod(len(items), n)
    return [items[i * k + min(i, m):(i + 1) * k + min(i + 1, m)]
            for i in range(n)]


def sample_indices(num_items: int, n: int, training: bool,
                   rng: random.Random | None = None):
    """Even-segment frame/clip sampling (vision_mapper.py:144-148)."""
    if num_items < n:
        # repeat last to reach n (degenerate short videos)
        idx = list(range(num_items)) + [num_items - 1] * (n - num_items)
        return idx
    pieces = split_even(list(range(num_items)), n)
    if training:
        rng = rng or random
        return [rng.choice(p) for p in pieces]
    return [p[(len(p) + 1) // 2 - 1] for p in pieces]


def _load_image(path: str) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.uint8)


def _resize_short_side(img: np.ndarray, target: int) -> np.ndarray:
    """Host-side decode-time downscale + center square crop so every frame
    in a batch shares one static shape; the exact model-resolution resize /
    random crop happens on device. This bounds host->device traffic to
    ~(1.15*res)^2 uint8 per frame."""
    h, w = img.shape[:2]
    short = min(h, w)
    if short != target:
        scale = target / short
        new = (max(target, round(w * scale)), max(target, round(h * scale)))
        img = np.asarray(Image.fromarray(img).resize(new, Image.BILINEAR),
                         np.uint8)
        h, w = img.shape[:2]
    top, left = (h - target) // 2, (w - target) // 2
    return img[top:top + target, left:left + target]


class VisionMapper:
    def __init__(self, d_cfg, args):
        self.vision = d_cfg["vision"]
        self.name = d_cfg["name"]
        self.training = d_cfg["training"]
        self.vision_format = d_cfg["vision_format"]
        self.sample_num = d_cfg.get("vision_sample_num", 1)
        self.resolution = args.model_cfg.vision_resolution
        # decode at ~1.15x the model resolution so crop_flip has margin
        self.host_size = int(self.resolution * 1.15)
        self.transforms = d_cfg.get("vision_transforms", "none")

    def read(self, id_) -> np.ndarray | None:
        """Returns uint8 (n, H, W, 3) or None on decode failure."""
        try:
            if self.vision_format == "image_rawimage":
                path = os.path.join(self.vision, str(id_))
                for suffix in ("", ".jpg", ".JPEG", ".png"):
                    if os.path.exists(path + suffix):
                        path = path + suffix
                        break
                if path.lower().endswith((".jpg", ".jpeg")):
                    nat = _native_runtime()
                    if nat is not None:
                        out, ok = nat.decode_image_batch([path],
                                                         self.host_size,
                                                         n_threads=1)
                        if ok[0]:
                            return out
                img = _resize_short_side(_load_image(path), self.host_size)
                return img[None]
            if self.vision_format == "video_frame":
                frame_dir = os.path.join(self.vision, str(id_))
                frames = sorted(os.listdir(frame_dir))
                idx = sample_indices(len(frames), self.sample_num,
                                     self.training)
                out = [_resize_short_side(
                    _load_image(os.path.join(frame_dir, frames[i])),
                    self.host_size) for i in idx]
                return np.stack(out)
            if self.vision_format == "video_rawvideo":
                return self._read_video(id_)
            raise NotImplementedError(self.vision_format)
        except Exception as e:  # resample-on-corrupt upstream
            LOGGER.info("vision read failed for %s: %s", id_, e)
            return None

    def _read_video(self, id_):
        path = os.path.join(self.vision, str(id_))
        for suffix in ("", ".mp4", ".avi", ".webm", ".mkv"):
            if os.path.exists(path + suffix):
                path = path + suffix
                break
        try:
            import decord  # optional (absent here)
            vr = decord.VideoReader(path)
            idx = sample_indices(len(vr), self.sample_num, self.training)
            frames = vr.get_batch(idx).asnumpy()
            return np.stack([_resize_short_side(f, self.host_size)
                             for f in frames])
        except ImportError:
            pass
        # ffmpeg-pipe fallback (also absent in this image; gated)
        raise RuntimeError(
            "video decode requires decord or ffmpeg; neither is available")
