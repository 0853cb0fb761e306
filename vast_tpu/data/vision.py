"""Host-side vision reading (decode only — numeric work happens on device).

Reference equivalent: data/vision_mapper.py, which decoded AND transformed
on CPU workers. Here hosts only decode to uint8 at a fixed host resolution;
resize/crop/flip/normalize run on device (ops/image.py). Supported
``vision_format`` values match the reference: ``image_rawimage``,
``video_frame`` (frame directories), ``video_rawvideo`` (native FFmpeg
runtime, with decord / ffmpeg-CLI-pipe fallbacks), and ``video_feats``
(precomputed hdf5/npy features, vision_mapper.py:86-96).

Frame sampling reproduces utils/tool.py:12 ``split()`` + random-in-segment
(train) / center (eval) selection (vision_mapper.py:144-148).
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess

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


def _ffmpeg_decode_all(path: str, host_size: int):
    """Last-resort decode: pipe every frame as rawvideo RGB24 through the
    ffmpeg CLI. Square-scales the short side to host_size with centered
    crop (matching the native path). Returns ((n, s, s, 3) uint8, fps)."""
    s = host_size
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=width,height,r_frame_rate",
         "-of", "csv=p=0", path],
        capture_output=True, text=True, check=True)
    fields = probe.stdout.strip().split(",")
    w, h = int(fields[0]), int(fields[1])
    fps = 25.0
    if len(fields) > 2 and "/" in fields[2]:
        num, den = fields[2].split("/")
        # ffprobe reports '0/1' for some containers/attached pics —
        # num must be positive too or _sample_count would divide by
        # ~0 and request ~1e8 sample indices
        if float(den) > 0 and float(num) > 0:
            fps = float(num) / float(den)
    scale = s / min(w, h)
    nw, nh = max(s, round(w * scale)), max(s, round(h * scale))
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-f", "rawvideo",
         "-pix_fmt", "rgb24", "-vf",
         f"scale={nw}:{nh},crop={s}:{s}", "pipe:1"],
        capture_output=True, check=True).stdout
    frames = np.frombuffer(out, np.uint8)
    n = len(frames) // (s * s * 3)
    return frames[: n * s * s * 3].reshape(n, s, s, 3), fps


def rgb_to_yuv420_packed(img: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) RGB -> packed YUV420 planes (H*W*3//2,) uint8.

    BT.601 limited-range forward transform with 2x2 chroma averaging —
    the host-side inverse of ops/image.py yuv420_to_rgb, used when a
    yuv420-format dataset meets an image member (mixed webdataset tars)
    so every sample in the stream shares one wire format."""
    h, w = img.shape[:2]
    assert h % 2 == 0 and w % 2 == 0, img.shape
    f = img.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 16.0 + (219.0 / 255.0) * (0.299 * r + 0.587 * g + 0.114 * b)
    u = 128.0 + (224.0 / 255.0) * (-0.168736 * r - 0.331264 * g + 0.5 * b)
    v = 128.0 + (224.0 / 255.0) * (0.5 * r - 0.418688 * g - 0.081312 * b)
    u = u.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
    v = v.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
    return np.concatenate([
        np.clip(np.round(y), 0, 255).astype(np.uint8).reshape(-1),
        np.clip(np.round(u), 0, 255).astype(np.uint8).reshape(-1),
        np.clip(np.round(v), 0, 255).astype(np.uint8).reshape(-1)])


def decode_video_bytes(raw: bytes, sample_num: int, training: bool,
                       host_size: int,
                       rng: random.Random | None = None,
                       yuv: bool = False) -> np.ndarray:
    """In-memory video container -> (sample_num, s, s, 3) uint8 frames
    (or packed (sample_num, s*s*3//2) YUV420 planes when ``yuv``).

    Split-segment frame sampling over the full stream, as the reference
    does for tar-member mp4s (IndexSrc.py:104-110: decord.VideoReader(
    io.BytesIO(src)) + split + random-in-segment). Decode priority:
    native FFmpeg runtime (zero-copy in-memory AVIO) -> decord on a
    BytesIO -> ffmpeg CLI via a spooled temp file (RGB only — yuv mode
    is native-only; callers gate on media availability). Raises on
    failure (callers apply warn-and-continue)."""
    nat = _native_runtime()
    if nat is not None and nat.media_available():
        counts, _fps = nat.video_info_bytes_batch([raw])
        if counts[0] > 0:
            idx = sample_indices(int(counts[0]), sample_num, training, rng)
            decode = (nat.decode_video_bytes_batch_yuv if yuv
                      else nat.decode_video_bytes_batch)
            frames, ok = decode(
                [raw], np.asarray([idx], np.int32), host_size, n_threads=1)
            if ok[0]:
                return frames[0]
        raise RuntimeError("native in-memory video decode failed")
    if yuv:
        raise RuntimeError("yuv420 decode needs the native media runtime")
    try:
        import decord  # optional
        import io
        vr = decord.VideoReader(io.BytesIO(raw))
        idx = sample_indices(len(vr), sample_num, training, rng)
        frames = vr.get_batch(idx).asnumpy()
        return np.stack([_resize_short_side(f, host_size) for f in frames])
    except ImportError:
        pass
    if shutil.which("ffmpeg"):
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".mp4") as tf:
            tf.write(raw)
            tf.flush()
            frames, _fps = _ffmpeg_decode_all(tf.name, host_size)
        idx = sample_indices(frames.shape[0], sample_num, training, rng)
        return frames[idx]
    raise RuntimeError(
        "video decode needs the native media runtime, decord, or ffmpeg")


class VisionMapper:
    def __init__(self, d_cfg, args):
        self.vision = d_cfg["vision"]
        self.name = d_cfg["name"]
        self.training = d_cfg["training"]
        self.vision_format = d_cfg["vision_format"]
        self.sample_num = d_cfg.get("vision_sample_num", 1)
        self.resolution = args.model_cfg.vision_resolution
        # training: decode at ~1.15x the model resolution so the device
        # random-resized-crop has margin.  eval: decode at exactly the
        # model resolution — the device center-crop then reduces to the
        # canonical Resize(R)+CenterCrop(R) eval transform (one bilinear
        # stage, like the reference's CPU torchvision pipeline,
        # vision_mapper.py:67-78) and host->device traffic drops 24%.
        self.host_size = (int(self.resolution * 1.15)
                          if d_cfg["training"] else self.resolution)
        self.transforms = d_cfg.get("vision_transforms", "none")
        # pixel_format "yuv420": ship packed YUV420 planes (half the
        # host->device bytes; scaler runs on 1.5 samples/px) and expand to
        # RGB on device (ops/image.py yuv420_to_rgb). Native-runtime
        # rawvideo only; anything else falls back to RGB.
        self.pixel_format = d_cfg.get("pixel_format", "rgb")
        if self.pixel_format == "yuv420":
            nat = _native_runtime()
            if (self.vision_format != "video_rawvideo" or nat is None
                    or not nat.media_available()):
                LOGGER.warning(
                    "%s: pixel_format yuv420 needs the native runtime and "
                    "video_rawvideo (got %s); falling back to rgb",
                    self.name, self.vision_format)
                self.pixel_format = "rgb"
            elif self.host_size % 2:
                self.host_size += 1  # YUV420 planes need even dims
        # feature-extraction mode (vision_mapper.py:23-26, :141-143)
        self.dense_extraction = d_cfg.get("dense_extraction", False)
        self.extract_fps = d_cfg.get("extract_fps")
        self.frame_fps = d_cfg.get("frame_fps")
        # precomputed-feature pooling target (vision_mapper.py:102; the
        # reference reads self.num_pre_clips, whose assignment is commented
        # out in its constructor — we take it from the dataset cfg, falling
        # back to the sample budget)
        self.num_pre_clips = d_cfg.get("num_pre_clips", self.sample_num)

    @property
    def out_key(self) -> str:
        return ("vision_frames_yuv" if self.pixel_format == "yuv420"
                else "vision_frames")

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
                n = self.sample_num
                if self.dense_extraction:  # vision_mapper.py:157-159
                    n = max(1, int(len(frames) * self.extract_fps
                                   / self.frame_fps))
                idx = sample_indices(len(frames), n, self.training)
                out = [_resize_short_side(
                    _load_image(os.path.join(frame_dir, frames[i])),
                    self.host_size) for i in idx]
                return np.stack(out)
            if self.vision_format == "video_rawvideo":
                return self._read_video(id_)
            if self.vision_format == "video_feats":
                return self._read_feats(id_)
            raise NotImplementedError(self.vision_format)
        except Exception as e:  # resample-on-corrupt upstream
            LOGGER.info("vision read failed for %s: %s", id_, e)
            return None

    def _sample_count(self, num_frames: int, fps: float) -> int:
        if self.dense_extraction:  # vision_mapper.py:141-143
            if fps <= 0:  # decoder couldn't determine the frame rate
                fps = 25.0
            return max(1, int(num_frames * self.extract_fps / fps))
        return self.sample_num

    def _read_video(self, id_):
        """video container -> (n, host_size, host_size, 3) uint8.

        Decode priority: native FFmpeg runtime (runtime/vast_media.cpp)
        -> decord -> ffmpeg CLI pipe. Reference: vision_mapper.py:125-149
        (decord only).
        """
        path = os.path.join(self.vision, str(id_))
        for suffix in ("", ".mp4", ".avi", ".webm", ".mkv"):
            if os.path.exists(path + suffix):
                path = path + suffix
                break
        nat = _native_runtime()
        if nat is not None and nat.media_available():
            counts, fps = nat.video_info_batch([path], n_threads=1)
            if counts[0] > 0:
                idx = sample_indices(
                    int(counts[0]),
                    self._sample_count(int(counts[0]), float(fps[0])),
                    self.training)
                decode = (nat.decode_video_batch_yuv
                          if self.pixel_format == "yuv420"
                          else nat.decode_video_batch)
                frames, ok = decode(
                    [path], np.asarray([idx], np.int32), self.host_size,
                    n_threads=1)
                if ok[0]:
                    return frames[0]
            raise RuntimeError(f"native video decode failed for {path}")
        try:
            import decord  # optional
            vr = decord.VideoReader(path)
            idx = sample_indices(
                len(vr), self._sample_count(len(vr), vr.get_avg_fps()),
                self.training)
            frames = vr.get_batch(idx).asnumpy()
            return np.stack([_resize_short_side(f, self.host_size)
                             for f in frames])
        except ImportError:
            pass
        if shutil.which("ffmpeg"):
            return self._ffmpeg_pipe_read(path)
        raise RuntimeError(
            "video decode needs the native media runtime, decord, or ffmpeg")

    def _ffmpeg_pipe_read(self, path: str) -> np.ndarray:
        frames, fps = _ffmpeg_decode_all(path, self.host_size)
        n = frames.shape[0]
        idx = sample_indices(n, self._sample_count(n, fps), self.training)
        return frames[idx]

    def _read_feats(self, id_):
        """Precomputed features (hdf5 / npy), L2-normalized then mean-pooled
        into ``num_pre_clips`` even segments (vision_mapper.py:86-114)."""
        if self.vision.endswith("hdf5"):
            import h5py
            with h5py.File(self.vision, "r") as f:
                g = f[str(id_)]
                feat = g["c3d_features"][:] if "c3d_features" in g else g[:]
        else:
            feat = np.load(os.path.join(self.vision, f"{id_}.npy"))
        feat = np.asarray(feat, np.float32)
        feat /= np.maximum(np.linalg.norm(feat, axis=1, keepdims=True), 1e-12)
        n_pre, n_src = self.num_pre_clips, feat.shape[0]
        idxs = np.round(np.arange(n_pre + 1) / n_pre * n_src).astype(np.int64)
        idxs = np.minimum(idxs, n_src - 1)
        pooled = [feat[s:e].mean(axis=0) if s < e else feat[s]
                  for s, e in zip(idxs[:-1], idxs[1:])]
        return np.stack(pooled)
