"""On-device image preprocessing (resize / crop / flip / normalize).

The reference runs torchvision transforms on CPU dataloader workers
(data/vision_mapper.py:55-78). Here hosts deliver raw uint8 frames and the
resize + normalize runs on device inside the jitted step — XLA fuses the
uint8->float conversion, interpolation and normalization into the encoder's
first conv read.

Stats match the reference: CLIP mean/std for clip/evaclip encoders,
ImageNet stats otherwise (data/vision_mapper.py:46-52).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(x, mean=CLIP_MEAN, std=CLIP_STD):
    """x: (..., H, W, 3) in [0, 1] -> normalized."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def resize_frames(x, resolution: int):
    """Bilinear resize (..., H, W, 3) -> (..., R, R, 3)."""
    shape = x.shape[:-3] + (resolution, resolution, 3)
    return jax.image.resize(x, shape, method="bilinear")


def center_crop_resize(x, resolution: int):
    """Resize short side then center crop (eval 'crop_flip' path)."""
    h, w = x.shape[-3], x.shape[-2]
    scale = resolution / min(h, w)
    nh, nw = max(resolution, round(h * scale)), max(resolution, round(w * scale))
    x = jax.image.resize(x, x.shape[:-3] + (nh, nw, 3), method="bilinear")
    top, left = (nh - resolution) // 2, (nw - resolution) // 2
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(x, top, top + resolution, axis=-3),
        left, left + resolution, axis=-2)


def random_resized_crop_flip(rng, x, resolution: int,
                             scale=(0.8, 1.0)):
    """Training 'crop_flip' transform, batched over leading dims.

    x: (B, N, H, W, 3). One crop window + flip decision per (B, N) frame
    stack (matching per-sample torchvision semantics closely enough for
    augmentation purposes; aspect ratio fixed at 1.0 as in the reference's
    RandomResizedCrop(resolution, [0.8, 1.0], [1.0, 1.0])).
    """
    b = x.shape[0]
    h, w = x.shape[-3], x.shape[-2]
    k_area, k_pos, k_flip = jax.random.split(rng, 3)
    area = jax.random.uniform(k_area, (b,), minval=scale[0], maxval=scale[1])
    side = jnp.sqrt(area * h * w)
    side = jnp.minimum(side, jnp.asarray(min(h, w), side.dtype))
    pos = jax.random.uniform(k_pos, (b, 2))
    top = (pos[:, 0] * (h - side)).astype(jnp.int32)
    left = (pos[:, 1] * (w - side)).astype(jnp.int32)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))

    def crop_one(img, t, l, s, f):
        # dynamic crop via scale-and-translate resize (static output shape)
        out_shape = img.shape[:-3] + (resolution, resolution, 3)
        scale_f = resolution / s
        translation = -jnp.stack([t, l]).astype(jnp.float32) * scale_f
        out = jax.image.scale_and_translate(
            img.astype(jnp.float32), out_shape, (img.ndim - 3, img.ndim - 2),
            jnp.stack([scale_f, scale_f]), translation, method="bilinear")
        return jnp.where(f, out[..., :, ::-1, :], out)

    return jax.vmap(crop_one)(x, top, left, side, flip)


def yuv420_to_rgb(packed):
    """Packed YUV420 planes -> RGB frames at uint8 scale (float32 0..255).

    packed: (..., t*t*3//2) uint8 — per frame Y[t*t] U[(t/2)^2] V[(t/2)^2],
    the wire format of the native decoder's YUV path
    (runtime/vast_media.cpp frame_to_square_yuv). Ships half the bytes of
    RGB; the BT.601 limited-range expansion here is a handful of
    elementwise ops XLA fuses into the model's first conv read, and
    chroma upsamples 2x nearest. Matches libswscale's default
    (non-JPEG-format) YUV<->RGB coefficients.
    """
    t = int(round((packed.shape[-1] * 2 / 3) ** 0.5))
    assert t * t * 3 // 2 == packed.shape[-1], packed.shape
    lead = packed.shape[:-1]
    q = (t // 2) * (t // 2)
    f32 = jnp.float32
    y = packed[..., : t * t].reshape(lead + (t, t)).astype(f32)
    u = packed[..., t * t: t * t + q].reshape(
        lead + (t // 2, t // 2)).astype(f32)
    v = packed[..., t * t + q:].reshape(lead + (t // 2, t // 2)).astype(f32)
    u = jnp.repeat(jnp.repeat(u, 2, axis=-1), 2, axis=-2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=-1), 2, axis=-2)
    y = (y - 16.0) * (255.0 / 219.0)
    u = (u - 128.0) * (255.0 / 224.0)
    v = (v - 128.0) * (255.0 / 224.0)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def preprocess_frames(frames_uint8, resolution: int, *, mean=CLIP_MEAN,
                      std=CLIP_STD, train: bool = False, rng=None,
                      transforms: str = "none"):
    """uint8 (B, N, H, W, 3) -> normalized float (B, N, R, R, 3).

    transforms: 'none' (plain resize) or 'crop_flip'
    (data/vision_mapper.py:55-78).
    """
    x = frames_uint8.astype(jnp.float32) / 255.0
    if transforms == "crop_flip":
        if train:
            assert rng is not None
            x = random_resized_crop_flip(rng, x, resolution)
        else:
            x = center_crop_resize(x, resolution)
    else:
        if x.shape[-3] != resolution or x.shape[-2] != resolution:
            x = resize_frames(x, resolution)
    return normalize_image(x, mean, std)
