"""Swin Transformer image encoder (flax.linen).

Alternative vision tower (reference: model/vision_encoders/swin/swin.py,
selected by vision_encoder_type swin_base_22k_224 / swin_large_22k_224 —
general_module.py:528-583). Standard Swin: 4x4 patch embed, 4 stages with
patch merging, 7x7 (shifted) window attention with relative position bias.
``forward_features`` output is the final-stage token grid after LN —
VAST mean-pools it over tokens (general_module.py:431).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vast_tpu.models.remat import remat_policy
from vast_tpu.ops.activations import gelu
from vast_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    embed_dim: int = 128
    depths: tuple = (2, 2, 18, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: str = "dots"

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


SWIN_PRESETS = {
    "swin_base_22k_224": SwinConfig(),
    "swin_large_22k_224": SwinConfig(embed_dim=192, num_heads=(6, 12, 24, 48)),
}
SWIN_VISION_DIMS = {"swin_base_22k_224": 1024, "swin_large_22k_224": 1536}


def relative_position_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (W^2, W^2)


def window_partition(x, w: int):
    """(B, H, W, C) -> (B*nW, w*w, C)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, w * w, c)


def window_reverse(x, w: int, h: int, wd: int):
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.reshape(b, h // w, wd // w, w, w, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, wd, -1)


def shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Boolean (nW, w^2, w^2) mask for shifted windows (True=attend)."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[:, hs, ws, :] = cnt
            cnt += 1
    b, hh, ww, _ = img.shape
    x = img.reshape(1, h // window, window, w // window, window, 1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    return (x[:, :, None] == x[:, None, :])


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nB, w^2, C); mask: (nW, w^2, w^2) bool or None
        nb, n, c = x.shape
        h = self.heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h))
        idx = relative_position_index(self.window)
        bias = table[idx.reshape(-1)].reshape(n, n, h)
        bias = jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, n, n)
        attn_mask = None
        if mask is not None:
            nw = mask.shape[0]
            attn_mask = jnp.broadcast_to(
                mask[:, None], (nw, 1, n, n))
            attn_mask = jnp.tile(attn_mask, (nb // nw, 1, 1, 1))
        out = multi_head_attention(
            q.reshape(nb, n, h, d), k.reshape(nb, n, h, d),
            v.reshape(nb, n, h, d), bias=bias, mask=attn_mask)
        return nn.Dense(c, dtype=self.dtype, name="proj")(
            out.reshape(nb, n, c))


class SwinBlock(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int
    resolution: int
    shift: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = w = self.resolution
        win = min(c.window_size, h)
        shift = self.shift if win < h else 0
        b, l, ch = x.shape
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm1")(x)
        y = y.reshape(b, h, w, ch)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        else:
            mask = None
        y = window_partition(y, win)
        y = WindowAttention(self.dim, self.heads, win, c.dtype,
                            name="attn")(y, mask)
        y = window_reverse(y, win, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y.reshape(b, l, ch)
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * c.mlp_ratio), dtype=c.dtype,
                     name="fc1")(y)
        y = gelu(y)
        y = nn.Dense(self.dim, dtype=c.dtype, name="fc2")(y)
        return x + y


class SwinTransformer(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, pixels, deterministic=True):
        """(B, H, W, 3) -> (B, L_final, num_features) after final LN."""
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(
                        pixels.astype(c.dtype))
        res = c.image_size // c.patch_size
        b = x.shape[0]
        x = x.reshape(b, res * res, c.embed_dim)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="patch_norm")(x)

        dim = c.embed_dim
        for si, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            block_cls = (nn.remat(SwinBlock, policy=remat_policy(c.remat_policy))
                         if c.remat else SwinBlock)
            for bi in range(depth):
                x = block_cls(
                    c, dim, heads, res,
                    shift=0 if bi % 2 == 0 else c.window_size // 2,
                    name=f"stage_{si}_block_{bi}")(x)
            if si < len(c.depths) - 1:
                # patch merging: 2x2 concat + LN + reduction
                x = x.reshape(b, res, res, dim)
                x = jnp.concatenate(
                    [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                     x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
                res //= 2
                x = x.reshape(b, res * res, 4 * dim)
                x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                                 name=f"merge_norm_{si}")(x)
                x = nn.Dense(2 * dim, use_bias=False, dtype=c.dtype,
                             name=f"merge_reduction_{si}")(x)
                dim *= 2
        return nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm")(x)
