"""Video Swin Transformer (3-D shifted windows, flax.linen).

Alternative video tower (reference: model/vision_encoders/videoswin/
videoswin.py, vision_encoder_type videoswin_base_k600_22k —
general_module.py:230-243). 3-D patch embed (2,4,4), 4 stages with
(T,H,W)=(8,7,7) shifted-window attention and 3-D relative position bias,
spatial-only patch merging. Output is (B, T', L', C) token grids
(forward_vision_encoder reshapes — general_module.py:395-398).
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
class VideoSwinConfig:
    patch_size: tuple = (2, 4, 4)
    embed_dim: int = 128
    depths: tuple = (2, 2, 18, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: tuple = (8, 7, 7)
    mlp_ratio: float = 4.0
    # VAST's fork embeds with temporal kernel 2 but stride ``time_stride``
    # (=1 in production) plus one trailing temporal pad, so T' == T
    # (videoswin.py:346-366, general_module.py:234)
    time_stride: int = 1
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: str = "dots"

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


def rel_index_3d(wt: int, wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wt), np.arange(wh),
                                  np.arange(ww), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += wt - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


def window_partition_3d(x, w):
    b, t, h, wd, c = x.shape
    wt, wh, ww = w
    x = x.reshape(b, t // wt, wt, h // wh, wh, wd // ww, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(-1, wt * wh * ww, c)


def window_reverse_3d(x, w, t, h, wd):
    wt, wh, ww = w
    b = x.shape[0] // ((t // wt) * (h // wh) * (wd // ww))
    x = x.reshape(b, t // wt, h // wh, wd // ww, wt, wh, ww, -1)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(b, t, h, wd, -1)


def shift_mask_3d(t, h, w, window, shift) -> np.ndarray:
    img = np.zeros((1, t, h, w, 1))
    cnt = 0

    def slc(size, win, sh):
        if sh == 0:
            return (slice(0, size),)
        return (slice(0, -win), slice(-win, -sh), slice(-sh, None))

    for ts in slc(t, window[0], shift[0]):
        for hs in slc(h, window[1], shift[1]):
            for ws in slc(w, window[2], shift[2]):
                img[:, ts, hs, ws, :] = cnt
                cnt += 1
    x = np.asarray(window_partition_3d(jnp.asarray(img), window))[..., 0]
    return x[:, :, None] == x[:, None, :]


class WindowAttention3D(nn.Module):
    dim: int
    heads: int
    window: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        nb, n, c = x.shape
        h = self.heads
        d = c // h
        wt, wh, ww = self.window
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1), h))
        idx = rel_index_3d(wt, wh, ww)
        bias = table[idx.reshape(-1)].reshape(n, n, h)
        bias = jnp.transpose(bias, (2, 0, 1))[None]
        attn_mask = None
        if mask is not None:
            nw = mask.shape[0]
            attn_mask = jnp.tile(mask[:, None], (nb // nw, 1, 1, 1))
        out = multi_head_attention(
            q.reshape(nb, n, h, d), k.reshape(nb, n, h, d),
            v.reshape(nb, n, h, d), bias=bias, mask=attn_mask)
        return nn.Dense(c, dtype=self.dtype, name="proj")(
            out.reshape(nb, n, c))


class VideoSwinBlock(nn.Module):
    cfg: VideoSwinConfig
    dim: int
    heads: int
    grid: tuple  # (T, H, W)
    shifted: bool

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        t, h, w = self.grid
        win = tuple(min(ws, g) for ws, g in zip(c.window_size, (t, h, w)))
        shift = tuple(0 if win[i] >= (t, h, w)[i] else win[i] // 2
                      for i in range(3)) if self.shifted else (0, 0, 0)
        b = x.shape[0]
        ch = x.shape[-1]
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm1")(x)
        y = y.reshape(b, t, h, w, ch)
        if any(shift):
            y = jnp.roll(y, tuple(-s for s in shift), axis=(1, 2, 3))
            mask = jnp.asarray(shift_mask_3d(t, h, w, win, shift))
        else:
            mask = None
        y = window_partition_3d(y, win)
        y = WindowAttention3D(self.dim, self.heads, win, c.dtype,
                              name="attn")(y, mask)
        y = window_reverse_3d(y, win, t, h, w)
        if any(shift):
            y = jnp.roll(y, shift, axis=(1, 2, 3))
        x = x + y.reshape(b, -1, ch)
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * c.mlp_ratio), dtype=c.dtype, name="fc1")(y)
        y = gelu(y)
        y = nn.Dense(self.dim, dtype=c.dtype, name="fc2")(y)
        return x + y


class VideoSwinTransformer(nn.Module):
    cfg: VideoSwinConfig

    @nn.compact
    def __call__(self, video, deterministic=True):
        """(B, T, H, W, 3) -> (B, T', L', num_features)."""
        c = self.cfg
        pt, ph, pw = c.patch_size
        # one trailing temporal pad + temporal stride time_stride
        # (PatchEmbed3D, videoswin.py:354-366)
        video = jnp.pad(video, [(0, 0), (0, 1), (0, 0), (0, 0), (0, 0)])
        x = nn.Conv(c.embed_dim, (pt, ph, pw),
                    strides=(c.time_stride, ph, pw),
                    padding="VALID", dtype=c.dtype, name="patch_embed")(
                        video.astype(c.dtype))
        b, t, h, w, _ = x.shape
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                         name="patch_norm")(x.reshape(b, -1, c.embed_dim))
        dim = c.embed_dim
        for si, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            block_cls = (nn.remat(VideoSwinBlock, policy=remat_policy(c.remat_policy))
                         if c.remat else VideoSwinBlock)
            for bi in range(depth):
                x = block_cls(c, dim, heads, (t, h, w), shifted=bi % 2 == 1,
                              name=f"stage_{si}_block_{bi}")(x)
            if si < len(c.depths) - 1:
                # spatial-only patch merging
                x = x.reshape(b, t, h, w, dim)
                x = jnp.concatenate(
                    [x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                     x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], axis=-1)
                h //= 2
                w //= 2
                x = x.reshape(b, -1, 4 * dim)
                x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                                 name=f"merge_norm_{si}")(x)
                x = nn.Dense(2 * dim, use_bias=False, dtype=c.dtype,
                             name=f"merge_reduction_{si}")(x)
                dim *= 2
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm")(x)
        return x.reshape(b, t, h * w, dim)
