"""OpenAI CLIP vision transformer (flax.linen).

Alternative vision encoder (reference: model/vision_encoders/clip/clip.py,
selected by vision_encoder_type clip_vit_base_16 / clip_vit_base_32 /
clip_vit_large_14_336px — general_module.py:361-373). Pre-norm blocks with
QuickGELU, class embedding + learned positional embedding, ln_pre / ln_post;
``return_all_features`` applies ln_post to the full token grid
(clip.py:257-262), which is what VAST consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vast_tpu.models.remat import remat_policy
from vast_tpu.models.hmajor import HeadMajorOut, HeadMajorQKV
from vast_tpu.ops.attention import multi_head_attention_hmajor


@dataclasses.dataclass(frozen=True)
class ClipVitConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: str = "dots"

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size


CLIP_PRESETS = {
    "clip_vit_base_16": ClipVitConfig(),
    "clip_vit_base_32": ClipVitConfig(patch_size=32),
    "clip_vit_large_14_336px": ClipVitConfig(
        image_size=336, patch_size=14, width=1024, layers=24, heads=16),
}

CLIP_VISION_DIMS = {
    "clip_vit_base_16": 768, "clip_vit_base_32": 768,
    "clip_vit_large_14_336px": 1024,
}


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class ClipBlock(nn.Module):
    cfg: ClipVitConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = c.heads
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln_1")(x)
        # head-major projections (transpose fused into the matmuls;
        # nn.Dense-compatible params — models/hmajor.py)
        q, k, v = HeadMajorQKV(c.width, h, use_bias=True, dtype=c.dtype,
                               name="in_proj")(y)
        out = multi_head_attention_hmajor(q, k, v)
        out = HeadMajorOut(c.width, dtype=c.dtype, name="out_proj")(out)
        x = x + out
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln_2")(x)
        y = nn.Dense(4 * c.width, dtype=c.dtype, name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(c.width, dtype=c.dtype, name="c_proj")(y)
        return x + y


class ClipVisionTransformer(nn.Module):
    cfg: ClipVitConfig

    @nn.compact
    def __call__(self, pixels, deterministic=True):
        """pixels: (B, H, W, 3) normalized -> (B, 1+P, width) all tokens."""
        c = self.cfg
        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    use_bias=False, dtype=c.dtype, name="conv1")(
                        pixels.astype(c.dtype))
        x = x.reshape(x.shape[0], -1, c.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(c.width ** -0.5), (c.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (x.shape[0], 1, c.width)), x],
            axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c.width ** -0.5),
                         (c.grid_size ** 2 + 1, c.width))
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln_pre")(x)
        block_cls = (nn.remat(ClipBlock, policy=remat_policy(c.remat_policy))
                     if c.remat else ClipBlock)
        for i in range(c.layers):
            x = block_cls(c, name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln_post")(x)
