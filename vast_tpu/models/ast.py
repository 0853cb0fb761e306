"""AST audio encoder (flax.linen) — the alternative to BEATs.

Reference: model/audio_encoders/ast/ast.py — a plain pre-norm ViT over the
(mel x frames) spectrogram: Conv2d 16x16 patch embed, learned positional
embedding + CLS token, 12 pre-norm layers, final LayerNorm. Input is the
fbank permuted to (mel, frames) (general_module.py:405-408).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vast_tpu.models.remat import remat_policy
from vast_tpu.models.hmajor import HeadMajorDense, HeadMajorOut
from vast_tpu.ops.activations import gelu
from vast_tpu.ops.attention import multi_head_attention_hmajor


@dataclasses.dataclass(frozen=True)
class AstConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    audio_melbins: int = 64
    audio_target_length: int = 1024
    patch_size: int = 16
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: str = "dots"

    @property
    def tokens_per_clip(self) -> int:
        return ((self.audio_melbins // self.patch_size)
                * (self.audio_target_length // self.patch_size))


class AstLayer(nn.Module):
    cfg: AstConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = c.num_attention_heads
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln1")(x)
        # head-major projections (transpose fused into the matmuls;
        # nn.Dense-compatible params — models/hmajor.py)
        q = HeadMajorDense(c.hidden_size, h, dtype=c.dtype, name="q")(y)
        k = HeadMajorDense(c.hidden_size, h, dtype=c.dtype, name="k")(y)
        v = HeadMajorDense(c.hidden_size, h, dtype=c.dtype, name="v")(y)
        a = multi_head_attention_hmajor(q, k, v)
        x = x + HeadMajorOut(c.hidden_size, dtype=c.dtype, name="proj")(a)
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln2")(x)
        y = nn.Dense(c.intermediate_size, dtype=c.dtype, name="fc1")(y)
        y = gelu(y)
        y = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(y)
        return x + y


class AstModel(nn.Module):
    """fbank clip (B, T, M) -> tokens (B, 1 + (M/16)*(T/16), 768).

    The (T, M) fbank is transposed to (M, T) before patching, matching
    forward_audio_encoder's permute (general_module.py:406).
    """

    cfg: AstConfig

    @nn.compact
    def __call__(self, fbank, deterministic=True):
        c = self.cfg
        x = jnp.swapaxes(fbank, -1, -2)[..., None].astype(c.dtype)  # (B, M, T, 1)
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="first_conv")(x)
        x = x.reshape(x.shape[0], -1, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, c.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype),
                              (x.shape[0], 1, c.hidden_size)), x], axis=1)
        pos = nn.Embed(c.tokens_per_clip + 1, c.hidden_size,
                       name="position_embeddings", dtype=c.dtype)
        x = x + pos(jnp.arange(x.shape[1])[None, :])
        block_cls = (nn.remat(AstLayer, policy=remat_policy(c.remat_policy))
                     if c.remat else AstLayer)
        for i in range(c.num_hidden_layers):
            x = block_cls(c, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                            name="last_layernorm")(x)
