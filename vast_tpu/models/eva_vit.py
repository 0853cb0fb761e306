"""EVA-CLIP vision transformer family (flax.linen).

Covers every variant the reference instantiates
(model/general_module.py:320-360 + evaclip/model_configs/*.json):

  * EVA01-g-14 (the VAST default): 40 layers, width 1408, head dim 88,
    mlp_ratio 4.3637, abs pos embed, fused-qkv with q/v bias only
    (eva_vit_model.py:305-312), plain GELU MLP.
  * EVA02 B/L: separate q/k/v projections without k bias (subln), 2-D
    rotary embeddings over the patch grid with frequency interpolation
    (rope.py:79, intp_freq), SwiGLU MLP with inner LayerNorm, sub-LN.
  * EVA02-bigE-plus: post-norm blocks.

Attention runs through ops.multi_head_attention (Pallas flash on TPU),
replacing the xformers path (eva_vit_model.py:330). ``return_all_features``
returns the full token grid after the final LN, which is what VAST consumes
(general_module.py:383).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vast_tpu.models.hmajor import (
    HeadMajorOut,
    HeadMajorQKV,
    TokenSlicedOut,
    TokenSlicedQKV,
)
from vast_tpu.ops.attention import (
    flash_self_attention_tmajor,
    multi_head_attention,
    multi_head_attention_hmajor,
)
from vast_tpu.models.remat import remat_policy, tag_attention
from vast_tpu.ops.flash_attention import head_packing, tmajor_fits_vmem


@dataclasses.dataclass(frozen=True)
class EvaVitConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    layers: int = 40
    head_width: int = 88
    mlp_ratio: float = 4.3637
    qkv_bias: bool = True            # q/v bias, zero k bias
    subln: bool = False              # separate q/k/v + inner attn LN
    swiglu: bool = False             # naiveswiglu MLP
    rope: bool = False               # 2-D rotary over patch grid
    pt_hw_seq_len: int = 16          # pretrain grid side for rope interp
    intp_freq: bool = False
    postnorm: bool = False
    ls_init_value: float | None = None  # layer-scale gamma init
    drop_path_rate: float = 0.0
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: str = "dots"
    # None (default): exact erf GELU (torch nn.GELU parity) in fp32;
    # tanh-approx in bf16. Round-2 measurement at the token-major MLP
    # shapes: tanh fuses completely into the matmul epilogue (6.34 vs
    # 6.36 ms plain) while erf costs a separate +3.2 ms pass per matmul —
    # round 1 concluded the opposite end-to-end, but that was an artifact
    # of the head-major path it measured through. tanh-vs-erf output
    # differs by less than bf16 rounding (tested), so bf16 defaults to
    # tanh; fp32 (parity/eval paths) stays exact. Explicit True/False
    # overrides either way.
    gelu_approx: bool | None = None

    @property
    def use_gelu_tanh(self) -> bool:
        if self.gelu_approx is None:
            return self.dtype == jnp.bfloat16
        return bool(self.gelu_approx)

    @property
    def num_heads(self) -> int:
        return self.width // self.head_width

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2


# named presets mirroring general_module.py:328-350 / model_configs/*.json
EVA_PRESETS = {
    "evaclip01_giant": EvaVitConfig(),
    "evaclip02_base": EvaVitConfig(
        patch_size=16, width=768, layers=12, head_width=64,
        mlp_ratio=2.6667, subln=True, swiglu=True, rope=True, intp_freq=True),
    "evaclip02_large": EvaVitConfig(
        patch_size=14, width=1024, layers=24, head_width=64,
        mlp_ratio=2.6667, subln=True, swiglu=True, rope=True, intp_freq=True),
    "evaclip02_bige": EvaVitConfig(
        patch_size=14, width=1792, layers=64, head_width=112,
        mlp_ratio=8.571428571428571, postnorm=True),
}

EVA_VISION_DIMS = {
    "evaclip01_giant": 1408, "evaclip02_base": 768,
    "evaclip02_large": 1024, "evaclip02_bige": 1792,
}


def rope_2d_freqs(cfg: EvaVitConfig) -> np.ndarray:
    """Interleaved 2-D rotary angles, shape (grid*grid, head_width/2).

    Mirrors VisionRotaryEmbeddingFast (evaclip/rope.py:79): per-axis dim is
    head_width//4 pairs with theta=10000 log-spacing; ``intp_freq`` rescales
    the fine-tune grid positions onto the pretrain grid.
    """
    dim = cfg.head_width // 2  # per-axis rotary dim (pairs*2)
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ft = cfg.grid_size
    t = np.arange(ft, dtype=np.float64)
    if cfg.intp_freq:
        t = t * (cfg.pt_hw_seq_len / ft)
    angles = np.outer(t, freqs)                     # (g, dim/2)
    angles = np.repeat(angles, 2, axis=-1)          # (g, dim) interleaved
    # broadcast to 2-D grid: row angles ++ col angles
    row = np.broadcast_to(angles[:, None, :], (ft, ft, dim))
    col = np.broadcast_to(angles[None, :, :], (ft, ft, dim))
    out = np.concatenate([row, col], axis=-1).reshape(ft * ft, 2 * dim)
    return out.astype(np.float32)


def apply_rope(x, angles):
    """x: (B, L, H, D) with L == angles.shape[0]; rotate_half convention
    matching evaclip/rope.py (interleaved pairs)."""
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * cos.astype(x.dtype) + rot * sin.astype(x.dtype)


class EvaAttention(nn.Module):
    cfg: EvaVitConfig

    def setup(self):
        c = self.cfg
        all_dim = c.num_heads * c.head_width
        if c.subln:
            self.q_proj = nn.Dense(all_dim, use_bias=False, dtype=c.dtype)
            self.k_proj = nn.Dense(all_dim, use_bias=False, dtype=c.dtype)
            self.v_proj = nn.Dense(all_dim, use_bias=False, dtype=c.dtype)
            self.inner_ln = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype)
            self.proj = nn.Dense(c.width, dtype=c.dtype)
        else:
            # token-sliced fast path (BENCH_NOTES "attention glue", r2):
            # q/k/v stay in the (B, L, 3*H*Dp) layout the plain projection
            # matmul writes (~191 TFLOP/s vs ~85 for the transpose-fused
            # head-major einsum on v5e) and the Pallas kernel reads each
            # head as a 128-lane slice — zero layout glue end to end.
            # Static decision: rope-free (EVA01; rope reorders per-token
            # between projection and attention), TPU backend, kernel-sized
            # problem. Param trees are identical either way.
            l = c.num_patches + 1
            lp = -(-l // 16) * 16
            # unpadded head width when the kernel's head-grouping divides
            # num_heads (EVA-g: 16 heads x 88 -> hc=16, zero pad lanes;
            # measured +10% on the projection+attention chain, round 3)
            dp = head_packing(c.head_width, c.num_heads)
            self.token_sliced = (
                jax.default_backend() == "tpu" and not c.rope
                and l * l >= 128 * 128
                # the backward block must fit VMEM at g=1 — at 448px
                # (lp=1040) it doesn't; fall back to head-major flash
                and tmajor_fits_vmem(lp, dp, jnp.dtype(c.dtype).itemsize,
                                     heads=c.num_heads))
            if self.token_sliced:
                self.qkv = TokenSlicedQKV(all_dim, c.num_heads, dtype=c.dtype,
                                          pad_head_dim=dp,
                                          q_scale=c.head_width ** -0.5)
                self.proj = TokenSlicedOut(c.width, c.num_heads,
                                           c.head_width, dtype=c.dtype)
            else:
                self.qkv = HeadMajorQKV(all_dim, c.num_heads, dtype=c.dtype)
                self.proj = HeadMajorOut(c.width, dtype=c.dtype)
        if c.qkv_bias:
            self.q_bias = self.param("q_bias", nn.initializers.zeros, (all_dim,))
            self.v_bias = self.param("v_bias", nn.initializers.zeros, (all_dim,))

    def __call__(self, x, rope_angles=None):
        c = self.cfg
        b, l, _ = x.shape
        h, d = c.num_heads, c.head_width
        if c.subln:
            # inner_ln mixes all heads per token, so this variant stays
            # token-major
            q = self.q_proj(x)
            k = self.k_proj(x)
            v = self.v_proj(x)
            if c.qkv_bias:
                q = q + self.q_bias.astype(q.dtype)
                v = v + self.v_bias.astype(v.dtype)
            q = q.reshape(b, l, h, d)
            k = k.reshape(b, l, h, d)
            v = v.reshape(b, l, h, d)
            if rope_angles is not None:
                # rope applies to patch tokens only, cls token untouched
                # (eva_vit_model.py:305-310)
                q = jnp.concatenate(
                    [q[:, :1], apply_rope(q[:, 1:], rope_angles)], 1)
                k = jnp.concatenate(
                    [k[:, :1], apply_rope(k[:, 1:], rope_angles)], 1)
            out = multi_head_attention(q, k, v, scale=d ** -0.5)
            out = self.inner_ln(out.reshape(b, l, h * d))
            return self.proj(out)

        # token-sliced fast path (EVA01 and all rope-free variants on TPU)
        if self.token_sliced:
            lp = -(-l // 16) * 16
            if lp != l:
                # cheap contiguous-minor pad; junk key rows are masked
                # in-kernel (lk_true), junk query rows sliced at the end
                x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
            y = self.qkv(x)                     # (B, lp, H*3*Dp)
            dp = y.shape[-1] // (3 * h)
            if c.qkv_bias:
                # per-head [q | k | v] bias groups matching the fused
                # weight layout: q_bias pre-scaled (the q weights carry
                # the score scale), k zero, v v_bias
                qb = self.q_bias.reshape(h, d) * jnp.asarray(
                    d ** -0.5, self.q_bias.dtype)
                vb = self.v_bias.reshape(h, d)
                zb = jnp.zeros_like(qb)
                fused = jnp.stack([qb, zb, vb], axis=1)    # (h, 3, d)
                fused = jnp.pad(fused, [(0, 0), (0, 0), (0, dp - d)])
                y = y + fused.reshape(1, 1, h * 3 * dp).astype(y.dtype)
            out = tag_attention(
                flash_self_attention_tmajor(y, h, l if lp != l else 0, 1.0))
            return self.proj(out)[:, :l]
        q, k, v = self.qkv(x)
        if c.qkv_bias:
            q = q + self.q_bias.reshape(1, h, 1, d).astype(q.dtype)
            v = v + self.v_bias.reshape(1, h, 1, d).astype(v.dtype)
        if rope_angles is not None:
            hq = jnp.swapaxes(q[:, :, 1:], 1, 2)
            hk = jnp.swapaxes(k[:, :, 1:], 1, 2)
            q = jnp.concatenate(
                [q[:, :, :1], jnp.swapaxes(apply_rope(hq, rope_angles), 1, 2)],
                axis=2)
            k = jnp.concatenate(
                [k[:, :, :1], jnp.swapaxes(apply_rope(hk, rope_angles), 1, 2)],
                axis=2)
        out = multi_head_attention_hmajor(q, k, v, scale=d ** -0.5)
        return self.proj(out)


class EvaMlp(nn.Module):
    cfg: EvaVitConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hidden = int(c.width * c.mlp_ratio)
        if c.swiglu:
            x1 = nn.Dense(hidden, dtype=c.dtype, name="w1")(x)
            x2 = nn.Dense(hidden, dtype=c.dtype, name="w2")(x)
            x = nn.silu(x1) * x2
            if c.subln:
                x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                                 name="ffn_ln")(x)
            return nn.Dense(c.width, dtype=c.dtype, name="w3")(x)
        x = nn.Dense(hidden, dtype=c.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=c.use_gelu_tanh)
        if c.subln:
            x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ffn_ln")(x)
        return nn.Dense(c.width, dtype=c.dtype, name="fc2")(x)


class EvaBlock(nn.Module):
    cfg: EvaVitConfig
    drop_path: float = 0.0

    def setup(self):
        c = self.cfg
        self.norm1 = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype)
        self.norm2 = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype)
        self.attn = EvaAttention(c)
        self.mlp = EvaMlp(c)
        if c.ls_init_value is not None:
            init = nn.initializers.constant(c.ls_init_value)
            self.gamma_1 = self.param("gamma_1", init, (c.width,))
            self.gamma_2 = self.param("gamma_2", init, (c.width,))

    def _drop_path(self, x, deterministic):
        if self.drop_path == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return x * mask.astype(x.dtype) / keep

    def __call__(self, x, rope_angles=None, deterministic=True):
        c = self.cfg
        scale1 = getattr(self, "gamma_1", None)
        scale2 = getattr(self, "gamma_2", None)

        if c.postnorm:
            a = self.norm1(self.attn(x, rope_angles))
            if scale1 is not None:
                a = a * scale1.astype(a.dtype)
            x = x + self._drop_path(a, deterministic)
            m = self.norm2(self.mlp(x))
            if scale2 is not None:
                m = m * scale2.astype(m.dtype)
            x = x + self._drop_path(m, deterministic)
        else:
            a = self.attn(self.norm1(x), rope_angles)
            if scale1 is not None:
                a = a * scale1.astype(a.dtype)
            x = x + self._drop_path(a, deterministic)
            m = self.mlp(self.norm2(x))
            if scale2 is not None:
                m = m * scale2.astype(m.dtype)
            x = x + self._drop_path(m, deterministic)
        return x


class EvaVisionTransformer(nn.Module):
    cfg: EvaVitConfig

    def setup(self):
        c = self.cfg
        self.patch_embed = nn.Conv(c.width, (c.patch_size, c.patch_size),
                                   strides=(c.patch_size, c.patch_size),
                                   padding="VALID", dtype=c.dtype)
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, c.width))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, c.num_patches + 1, c.width))
        dpr = np.linspace(0, c.drop_path_rate, c.layers)
        self.blocks = [EvaBlock(c, drop_path=float(dpr[i]), name=f"block_{i}")
                       for i in range(c.layers)]
        self.norm = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype)
        if c.rope:
            self.rope_angles = jnp.asarray(rope_2d_freqs(c))
        else:
            self.rope_angles = None

    def __call__(self, pixels, deterministic=True):
        """pixels: (B, H, W, 3) normalized -> (B, 1+P, width) all tokens."""
        c = self.cfg
        x = self.patch_embed(pixels.astype(c.dtype))   # (B, g, g, width)
        x = x.reshape(x.shape[0], -1, c.width)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype),
                               (x.shape[0], 1, c.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        for blk in self.blocks:
            if c.remat:
                x = nn.remat(lambda m, y, det: m(y, self.rope_angles, det),
                             static_argnums=(2,),
                             policy=remat_policy(c.remat_policy),
                             )(blk, x, deterministic)
            else:
                x = blk(x, self.rope_angles, deterministic)
        return self.norm(x)
