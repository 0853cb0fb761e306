"""Head-major projection modules shared by the encoders.

Each module's param tree is identical to the ``nn.Dense`` it replaces
({'kernel': (in, features)} [+ {'bias': (features,)}]) so checkpoint
converters are unchanged, but the output comes out head-major
(B, H, L, Dh) straight from the projection matmul: XLA fuses the
(B,L,H,D)->(B,H,L,D) transpose into the dot output, removing the
standalone HBM transpose passes around attention (~2 ms/layer on ViT-g —
see ops/attention.py and BENCH_NOTES.md).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class HeadMajorDense(nn.Module):
    """nn.Dense-compatible projection emitting head-major (B, H, L, Dh)."""

    features: int
    heads: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = x.shape[-1]
        hd = self.features // self.heads
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (w, self.features))
        k3 = kernel.reshape(w, self.heads, hd).astype(self.dtype)
        y = jnp.einsum("blw,whd->bhld", x.astype(self.dtype), k3)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.reshape(1, self.heads, 1, hd).astype(self.dtype)
        return y


class HeadMajorQKV(nn.Module):
    """Fused qkv projection -> three head-major (B, H, L, Dh) tensors;
    params match ``nn.Dense(3*all_dim, use_bias=False)``."""

    all_dim: int
    heads: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = x.shape[-1]
        hd = self.all_dim // self.heads
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (w, 3 * self.all_dim))
        k3 = kernel.reshape(w, 3, self.heads, hd).astype(self.dtype)
        x = x.astype(self.dtype)
        q = jnp.einsum("blw,whd->bhld", x, k3[:, 0])
        k = jnp.einsum("blw,whd->bhld", x, k3[:, 1])
        v = jnp.einsum("blw,whd->bhld", x, k3[:, 2])
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (3 * self.all_dim,))
            b3 = bias.reshape(1, 3, self.heads, 1, hd).astype(self.dtype)
            q, k, v = q + b3[:, 0], k + b3[:, 1], v + b3[:, 2]
        return q, k, v


class HeadMajorOut(nn.Module):
    """Output projection over head-major (B, H, L, Dh) -> (B, L, features);
    params match ``nn.Dense(features)``."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, o):
        _, h, _, hd = o.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (h * hd, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k3 = kernel.reshape(h, hd, self.features).astype(self.dtype)
        return (jnp.einsum("bhld,hdw->blw", o.astype(self.dtype), k3)
                + bias.astype(self.dtype))


class ProjParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense``: declares the identical
    {kernel, bias} tree but returns the raw arrays so the owner can fold
    them into a fused/padded layout chosen at trace time (e.g. BEATs
    picks token-sliced vs head-major per backend/shape while keeping one
    checkpoint-compatible param tree)."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class TokenSlicedQKV(nn.Module):
    """Fused qkv projection for the token-sliced attention kernel: ONE
    plain (B*L, W) x (W, H*3*Dp) matmul emitting (B, L, H*3*Dp) with each
    head's [q | k | v] a contiguous lane-aligned group (the kernel reads
    one block per head; its gradient writes one block back — no concat).
    Params match ``nn.Dense(3*all_dim, use_bias=False)`` exactly (kernel
    (W, 3*all_dim) [+ bias]); head-dim padding, the per-head reorder, and
    the query scale are baked into the reshaped weights at trace time, so
    the matmul runs at full speed (plain ~191 vs transpose-fused
    head-major ~85 TFLOP/s on v5e — see BENCH_NOTES round 2) and
    attention needs zero layout glue."""

    all_dim: int
    heads: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    pad_head_dim: int = 0
    q_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = x.shape[-1]
        hd = self.all_dim // self.heads
        dp = max(self.pad_head_dim, hd)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (w, 3 * self.all_dim))
        k4 = kernel.reshape(w, 3, self.heads, hd).astype(self.dtype)
        if self.q_scale != 1.0:
            scale = jnp.asarray(self.q_scale, self.dtype)
            k4 = jnp.concatenate([k4[:, :1] * scale, k4[:, 1:]], axis=1)
        if dp > hd:
            k4 = jnp.pad(k4, [(0, 0), (0, 0), (0, 0), (0, dp - hd)])
        k4 = jnp.transpose(k4, (0, 2, 1, 3))      # (w, h, 3, dp)
        y = x.astype(self.dtype) @ k4.reshape(w, self.heads * 3 * dp)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (3 * self.all_dim,))
            b4 = bias.reshape(1, 3, self.heads, hd).astype(self.dtype)
            if self.q_scale != 1.0:
                b4 = jnp.concatenate(
                    [b4[:, :1] * jnp.asarray(self.q_scale, self.dtype),
                     b4[:, 1:]], axis=1)
            if dp > hd:
                b4 = jnp.pad(b4, [(0, 0)] * 3 + [(0, dp - hd)])
            b4 = jnp.transpose(b4, (0, 2, 1, 3))
            y = y + b4.reshape(1, 1, self.heads * 3 * dp)
        return y


class TokenSlicedOut(nn.Module):
    """Output projection consuming the token-sliced attention output
    (B, L, H*Dp): a plain matmul whose reshaped kernel carries zero rows
    for the Dp tile-padding lanes. Params match ``nn.Dense(features)``."""

    features: int
    heads: int
    head_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, o):
        dp = o.shape[-1] // self.heads
        hd = self.head_dim
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.heads * hd, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k3 = kernel.reshape(self.heads, hd, self.features).astype(self.dtype)
        if dp > hd:
            k3 = jnp.pad(k3, [(0, 0), (0, dp - hd), (0, 0)])
        return (o.astype(self.dtype) @ k3.reshape(self.heads * dp,
                                                  self.features)
                + bias.astype(self.dtype))
