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
