"""Attention front end: pads to TPU tiles and dispatches Pallas vs XLA.

Every encoder (EVA ViT, CLIP ViT, BEATs, AST, BERT self + cross) funnels
through :func:`multi_head_attention`, so the Pallas flash kernel and the
XLA reference path are interchangeable per backend/shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vast_tpu.ops.flash_attention import NEG_INF, flash_attention


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def reference_attention(q, k, v, bias=None):
    """Plain XLA attention. q/k/v: (B, H, L, D); bias additive."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


# Pallas kernels are not auto-differentiable: the flash forward gets a
# custom VJP whose backward recomputes attention through the XLA reference
# (memory profile of the backward then matches a standard training step;
# a dedicated backward kernel is a further optimization).
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_fwd(qh, kh, vh, add_bias, interpret):
    return flash_attention(qh, kh, vh, add_bias, interpret=interpret)


def _flash_fwd_fwd(qh, kh, vh, add_bias, interpret):
    out = flash_attention(qh, kh, vh, add_bias, interpret=interpret)
    return out, (qh, kh, vh, add_bias)


def _flash_fwd_bwd(interpret, residuals, g):
    qh, kh, vh, add_bias = residuals
    if add_bias is None:
        _, vjp = jax.vjp(lambda q, k, v: reference_attention(q, k, v),
                         qh, kh, vh)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(reference_attention, qh, kh, vh, add_bias)
    return vjp(g)


_flash_fwd.defvjp(_flash_fwd_fwd, _flash_fwd_bwd)


def _use_pallas_shapes(b, lq, lk, h, d) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if lq * lk < 128 * 128:
        # tiny problems: XLA fusion wins over kernel launch overhead
        return False
    # when tile padding inflates the kernel's compute too much (short
    # queries like the 40-token fusion cross-attention), XLA wins
    waste = (_round_up(lq, 128) / lq) * (_round_up(lk, 128) / lk) \
        * (_round_up(d, 128) / d)
    return waste <= 2.5


def multi_head_attention(q, k, v, *, bias=None, mask=None, scale=None,
                         impl: str = "auto", interpret: bool = False):
    """Scaled dot-product attention over (B, L, H, D) tensors.

    bias: additive float, broadcastable to (B, H, Lq, Lk) — e.g. BEATs'
    gated relative position bias.
    mask: boolean, True = attend, broadcastable to (B, 1|H, Lq, Lk) —
    padding / causal / part-causal masks.
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = d ** -0.5

    add_bias = None
    if bias is not None:
        add_bias = bias.astype(jnp.float32)
    if mask is not None:
        mb = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
        while mb.ndim < 4:
            mb = mb[:, None]
        add_bias = mb if add_bias is None else add_bias + mb

    use_pallas = impl == "pallas" or (
        impl == "auto" and _use_pallas_shapes(b, lq, lk, h, d))
    if not use_pallas:
        qh = jnp.swapaxes(q, 1, 2) * jnp.asarray(scale, q.dtype)
        out = reference_attention(qh, jnp.swapaxes(k, 1, 2),
                                  jnp.swapaxes(v, 1, 2), add_bias)
        return jnp.swapaxes(out, 1, 2).astype(q.dtype)

    # pad to hardware tiles: D -> 128 lanes, L -> block multiples
    dp = _round_up(d, 128)
    lqp = _round_up(lq, 128)
    lkp = _round_up(lk, 128)
    qs = q * jnp.asarray(scale, q.dtype)

    if add_bias is None and lk != lkp:
        add_bias = jnp.zeros((1, 1, lq, lk), jnp.float32)
    if add_bias is not None:
        add_bias = jnp.broadcast_to(
            add_bias, (add_bias.shape[0], add_bias.shape[1], lq, lk))
        add_bias = jnp.pad(
            add_bias,
            [(0, 0), (0, 0), (0, lqp - lq), (0, lkp - lk)],
            constant_values=NEG_INF,
        )

    qh = jnp.swapaxes(qs, 1, 2)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    pad_q = [(0, 0), (0, 0), (0, lqp - lq), (0, dp - d)]
    pad_k = [(0, 0), (0, 0), (0, lkp - lk), (0, dp - d)]
    out = _flash_fwd(jnp.pad(qh, pad_q), jnp.pad(kh, pad_k),
                     jnp.pad(vh, pad_k), add_bias, interpret)
    out = out[:, :, :lq, :d]
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)
