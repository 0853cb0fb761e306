"""Attention front end: pads to TPU tiles and dispatches Pallas vs XLA.

Every encoder (EVA ViT, CLIP ViT, BEATs, AST, BERT self + cross) funnels
through :func:`multi_head_attention` (token-major ``(B, L, H, D)``) or
:func:`multi_head_attention_hmajor` (head-major ``(B, H, L, D)``), so the
Pallas flash kernel and the XLA reference path are interchangeable per
backend/shape.

The head-major entry exists because the ``(B, L, H, D) <-> (B, H, L, D)``
HBM transposes around the kernel cost more than the kernel itself at
encoder shapes (~2.7 ms/layer on ViT-g vs 1.3 ms of attention math).
Callers that produce q/k/v head-major straight out of the projection
matmul (``einsum('blw,whd->bhld')`` — XLA fuses the transpose into the
dot output) skip that traffic entirely; see models/eva_vit.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vast_tpu.ops.flash_attention import (
    NEG_INF,
    flash_attention,
    flash_attention_bwd,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _data_mesh_axes(batch: int):
    """(axis names, product size) to split a kernel's batch dim over.

    Prefers every mesh axis (dp, fsdp, AND tp — a Megatron layout
    doesn't reach inside an opaque kernel, so splitting its batch over
    tp beats running it tp-replicated); falls back to (dp, fsdp) when
    the batch doesn't divide the full product (ragged eval tails under
    tp), then to no mapping at all.
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty or "dp" not in am.axis_names:
        return (), 1
    for cand in (("dp", "fsdp", "tp"), ("dp", "fsdp")):
        axes = tuple(a for a in cand if a in am.axis_names)
        n = math.prod(am.shape[a] for a in axes)
        if n > 1 and batch % n == 0:
            return axes, n
    return (), 1


def _shard_map_batch(fn, args, batch_axes):
    """Explicitly partition a Pallas kernel call over the data mesh axes.

    A ``pallas_call`` lowers to an opaque Mosaic custom call that XLA's
    SPMD partitioner cannot split: under jit-with-mesh it all-gathers the
    operands and runs the FULL problem replicated on every device (the
    CPU dryrun never sees this because kernels are gated off CPU).
    ``shard_map`` states the batch decomposition explicitly, so each
    device runs only its batch shard through the kernel — and because the
    custom-VJP entries are wrapped whole, the backward kernels run
    per-shard too. ``check_vma=False`` is required (pallas_call outputs
    carry no vma); the transpose still psums cotangents of replicated
    operands (biases) — proven in tests/test_multichip.py.

    ``batch_axes``: per arg, 0 to shard the leading dim, None to
    replicate. Falls back to the unwrapped call when not under a mesh or
    when a sharded arg's batch dim doesn't divide the data axes (ragged
    eval tails -> GSPMD replication: correct, just slow).
    """
    batch = min(a.shape[0] for a, ba in zip(args, batch_axes) if ba == 0)
    axes, n = _data_mesh_axes(batch)
    if n == 1:
        return fn(*args)
    for a, ba in zip(args, batch_axes):
        if ba == 0 and a.shape[0] % n:
            return fn(*args)
    in_specs = tuple(P(axes) if ba == 0 else P()
                     for ba in batch_axes)
    f = jax.shard_map(fn, in_specs=in_specs, out_specs=P(axes),
                      axis_names=set(axes), check_vma=False)
    return f(*args)


# single-q-block limit: below this the query length only needs sublane
# (16) alignment; longer sequences tile the q axis in 128-multiples
_SINGLE_Q_BLOCK = 512


def _pad_len_q(lq: int) -> int:
    lq16 = _round_up(lq, 16)
    return lq16 if lq16 <= _SINGLE_Q_BLOCK else _round_up(lq, 128)


def reference_attention(q, k, v, bias=None):
    """Plain XLA attention. q/k/v: (B, H, L, D); bias additive."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


# Pallas kernels are not auto-differentiable: the flash forward carries a
# custom VJP whose backward is the tiled Pallas kernel pair in
# ops/flash_attention.py (dk/dv then dq, recomputing p from the saved
# logsumexp) — the (B, H, Lq, Lk) probability tensor never touches HBM in
# either direction.
#
# ``bias_grad`` (static) selects whether the bias cotangent is real:
# learned additive biases (BEATs gated rel-pos, Swin rel-pos tables) need
# ds reduced over their broadcast axes; boolean masks (BERT padding /
# causal) are non-differentiable, so their cotangent is symbolic zeros and
# ds is never materialized. ``lk_true`` (static) marks Lk tile padding
# masked in-kernel.
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_fwd(qh, kh, vh, add_bias, bias_grad, interpret, lk_true=0):
    return flash_attention(qh, kh, vh, add_bias, interpret=interpret,
                           lk_true=lk_true)


def _flash_fwd_fwd(qh, kh, vh, add_bias, bias_grad, interpret, lk_true=0):
    out, lse = flash_attention(qh, kh, vh, add_bias, interpret=interpret,
                               return_lse=True, lk_true=lk_true)
    return out, (qh, kh, vh, add_bias, out, lse)


def _flash_fwd_bwd(bias_grad, interpret, lk_true, residuals, g):
    qh, kh, vh, add_bias, out, lse = residuals
    g = g.astype(qh.dtype)
    if bias_grad and add_bias is not None:
        dq, dk, dv, ds = flash_attention_bwd(
            qh, kh, vh, add_bias, out, lse, g, interpret=interpret,
            return_dbias=True, lk_true=lk_true)
        reduce_axes = tuple(
            i for i in (0, 1) if add_bias.shape[i] == 1 and ds.shape[i] != 1)
        dbias = ds.sum(axis=reduce_axes, keepdims=True) if reduce_axes else ds
        return dq, dk, dv, dbias.astype(add_bias.dtype)
    dq, dk, dv = flash_attention_bwd(qh, kh, vh, add_bias, out, lse, g,
                                     interpret=interpret, lk_true=lk_true)
    dbias = None if add_bias is None else jnp.zeros_like(add_bias)
    return dq, dk, dv, dbias


_flash_fwd.defvjp(_flash_fwd_fwd, _flash_fwd_bwd)


# Token-sliced self-attention VJP: one fused (B, Lp, 3*H*Dp) operand in,
# (B, Lp, H*Dp) out, gradients in the same fused layout. The backward
# kernel recomputes softmax and delta in-kernel, so the only residuals
# are the operand and the output — both already materialized.
@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _tmajor_call(qkv, heads, lk_true, scale, interpret=False):
    from vast_tpu.ops.flash_attention import self_attention_tmajor
    return self_attention_tmajor(qkv, heads=heads, lk_true=lk_true,
                                 scale=scale, interpret=interpret)


def _tmajor_fwd(qkv, heads, lk_true, scale, interpret=False):
    out = _tmajor_call(qkv, heads, lk_true, scale, interpret)
    return out, (qkv, out)


def _tmajor_bwd(heads, lk_true, scale, interpret, residuals, g):
    from vast_tpu.ops.flash_attention import self_attention_tmajor_bwd
    qkv, out = residuals
    dqkv = self_attention_tmajor_bwd(qkv, out, g.astype(qkv.dtype),
                                     heads=heads, lk_true=lk_true,
                                     scale=scale, interpret=interpret)
    return (dqkv,)


_tmajor_call.defvjp(_tmajor_fwd, _tmajor_bwd)


def flash_self_attention_tmajor(qkv, heads, lk_true, scale,
                                interpret=False):
    return _shard_map_batch(
        lambda x: _tmajor_call(x, heads, lk_true, scale, interpret),
        (qkv,), (0,))


# Biased variant (BEATs gated rel-pos): bias (B, H, Lp, Lp) added to the
# scaled scores in-kernel; its cotangent is the raw per-score ds — the
# chain through the gate/embedding happens in XLA outside the kernel.
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _tmajor_biased_call(qkv, bias, heads, lk_true, scale,
                        interpret=False):
    from vast_tpu.ops.flash_attention import self_attention_tmajor
    return self_attention_tmajor(qkv, bias, heads=heads, lk_true=lk_true,
                                 scale=scale, interpret=interpret)


def _tmajor_biased_fwd(qkv, bias, heads, lk_true, scale, interpret=False):
    out = _tmajor_biased_call(qkv, bias, heads, lk_true, scale, interpret)
    return out, (qkv, bias, out)


def _tmajor_biased_bwd(heads, lk_true, scale, interpret, residuals, g):
    from vast_tpu.ops.flash_attention import self_attention_tmajor_bwd
    qkv, bias, out = residuals
    dqkv, dbias = self_attention_tmajor_bwd(
        qkv, out, g.astype(qkv.dtype), bias, heads=heads, lk_true=lk_true,
        scale=scale, interpret=interpret)
    return dqkv, dbias


_tmajor_biased_call.defvjp(_tmajor_biased_fwd, _tmajor_biased_bwd)


def flash_self_attention_tmajor_biased(qkv, bias, heads, lk_true, scale,
                                       interpret=False):
    if bias.shape[0] == 1 and qkv.shape[0] != 1:
        # the kernel's bias BlockSpec is indexed by batch row and its
        # backward emits a full-batch dbias, so a shared bias must be
        # materialized per row (BEATs always passes per-sample biases;
        # this keeps the shared-bias case correct instead of tracing
        # a kernel with an out-of-bounds size-1 block dim)
        bias = jnp.broadcast_to(bias, (qkv.shape[0],) + bias.shape[1:])
    return _shard_map_batch(
        lambda x, b: _tmajor_biased_call(x, b, heads, lk_true, scale,
                                         interpret),
        (qkv, bias), (0, 0))


def _use_pallas_shapes(b, lq, lk, h, d, has_bias=True) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if lq * lk < 128 * 128:
        # tiny problems: XLA fusion wins over kernel launch overhead
        return False
    if d < 128 and lk >= 8 * lq:
        # long-KV / short-Q (BERT fusion cross-attention: 40 caption
        # tokens against ~2312 condition tokens at Dh=64): the problem is
        # KV-bandwidth-bound and the kernel's 128-lane head-dim pad
        # doubles exactly that traffic; in the backward the padded K/V
        # temps (163 MB x 12 layers at flagship batch 8) OOMed one v5e.
        # XLA's unpadded path is leaner and no slower here (round 3).
        return False
    # when tile padding inflates the kernel's compute too much (very short
    # queries/keys or tiny head dims), XLA wins. Without a bias array Lk
    # only pads to sublane granularity (masked in-kernel via lk_true).
    lk_gran = 16 if (not has_bias and lk <= 4096) else 128
    waste = (_pad_len_q(lq) / lq) * (_round_up(lk, lk_gran) / lk) \
        * (_round_up(d, 128) / d)
    return waste <= 2.5


def _prepare_bias(bias, mask):
    add_bias = None
    if bias is not None:
        add_bias = bias.astype(jnp.float32)
    if mask is not None:
        mb = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
        while mb.ndim < 4:
            mb = mb[:, None]
        add_bias = mb if add_bias is None else add_bias + mb
    return add_bias


def multi_head_attention_hmajor(q, k, v, *, bias=None, mask=None, scale=None,
                                impl: str = "auto", interpret: bool = False):
    """Scaled dot-product attention over head-major (B, H, L, D) tensors.

    Returns (B, H, Lq, D) in q.dtype. bias: additive float, broadcastable
    to (B, H, Lq, Lk). mask: boolean, True = attend, broadcastable to
    (B, 1|H, Lq, Lk).
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    add_bias = _prepare_bias(bias, mask)

    # saveable under the selective ('dots') remat policy — pallas calls
    # are not dots, so without the tag the whole kernel would re-run in
    # the backward recompute (models/remat.py)
    from vast_tpu.models.remat import tag_attention

    use_pallas = impl == "pallas" or (
        impl == "auto" and _use_pallas_shapes(b, lq, lk, h, d,
                                              add_bias is not None))
    if not use_pallas:
        out = reference_attention(q * jnp.asarray(scale, q.dtype), k, v,
                                  add_bias)
        return tag_attention(out.astype(q.dtype))

    # pad to hardware tiles: D -> 128 lanes, Lq -> sublane granularity.
    # Lk is the lane axis only of the in-register score tile: without a
    # bias array it needs just sublane (16) granularity and the tile tail
    # is masked in-kernel (lk_true); with a bias array the bias block's
    # own lane axis is Lk, so it must be a 128 multiple.
    dp = _round_up(d, 128)
    lqp = _pad_len_q(lq)
    lk_true = 0
    if add_bias is None:
        lkp = _round_up(lk, 16 if lk <= 4096 else 128)
        if lkp != lk:
            lk_true = lk
    else:
        lkp = _round_up(lk, 128)
        add_bias = jnp.broadcast_to(
            add_bias, (add_bias.shape[0], add_bias.shape[1], lq, lk))
        add_bias = jnp.pad(
            add_bias,
            [(0, 0), (0, 0), (0, lqp - lq), (0, lkp - lk)],
            constant_values=NEG_INF,
        )

    qs = q * jnp.asarray(scale, q.dtype)
    pad_q = [(0, 0), (0, 0), (0, lqp - lq), (0, dp - d)]
    pad_k = [(0, 0), (0, 0), (0, lkp - lk), (0, dp - d)]
    bg = bias is not None
    args = [jnp.pad(qs, pad_q), jnp.pad(k, pad_k), jnp.pad(v, pad_k)]
    if add_bias is None:
        out = _shard_map_batch(
            lambda q_, k_, v_: _flash_fwd(q_, k_, v_, None, bg, interpret,
                                          lk_true),
            tuple(args), (0, 0, 0))
    else:
        args.append(add_bias)
        out = _shard_map_batch(
            lambda q_, k_, v_, b_: _flash_fwd(q_, k_, v_, b_, bg, interpret,
                                              lk_true),
            tuple(args), (0, 0, 0, 0 if add_bias.shape[0] != 1 else None))
    return tag_attention(out[:, :, :lq, :d].astype(q.dtype))


def multi_head_attention(q, k, v, *, bias=None, mask=None, scale=None,
                         impl: str = "auto", interpret: bool = False):
    """Scaled dot-product attention over token-major (B, L, H, D) tensors.

    Transposes to head-major around :func:`multi_head_attention_hmajor`;
    prefer the head-major entry in hot paths where the projections can
    emit (B, H, L, D) directly.
    """
    out = multi_head_attention_hmajor(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        bias=bias, mask=mask, scale=scale, impl=impl, interpret=interpret)
    return jnp.swapaxes(out, 1, 2)
