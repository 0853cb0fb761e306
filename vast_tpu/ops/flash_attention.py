"""Pallas TPU flash attention (self + cross, optional additive bias).

Replaces the reference's xformers ``memory_efficient_attention`` CUDA path
(model/vision_encoders/evaclip/eva_vit_model.py:330) and every
materialized softmax(QK^T)V in the encoders — the XLA fallback round-trips
the (B, H, Lq, Lk) probability tensor through HBM, which is the dominant
cost at encoder sequence lengths (257-4k).

Two kernels:
  * single-block: for Lk <= 4096 the whole K/V fits VMEM, so each grid
    step computes an entire softmax row block with no online rescaling —
    grid (B*H, Lq/block_q);
  * looped: for longer Lk, classic online-softmax accumulation with the
    KV tile axis innermost (sequential on TPU, scratch persists).

Layout: q (B, H, Lq, D), k/v (B, H, Lk, D), bias (1|B, 1|H, Lq, Lk)
additive (large negatives mask). D and lengths are padded to tiles by the
wrapper in ``ops/attention.py``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
SINGLE_BLOCK_MAX_KV = 4096
# shared per-grid-step VMEM budget for kernel G-selection and routing gates
TMAJOR_VMEM_BUDGET = 13 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(l: int, target: int) -> int:
    """Largest 128-multiple block <= target dividing l (l is a multiple
    of 128 by wrapper construction)."""
    if l <= target:
        return l
    for cand in range(target, 127, -128):
        if l % cand == 0:
            return cand
    return 128


def _single_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                   has_bias: bool, bias4: bool = False, lk_true: int = 0):
    """Whole-KV softmax for a (G, bq, d) query block; G batched (B*H)
    problems per grid step amortize per-step pipeline overhead.

    ``bias4`` selects a per-problem bias block (1, G, bq, lk) instead of a
    shared (1, bq, lk) one. ``lse_ref`` may be None (inference) or a
    (G, bq, 1) fp32 block receiving logsumexp rows for the backward.
    ``lk_true`` > 0 masks key columns >= lk_true in-kernel (cheaper than
    materializing a -inf bias in HBM just for tile padding, and it lets
    Lk stay at sublane (16) granularity instead of lane (128)).
    """
    q = q_ref[...]  # (G, bq, d)
    k = k_ref[...]  # (G, lk, d)
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, bq, lk)
    if has_bias:
        s = s + (bias_ref[0] if bias4 else bias_ref[...]).astype(jnp.float32)
    if lk_true:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < lk_true, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[...] = m + jnp.log(l)


def _single_kernel_nolse(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                         has_bias: bool, bias4: bool = False,
                         lk_true: int = 0):
    _single_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, None,
                   has_bias=has_bias, bias4=bias4, lk_true=lk_true)


def _looped_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, m_scr,
                   l_scr, acc_scr, *, nk: int, has_bias: bool,
                   lk_true: int = 0, block_k: int = 0):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    if lk_true:
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < lk_true, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_scr[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_next

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0] = m_scr[:] + jnp.log(l)


def _looped_kernel_nolse(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr,
                         acc_scr, *, nk: int, has_bias: bool,
                         lk_true: int = 0, block_k: int = 0):
    _looped_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, None, m_scr, l_scr,
                   acc_scr, nk=nk, has_bias=has_bias, lk_true=lk_true,
                   block_k=block_k)


def _flatten_bias(bias, b, h, lq, lk):
    """(Bb, Hb, Lq, Lk) -> (BH, Lq, Lk) or (1, Lq, Lk)."""
    bb, hb = bias.shape[0], bias.shape[1]
    if bb == 1 and hb == 1:
        return bias.reshape(1, lq, lk)
    return jnp.broadcast_to(bias, (b, h, lq, lk)).reshape(b * h, lq, lk)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret",
                                    "return_lse", "lk_true"))
def flash_attention(q, k, v, bias=None, *, block_q: int = 512,
                    block_k: int = 1024, interpret: bool = False,
                    return_lse: bool = False, lk_true: int = 0):
    """Tiled attention; q/k/v already scaled and tile-padded.

    q: (B, H, Lq, D); k, v: (B, H, Lk, D); bias: (Bb, Hb, Lq, Lk) with
    Bb in {1, B}, Hb in {1, H}; returns (B, H, Lq, D) in q.dtype, plus the
    per-row logsumexp (B, H, Lq, 1) fp32 when ``return_lse`` (residual for
    :func:`flash_attention_bwd`).

    ``lk_true`` > 0 marks keys >= lk_true as padding, masked in-kernel via
    an iota compare — no -inf bias array needed, and Lk only has to be a
    sublane (16) multiple rather than a lane (128) multiple in the
    single-block regime (K/V's lane axis is D; Lk surfaces as the lane
    axis only on the in-register score tile, which Mosaic pads for free).
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    qf = q.reshape(bh, lq, d)
    kf = k.reshape(bh, lk, d)
    vf = v.reshape(bh, lk, d)

    has_bias = bias is not None
    if has_bias:
        bias = _flatten_bias(bias, b, h, lq, lk)

    block_q = _pick_block(lq, block_q)
    nq = lq // block_q

    if lk <= SINGLE_BLOCK_MAX_KV:
        # pick the BH batching factor G so VMEM stays ~<=10MB
        per_g = (2 * lk * d * q.dtype.itemsize          # k + v blocks
                 + 2 * block_q * lk * 4                 # s + p fp32
                 + 2 * block_q * d * q.dtype.itemsize)  # q + o
        budget = TMAJOR_VMEM_BUDGET
        g = 1
        for cand in (8, 4, 2):
            if bh % cand == 0 and cand * per_g <= budget:
                g = cand
                break
        bias_per_bh = has_bias and bias.shape[0] == bh
        if bias_per_bh:
            bias = bias.reshape(bh // g, g, lq, lk)

        grid = (bh // g, nq)
        in_specs = [
            pl.BlockSpec((g, block_q, d), lambda ibh, iq: (ibh, iq, 0)),
            pl.BlockSpec((g, lk, d), lambda ibh, iq: (ibh, 0, 0)),
            pl.BlockSpec((g, lk, d), lambda ibh, iq: (ibh, 0, 0)),
        ]
        base = _single_kernel if return_lse else _single_kernel_nolse
        ltk = lk_true if 0 < lk_true < lk else 0
        if bias_per_bh:
            in_specs.append(pl.BlockSpec(
                (1, g, block_q, lk), lambda ibh, iq: (ibh, 0, iq, 0)))
            args = (qf, kf, vf, bias)
            kernel = functools.partial(base, has_bias=True, bias4=True,
                                       lk_true=ltk)
        elif has_bias:
            # shared bias broadcasts over the G problems in a step
            in_specs.append(pl.BlockSpec(
                (1, block_q, lk), lambda ibh, iq: (0, iq, 0)))
            args = (qf, kf, vf, bias)
            kernel = functools.partial(base, has_bias=True, lk_true=ltk)
        else:
            in_specs.append(pl.BlockSpec(
                (1, 1, 1), lambda ibh, iq: (0, 0, 0)))
            args = (qf, kf, vf, jnp.zeros((1, 1, 1), jnp.float32))
            kernel = functools.partial(base, has_bias=False, lk_true=ltk)
        out_specs = pl.BlockSpec((g, block_q, d), lambda ibh, iq: (ibh, iq, 0))
        out_shape = jax.ShapeDtypeStruct((bh, lq, d), q.dtype)
        if return_lse:
            out_specs = [out_specs, pl.BlockSpec(
                (g, block_q, 1), lambda ibh, iq: (ibh, iq, 0))]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32)]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(*args)
        if return_lse:
            o, lse = out
            return o.reshape(b, h, lq, d), lse.reshape(b, h, lq, 1)
        return out.reshape(b, h, lq, d)

    block_k = _pick_block(lk, block_k)
    nk = lk // block_k
    grid = (bh, nq, nk)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0)),
    ]
    if has_bias:
        if bias.shape[0] == 1:
            in_specs.append(pl.BlockSpec(
                (1, block_q, block_k), lambda ibh, iq, ik: (0, iq, ik)))
        else:
            in_specs.append(pl.BlockSpec(
                (1, block_q, block_k), lambda ibh, iq, ik: (ibh, iq, ik)))
        args = (qf, kf, vf, bias)
    else:
        in_specs.append(pl.BlockSpec(
            (1, 1, 1), lambda ibh, iq, ik: (0, 0, 0)))
        args = (qf, kf, vf, jnp.zeros((1, 1, 1), jnp.float32))
    base = _looped_kernel if return_lse else _looped_kernel_nolse
    base = functools.partial(base, lk_true=lk_true if 0 < lk_true < lk else 0,
                             block_k=block_k)
    out_specs = pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0))
    out_shape = jax.ShapeDtypeStruct((bh, lq, d), q.dtype)
    if return_lse:
        out_specs = [out_specs, pl.BlockSpec(
            (1, block_q, 1), lambda ibh, iq, ik: (ibh, iq, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(base, nk=nk, has_bias=has_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    if return_lse:
        o, lse = out
        return o.reshape(b, h, lq, d), lse.reshape(b, h, lq, 1)
    return out.reshape(b, h, lq, d)


# ---------------------------------------------------------------------------
# Backward: tiled dq/dk/dv with in-kernel recompute from the forward's
# logsumexp rows — the (B, H, Lq, Lk) probability tensor is never
# materialized in HBM (the round-1 XLA-reference VJP did, costing the
# training path exactly the memory the forward kernel saved). Replaces the
# backward of xformers memory_efficient_attention
# (reference eva_vit_model.py:330).
#
# Two passes (FlashAttention-2 schedule):
#   * dk/dv: grid (BH, nk, nq), q-blocks innermost; each kv tile
#     accumulates ds^T q and p^T do across all q tiles in VMEM scratch;
#   * dq:    grid (BH, nq, nk), kv-blocks innermost; optionally also emits
#     the full ds = p * (dO V^T - delta) when the caller needs a bias
#     gradient (learned relative-position biases: BEATs / Swin).
#
# delta = rowsum(dO * O) is a cheap XLA elementwise reduce done outside.
# Fully-masked *padding* query rows are safe (their dO is zero after the
# wrapper's slice); fully-masked real rows have undefined gradients, as in
# every flash-attention implementation.
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                      bias_ref, dq_ref, dk_ref, dv_ref, ds_ref, *,
                      has_bias: bool, bias4: bool = False, lk_true: int = 0):
    """Single-pass backward for problems whose whole (Lq, Lk) score tile
    fits VMEM (every VAST encoder: EVA 272/384, BEATs 512, BERT <=80): s
    is recomputed ONCE and dq/dk/dv all come off it — 5 MXU ops instead of
    the two-pass schedule's 7. Blocks are (G, ., .), G batched problems
    per grid step as in the forward."""
    q = q_ref[...]          # (G, lq, d)
    do = do_ref[...]
    lse = lse_ref[...]      # (G, lq, 1)
    delta = delta_ref[...]
    k = k_ref[...]          # (G, lk, d)
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (G, lq, lk)
    if has_bias:
        s = s + (bias_ref[0] if bias4 else bias_ref[...]).astype(jnp.float32)
    if lk_true:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < lk_true, s, NEG_INF)
    p = jnp.exp(s - lse)
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (G, lk, d)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (G, lq, lk)
    ds = p * (dp - delta)
    if ds_ref is not None:
        ds_ref[...] = ds.astype(ds_ref.dtype)
    dsc = ds.astype(q.dtype)
    dk_ref[...] = jax.lax.dot_general(
        dsc, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dq_ref[...] = jax.lax.dot_general(
        dsc, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _bwd_fused_kernel_nods(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                           bias_ref, dq_ref, dk_ref, dv_ref, *,
                           has_bias: bool, bias4: bool = False,
                           lk_true: int = 0):
    _bwd_fused_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                      bias_ref, dq_ref, dk_ref, dv_ref, None,
                      has_bias=has_bias, bias4=bias4, lk_true=lk_true)


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                    bias_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, nq: int,
                    has_bias: bool, lk_true: int = 0, block_k: int = 0):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]          # (bq, d)
    do = do_ref[0]        # (bq, d)
    lse = lse_ref[0]      # (bq, 1) fp32
    delta = delta_ref[0]  # (bq, 1) fp32
    k = k_ref[0]          # (bk, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    if lk_true:
        col = (pl.program_id(1) * block_k
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
        s = jnp.where(col < lk_true, s, NEG_INF)
    p = jnp.exp(s - lse)  # (bq, bk)
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, bias_ref,
                   dq_ref, ds_ref, dq_acc, *, nk: int, has_bias: bool,
                   lk_true: int = 0, block_k: int = 0):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    if lk_true:
        col = (pl.program_id(2) * block_k
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
        s = jnp.where(col < lk_true, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    if ds_ref is not None:
        ds_ref[0] = ds.astype(ds_ref.dtype)
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dq_kernel_nods(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                        bias_ref, dq_ref, dq_acc, *, nk: int, has_bias: bool,
                        lk_true: int = 0, block_k: int = 0):
    _bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, bias_ref,
                   dq_ref, None, dq_acc, nk=nk, has_bias=has_bias,
                   lk_true=lk_true, block_k=block_k)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret",
                                    "return_dbias", "lk_true"))
def flash_attention_bwd(q, k, v, bias, o, lse, do, *, block_q: int = 512,
                        block_k: int = 512, interpret: bool = False,
                        return_dbias: bool = False, lk_true: int = 0):
    """Gradients of :func:`flash_attention` w.r.t. q, k, v (and the raw
    per-(b,h) ds when ``return_dbias`` — the caller reduces it over the
    bias's broadcast axes).

    q/k/v/o/do: (B, H, L, D) tile-padded as in the forward; lse:
    (B, H, Lq, 1) fp32 from ``return_lse``; bias: (Bb, Hb, Lq, Lk) or None.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    qf = q.reshape(bh, lq, d)
    kf = k.reshape(bh, lk, d)
    vf = v.reshape(bh, lk, d)
    dof = do.reshape(bh, lq, d)
    lsef = lse.reshape(bh, lq, 1)
    delta = jnp.sum(dof.astype(jnp.float32) * o.reshape(bh, lq, d)
                    .astype(jnp.float32), axis=-1, keepdims=True)

    has_bias = bias is not None
    if has_bias:
        biasf = _flatten_bias(bias, b, h, lq, lk)
    else:
        biasf = jnp.zeros((1, 1, 1), jnp.float32)

    # fused single-pass backward when the whole problem fits VMEM
    per_g = (4 * lq * lk * 4                       # s, p, dp, ds fp32
             + 4 * lq * d * q.dtype.itemsize       # q, do, dq, +slack
             + 4 * lk * d * q.dtype.itemsize)      # k, v, dk, dv
    if lq <= 512 and lk <= SINGLE_BLOCK_MAX_KV \
            and per_g <= TMAJOR_VMEM_BUDGET:
        g = 1
        for cand in (8, 4, 2):
            if bh % cand == 0 and cand * per_g <= TMAJOR_VMEM_BUDGET:
                g = cand
                break
        bias_per_bh = has_bias and biasf.shape[0] == bh
        bias_arg = biasf
        if bias_per_bh:
            bias_arg = biasf.reshape(bh // g, g, lq, lk)
        in_specs = [
            pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, lq, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, lq, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0)),
        ]
        if bias_per_bh:
            in_specs.append(pl.BlockSpec((1, g, lq, lk),
                                         lambda i: (i, 0, 0, 0)))
        elif has_bias:
            in_specs.append(pl.BlockSpec((1, lq, lk), lambda i: (0, 0, 0)))
        else:
            in_specs.append(pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)))
        base = _bwd_fused_kernel if return_dbias else _bwd_fused_kernel_nods
        kernel = functools.partial(base, has_bias=has_bias,
                                   bias4=bias_per_bh,
                                   lk_true=lk_true if 0 < lk_true < lk else 0)
        out_specs = [
            pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
        ]
        if return_dbias:
            out_specs.append(pl.BlockSpec((g, lq, lk), lambda i: (i, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((bh, lq, lk), jnp.float32))
        out = pl.pallas_call(
            kernel,
            grid=(bh // g,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(qf, dof, lsef, delta, kf, vf, bias_arg)
        if return_dbias:
            dq, dk, dv, ds = out
            return (dq.reshape(b, h, lq, d), dk.reshape(b, h, lk, d),
                    dv.reshape(b, h, lk, d), ds.reshape(b, h, lq, lk))
        dq, dk, dv = out
        return (dq.reshape(b, h, lq, d), dk.reshape(b, h, lk, d),
                dv.reshape(b, h, lk, d))

    # Tiled path: blocks are 128-granular, but the forward wrapper may
    # deliver Lk (and Lq <= 512) at sublane (16) granularity when it ran
    # the single-block bias-free forward. Re-pad here to 128 multiples
    # with in-kernel lk_true masking, else ``nk = lk // block_k``
    # truncates and dk/dv tail rows are never written (advisor r2 high:
    # AST training, lk=1216 -> nk=9 covered only 1152 keys).
    lq_out, lk_out = lq, lk
    if lk % 128:
        if not (0 < lk_true < lk):
            lk_true = lk
        pad = _round_up(lk, 128) - lk
        kf = jnp.pad(kf, [(0, 0), (0, pad), (0, 0)])
        vf = jnp.pad(vf, [(0, 0), (0, pad), (0, 0)])
        if has_bias:
            biasf = jnp.pad(biasf, [(0, 0), (0, 0), (0, pad)])
        lk += pad
    if lq > 512 and lq % 128:
        # zero-padded q/do/lse/delta rows contribute exactly zero to
        # dk/dv (do = 0 and delta = 0 => ds = 0) and their dq is sliced
        pad = _round_up(lq, 128) - lq
        qf = jnp.pad(qf, [(0, 0), (0, pad), (0, 0)])
        dof = jnp.pad(dof, [(0, 0), (0, pad), (0, 0)])
        lsef = jnp.pad(lsef, [(0, 0), (0, pad), (0, 0)])
        delta = jnp.pad(delta, [(0, 0), (0, pad), (0, 0)])
        if has_bias:
            biasf = jnp.pad(biasf, [(0, 0), (0, pad), (0, 0)])
        lq += pad

    block_q = _pick_block(lq, block_q)
    block_k = _pick_block(lk, block_k)
    nq = lq // block_q
    nk = lk // block_k

    def bias_spec(index_map):
        if not has_bias:
            return pl.BlockSpec((1, 1, 1), lambda *a: (0, 0, 0))
        if biasf.shape[0] == 1:
            return pl.BlockSpec((1, block_q, block_k),
                                lambda *a: (0,) + index_map(*a)[1:])
        return pl.BlockSpec((1, block_q, block_k), index_map)

    # pass 1: dk, dv — kv tiles resident, q tiles stream (innermost)
    dkv_specs = [
        pl.BlockSpec((1, block_q, d), lambda ibh, ik, iq: (ibh, iq, 0)),
        pl.BlockSpec((1, block_q, d), lambda ibh, ik, iq: (ibh, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda ibh, ik, iq: (ibh, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda ibh, ik, iq: (ibh, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda ibh, ik, iq: (ibh, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda ibh, ik, iq: (ibh, ik, 0)),
        bias_spec(lambda ibh, ik, iq: (ibh, iq, ik)),
    ]
    ltk = lk_true if 0 < lk_true < lk else 0
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, nq=nq, has_bias=has_bias,
                          lk_true=ltk, block_k=block_k),
        grid=(bh, nk, nq),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda ibh, ik, iq: (ibh, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ibh, ik, iq: (ibh, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, dof, lsef, delta, kf, vf, biasf)

    # pass 2: dq (+ optional full ds) — q tiles resident, kv tiles stream
    dq_specs = [
        pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0)),
        pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda ibh, iq, ik: (ibh, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda ibh, iq, ik: (ibh, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0)),
        bias_spec(lambda ibh, iq, ik: (ibh, iq, ik)),
    ]
    dq_out_spec = pl.BlockSpec((1, block_q, d),
                               lambda ibh, iq, ik: (ibh, iq, 0))
    dq_out_shape = jax.ShapeDtypeStruct((bh, lq, d), q.dtype)
    if return_dbias:
        out = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, nk=nk, has_bias=has_bias,
                              lk_true=ltk, block_k=block_k),
            grid=(bh, nq, nk),
            in_specs=dq_specs,
            out_specs=[dq_out_spec, pl.BlockSpec(
                (1, block_q, block_k), lambda ibh, iq, ik: (ibh, iq, ik))],
            out_shape=[dq_out_shape,
                       jax.ShapeDtypeStruct((bh, lq, lk), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(qf, dof, lsef, delta, kf, vf, biasf)
        dq, ds = out
        return (dq.reshape(b, h, lq, d)[:, :, :lq_out],
                dk.reshape(b, h, lk, d)[:, :, :lk_out],
                dv.reshape(b, h, lk, d)[:, :, :lk_out],
                ds.reshape(b, h, lq, lk)[:, :, :lq_out, :lk_out])
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_nods, nk=nk, has_bias=has_bias,
                          lk_true=ltk, block_k=block_k),
        grid=(bh, nq, nk),
        in_specs=dq_specs,
        out_specs=dq_out_spec,
        out_shape=dq_out_shape,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, dof, lsef, delta, kf, vf, biasf)
    return (dq.reshape(b, h, lq, d)[:, :, :lq_out],
            dk.reshape(b, h, lk, d)[:, :, :lk_out],
            dv.reshape(b, h, lk, d)[:, :, :lk_out])


# ---------------------------------------------------------------------------
# Token-major self-attention ("token-sliced"): q/k/v stay in the layout the
# projection matmul naturally writes — (B, Lp, H*3*Dp) with each head's
# [q | k | v] a contiguous 3*Dp lane group — and the grid's head axis
# selects the group via the BlockSpec index map. Rationale (BENCH_NOTES
# "attention glue", round 2): a plain (BL, W) x (W, 3HDp) matmul sustains
# ~191 TFLOP/s on v5e while the transpose-fused head-major einsum
# ('blw,whd->bhld') drops to ~85 TFLOP/s — the strided head-major write
# pattern halves the matmul. Reading per-head lane groups costs nothing,
# so attention runs with ZERO layout glue end to end and the projections
# run at full matmul speed. The per-head-contiguous ordering (vs
# [q heads | k heads | v heads]) lets forward read ONE operand block and
# backward write ONE gradient block — no concat pass. Replaces the
# head-major EVA path; the reference hot path being replaced is still
# xformers memory_efficient_attention (eva_vit_model.py:330).
#
# The backward is self-contained: for single-block problems the whole
# softmax row is in VMEM, so lse and delta are recomputed in-kernel and
# the only residuals are (qkv, out) — tensors the forward already
# materialized.
# ---------------------------------------------------------------------------


def head_packing(d: int, heads: int) -> int:
    """Lane-padded per-head width Dp for the token-sliced kernels.

    The kernel groups hc = 128/gcd(Dp, 128) heads per block so the block
    lane count hc*3*Dp is 128-aligned. When that hc divides ``heads`` the
    TRUE head width needs no padding at all (EVA-g d=88 -> hc=16, BEATs
    d=64 -> hc=2): the per-head q/k/v slices are cut in-VMEM with lane
    rotations, which measure ~10% FASTER than carrying 88->128 zero-lanes
    through the projections (BENCH_NOTES round 3, adopt note). Only when
    hc doesn't divide ``heads`` fall back to one padded 128-lane head per
    block."""
    if heads % (128 // math.gcd(d, 128)) == 0:
        return d
    return -(-d // 128) * 128


def _hc_for(dp: int, heads: int) -> int:
    """Heads per kernel block: smallest hc making hc*3*Dp lane-aligned
    (3 is odd, so the condition is hc*Dp % 128 == 0)."""
    hc = 128 // math.gcd(dp, 128)
    assert heads % hc == 0, (dp, heads)
    return hc


def _tmajor_per_g(lp, width, itemsize, tensors, scores):
    """VMEM bytes of ONE grid step of a token-sliced kernel: ``tensors``
    Lp x ``width`` tensor blocks plus ``scores`` fp32 Lp x Lp score
    tiles. The single source of truth shared by the kernels' g-selection
    (_tmajor_g) and the call-site routing gate (tmajor_fits_vmem) — the
    two MUST agree or the gate stops preventing g=1 compile crashes."""
    return tensors * lp * width * itemsize + scores * lp * lp * 4


def tmajor_fits_vmem(lp: int, dp: int, itemsize: int, heads: int = 1,
                     has_bias: bool = False) -> bool:
    """Whether the token-sliced BACKWARD fits the VMEM budget at g=1
    (8 L x D tensor blocks per head-group: qkv + dqkv at 3*Dp, o + do at
    Dp, hc heads per block; plus 4 fp32 L x L score tiles: s, p, dp, ds —
    with an additive bias, 2 more L x L blocks PER grouped head for the
    bias input and cotangent). Call-site gate: beyond this (e.g. EVA at
    448px, lp=1040 -> ~23 MB) the model must route to the head-major
    flash path instead of compile-crashing (advisor r2)."""
    hc = 128 // math.gcd(dp, 128)
    if heads % hc:
        hc = 1
    scores = 4 + (2 * hc if has_bias else 0)
    return _tmajor_per_g(lp, hc * dp, itemsize, 8, scores) \
        <= TMAJOR_VMEM_BUDGET


def _tmajor_g(lp, width, dtype_size, tensors, scores, batch):
    """Largest G in (8,4,2,1) dividing ``batch`` whose VMEM footprint
    (``tensors`` L x ``width`` blocks + ``scores`` fp32 L x L tiles)
    fits."""
    per_g = _tmajor_per_g(lp, width, dtype_size, tensors, scores)
    for cand in (8, 4, 2):
        if batch % cand == 0 and cand * per_g <= TMAJOR_VMEM_BUDGET:
            return cand
    return 1


def _tmajor_fwd_kernel(qkv_ref, o_ref, *, dp: int, hc: int, lk_true: int,
                       scale: float, bias_ref=None):
    blk = qkv_ref[...]                            # (G, Lp, hc*3*Dp)
    for i in range(hc):
        base = i * 3 * dp
        q = blk[..., base:base + dp]
        k = blk[..., base + dp:base + 2 * dp]
        v = blk[..., base + 2 * dp:base + 3 * dp]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (G, Lp, Lp)
        if scale != 1.0:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[:, i].astype(jnp.float32)  # (G, hc, Lp, Lp)
        if lk_true:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < lk_true, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[..., i * dp:(i + 1) * dp] = o.astype(o_ref.dtype)


def _tmajor_fwd_kernel_bias(qkv_ref, bias_ref, o_ref, *, dp: int, hc: int,
                            lk_true: int, scale: float):
    _tmajor_fwd_kernel(qkv_ref, o_ref, dp=dp, hc=hc, lk_true=lk_true,
                       scale=scale, bias_ref=bias_ref)


def _tmajor_bwd_kernel(qkv_ref, o_ref, do_ref, dqkv_ref, *, dp: int,
                       hc: int, lk_true: int, scale: float, bias_ref=None,
                       dbias_ref=None):
    blk = qkv_ref[...]                            # (G, Lp, hc*3*Dp)
    for i in range(hc):
        base = i * 3 * dp
        q = blk[..., base:base + dp]
        k = blk[..., base + dp:base + 2 * dp]
        v = blk[..., base + 2 * dp:base + 3 * dp]
        o = o_ref[..., i * dp:(i + 1) * dp].astype(jnp.float32)
        do = do_ref[..., i * dp:(i + 1) * dp]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[:, i].astype(jnp.float32)
        if lk_true:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < lk_true, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / l                                 # (G, Lp, Lp) fp32
        delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dpv = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dpv - delta)                    # d(score before *scale)
        if dbias_ref is not None:
            dbias_ref[:, i] = ds.astype(dbias_ref.dtype)
        dsc = ds.astype(q.dtype)
        dk = jax.lax.dot_general(
            dsc, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dq = jax.lax.dot_general(
            dsc, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dqkv_ref[..., base:base + dp] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[..., base + dp:base + 2 * dp] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[..., base + 2 * dp:base + 3 * dp] = dv.astype(
            dqkv_ref.dtype)


def _tmajor_bwd_kernel_bias(qkv_ref, bias_ref, o_ref, do_ref, dqkv_ref,
                            dbias_ref, *, dp: int, hc: int, lk_true: int,
                            scale: float):
    _tmajor_bwd_kernel(qkv_ref, o_ref, do_ref, dqkv_ref, dp=dp, hc=hc,
                       lk_true=lk_true, scale=scale, bias_ref=bias_ref,
                       dbias_ref=dbias_ref)


@functools.partial(jax.jit,
                   static_argnames=("heads", "lk_true", "scale", "interpret"))
def self_attention_tmajor(qkv, bias=None, *, heads: int, lk_true: int = 0,
                          scale: float = 1.0, interpret: bool = False):
    """Self-attention over a fused token-major qkv tensor.

    qkv: (B, Lp, H*3*Dp) — the raw output of one projection matmul whose
    reshaped weights order each head's [q | k | v] contiguously, each
    section Dp wide, Lp a sublane multiple. Dp may be the TRUE head width
    (no lane padding): the kernel groups hc = 128/gcd(Dp, 128) heads per
    block (hc must divide H — use ``head_packing`` at the call site) and
    cuts per-head slices in-VMEM. Returns (B, Lp, H*Dp). ``lk_true``
    masks key tile padding in-kernel; ``scale`` is applied to the scores
    (fp32). ``bias`` is an optional additive (B, H, Lp, Lp) score bias,
    added AFTER the scale (BEATs' gated rel-pos semantics, reference
    beats.py:767-769); with a bias Lp must be a 128 multiple (it is the
    bias block's lane axis).
    """
    b, lp, total = qkv.shape
    dp = (total // 3) // heads
    hc = _hc_for(dp, heads)
    n_scores = 2 if bias is None else 2 + hc
    g = _tmajor_g(lp, hc * dp, qkv.dtype.itemsize, 4, n_scores, b)
    in_specs = [pl.BlockSpec((g, lp, hc * 3 * dp),
                             lambda ib, ih: (ib, 0, ih))]
    ops = [qkv]
    if bias is None:
        kern = functools.partial(_tmajor_fwd_kernel, dp=dp, hc=hc,
                                 lk_true=lk_true, scale=scale)
    else:
        kern = functools.partial(_tmajor_fwd_kernel_bias, dp=dp, hc=hc,
                                 lk_true=lk_true, scale=scale)
        in_specs.append(
            pl.BlockSpec((g, hc, lp, lp), lambda ib, ih: (ib, ih, 0, 0)))
        ops.append(bias)
    return pl.pallas_call(
        kern,
        grid=(b // g, heads // hc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, lp, hc * dp), lambda ib, ih: (ib, 0, ih)),
        out_shape=jax.ShapeDtypeStruct((b, lp, heads * dp), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*ops)


@functools.partial(jax.jit,
                   static_argnames=("heads", "lk_true", "scale", "interpret"))
def self_attention_tmajor_bwd(qkv, o, do, bias=None, *, heads: int,
                              lk_true: int = 0, scale: float = 1.0,
                              interpret: bool = False):
    """Gradient w.r.t. the fused qkv tensor, same per-head [dq | dk | dv]
    layout, recomputing softmax and delta in-kernel from (qkv, o, do).
    With ``bias``, returns (dqkv, dbias) where dbias is the raw per-score
    cotangent (B, H, Lp, Lp) in the bias dtype (callers reduce broadcast
    axes / chain through the gate outside the kernel)."""
    b, lp, total = qkv.shape
    dp = (total // 3) // heads
    hc = _hc_for(dp, heads)
    n_scores = 4 if bias is None else 4 + 2 * hc
    g = _tmajor_g(lp, hc * dp, qkv.dtype.itemsize, 8, n_scores, b)
    in_specs = [
        pl.BlockSpec((g, lp, hc * 3 * dp), lambda ib, ih: (ib, 0, ih)),
        pl.BlockSpec((g, lp, hc * dp), lambda ib, ih: (ib, 0, ih)),
        pl.BlockSpec((g, lp, hc * dp), lambda ib, ih: (ib, 0, ih)),
    ]
    if bias is None:
        return pl.pallas_call(
            functools.partial(_tmajor_bwd_kernel, dp=dp, hc=hc,
                              lk_true=lk_true, scale=scale),
            grid=(b // g, heads // hc),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((g, lp, hc * 3 * dp),
                                   lambda ib, ih: (ib, 0, ih)),
            out_shape=jax.ShapeDtypeStruct((b, lp, total), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(qkv, o, do)
    in_specs.insert(1, pl.BlockSpec((g, hc, lp, lp),
                                    lambda ib, ih: (ib, ih, 0, 0)))
    return pl.pallas_call(
        functools.partial(_tmajor_bwd_kernel_bias, dp=dp, hc=hc,
                          lk_true=lk_true, scale=scale),
        grid=(b // g, heads // hc),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((g, lp, hc * 3 * dp), lambda ib, ih: (ib, 0, ih)),
            pl.BlockSpec((g, hc, lp, lp), lambda ib, ih: (ib, ih, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, total), qkv.dtype),
            jax.ShapeDtypeStruct((b, heads, lp, lp), bias.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qkv, bias, o, do)
