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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
SINGLE_BLOCK_MAX_KV = 4096


def _pick_block(l: int, target: int) -> int:
    """Largest 128-multiple block <= target dividing l (l is a multiple
    of 128 by wrapper construction)."""
    if l <= target:
        return l
    for cand in range(target, 127, -128):
        if l % cand == 0:
            return cand
    return 128


def _single_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, has_bias: bool):
    """Whole-KV softmax for a (G, bq, d) query block; G batched (B*H)
    problems per grid step amortize per-step pipeline overhead."""
    q = q_ref[...]  # (G, bq, d)
    k = k_ref[...]  # (G, lk, d)
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, bq, lk)
    if has_bias:
        s = s + bias_ref[...].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _single_kernel_bias4(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """Variant with a per-problem bias block (1, G, bq, lk)."""
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l = jnp.where(l == 0.0, 1.0, l)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _looped_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr,
                   acc_scr, *, nk: int, has_bias: bool):
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


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, bias=None, *, block_q: int = 512,
                    block_k: int = 1024, interpret: bool = False):
    """Tiled attention; q/k/v already scaled and tile-padded.

    q: (B, H, Lq, D); k, v: (B, H, Lk, D); bias: (Bb, Hb, Lq, Lk) with
    Bb in {1, B}, Hb in {1, H}; returns (B, H, Lq, D) in q.dtype.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    qf = q.reshape(bh, lq, d)
    kf = k.reshape(bh, lk, d)
    vf = v.reshape(bh, lk, d)

    has_bias = bias is not None
    if has_bias:
        bb, hb = bias.shape[0], bias.shape[1]
        bias_bh = 1 if (bb == 1 and hb == 1) else bh
        if bias_bh == bh:
            bias = jnp.broadcast_to(bias, (b, h, lq, lk)).reshape(bh, lq, lk)
        else:
            bias = bias.reshape(1, lq, lk)

    block_q = _pick_block(lq, block_q)
    nq = lq // block_q

    if lk <= SINGLE_BLOCK_MAX_KV:
        # pick the BH batching factor G so VMEM stays ~<=10MB
        per_g = (2 * lk * d * q.dtype.itemsize          # k + v blocks
                 + 2 * block_q * lk * 4                 # s + p fp32
                 + 2 * block_q * d * q.dtype.itemsize)  # q + o
        budget = 13 * 1024 * 1024
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
        if bias_per_bh:
            in_specs.append(pl.BlockSpec(
                (1, g, block_q, lk), lambda ibh, iq: (ibh, 0, iq, 0)))
            args = (qf, kf, vf, bias)
            kernel = _single_kernel_bias4
        elif has_bias:
            # shared bias broadcasts over the G problems in a step
            in_specs.append(pl.BlockSpec(
                (1, block_q, lk), lambda ibh, iq: (0, iq, 0)))
            args = (qf, kf, vf, bias)
            kernel = functools.partial(_single_kernel, has_bias=True)
        else:
            in_specs.append(pl.BlockSpec(
                (1, 1, 1), lambda ibh, iq: (0, 0, 0)))
            args = (qf, kf, vf, jnp.zeros((1, 1, 1), jnp.float32))
            kernel = functools.partial(_single_kernel, has_bias=False)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((g, block_q, d),
                                   lambda ibh, iq: (ibh, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(*args)
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
    out = pl.pallas_call(
        functools.partial(_looped_kernel, nk=nk, has_bias=has_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda ibh, iq, ik: (ibh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, lq, d)
