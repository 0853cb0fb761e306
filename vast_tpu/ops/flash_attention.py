"""Pallas TPU flash attention (self + cross, optional additive bias).

Replaces the reference's xformers ``memory_efficient_attention`` CUDA path
(model/vision_encoders/evaclip/eva_vit_model.py:330) and every materialized
softmax(QK^T)V in the encoders. Online-softmax tiling over the KV axis; the
KV grid dimension is innermost so scratch accumulators persist across its
sequential iterations on TPU.

Layout: q (B, H, Lq, D), k/v (B, H, Lk, D), bias (1|B, 1|H, Lq, Lk) additive
(use large negatives for masking). D and the sequence lengths are padded to
hardware tiles by the wrapper in ``ops/attention.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, nk: int, has_bias: bool):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (bk, d)
    v = v_ref[0, 0]  # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_scr[:]  # (bq, 1)
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_next
    l_scr[:] = l_next

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:]
        # rows that saw only -inf (fully masked) produce l == 0; emit zeros.
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, bias=None, *, block_q: int = 128,
                    block_k: int = 128, interpret: bool = False):
    """Tiled attention; q/k/v already scaled and tile-padded.

    q: (B, H, Lq, D); k, v: (B, H, Lk, D); bias: (Bb, Hb, Lq, Lk) with
    Bb in {1, B}, Hb in {1, H}; returns (B, H, Lq, D) in q.dtype.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q = min(block_q, lq)
    block_k = min(block_k, lk)
    assert lq % block_q == 0 and lk % block_k == 0, (lq, lk, block_q, block_k)
    nq, nk = lq // block_q, lk // block_k

    grid = (b, h, nq, nk)
    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0))
    k_spec = pl.BlockSpec((1, 1, block_k, d), lambda ib, ih, iq, ik: (ib, ih, ik, 0))
    o_spec = pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0))
    in_specs = [q_spec, k_spec, k_spec]

    has_bias = bias is not None
    if has_bias:
        bb, hb = bias.shape[0], bias.shape[1]
        bias_spec = pl.BlockSpec(
            (1, 1, block_q, block_k),
            lambda ib, ih, iq, ik, bb=bb, hb=hb: (
                ib if bb > 1 else 0, ih if hb > 1 else 0, iq, ik),
        )
        in_specs.append(bias_spec)
        args = (q, k, v, bias)
    else:
        in_specs.append(None)
        args = (q, k, v, jnp.zeros((1, 1, 1, 1), q.dtype))
        # placeholder never read; give it a full-array spec
        in_specs[-1] = pl.BlockSpec((1, 1, 1, 1), lambda ib, ih, iq, ik: (0, 0, 0, 0))

    kernel = functools.partial(_flash_kernel, nk=nk, has_bias=has_bias)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
