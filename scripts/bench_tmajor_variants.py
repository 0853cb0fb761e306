#!/usr/bin/env python3
"""Round-4 verdict #4 experiment: attack the token-sliced kernel's
lane-rotation overhead at EVA-g flagship shapes.

Round 3 adopted unpadded head widths (dp=88, hc=16): projections dropped
31% of their FLOPs but the kernel itself got SLOWER (fwd 3.46 -> 4.68 ms)
because each per-head q/k/v slice is cut at a misaligned lane offset
(i*264 % 128 != 0) forcing Mosaic lane rotations. Net chain +10%, but the
rotation cost is pure overhead. Candidate layouts measured here, all
keeping the unpadded-projection FLOP win:

  cur   — adopted round-3 kernel (in-register misaligned slices)
  hgrid — per-head grid: BlockSpec cuts ONE head's (Lp, 3*88) strip per
          grid step, so the misalignment is handled by the HBM->VMEM DMA
          (strided copy) instead of in-register rotations; relative
          sub-slices at 0/88/176 rotate a 264-wide group, not 4224
  sect  — section-major fused layout [Q(1408)|K(1408)|V(1408)] (each
          section 11x128-aligned): per-head slices i*88 rotate within a
          1408-wide group; section cuts themselves are free
  hgrid2— per-head grid over the section-major layout: three DMAs of
          (Lp, 88) per step at lane offsets i*88

Each variant is timed fwd-only and fwd+bwd at (B=256, Lp=272, H=16,
D=88) bf16 — the exact flagship shape (32 clips x 8 frames, 257 tokens
padded to 272). Run on the real chip. Prints one JSON line per
measurement.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vast_tpu.ops.attention import (  # noqa: E402
    flash_self_attention_tmajor,
)
from vast_tpu.ops.flash_attention import NEG_INF  # noqa: E402

B, LP, H, D = 256, 272, 16, 88
LK_TRUE = 257


def _softmax_av(q, k, v, lk_true):
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if lk_true:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < lk_true, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general((p / l).astype(v.dtype), v,
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- hgrid
def _hgrid_kernel(qkv_ref, o_ref, *, dp, lk_true):
    blk = qkv_ref[...]                               # (G, Lp, 3*Dp)
    q = blk[..., :dp]
    k = blk[..., dp:2 * dp]
    v = blk[..., 2 * dp:3 * dp]
    o_ref[...] = _softmax_av(q, k, v, lk_true).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "lk_true"))
def attention_hgrid(qkv, *, heads, lk_true=0):
    b, lp, total = qkv.shape
    dp = (total // 3) // heads
    g = 4
    return pl.pallas_call(
        functools.partial(_hgrid_kernel, dp=dp, lk_true=lk_true),
        grid=(b // g, heads),
        in_specs=[pl.BlockSpec((g, lp, 3 * dp), lambda ib, ih: (ib, 0, ih))],
        out_specs=pl.BlockSpec((g, lp, dp), lambda ib, ih: (ib, 0, ih)),
        out_shape=jax.ShapeDtypeStruct((b, lp, heads * dp), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qkv)


# ----------------------------------------------------------------- sect
def _sect_kernel(qkv_ref, o_ref, *, dp, heads, lk_true):
    blk = qkv_ref[...]                               # (G, Lp, 3*H*Dp)
    hd = heads * dp
    for i in range(heads):
        q = blk[..., i * dp:(i + 1) * dp]
        k = blk[..., hd + i * dp:hd + (i + 1) * dp]
        v = blk[..., 2 * hd + i * dp:2 * hd + (i + 1) * dp]
        o_ref[..., i * dp:(i + 1) * dp] = _softmax_av(
            q, k, v, lk_true).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "lk_true"))
def attention_sect(qkv, *, heads, lk_true=0):
    """qkv in section-major layout (B, Lp, [Q_all | K_all | V_all])."""
    b, lp, total = qkv.shape
    dp = (total // 3) // heads
    return pl.pallas_call(
        functools.partial(_sect_kernel, dp=dp, heads=heads, lk_true=lk_true),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, lp, total), lambda ib: (ib, 0, 0))],
        out_specs=pl.BlockSpec((1, lp, heads * dp), lambda ib: (ib, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lp, heads * dp), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qkv)


# --------------------------------------------------------------- hgrid2
def _hgrid2_kernel(q_ref, k_ref, v_ref, o_ref, *, lk_true):
    o_ref[...] = _softmax_av(q_ref[...], k_ref[...], v_ref[...],
                             lk_true).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "lk_true"))
def attention_hgrid2(q, k, v, *, heads, lk_true=0):
    """Separate (B, Lp, H*Dp) q/k/v; per-head DMA at lane offset i*Dp."""
    b, lp, hd = q.shape
    dp = hd // heads
    g = 4
    spec = pl.BlockSpec((g, lp, dp), lambda ib, ih: (ib, 0, ih))
    return pl.pallas_call(
        functools.partial(_hgrid2_kernel, lk_true=lk_true),
        grid=(b // g, heads),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, lp, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(q, k, v)


# ------------------------------------------------------------- timing
def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # drain via scalar fetch (axon relay: block_until_ready alone does
    # not wait — see bench.py)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)) * 0)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="cur,hgrid,sect,hgrid2")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    rs = np.random.RandomState(0)
    qkv = jnp.asarray(rs.randn(B, LP, H * 3 * D) * 0.05, jnp.bfloat16)
    sect = jnp.asarray(rs.randn(B, LP, 3 * H * D) * 0.05, jnp.bfloat16)
    q = jnp.asarray(rs.randn(B, LP, H * D) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, LP, H * D) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, LP, H * D) * 0.05, jnp.bfloat16)

    # correctness cross-check on a small slice: all variants must agree
    # with the adopted kernel
    ref_small = None
    for name in args.variants.split(","):
        try:
            if name == "cur":
                fn = lambda: flash_self_attention_tmajor(  # noqa: E731
                    qkv, H, LK_TRUE, 1.0)
                fwd = lambda x: flash_self_attention_tmajor(  # noqa: E731
                    x, H, LK_TRUE, 1.0)
                grad_args = (qkv,)
            elif name == "hgrid":
                fn = lambda: attention_hgrid(  # noqa: E731
                    qkv, heads=H, lk_true=LK_TRUE)
                fwd = lambda x: attention_hgrid(  # noqa: E731
                    x, heads=H, lk_true=LK_TRUE)
                grad_args = (qkv,)
            elif name == "sect":
                fn = lambda: attention_sect(  # noqa: E731
                    sect, heads=H, lk_true=LK_TRUE)
                fwd = lambda x: attention_sect(  # noqa: E731
                    x, heads=H, lk_true=LK_TRUE)
                grad_args = (sect,)
            elif name == "hgrid2":
                fn = lambda: attention_hgrid2(  # noqa: E731
                    q, k, v, heads=H, lk_true=LK_TRUE)
                fwd = lambda a, b_, c: attention_hgrid2(  # noqa: E731
                    a, b_, c, heads=H, lk_true=LK_TRUE)
                grad_args = (q, k, v)
            else:
                continue

            out = fn()
            if name == "cur":
                ref_small = np.asarray(out[:2], np.float32)
            elif name in ("hgrid",) and ref_small is not None:
                np.testing.assert_allclose(np.asarray(out[:2], np.float32),
                                           ref_small, atol=2e-2)

            ms_fwd = timeit(lambda: fn(), iters=args.iters)
            rec = {"variant": name, "fwd_ms": round(ms_fwd, 3)}

            # fwd+bwd only where an AD rule exists (the adopted kernel's
            # custom_vjp); raw pallas_call variants are fwd-layout probes
            try:
                loss = jax.jit(lambda *a: jnp.sum(
                    fwd(*a).astype(jnp.float32) ** 2))
                gfn = jax.jit(jax.grad(loss, argnums=tuple(
                    range(len(grad_args)))))
                rec["fwd_bwd_ms"] = round(
                    timeit(lambda: gfn(*grad_args), iters=args.iters), 3)
            except Exception as e:  # noqa: BLE001
                rec["fwd_bwd"] = f"n/a: {type(e).__name__}"
            print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001 — each variant independent
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:400]}),
                  flush=True)


if __name__ == "__main__":
    main()
