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
  sect  — section-major fused layout [Q(1408)|K(1408)|V(1408)] (each
          section 11x128-aligned): per-head slices i*88 rotate within a
          1408-wide group; section cuts themselves are free
  dma   — per-head grid with the input left in HBM (memory_space=ANY):
          the kernel manually `make_async_copy`s ONE head's (Lp, 3*88)
          strip per grid step, so the misalignment is handled by the
          HBM->VMEM DMA engine instead of in-register lane rotations
  pad128— round-2 padded layout (Dp=128, zero lanes): the kernel-speed
          reference point; its projections carry +45% FLOPs (measured
          separately in the chain bench, BENCH_NOTES)

NOTE (attempted, rejected by the Mosaic lowering): a per-head BlockSpec
grid over either the fused (block last dim 264) or section-major
(block last dim 88) layout fails to lower — "the last two dimensions
of your block shape" must be (8,128)-divisible or equal to the array
dims, and a per-head strip is neither. The `dma` variant is the same
idea expressed through the manual-copy API instead of BlockSpec.

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


# ------------------------------------------------------------------ dma
@functools.partial(jax.jit, static_argnames=("heads", "lk_true", "interpret"))
def attention_dma(qkv, *, heads, lk_true=0, interpret=False):
    """Input stays in HBM; each grid step DMAs one head's strip. The
    output head strips (Lp, 88) still can't be BlockSpec'd per head, so
    the output block spans ALL heads (full last dim) and each step
    writes its own strip — in-register rotation on the WRITE only."""
    b, lp, total = qkv.shape
    dp = (total // 3) // heads
    g = 4

    def _kern(qkv_hbm, o_ref, scr, sem):
        ih = pl.program_id(1)
        ib = pl.program_id(0)
        cp = pltpu.make_async_copy(
            qkv_hbm.at[pl.ds(ib * g, g), :, pl.ds(ih * 3 * dp, 3 * dp)],
            scr, sem)
        cp.start()
        cp.wait()
        blk = scr[...]
        q = blk[..., :dp]
        k = blk[..., dp:2 * dp]
        v = blk[..., 2 * dp:3 * dp]
        o_ref[..., pl.ds(ih * dp, dp)] = _softmax_av(
            q, k, v, lk_true).astype(o_ref.dtype)

    return pl.pallas_call(
        _kern,
        grid=(b // g, heads),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((g, lp, heads * dp),
                               lambda ib, ih: (ib, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lp, heads * dp), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((g, lp, 3 * dp), qkv.dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
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


@functools.partial(jax.jit, static_argnames=("heads", "lk_true", "interpret"))
def attention_sect(qkv, *, heads, lk_true=0, interpret=False):
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
        interpret=interpret,
    )(qkv)


# --------------------------------------------------------------- pad128
def attention_pad128(qkv128, *, heads, lk_true=0):
    """Round-2 padded layout: Dp=128 so every per-head slice is
    lane-aligned (no rotations, 45% zero lanes). Kernel-speed reference
    point — the adopted kernel path handles this via head_packing."""
    return flash_self_attention_tmajor(qkv128, heads, lk_true, 1.0)


# ------------------------------------------------------------- timing
def _drain(out):
    # over the axon relay, block_until_ready does NOT wait — only a host
    # scalar fetch drains the device stream (see bench.py)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)) * 0)


def timeit(fn, *args, iters=20):
    _drain(fn(*args))  # warmup: compile + step 1 fully retired
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="cur,sect,dma,pad128")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode functional check only")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    rs = np.random.RandomState(0)
    host = (rs.randn(B, LP, H * 3 * D) * 0.05).astype(jnp.bfloat16)
    qkv = jnp.asarray(host)
    # section-major permutation of the SAME data: [q0..qH | k0..kH | v..]
    h4 = host.reshape(B, LP, H, 3, D)
    sect = jnp.asarray(np.ascontiguousarray(
        h4.transpose(0, 1, 3, 2, 4)).reshape(B, LP, 3 * H * D))
    # padded-128 layout of the same data (each 88 section -> 128 lanes)
    pad = np.zeros((B, LP, H, 3, 128), host.dtype)
    pad[..., :D] = h4
    qkv128 = jnp.asarray(pad.reshape(B, LP, H * 3 * 128))
    del host, h4, pad

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
            elif name == "sect":
                fn = lambda: attention_sect(  # noqa: E731
                    sect, heads=H, lk_true=LK_TRUE)
                fwd = lambda x: attention_sect(  # noqa: E731
                    x, heads=H, lk_true=LK_TRUE)
                grad_args = (sect,)
            elif name == "dma":
                fn = lambda: attention_dma(  # noqa: E731
                    qkv, heads=H, lk_true=LK_TRUE, interpret=args.interpret)
                fwd = lambda x: attention_dma(  # noqa: E731
                    x, heads=H, lk_true=LK_TRUE, interpret=args.interpret)
                grad_args = (qkv,)
            elif name == "pad128":
                fn = lambda: attention_pad128(  # noqa: E731
                    qkv128, heads=H, lk_true=LK_TRUE)
                fwd = lambda x: attention_pad128(  # noqa: E731
                    x, heads=H, lk_true=LK_TRUE)
                grad_args = (qkv128,)
            else:
                continue

            out = fn()
            if name == "cur":
                ref_small = np.asarray(out[:2], np.float32)
            elif ref_small is not None:
                small = np.asarray(out[:2], np.float32)
                if name == "pad128":
                    small = small.reshape(2, LP, H, 128)[..., :D] \
                        .reshape(2, LP, H * D)
                np.testing.assert_allclose(small, ref_small, atol=2e-2)

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
