#!/usr/bin/env python3
"""Train-throughput sweep: batch x remat policy, on the real chip.

Round-3 verdict #3: sweep batch {8,12,16} x remat {attn, attn_offload,
dots_offload}, and measure the useful-FLOP (recompute-exclusive) cost of
the train step so bench.py can report BOTH MFU numbers honestly.

Useful FLOPs come from XLA cost_analysis of the train program compiled
WITHOUT remat (checkpointing=False) — AOT compile only, never executed
(execution would OOM one v5e at flagship batch; compilation doesn't
allocate HBM). Recompute-inclusive FLOPs come from the same analysis of
the remat'd program actually benchmarked.

Usage: python scripts/bench_train_sweep.py [--configs b,policy;b,policy...]
Prints one JSON line per config plus a final summary line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def build_step(batch_size, policy):
    from vast_tpu.config import EasyDict
    from vast_tpu.models.vast import VASTConfig, VASTModel
    from vast_tpu.training.optimizer import build_optimizer
    from vast_tpu.training.step import create_train_state, make_train_step

    rs = np.random.RandomState(0)
    model = VASTModel(VASTConfig(
        max_vision_sample_num=8, max_audio_sample_num=1,
        dtype=jnp.bfloat16, checkpointing=policy != "none",
        remat_policy=policy if policy != "none" else "attn"))
    data = bench.make_data(rs, batch_size)
    init_batch = {k: v[:1] for k, v in data.items()}
    params = bench.fast_params(
        model, init_batch, task="ret%tva", compute_loss=True,
        deterministic=True,
        step_rngs={"mask": jax.random.PRNGKey(1),
                   "negatives": jax.random.PRNGKey(2)})
    run_cfg = EasyDict({"learning_rate": 1e-4, "clip_lr": 5e-7,
                        "adam_mu_dtype": "bfloat16",
                        "adam_nu_dtype": "bfloat16", "seed": 0})
    tx, _ = build_optimizer(params, run_cfg,
                            {"vision_encoder_type": "evaclip01_giant"}, 1000)
    state = create_train_state(params, tx)
    del params
    step = make_train_step(model, tx, "ret%tva")
    return step, state, data


def measure(batch_size, policy, iters=8):
    step, state, data = build_step(batch_size, policy)
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, metrics = step(state, dict(data), rng)
    float(metrics["total_loss"])  # drain: compile + step 1
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dict(data), rng)
    float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    del state, step, data
    jax.clear_caches()
    return batch_size * iters / dt, compile_s


def cost_analysis_flops(batch_size, policy):
    """TFLOPs per clip of the train step via XLA cost analysis —
    AOT lower+compile only (never executed)."""
    step, state, data = build_step(batch_size, policy)
    # make_train_step returns the raw jitted fn when mesh is None
    lowered = step.lower(state, dict(data), jax.random.PRNGKey(0))
    try:
        cost = lowered.compile().cost_analysis()
        src = "compiled"
    except Exception:
        # the no-remat flagship graph crashes the remote compile helper
        # (HTTP 500, observed r4); unoptimized-HLO analysis is ~2-3% high
        # on these matmul-dominated graphs but never needs the compiler
        cost = lowered.cost_analysis()
        src = "lowered"
    if isinstance(cost, list):
        cost = cost[0]
    del step, state, data
    jax.clear_caches()
    return float(cost["flops"]) / 1e12 / batch_size, src


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="8,attn;8,attn_offload;"
                    "12,attn_offload;16,attn_offload;12,dots_offload")
    ap.add_argument("--flops", action="store_true",
                    help="also cost-analyze useful (no-remat) FLOPs")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    results = {}
    if args.flops:
        for policy in ("none", "attn"):
            try:
                tf, src = cost_analysis_flops(8, policy)
                print(json.dumps({"cost_analysis": policy, "source": src,
                                  "tflop_per_clip": round(tf, 3)}),
                      flush=True)
                results[f"tflop_{policy}"] = round(tf, 3)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"cost_analysis": policy,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)

    for spec in args.configs.split(";"):
        if not spec:
            continue
        b, policy = spec.split(",")
        b = int(b)
        try:
            rate, compile_s = measure(b, policy, args.iters)
            out = {"batch": b, "policy": policy,
                   "clips_per_s": round(rate, 3),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001
            out = {"batch": b, "policy": policy,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        results[f"{b},{policy}"] = out
        print(json.dumps(out), flush=True)

    print(json.dumps({"sweep": results}), flush=True)


if __name__ == "__main__":
    main()
