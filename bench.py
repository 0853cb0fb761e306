#!/usr/bin/env python3
"""Benchmark: clips/sec/chip for MSR-VTT-style retrieval, inference + train.

Inference metric (primary, the BASELINE.json north star): the full
on-device path for one retrieval "clip" — uint8 frames -> device
resize/normalize -> EVA01-g/14 over 8 frames -> BEATs over 1 fbank clip
(fbank computed on device from the raw waveform) -> BERT text encode ->
contrastive features + fused condition features. Host-side video container
decode runs in the native FFmpeg runtime (runtime/vast_media.cpp) on CPU
threads concurrently with device compute and is benchmarked separately in
BENCH_NOTES.md.

Training metric (extra key): one full ret%tva optimizer step (ITC + ITM
losses, EVA-g+BEATs+BERT backward, AdamW with bf16 moments, per-block
remat) — the reference's primary workload (utils/pipeline.py:17-143).

Prints ONE JSON line. ``vs_baseline`` compares inference against an
estimated H100 reference throughput for the PyTorch release (see
H100_EST_CLIPS_PER_S; the reference repo publishes no numbers —
BASELINE.md). Physics note: one v5e peaks at ~197 bf16 TFLOP/s vs the
H100's ~990; per-chip parity with a 5x target is a multi-chip story
(see BENCH_NOTES.md "Context for vs_baseline").
"""

import json
import time

import numpy as np

# Estimated reference throughput: VAST PyTorch inference on one H100,
# fp16, 8-frame EVA01-g/14 (~283 GFLOPs/frame) + BEATs + BERT with CPU
# dataloader preprocessing. Computed as ~35% MFU on 990 TFLOP/s peak over
# One clip = 4.382 TFLOP forward (XLA cost_analysis of the jitted infer
# program: EVA-g over 8x257 tokens dominates at ~4.15; BEATs + BERT +
# fusion make up the rest).  Round 1 used "2.4 TFLOP/clip", which was a
# MAC/FLOP confusion (ViT-g/14 is ~260 GMAC = 520 GFLOP per image).
# H100 estimate: 35% MFU on 990 bf16 TFLOP/s => 346.5 / 4.382 = 79 clips/s.
TFLOP_PER_CLIP = 4.382
H100_EST_CLIPS_PER_S = 0.35 * 990.0 / TFLOP_PER_CLIP  # ~79.1

INFER_BATCH = 32  # throughput sweet spot measured in round 1
TRAIN_BATCH = 8   # fits the single v5e with remat + bf16 Adam moments


def fast_params(model, batch, **apply_kw):
    """Random params without compiling the giant init program: eval_shape
    the init, then fill every leaf with N(0, 0.02) in one cheap jit."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda r: model.init({"params": r}, batch, **apply_kw),
        jax.random.PRNGKey(0))["params"]

    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make(rng):
        keys = jax.random.split(rng, len(leaves))
        return [jax.random.normal(k, l.shape, l.dtype) * 0.02
                if jnp.issubdtype(l.dtype, jnp.floating)
                else jnp.zeros(l.shape, l.dtype)
                for k, l in zip(keys, leaves)]

    return jax.tree_util.tree_unflatten(treedef, make(jax.random.PRNGKey(0)))


def make_data(rs, batch, frames=8):
    import jax.numpy as jnp

    return {
        "vision_frames": jnp.asarray(
            rs.randint(0, 255, (batch, frames, 257, 257, 3), np.uint8)),
        "audio_waveforms": jnp.asarray(
            (rs.randn(batch, 1024 * 160 + 400) * 2 ** 15).astype(np.float32)),
        "caption_tokens": jnp.asarray(
            rs.randint(1000, 20000, (batch, 40)).astype(np.int32)),
        "caption_attention_mask": jnp.ones((batch, 40), jnp.int32),
    }


def bench_inference(model, rs):
    import jax
    import jax.numpy as jnp

    data = make_data(rs, INFER_BATCH)
    params = fast_params(model, data, task="ret%tva", compute_loss=False,
                         deterministic=True)

    @jax.jit
    def infer(params, batch):
        out = model.apply({"params": params}, batch, "ret%tva",
                          compute_loss=False, deterministic=True)
        # scalar checksum: forces full materialization when fetched (over
        # the axon relay, block_until_ready alone does NOT wait — only a
        # host transfer drains the device stream)
        return (jnp.sum(out["feat_t"].astype(jnp.float32))
                + jnp.sum(out["feat_cond_tva"].astype(jnp.float32))
                + jnp.sum(out["condition_feats_tva"].astype(jnp.float32)))

    float(infer(params, data))  # warmup/compile + drain

    # fetch round-trip latency to subtract (measured on a drained stream)
    zero = jax.jit(lambda: jnp.zeros(()))()
    t0 = time.perf_counter()
    float(zero)
    rtt = time.perf_counter() - t0

    iters = 16
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = infer(params, data)
    float(out)  # drains the in-order device stream -> all iters done
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    return INFER_BATCH * iters / dt


def bench_train(model, rs):
    import jax

    from vast_tpu.config import EasyDict
    from vast_tpu.training.optimizer import build_optimizer
    from vast_tpu.training.step import create_train_state, make_train_step

    data = make_data(rs, TRAIN_BATCH)
    init_batch = {k: v[:1] for k, v in data.items()}
    params = fast_params(
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
    rng = jax.random.PRNGKey(0)

    state, metrics = step(state, dict(data), rng)  # compile + step 1
    float(metrics["total_loss"])  # drain

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dict(data), rng)
    float(metrics["total_loss"])  # drains the in-order stream
    dt = time.perf_counter() - t0
    return TRAIN_BATCH * iters / dt


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the flagship train program takes ~20 min
    # to compile over the axon tunnel; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from vast_tpu.models.vast import VASTConfig, VASTModel

    rs = np.random.RandomState(0)
    n_chips = max(jax.device_count(), 1)

    infer_model = VASTModel(VASTConfig(max_vision_sample_num=8,
                                       max_audio_sample_num=1,
                                       dtype=jnp.bfloat16))
    infer_clips = bench_inference(infer_model, rs) / n_chips

    train_model = VASTModel(VASTConfig(max_vision_sample_num=8,
                                       max_audio_sample_num=1,
                                       dtype=jnp.bfloat16,
                                       checkpointing=True))
    try:
        train_clips = round(bench_train(train_model, rs) / n_chips, 2)
    except Exception as e:  # train bench must not sink the primary metric
        train_clips = f"failed: {type(e).__name__}"

    print(json.dumps({
        "metric": "msrvtt_retrieval_inference_clips_per_sec_per_chip",
        "value": round(infer_clips, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(infer_clips / H100_EST_CLIPS_PER_S, 3),
        "train_clips_per_sec_per_chip": train_clips,
        "train_batch_per_chip": TRAIN_BATCH,
    }))


if __name__ == "__main__":
    main()
