#!/usr/bin/env python3
"""Profile the bench.py e2e decode+encode pipeline component-by-component.

Round-5 verdict item 1: e2e 21.2 clips/s vs decode-pool 33.6 and
device-only 32.3 in the same run. Hypothesis: on a 1-core host the
pipeline cannot overlap — decode CPU + consumer-side host->device
transfer CPU serialize on the single core, so
    e2e = batch / (decode_cpu_per_batch + consumer_cpu_per_batch).
This script measures each term on a drained stream and prints the
prediction next to the measured e2e rate.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def timed(fn, *a, reps=4, **kw):
    fn(*a, **kw)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **kw)
    return (time.perf_counter() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from vast_tpu.models.vast import VASTConfig, VASTModel

    rs = np.random.RandomState(0)
    model = VASTModel(VASTConfig(max_vision_sample_num=8,
                                 max_audio_sample_num=1,
                                 dtype=jnp.bfloat16))
    infer_rate, infer, params = bench.bench_inference(model, rs)
    print(f"device-only: {infer_rate:.1f} clips/s", flush=True)

    media = bench._make_media_fixtures()
    assert not isinstance(media, str), media
    vids, auds = media
    n_cores = os.cpu_count() or 1

    # 1. decode CPU per batch (standalone, like bench_decode_standalone).
    # yuv=True + int16 audio: profile the SAME wire format bench_e2e
    # runs, or the serial-CPU prediction below is apples-to-oranges
    # (RGB decodes ~1.2x slower and ships 2x the frame bytes)
    def decode_wire():
        f, w = bench._decode_batch(vids[:bench.INFER_BATCH],
                                   auds[:bench.INFER_BATCH], n_cores,
                                   yuv=True)
        return f, np.clip(w, -32768, 32767).astype(np.int16)

    dt_decode, (frames, wavs) = timed(decode_wire, reps=3)
    print(f"decode per batch: {dt_decode*1e3:.0f} ms "
          f"({bench.INFER_BATCH/dt_decode:.1f} clips/s)", flush=True)
    print(f"frames: {frames.shape} {frames.dtype} "
          f"{frames.nbytes/1e6:.1f} MB; wavs: {wavs.shape} {wavs.dtype} "
          f"{wavs.nbytes/1e6:.1f} MB", flush=True)

    # 2. host->device transfer cost on a drained stream
    def xfer(x):
        return jax.device_put(x).block_until_ready()

    dt_f, _ = timed(xfer, frames)
    dt_w, _ = timed(xfer, wavs)
    print(f"transfer frames: {dt_f*1e3:.0f} ms "
          f"({frames.nbytes/1e6/dt_f:.0f} MB/s)", flush=True)
    print(f"transfer wavs:   {dt_w*1e3:.0f} ms "
          f"({wavs.nbytes/1e6/dt_w:.0f} MB/s)", flush=True)

    # 2b. does a big raw transfer hit better bandwidth? (fixed-cost probe)
    big = np.zeros(256 * 1024 * 1024, np.uint8)
    dt_big, _ = timed(xfer, big, reps=2)
    print(f"transfer 256MB zeros: {dt_big*1e3:.0f} ms "
          f"({big.nbytes/1e6/dt_big:.0f} MB/s)", flush=True)

    # 3. consumer step cost: asarray + dispatch, on a drained stream
    caption = {
        "caption_tokens": jnp.asarray(
            rs.randint(1000, 20000, (bench.INFER_BATCH, 40)).astype(np.int32)),
        "caption_attention_mask": jnp.ones((bench.INFER_BATCH, 40), jnp.int32),
    }

    dequant = bench._dequant_jit()

    def consumer_step():
        out = infer(params, dict(
            caption,
            vision_frames_yuv=jnp.asarray(frames),
            audio_waveforms=dequant(jnp.asarray(wavs))))
        return out

    # dispatch-only (async): don't drain
    t0 = time.perf_counter()
    out = consumer_step()
    dt_dispatch = time.perf_counter() - t0
    float(out)
    dt_consumer, out = timed(lambda: float(consumer_step()), reps=3)
    print(f"consumer dispatch (async): {dt_dispatch*1e3:.0f} ms", flush=True)
    print(f"consumer step (drained):   {dt_consumer*1e3:.0f} ms", flush=True)

    # 4. the pipeline itself, as bench.py runs it
    e2e = bench.bench_e2e(infer, params, rs, vids, auds, n_cores)
    pred = bench.INFER_BATCH / (dt_decode + dt_dispatch)
    print(json.dumps({
        "decode_ms_per_batch": round(dt_decode * 1e3),
        "transfer_frames_ms": round(dt_f * 1e3),
        "transfer_wavs_ms": round(dt_w * 1e3),
        "bandwidth_MBps_big": round(big.nbytes / 1e6 / dt_big),
        "dispatch_ms": round(dt_dispatch * 1e3),
        "e2e_measured_clips_s": round(e2e, 2),
        "e2e_predicted_serial_cpu": round(pred, 2),
        "device_only_clips_s": round(infer_rate, 1),
    }))


if __name__ == "__main__":
    main()
