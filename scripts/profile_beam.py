#!/usr/bin/env python3
"""Bisect where beam-3 decode time goes on the real chip (r5 verdict #6).

Variants timed (all on the flagship bf16 model, 40 max tokens, no EOS so
every variant runs the full loop):
  greedy_b32          — baseline rows=32
  greedy_b96          — rows=96 == beam-3's row count, NO beam bookkeeping
                        (isolates: beam cost == row cost + bookkeeping)
  beam3_b32           — the real thing
  beam3_b32_short_Lc  — condition stream cut 9x (isolates cross-KV reads)
  greedy_b32_short_Lc — same cut for greedy
  beam3_b32_t20       — half the steps (fixed overhead vs per-step cost)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import fast_params, make_data  # noqa: E402

COND_TOKENS = 8 * 257 + 248


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from vast_tpu.models.bert import BertConfig
    from vast_tpu.models.generation import GenerationConfig, generate
    from vast_tpu.models.vast import VASTConfig, VASTModel

    rs = np.random.RandomState(0)
    model = VASTModel(VASTConfig(max_vision_sample_num=8,
                                 max_audio_sample_num=1,
                                 dtype=jnp.bfloat16))
    data = make_data(rs, 2)
    params = fast_params(model, data, task="ret%tva_cap%tva",
                         compute_loss=True, deterministic=True,
                         step_rngs={"mask": jax.random.PRNGKey(1),
                                    "negatives": jax.random.PRNGKey(2)})
    d = (model.cfg.bert_cfg or BertConfig()).hidden_size

    def run(name, batch, beams, lc, tmax):
        cond = jnp.asarray(rs.randn(batch, lc, d), jnp.float32)
        cfg = GenerationConfig(max_new_tokens=tmax, num_beams=beams,
                               length_penalty=0.6)
        np.asarray(generate(model, params, cond, cfg))  # compile
        iters = 4
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = generate(model, params, cond, cfg)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.0f} ms/batch = "
              f"{batch/dt:.1f} captions/s", flush=True)
        return dt

    run("greedy_b32           ", 32, 1, COND_TOKENS, 40)
    run("greedy_b96           ", 96, 1, COND_TOKENS, 40)
    run("beam3_b32            ", 32, 3, COND_TOKENS, 40)
    run("beam3_b32_t20        ", 32, 3, COND_TOKENS, 20)
    run("greedy_b32_short_Lc  ", 32, 1, 248, 40)
    run("beam3_b32_short_Lc   ", 32, 3, 248, 40)


if __name__ == "__main__":
    main()
