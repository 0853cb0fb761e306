#!/usr/bin/env python3
"""Evaluation-path throughput at flagship shapes (one chip).

The reference's retrieval eval spends its time in two loops this repo
redesigned (SURVEY §7.3 #6 flagged the first as a potential 100x
slowdown if ported naively):

  * ITM rerank — reference: per-COLUMN Python loop, micro-batches of 25
    through the fusion encoder (evaluation_mm.py:253-319); here: pairs
    grouped BY CANDIDATE, the candidate's cross-attention K/V projected
    once per segment and its texts folded onto the shared K/V
    (evaluation/evaluation_mm.py rerank_scores).
  * caption/QA generation — reference: HF ``generate`` re-running the
    growing prefix per step with dynamic shapes (bert.py:1027-1044);
    here: a fixed-shape early-exiting ``lax.while_loop`` over a
    two-token decode window with a KV cache + beam-shared precomputed
    cross-attention K/V (models/generation.py).

Prints one JSON line: rerank pairs/s/chip for the old per-pair path and
the grouped path, the derived MSR-VTT-1k full-rerank seconds (1000
texts x top-50, both directions, assuming ~top_k texts per candidate —
a skewed ITC distribution adds segment padding beyond this estimate),
beam-3 and greedy captions/s/chip (no-EOS worst case: random params
never finish early). Not part of the driver bench contract — run
manually; numbers recorded in BENCH_NOTES.md.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import fast_params, make_data  # noqa: E402

N_TEXT = 1000          # MSR-VTT test split
TOP_K = 50             # itm_rerank_num default
COND_TOKENS = 8 * 257 + 248  # tva condition stream at 8 frames + 1 clip


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from vast_tpu.evaluation.evaluation_mm import _slice_scores
    from vast_tpu.models.generation import GenerationConfig, generate
    from vast_tpu.models.vast import VASTConfig, VASTModel

    rs = np.random.RandomState(0)
    model = VASTModel(VASTConfig(max_vision_sample_num=8,
                                 max_audio_sample_num=1,
                                 dtype=jnp.bfloat16))
    data = make_data(rs, 2)
    # loss-mode ret+cap init so the param tree includes the fusion
    # encoder's cross-attention, the ITM head, and the MLM decode head
    # (compute_loss=False ret skips all three)
    params = fast_params(model, data, task="ret%tva_cap%tva",
                         compute_loss=True, deterministic=True,
                         step_rngs={"mask": jax.random.PRNGKey(1),
                                    "negatives": jax.random.PRNGKey(2)})
    from vast_tpu.models.bert import BertConfig
    d = (model.cfg.bert_cfg or BertConfig()).hidden_size

    def bench_rerank_pairwise(chunk):
        """The pre-grouping path: K/V projected per (text, cand) pair."""
        cond = jnp.asarray(rs.randn(chunk, COND_TOKENS, d), jnp.float32)
        ids = jnp.asarray(rs.randint(1000, 20000, (chunk, 40)), jnp.int32)
        mask = jnp.ones((chunk, 40), jnp.int32)
        fn = jax.jit(functools.partial(_slice_scores, model))
        np.asarray(fn(params, cond, ids, mask))  # compile
        iters = 8
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(params, cond, ids, mask)
        np.asarray(out)  # drain
        return chunk * iters / (time.perf_counter() - t0)

    def bench_rerank_grouped(g, t):
        """The shipping path: K/V once per candidate, texts folded onto
        the shared K/V, candidate rows gathered on device from the
        device-resident condition matrix (rerank_scores)."""
        from vast_tpu.evaluation.evaluation_mm import _grouped_scores
        cond_all = jnp.asarray(rs.randn(2 * g, COND_TOKENS, d), jnp.float32)
        cands = np.arange(g, dtype=np.int32)
        ids = jnp.asarray(rs.randint(1000, 20000, (g * t, 40)), jnp.int32)
        mask = jnp.ones((g * t, 40), jnp.int32)
        fn = jax.jit(functools.partial(_grouped_scores, model))
        np.asarray(fn(params, cond_all, cands, ids, mask))  # compile
        iters = 8
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(params, cond_all, cands, ids, mask)
        np.asarray(out)
        return g * t * iters / (time.perf_counter() - t0)

    results = {}
    results["rerank_pairs_per_sec_pairwise_chunk64"] = round(
        bench_rerank_pairwise(64), 1)
    best_cfg, best = None, 0.0
    for g, t in ((8, 16), (4, 32), (2, 64)):
        rate = bench_rerank_grouped(g, t)
        results[f"rerank_pairs_per_sec_grouped_g{g}t{t}"] = round(rate, 1)
        if rate > best:
            best_cfg, best = (g, t), rate
    # full MSR-VTT rerank, both directions: every candidate owns ~TOP_K
    # texts, padded up to segment multiples of t
    g, t = best_cfg
    slots = 2 * N_TEXT * -(-TOP_K // t) * t
    results["msrvtt1k_full_rerank_seconds"] = round(slots / best, 1)

    def bench_generate(num_beams, batch):
        cond = jnp.asarray(rs.randn(batch, COND_TOKENS, d), jnp.float32)
        cfg = GenerationConfig(max_new_tokens=40, num_beams=num_beams,
                               length_penalty=0.6)
        np.asarray(generate(model, params, cond, cfg))  # compile
        iters = 4
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = generate(model, params, cond, cfg)
        np.asarray(out)
        return batch * iters / (time.perf_counter() - t0)

    results["greedy_captions_per_sec_b32"] = round(bench_generate(1, 32), 2)
    results["beam3_captions_per_sec_b32"] = round(bench_generate(3, 32), 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
