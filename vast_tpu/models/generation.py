"""Fixed-shape masked-AR generation (greedy / top-k sampling / beam).

The reference decodes by appending a [MASK] token each step and predicting
it through HF ``generate`` (bert.py:1027-1044, model/vast.py:529-547),
re-running the whole prefix per step with dynamic shapes. Here the decode
loop is a ``lax.scan`` over a KV cache: each step feeds the 2-token
[fixup, MASK] window (see models/bert.py), so shapes are static, XLA
compiles one step, and each step is O(L) instead of O(L^2).

Beam search follows the HF semantics the reference relies on:
``num_beams`` = beam_size (3), ``length_penalty`` 0.6 for captions / 1.0
for QA, finished-hypothesis score = sum_logprobs / len**length_penalty.

QA prompts (question + BOS) reproduce ``update_attention_mask``
(bert.py:1011-1018): question rows attend bidirectionally over valid
question tokens only (BOS visible just to itself); BOS and generated
tokens additionally see BOS and everything generated so far.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from vast_tpu.models.bert import init_cache

NEG_INF = -1.0e7


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 40
    num_beams: int = 1
    do_sample: bool = False
    top_k: int = 10
    length_penalty: float = 0.6
    bos_id: int = 101
    eos_id: int = 102
    pad_id: int = 0
    mask_id: int = 103


def _prefill_mask(prompt_mask):
    """(B, P) valid mask -> (B, P, P): bidirectional over valid prompt
    positions; the final slot (BOS) is visible only to itself."""
    b, p = prompt_mask.shape
    m = jnp.broadcast_to(prompt_mask[:, None, :], (b, p, p))
    if p > 1:
        col_is_bos = jnp.arange(p)[None, :] == p - 1
        row_is_bos = jnp.arange(p)[:, None] == p - 1
        m = jnp.where(col_is_bos[None] & ~row_is_bos[None], 0, m)
        m = jnp.where((col_is_bos & row_is_bos)[None], 1, m)
    return m


def generate(model, params, cond_feats, cfg: GenerationConfig,
             prompt_ids=None, prompt_mask=None, rng=None):
    """Returns generated ids (B, max_new_tokens), pad-filled after EOS.

    cond_feats: (B, Lc, D) fusion condition features.
    prompt_ids/prompt_mask: (B, P); default prompt is a single BOS.

    The whole decode (prefill + scan) is jitted per (model, cfg, shapes);
    repeated eval batches reuse the compiled program.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if prompt_ids is None:
        b = cond_feats.shape[0]
        prompt_ids = jnp.full((b, 1), cfg.bos_id, jnp.int32)
        prompt_mask = jnp.ones((b, 1), jnp.int32)
    return _generate_jit(model, cfg, params, cond_feats, prompt_ids,
                         prompt_mask, rng)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _generate_jit(model, cfg, params, cond_feats, prompt_ids, prompt_mask,
                  rng):
    return _generate_impl(model, params, cond_feats, cfg, prompt_ids,
                          prompt_mask, rng)


def _generate_impl(model, params, cond_feats, cfg: GenerationConfig,
                   prompt_ids=None, prompt_mask=None, rng=None):
    b = cond_feats.shape[0]
    if prompt_ids is None:
        prompt_ids = jnp.full((b, 1), cfg.bos_id, jnp.int32)
        prompt_mask = jnp.ones((b, 1), jnp.int32)
    p = prompt_ids.shape[1]
    total = p + cfg.max_new_tokens + 1
    bert_cfg = model.cfg.resolved_bert_cfg()

    bert = functools.partial(
        model.apply, {"params": params},
        method=lambda m, *a, **kw: m.multimodal_encoder(*a, **kw))

    cross_kv = model.apply(
        {"params": params}, cond_feats,
        method=lambda m, x: m.multimodal_encoder.precompute_cross_kv(x))

    # prefill: write prompt K/V with the bidirectional prompt mask
    cache = init_cache(bert_cfg, b, total, dtype=jnp.float32)
    m3 = jnp.pad(_prefill_mask(prompt_mask), [(0, 0), (0, 0), (0, total - p)])
    _, cache = bert(prompt_ids, cache=cache, cache_index=0,
                    cross_kv=cross_kv, decode_self_mask=m3)

    # decode-time cache mask: valid prompt (BOS slot forced visible) + all
    # generated slots (the per-step qpos constraint handles causality).
    dec_cache_mask = jnp.concatenate(
        [prompt_mask.at[:, p - 1].set(1),
         jnp.ones((b, total - p), jnp.int32)], axis=1)

    last_tok = prompt_ids[:, -1].astype(jnp.int32)
    if cfg.num_beams > 1:
        return _beam_search(bert, cache, cross_kv, dec_cache_mask, last_tok,
                            p, cfg, b)
    return _greedy_or_sample(bert, cache, cross_kv, dec_cache_mask, last_tok,
                             p, cfg, rng, b)


def _bert_step(bert, tokens2, index, cache, cache_mask, cross_kv):
    logits, cache = bert(tokens2, cache=cache, cache_index=index,
                         cache_mask=cache_mask, cross_kv=cross_kv)
    return logits[:, -1], cache


def _greedy_or_sample(bert, cache, cross_kv, cache_mask, last_tok, p, cfg,
                      rng, b):
    def step(carry, i):
        cache, prev_tok, finished, key = carry
        tokens2 = jnp.stack(
            [prev_tok, jnp.full((b,), cfg.mask_id, jnp.int32)], axis=1)
        logits, cache = _bert_step(bert, tokens2, p - 1 + i, cache,
                                   cache_mask, cross_kv)
        if cfg.do_sample:
            key, sub = jax.random.split(key)
            topv, topi = jax.lax.top_k(logits, cfg.top_k)
            choice = jax.random.categorical(sub, topv)
            nxt = jnp.take_along_axis(topi, choice[:, None], axis=1)[:, 0]
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, cfg.pad_id, nxt).astype(jnp.int32)
        finished = finished | (nxt == cfg.eos_id)
        return (cache, nxt, finished, key), nxt

    key = rng if rng is not None else jax.random.PRNGKey(0)
    init = (cache, last_tok, jnp.zeros((b,), bool), key)
    _, toks = jax.lax.scan(step, init, jnp.arange(cfg.max_new_tokens))
    return jnp.swapaxes(toks, 0, 1)  # (B, T)


def _beam_search(bert, cache, cross_kv, cache_mask, last_tok, p, cfg, b):
    k = cfg.num_beams

    def tile(x):
        return jnp.repeat(x, k, axis=0)  # (B,...) -> (B*k,...) beam-minor

    cache = jax.tree.map(tile, cache)
    cross_kv = jax.tree.map(tile, cross_kv)
    cache_mask = tile(cache_mask)

    scores = jnp.tile(jnp.asarray([[0.0] + [NEG_INF] * (k - 1)],
                                  jnp.float32), (b, 1))
    tokens = jnp.full((b, k, cfg.max_new_tokens), cfg.pad_id, jnp.int32)
    finished = jnp.zeros((b, k), bool)
    prev_tok = jnp.repeat(last_tok[:, None], k, axis=1)
    lengths = jnp.zeros((b, k), jnp.int32)

    def step(carry, i):
        cache, prev_tok, scores, tokens, finished, lengths = carry
        tok2 = jnp.stack(
            [prev_tok.reshape(-1),
             jnp.full((b * k,), cfg.mask_id, jnp.int32)], axis=1)
        logits, cache = _bert_step(bert, tok2, p - 1 + i, cache, cache_mask,
                                   cross_kv)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        vocab = logp.shape[-1]
        logp = logp.reshape(b, k, vocab)
        # finished beams extend only with pad, at zero cost
        pad_only = jnp.full((vocab,), NEG_INF).at[cfg.pad_id].set(0.0)
        logp = jnp.where(finished[:, :, None], pad_only[None, None], logp)

        cand = (scores[:, :, None] + logp).reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, k)
        beam_idx = top_idx // vocab
        tok_idx = (top_idx % vocab).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        tokens = tokens.at[:, :, i].set(tok_idx)
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        lengths = jnp.take_along_axis(lengths, beam_idx, axis=1)
        lengths = jnp.where(finished, lengths, lengths + 1)
        finished = finished | (tok_idx == cfg.eos_id)
        scores = top_scores

        flat_idx = (jnp.arange(b)[:, None] * k + beam_idx).reshape(-1)
        cache = jax.tree.map(lambda x: x[flat_idx], cache)
        return (cache, tok_idx, scores, tokens, finished, lengths), None

    init = (cache, prev_tok, scores, tokens, finished, lengths)
    (cache, prev_tok, scores, tokens, finished, lengths), _ = jax.lax.scan(
        step, init, jnp.arange(cfg.max_new_tokens))

    # HF-style length penalty at finalization
    lp = jnp.maximum(lengths, 1).astype(jnp.float32) ** cfg.length_penalty
    best = jnp.argmax(scores / lp, axis=1)
    return jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
