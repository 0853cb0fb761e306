"""Fixed-shape masked-AR generation (greedy / top-k sampling / beam).

The reference decodes by appending a [MASK] token each step and predicting
it through HF ``generate`` (bert.py:1027-1044, model/vast.py:529-547),
re-running the whole prefix per step with dynamic shapes. Here the decode
loop is a fixed-shape ``lax.while_loop`` (exiting early once every row is
finished, like HF's stopping rule) over a KV cache: each step feeds the 2-token
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

    # prefill: write prompt K/V with the bidirectional prompt mask.
    # Cache dtype follows the model dtype: on the bf16 flagship this
    # halves the decode's self-KV read/write AND the beam reorder gather
    # (the beam loop's dominant HBM traffic); tiny fp32 test models keep
    # fp32 so decode parity vs HF stays exact.
    cache = init_cache(bert_cfg, b, total, dtype=model.cfg.dtype)
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
    t_max = cfg.max_new_tokens

    def cond(carry):
        i, _, _, finished, _, _ = carry
        # early exit once every row hit EOS (HF generate's stopping rule;
        # real captions average ~12 of max 40 tokens, so this cuts the
        # decode's dominant cost — the per-step cross-KV read — ~2-3x)
        return (i < t_max) & ~jnp.all(finished)

    def step(carry):
        i, cache, prev_tok, finished, key, toks = carry
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
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i))
        return (i + 1, cache, nxt, finished, key, toks)

    key = rng if rng is not None else jax.random.PRNGKey(0)
    init = (jnp.asarray(0), cache, last_tok, jnp.zeros((b,), bool), key,
            jnp.full((b, t_max), cfg.pad_id, jnp.int32))
    out = jax.lax.while_loop(cond, step, init)
    return out[5]  # (B, T)


def _beam_search(bert, cache, cross_kv, cache_mask, last_tok, p, cfg, b):
    """HF-semantics beam search (what the reference's ``generate`` runs —
    transformers BeamSearchScorer, early_stopping=False):

    * per step the top ``2k`` of the k*vocab candidates are ranked; EOS
      candidates with rank < k move to a finished-hypothesis pool (score
      ``sum_logprobs / cur_len**length_penalty`` with cur_len = prompt +
      generated, the HF convention) and do NOT occupy live slots — the k
      live beams are the k best non-EOS candidates;
    * the pool keeps the best k finished hypotheses (replace-worst);
    * a batch is done when its pool is full and the worst pooled score
      beats the best still-possible candidate score; its state freezes;
    * finalize: for batches never done, live beams join the pool at full
      length; the best pooled hypothesis wins.
    """
    k = cfg.num_beams

    def tile(x):
        return jnp.repeat(x, k, axis=0)  # (B,...) -> (B*k,...) beam-minor

    cache = jax.tree.map(tile, cache)
    # cross_kv is NOT tiled: condition features are beam-invariant, and
    # BertAttention folds the k-tiled queries onto the shared K/V — the
    # decode step's dominant HBM read (12 layers x Lc x hidden of cross
    # K/V) stays at batch b instead of b*k
    cache_mask = tile(cache_mask)

    t_max = cfg.max_new_tokens
    scores = jnp.tile(jnp.asarray([[0.0] + [NEG_INF] * (k - 1)],
                                  jnp.float32), (b, 1))
    tokens = jnp.full((b, k, t_max), cfg.pad_id, jnp.int32)
    prev_tok = jnp.repeat(last_tok[:, None], k, axis=1)
    pool_scores = jnp.full((b, k), NEG_INF, jnp.float32)
    pool_tokens = jnp.full((b, k, t_max), cfg.pad_id, jnp.int32)
    pool_count = jnp.zeros((b,), jnp.int32)
    done = jnp.zeros((b,), bool)

    def cond(carry):
        i = carry[0]
        done = carry[-1]
        # early exit once every batch's beam pool is closed (the HF
        # stopping rule); done batches' state is frozen below, so exiting
        # early returns exactly the state the full t_max loop would
        return (i < t_max) & ~jnp.all(done)

    def step(carry):
        (i, cache, prev_tok, scores, tokens,
         pool_scores, pool_tokens, pool_count, done) = carry
        tok2 = jnp.stack(
            [prev_tok.reshape(-1),
             jnp.full((b * k,), cfg.mask_id, jnp.int32)], axis=1)
        logits, cache = _bert_step(bert, tok2, p - 1 + i, cache, cache_mask,
                                   cross_kv)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        vocab = logp.shape[-1]
        cand = (scores[:, :, None] + logp.reshape(b, k, vocab)
                ).reshape(b, k * vocab)
        s2k, idx2k = jax.lax.top_k(cand, 2 * k)          # sorted desc
        beam2k = idx2k // vocab
        tok2k = (idx2k % vocab).astype(jnp.int32)
        is_eos = tok2k == cfg.eos_id

        # --- pool update: EOS candidates ranked < k, length-penalized at
        # cur_len = p + i (BeamHypotheses.add; hyp excludes the EOS token)
        cur_len = jnp.asarray(p + i, jnp.float32)
        add_score = s2k / cur_len ** cfg.length_penalty
        eligible = is_eos & (jnp.arange(2 * k)[None, :] < k) & ~done[:, None]
        add_score = jnp.where(eligible, add_score, NEG_INF)
        cand_toks = jnp.take_along_axis(tokens, beam2k[:, :, None], axis=1)
        merged_scores = jnp.concatenate([pool_scores, add_score], axis=1)
        merged_tokens = jnp.concatenate([pool_tokens, cand_toks], axis=1)
        top_pool, pool_idx = jax.lax.top_k(merged_scores, k)
        pool_scores = top_pool
        pool_tokens = jnp.take_along_axis(
            merged_tokens, pool_idx[:, :, None], axis=1)
        pool_count = jnp.minimum(
            pool_count + jnp.sum(eligible, axis=1, dtype=jnp.int32), k)

        # --- live beams: the k best non-EOS candidates
        live = jnp.where(is_eos, NEG_INF, s2k)
        new_scores, sel = jax.lax.top_k(live, k)
        beam_idx = jnp.take_along_axis(beam2k, sel, axis=1)
        tok_idx = jnp.take_along_axis(tok2k, sel, axis=1)
        new_tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        new_tokens = new_tokens.at[:, :, i].set(tok_idx)

        # --- freeze done batches (HF: done batches pad and skip the pool)
        scores = jnp.where(done[:, None], scores, new_scores)
        tokens = jnp.where(done[:, None, None], tokens, new_tokens)
        prev_tok = jnp.where(done[:, None], prev_tok, tok_idx)
        keep = jnp.where(done[:, None], jnp.arange(k)[None, :], beam_idx)
        flat_idx = (jnp.arange(b)[:, None] * k + keep).reshape(-1)
        cache = jax.tree.map(lambda x: x[flat_idx], cache)

        # --- done rule (BeamHypotheses.is_done, early_stopping=False)
        best_possible = s2k[:, 0] / cur_len ** cfg.length_penalty
        done = done | ((pool_count >= k)
                       & (pool_scores[:, -1] >= best_possible))
        return (i + 1, cache, prev_tok, scores, tokens,
                pool_scores, pool_tokens, pool_count, done)

    init = (jnp.asarray(0), cache, prev_tok, scores, tokens,
            pool_scores, pool_tokens, pool_count, done)
    (_, cache, prev_tok, scores, tokens,
     pool_scores, pool_tokens, pool_count, done) = jax.lax.while_loop(
        cond, step, init)

    # finalize (BeamSearchScorer.finalize): never-done batches add their
    # live beams at full length; best pooled hypothesis wins
    final_len = jnp.asarray(p + t_max, jnp.float32)
    live_final = jnp.where(done[:, None], NEG_INF,
                           scores / final_len ** cfg.length_penalty)
    all_scores = jnp.concatenate([pool_scores, live_final], axis=1)
    all_tokens = jnp.concatenate([pool_tokens, tokens], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    return jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0]
