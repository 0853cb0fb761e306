"""BERT encoder/decoder with per-layer cross-attention (flax.linen).

TPU-native re-implementation of the fusion encoder the reference forked
from HF (model/text_encoders/bert/bert.py): ``is_decoder=True`` +
``add_cross_attention=True`` puts a cross-attention block after the
self-attention of *every* layer; 2-D padding masks and full 3-D per-row
masks (causal / part-causal, bert.py:697) are both supported.

Decode support: the reference generates autoregressively by appending a
[MASK] token each step and predicting it (bert.py:1027-1044), re-running
the full prefix. Here a fixed-shape KV cache processes exactly TWO tokens
per step — the real token that replaced last step's [MASK] at position
t-1 (its cached K/V is overwritten) and the new [MASK] at position t —
making each decode step O(L) instead of O(L^2), with identical math.
Cross-attention K/V over the condition features is computed once before
the loop (``precompute_cross_kv``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vast_tpu.models.remat import remat_policy
from vast_tpu.ops.activations import gelu
from vast_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    add_cross_attention: bool = True
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: str = "dots"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


# decode cache pytree: per layer {"k": (B, L, H, D), "v": (B, L, H, D)}
Cache = list[dict[str, jax.Array]]


class BertEmbeddings(nn.Module):
    cfg: BertConfig

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size,
                                        dtype=c.dtype)
        self.position_embeddings = nn.Embed(c.max_position_embeddings,
                                            c.hidden_size, dtype=c.dtype)
        self.token_type_embeddings = nn.Embed(c.type_vocab_size,
                                              c.hidden_size, dtype=c.dtype)
        self.ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 deterministic=True):
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[-1])[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(position_ids)
             + self.token_type_embeddings(token_type_ids))
        return self.dropout(self.ln(x), deterministic=deterministic)

    def attend(self, hidden):
        """hidden @ word_embedding_table.T (tied MLM decoder)."""
        return self.word_embeddings.attend(hidden)


class BertAttention(nn.Module):
    """Self- or cross-attention + output projection + residual LN."""

    cfg: BertConfig

    def setup(self):
        c = self.cfg
        self.query = nn.Dense(c.hidden_size, dtype=c.dtype)
        self.key = nn.Dense(c.hidden_size, dtype=c.dtype)
        self.value = nn.Dense(c.hidden_size, dtype=c.dtype)
        self.out = nn.Dense(c.hidden_size, dtype=c.dtype)
        self.out_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def _heads(self, layer, x):
        y = layer(x)
        return y.reshape(*y.shape[:-1], self.cfg.num_attention_heads,
                         self.cfg.head_dim)

    def __call__(self, hidden, kv_source=None, mask=None,
                 deterministic=True, cache=None, cache_index=None,
                 precomputed_kv=None):
        c = self.cfg
        b, lq, _ = hidden.shape

        q = self._heads(self.query, hidden)
        kv_groups = 1
        if precomputed_kv is not None:
            k, v = precomputed_kv
            if k.shape[0] != b:
                # beam-tiled queries over SHARED cross K/V: condition
                # features are beam-invariant, so beam decode keeps ONE
                # K/V copy and folds the beams into the query length —
                # the per-step HBM read of the (Lc x hidden x layers)
                # cross cache drops by the beam count (the decode
                # bottleneck; see models/generation.py)
                if b % k.shape[0]:
                    raise ValueError(
                        f"query batch {b} is not a multiple of the "
                        f"precomputed K/V batch {k.shape[0]}")
                kv_groups = b // k.shape[0]
                if mask is not None:
                    raise NotImplementedError(
                        "beam-grouped cross-attention assumes unmasked "
                        "condition features")
                q = q.reshape(k.shape[0], kv_groups * lq,
                              c.num_attention_heads, c.head_dim)
        else:
            src = hidden if kv_source is None else kv_source
            k = self._heads(self.key, src)
            v = self._heads(self.value, src)

        new_cache = None
        if cache is not None:
            # write this step's K/V at [cache_index, cache_index+lq)
            k = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0))
            v = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0))
            new_cache = {"k": k, "v": v}

        out = multi_head_attention(q, k, v, mask=mask)
        if kv_groups > 1:
            out = out.reshape(b, lq, c.num_attention_heads, c.head_dim)
        out = out.reshape(b, lq, c.hidden_size)
        out = self.out(out)
        out = self.dropout(out, deterministic=deterministic)
        out = self.out_ln(hidden + out)
        return out, new_cache

    def project_kv(self, x):
        """Precompute cross K/V for decode (condition feats are static)."""
        return self._heads(self.key, x), self._heads(self.value, x)


class BertMlp(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, deterministic=True):
        c = self.cfg
        x = nn.Dense(c.intermediate_size, dtype=c.dtype, name="intermediate")(hidden)
        x = gelu(x)
        x = nn.Dense(c.hidden_size, dtype=c.dtype, name="output")(x)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln",
                            dtype=c.dtype)(hidden + x)


class BertLayer(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.attention = BertAttention(self.cfg)
        if self.cfg.add_cross_attention:
            self.crossattention = BertAttention(self.cfg)
        self.mlp = BertMlp(self.cfg)

    def __call__(self, hidden, self_mask=None, encoder_hidden_states=None,
                 cross_mask=None, deterministic=True, cache=None,
                 cache_index=None, cross_kv=None):
        hidden, new_cache = self.attention(
            hidden, mask=self_mask, deterministic=deterministic,
            cache=cache, cache_index=cache_index)
        if self.cfg.add_cross_attention and (
            encoder_hidden_states is not None or cross_kv is not None
        ):
            hidden, _ = self.crossattention(
                hidden, kv_source=encoder_hidden_states, mask=cross_mask,
                deterministic=deterministic, precomputed_kv=cross_kv)
        hidden = self.mlp(hidden, deterministic=deterministic)
        return hidden, new_cache

    def cross_kv(self, encoder_hidden_states):
        return self.crossattention.project_kv(encoder_hidden_states)


def _extend_mask(attention_mask, lq: int):
    """2-D (B, Lk) or 3-D (B, Lq, Lk) mask -> boolean (B, 1, Lq, Lk).

    Mirrors get_extended_attention_mask (bert.py:697-767): a 2-D padding
    mask broadcasts over query positions; a 3-D mask is used as-is.
    """
    if attention_mask is None:
        return None
    if attention_mask.ndim == 2:
        m = attention_mask[:, None, None, :]
        m = jnp.broadcast_to(m, (attention_mask.shape[0], 1, lq,
                                 attention_mask.shape[-1]))
    elif attention_mask.ndim == 3:
        m = attention_mask[:, None, :, :]
    else:
        m = attention_mask
    return m.astype(bool)


class BertModel(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.embeddings = BertEmbeddings(self.cfg)
        self.layers = [BertLayer(self.cfg, name=f"layer_{i}")
                       for i in range(self.cfg.num_hidden_layers)]

    def __call__(self, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 deterministic=True, inputs_embeds=None,
                 cache=None, cache_index=None, cache_mask=None,
                 cross_kv=None, decode_self_mask=None):
        """Returns last_hidden_state (and the new cache when decoding).

        Standard mode: full-sequence forward, ``attention_mask`` 2-D or 3-D.
        Decode mode (``cache`` given): ``input_ids`` is the token window at
        positions [cache_index, cache_index+lq); ``cache_mask`` (B, L_cache)
        marks attendable cache slots (causality over written slots is
        enforced automatically), or pass ``decode_self_mask``
        (B, lq, L_cache) to override entirely — used for bidirectional
        prompt prefill (QA question prompts).
        """
        if inputs_embeds is None:
            if cache is not None and position_ids is None:
                position_ids = cache_index + jnp.arange(input_ids.shape[1])[None, :]
            x = self.embeddings(input_ids, token_type_ids, position_ids,
                                deterministic)
        else:
            x = inputs_embeds
        # under a dp mesh, re-pin hidden states to batch sharding right
        # after the table lookups — otherwise the whole embeddings+LN
        # chain runs in the table's fsdp layout and the partitioner
        # "involuntarily rematerializes" at the first matmul (dryrun-r3)
        from vast_tpu.parallel.mesh import constrain_batch_dim
        x = constrain_batch_dim(x)

        lq = x.shape[1]
        if cache is not None:
            if decode_self_mask is not None:
                self_mask = decode_self_mask[:, None].astype(bool)
            else:
                # decode: query tokens attend over valid cache slots up to
                # their own position (the fixup must not see the new MASK).
                l_cache = cache[0]["k"].shape[1]
                m = jnp.broadcast_to(cache_mask[:, None, None, :],
                                     (x.shape[0], 1, lq, l_cache)).astype(bool)
                pos = jnp.arange(l_cache)[None, None, None, :]
                qpos = cache_index + jnp.arange(lq)[None, None, :, None]
                self_mask = m & (pos <= qpos)
        else:
            self_mask = _extend_mask(attention_mask, lq)

        cross_mask = _extend_mask(encoder_attention_mask, lq)

        new_cache = []
        for i, layer in enumerate(self.layers):
            layer_cache = cache[i] if cache is not None else None
            layer_cross_kv = cross_kv[i] if cross_kv is not None else None
            if self.cfg.remat and cache is None:
                fn = nn.remat(
                    lambda mod, *a: mod(*a),
                    static_argnums=(5,),
                    policy=remat_policy(self.cfg.remat_policy),
                )
                x, nc = fn(layer, x, self_mask, encoder_hidden_states,
                           cross_mask, deterministic, layer_cache,
                           cache_index, layer_cross_kv)
            else:
                x, nc = layer(x, self_mask, encoder_hidden_states, cross_mask,
                              deterministic, layer_cache, cache_index,
                              layer_cross_kv)
            new_cache.append(nc)
        if cache is not None:
            return x, new_cache
        return x

    def precompute_cross_kv(self, encoder_hidden_states):
        return [layer.cross_kv(encoder_hidden_states) for layer in self.layers]

    def attend_embeddings(self, hidden):
        return self.embeddings.attend(hidden)


class BertMLMHead(nn.Module):
    """transform dense+gelu+LN; vocab decode is tied to word embeddings."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden):
        c = self.cfg
        x = nn.Dense(c.hidden_size, dtype=c.dtype, name="transform")(hidden)
        x = gelu(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="transform_ln",
                            dtype=c.dtype)(x)


class BertForMaskedLM(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.bert = BertModel(self.cfg)
        self.cls = BertMLMHead(self.cfg)
        self.decoder_bias = self.param(
            "decoder_bias", nn.initializers.zeros, (self.cfg.vocab_size,))

    def logits_from_hidden(self, hidden):
        x = self.cls(hidden)
        return self.bert.attend_embeddings(x) + self.decoder_bias

    def __call__(self, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 deterministic=True, cache=None, cache_index=None,
                 cache_mask=None, cross_kv=None, decode_self_mask=None):
        out = self.bert(
            input_ids, attention_mask, token_type_ids, position_ids,
            encoder_hidden_states, encoder_attention_mask, deterministic,
            cache=cache, cache_index=cache_index, cache_mask=cache_mask,
            cross_kv=cross_kv, decode_self_mask=decode_self_mask)
        if cache is not None:
            hidden, new_cache = out
            return self.logits_from_hidden(hidden), new_cache
        return self.logits_from_hidden(out)

    def encode(self, *args, **kwargs):
        """Self-attention-only text encoding (multimodal_encoder.bert(...))."""
        return self.bert(*args, **kwargs)

    def precompute_cross_kv(self, encoder_hidden_states):
        return self.bert.precompute_cross_kv(encoder_hidden_states)


def init_cache(cfg: BertConfig, batch: int, length: int,
               dtype=jnp.float32) -> Cache:
    h, d = cfg.num_attention_heads, cfg.head_dim
    return [
        {"k": jnp.zeros((batch, length, h, d), dtype),
         "v": jnp.zeros((batch, length, h, d), dtype)}
        for _ in range(cfg.num_hidden_layers)
    ]


def mlm_loss(logits, labels, ignore_index: int = -100):
    """Cross entropy over positions with label != ignore_index."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
