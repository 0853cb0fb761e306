"""BERT fusion encoder: HF parity, mask semantics, decode-cache exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vast_tpu.models.bert import (
    BertConfig,
    BertForMaskedLM,
    BertModel,
    init_cache,
    mlm_loss,
)

TINY = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=4, intermediate_size=64,
                  max_position_embeddings=64,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def make_model(cfg=TINY, seed=0, batch=2, length=8):
    model = BertForMaskedLM(cfg)
    ids = jnp.ones((batch, length), jnp.int32)
    cond = jnp.ones((batch, 3, cfg.hidden_size))
    params = model.init(jax.random.PRNGKey(seed), ids,
                        encoder_hidden_states=cond)["params"]
    return model, params


def test_forward_shapes_and_cross_attention():
    model, params = make_model()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 120, (2, 8)))
    mask = jnp.ones((2, 8), jnp.int32)
    cond = jnp.asarray(np.random.RandomState(1).randn(2, 5, 32), jnp.float32)
    logits = model.apply({"params": params}, ids, mask,
                         encoder_hidden_states=cond)
    assert logits.shape == (2, 8, 120)
    # changing the condition features must change the output (cross-attn live)
    logits2 = model.apply({"params": params}, ids, mask,
                          encoder_hidden_states=cond + 1.0)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_3d_mask_semantics():
    """A causal 3-D mask must prevent early positions from seeing later ones."""
    model, params = make_model(batch=1, length=6)
    ids = jnp.asarray([[5, 6, 7, 8, 9, 10]], jnp.int32)
    causal = jnp.tril(jnp.ones((1, 6, 6), jnp.int32))
    out1 = model.apply({"params": params}, ids, causal,
                       method=lambda m, *a, **k: m.encode(*a, **k))
    ids2 = ids.at[0, 5].set(99)  # change last token
    out2 = model.apply({"params": params}, ids2, causal,
                       method=lambda m, *a, **k: m.encode(*a, **k))
    np.testing.assert_allclose(np.asarray(out1[0, :5]), np.asarray(out2[0, :5]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(out1[0, 5]), np.asarray(out2[0, 5]))


def test_hf_parity_self_and_cross():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, is_decoder=True,
        add_cross_attention=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, attn_implementation="eager")
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()

    from vast_tpu.convert.torch_ckpt import convert_bert_model, to_numpy_state_dict
    sd = to_numpy_state_dict(hf.state_dict())
    params = convert_bert_model(sd, prefix="", num_layers=2)

    rs = np.random.RandomState(0)
    ids = rs.randint(0, 120, (2, 10))
    mask2d = np.ones((2, 10), np.int64)
    mask2d[1, 7:] = 0
    # use an explicit 3-D mask so stock HF doesn't add its own causal mask
    mask3d = np.broadcast_to(mask2d[:, None, :], (2, 10, 10)).copy()
    cond = rs.randn(2, 6, 32).astype(np.float32)
    cond_mask = np.ones((2, 6), np.int64)
    cond_mask[0, 4:] = 0

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask3d),
                 encoder_hidden_states=torch.tensor(cond),
                 encoder_attention_mask=torch.tensor(cond_mask),
                 ).last_hidden_state.numpy()

    model = BertModel(TINY)
    out = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(mask3d),
                      encoder_hidden_states=jnp.asarray(cond),
                      encoder_attention_mask=jnp.asarray(cond_mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_hf_parity_mlm_head():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, attn_implementation="eager")
    hf = transformers.BertForMaskedLM(hf_cfg).eval()
    hf.tie_weights()

    from vast_tpu.convert.torch_ckpt import convert_bert_mlm, to_numpy_state_dict
    sd = to_numpy_state_dict(hf.state_dict())
    params = convert_bert_mlm(sd, bert_prefix="bert.", num_layers=2)

    ids = np.random.RandomState(1).randint(0, 120, (2, 9))
    mask = np.ones((2, 9), np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0,
                     add_cross_attention=False)
    model = BertForMaskedLM(cfg)
    out = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_decode_cache_matches_full_forward():
    """The 2-token cached decode step must equal the reference's
    full-prefix-with-[MASK]-appended forward (bert.py:1027-1044)."""
    cfg = TINY
    model, params = make_model(cfg)
    b, mask_id = 2, 103 % cfg.vocab_size
    rs = np.random.RandomState(2)
    cond = jnp.asarray(rs.randn(b, 5, 32), jnp.float32)

    # generated-so-far tokens (simulate 4 decode steps already done)
    gen = jnp.asarray(rs.randint(0, 120, (b, 5)), jnp.int32)  # BOS + 4 tokens

    # --- reference path: full forward over [gen, MASK] with square mask
    t = gen.shape[1]
    full_ids = jnp.concatenate([gen, jnp.full((b, 1), mask_id, jnp.int32)], 1)
    sq = jnp.tril(jnp.ones((b, t + 1, t + 1), jnp.int32))
    ref_logits = model.apply({"params": params}, full_ids, sq,
                             encoder_hidden_states=cond)[:, -1]

    # --- cached path: replay steps 0..t with the 2-token window
    L = 8
    cache = init_cache(cfg, b, L)
    cache_mask = jnp.zeros((b, L), jnp.int32).at[:, : t + 1].set(1)
    cross_kv = model.apply({"params": params}, cond,
                           method=lambda m, x: m.precompute_cross_kv(x))

    # step 0: feed [BOS, MASK] at positions 0,1
    def step(tokens2, idx, cache):
        logits, cache = model.apply(
            {"params": params}, tokens2, cache=cache, cache_index=idx,
            cache_mask=cache_mask, cross_kv=cross_kv)
        return logits[:, -1], cache

    logits, cache = step(
        jnp.stack([gen[:, 0], jnp.full((b,), mask_id, jnp.int32)], 1), 0, cache)
    for i in range(1, t):
        logits, cache = step(
            jnp.stack([gen[:, i], jnp.full((b,), mask_id, jnp.int32)], 1),
            i, cache)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-3)


def test_mlm_loss_ignores_minus_100():
    logits = jnp.zeros((2, 4, 10))
    labels = jnp.asarray([[1, -100, 2, -100], [-100, -100, -100, 3]])
    loss = mlm_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-6)
