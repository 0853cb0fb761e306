"""Generation: cached scan decode must equal the reference's
full-prefix-per-step mask-append decoding (naively re-implemented here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_batch, tiny_vast_config
from vast_tpu.models.generation import GenerationConfig, generate
from vast_tpu.models.vast import VASTModel

CFG = tiny_vast_config()


def setup_model():
    model = VASTModel(CFG)
    batch = tiny_batch(b=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, "ret%tva_cap%tva",
        compute_loss=True, deterministic=True,
        step_rngs={"mask": jax.random.PRNGKey(2),
                   "negatives": jax.random.PRNGKey(3)})["params"]
    out = model.apply({"params": params}, batch, "ret%tva",
                      compute_loss=False, deterministic=True)
    cond = out["condition_feats_tva"]
    return model, params, cond


def naive_reference_decode(model, params, cond, gcfg, steps):
    """Reference algorithm (bert.py:1027-1044): at each step run the FULL
    sequence [generated..., MASK] with a growing square causal mask and take
    argmax at the MASK position."""
    b = cond.shape[0]
    seq = np.full((b, 1), gcfg.bos_id, np.int64)
    finished = np.zeros(b, bool)
    outs = []
    for _ in range(steps):
        t = seq.shape[1]
        ids = np.concatenate(
            [seq, np.full((b, 1), gcfg.mask_id, np.int64)], axis=1)
        mask3 = np.tril(np.ones((b, t + 1, t + 1), np.int64))
        logits = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask3),
            encoder_hidden_states=jnp.asarray(cond),
            method=lambda m, *a, **k: m.multimodal_encoder(*a, **k))
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))
        nxt = np.where(finished, gcfg.pad_id, nxt)
        finished |= nxt == gcfg.eos_id
        outs.append(nxt)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
    return np.stack(outs, axis=1)


@pytest.mark.slow
def test_greedy_matches_naive_reference():
    model, params, cond = setup_model()
    gcfg = GenerationConfig(max_new_tokens=6, num_beams=1)
    ours = np.asarray(generate(model, params, cond, gcfg))
    ref = naive_reference_decode(model, params, cond, gcfg, 6)
    np.testing.assert_array_equal(ours, ref)


def test_beam1_matches_greedy():
    model, params, cond = setup_model()
    g1 = GenerationConfig(max_new_tokens=5, num_beams=1)
    gb = GenerationConfig(max_new_tokens=5, num_beams=1 + 0, length_penalty=1.0)
    greedy = np.asarray(generate(model, params, cond, g1))
    gb2 = GenerationConfig(max_new_tokens=5, num_beams=2, length_penalty=0.0)
    # beam=2 with length_penalty 0: best beam's first tokens may differ from
    # greedy in general, but beam search must produce valid tokens
    beam = np.asarray(generate(model, params, cond, gb2))
    assert beam.shape == greedy.shape
    assert (beam >= 0).all() and (beam < 170).all()


@pytest.mark.slow
def test_beam_prefers_higher_logprob_sequence():
    """Beam search must find a sequence with >= total logprob than greedy."""
    model, params, cond = setup_model()
    steps = 5
    greedy = np.asarray(generate(
        model, params, cond, GenerationConfig(max_new_tokens=steps)))
    beam = np.asarray(generate(
        model, params, cond,
        GenerationConfig(max_new_tokens=steps, num_beams=3,
                         length_penalty=0.0)))

    def seq_logprob(tokens):
        b = cond.shape[0]
        total = np.zeros(b)
        seq = np.full((b, 1), 101, np.int64)
        done = np.zeros(b, bool)
        for i in range(tokens.shape[1]):
            t = seq.shape[1]
            ids = np.concatenate([seq, np.full((b, 1), 103, np.int64)], 1)
            mask3 = np.tril(np.ones((b, t + 1, t + 1), np.int64))
            logits = model.apply(
                {"params": params}, jnp.asarray(ids), jnp.asarray(mask3),
                encoder_hidden_states=jnp.asarray(cond),
                method=lambda m, *a, **k: m.multimodal_encoder(*a, **k))
            logp = np.asarray(jax.nn.log_softmax(logits[:, -1], -1))
            tok = tokens[:, i]
            step_lp = logp[np.arange(b), tok]
            total += np.where(done, 0.0, step_lp)
            done |= tok == 102
            done |= tok == 0
            seq = np.concatenate([seq, tok[:, None]], 1)
        return total

    lp_beam = seq_logprob(beam)
    lp_greedy = seq_logprob(greedy)
    assert (lp_beam >= lp_greedy - 1e-4).all(), (lp_beam, lp_greedy)


def test_qa_prompt_generation_shapes():
    model, params, cond = setup_model()
    b = cond.shape[0]
    rs = np.random.RandomState(0)
    prompt = np.concatenate([
        np.full((b, 1), 101), rs.randint(106, 170, (b, 4)),
        np.full((b, 1), 102), np.zeros((b, 2)),  # padded question
        np.full((b, 1), 101),  # BOS
    ], axis=1).astype(np.int32)
    pmask = (prompt != 0).astype(np.int32)
    gcfg = GenerationConfig(max_new_tokens=4, num_beams=3, length_penalty=1.0)
    out = np.asarray(generate(model, params, jnp.asarray(cond), gcfg,
                              prompt_ids=jnp.asarray(prompt),
                              prompt_mask=jnp.asarray(pmask)))
    assert out.shape == (b, 4)


def test_sampling_is_deterministic_given_rng():
    model, params, cond = setup_model()
    gcfg = GenerationConfig(max_new_tokens=5, do_sample=True, top_k=10)
    a = np.asarray(generate(model, params, cond, gcfg,
                            rng=jax.random.PRNGKey(7)))
    b = np.asarray(generate(model, params, cond, gcfg,
                            rng=jax.random.PRNGKey(7)))
    c = np.asarray(generate(model, params, cond, gcfg,
                            rng=jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


@pytest.mark.slow
def test_topk_sampling_distribution_matches_softmax():
    """Captioner-mode sampling (do_sample=True, top_k — the reference's
    msrvtt_captioner path, model/vast.py:529-534 num_return_sequences
    sampling): the FIRST sampled token must (a) always lie in the top-k
    set of the first-step logits and (b) follow softmax(top-k logits)
    empirically. One cond row is replicated so every batch row draws from
    the SAME distribution: 64 rows x 16 rngs = 1024 draws."""
    model, params, cond = setup_model()
    b = 64
    cond1 = jnp.broadcast_to(cond[:1], (b,) + cond.shape[1:])

    # expected first-step distribution via the naive full-prefix path:
    # logits at the MASK slot after [BOS] (the same oracle
    # naive_reference_decode uses)
    ids = np.asarray([[101, 103]], np.int64)
    mask3 = np.tril(np.ones((1, 2, 2), np.int64))
    logits = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask3),
        encoder_hidden_states=jnp.asarray(cond[:1]),
        method=lambda m, *a, **k: m.multimodal_encoder(*a, **k))[0, -1],
        np.float64)
    k = 10
    top_idx = np.argsort(-logits)[:k]
    z = np.exp(logits[top_idx] - logits[top_idx].max())
    probs = z / z.sum()

    gcfg = GenerationConfig(max_new_tokens=2, num_beams=1, do_sample=True,
                            top_k=k)
    draws = []
    for seed in range(16):
        out = np.asarray(generate(model, params, cond1, gcfg,
                                  rng=jax.random.PRNGKey(seed)))
        draws.extend(out[:, 0].tolist())
    draws = np.asarray(draws)
    n = draws.size
    assert np.isin(draws, top_idx).all(), \
        f"sampled outside top-{k}: {set(draws) - set(top_idx.tolist())}"
    emp = np.asarray([(draws == t).mean() for t in top_idx])
    # binomial 6-sigma band per token (n=1024 -> sigma <= ~0.016)
    sigma = np.sqrt(probs * (1 - probs) / n)
    np.testing.assert_array_less(np.abs(emp - probs),
                                 6 * sigma + 1e-3,
                                 err_msg=f"emp={emp} probs={probs}")


def hf_beam_oracle(model, params, cond, gcfg, steps):
    """Naive python re-implementation of HF beam search (BeamSearchScorer +
    BeamHypotheses, early_stopping=False) over full-prefix recompute —
    the exact algorithm the reference's ``generate`` call runs
    (model/vast.py:540-547). Returns (B, steps) generated ids."""
    b = cond.shape[0]
    k, lp_pow = gcfg.num_beams, gcfg.length_penalty
    p = 1  # BOS-only prompt

    def logp_row(seq, ci):
        ids = np.asarray([seq + [gcfg.mask_id]], np.int64)
        t = ids.shape[1]
        mask3 = np.tril(np.ones((1, t, t), np.int64))
        logits = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask3),
            encoder_hidden_states=jnp.asarray(cond[ci:ci + 1]),
            method=lambda m, *a, **kw: m.multimodal_encoder(*a, **kw))
        return np.asarray(jax.nn.log_softmax(
            logits[0, -1].astype(jnp.float32), -1))

    out = np.full((b, steps), gcfg.pad_id, np.int32)
    for ci in range(b):
        beams = [([int(gcfg.bos_id)], 0.0)]
        pool = []  # (penalized score, generated ids excl. eos)
        done = False
        for i in range(steps):
            if done:
                break
            cand = []
            for bi, (seq, s) in enumerate(beams):
                lp = logp_row(seq, ci)
                for v, w in enumerate(lp):
                    cand.append((s + float(w), bi, v))
            cand.sort(key=lambda c: -c[0])
            top2k = cand[:2 * k]
            cur_div = float(p + i) ** lp_pow
            new_beams = []
            for rank, (s, bi, v) in enumerate(top2k):
                if v == gcfg.eos_id:
                    if rank < k:  # worse-ranked EOS candidates are skipped
                        pool.append((s / cur_div, beams[bi][0][1:]))
                        pool.sort(key=lambda h: -h[0])
                        pool = pool[:k]
                elif len(new_beams) < k:
                    new_beams.append((beams[bi][0] + [v], s))
            beams = new_beams
            if len(pool) == k:
                best_possible = top2k[0][0] / cur_div
                if pool[-1][0] >= best_possible:
                    done = True
        if not done:
            fin_div = float(p + steps) ** lp_pow
            for seq, s in beams:
                pool.append((s / fin_div, seq[1:]))
            pool.sort(key=lambda h: -h[0])
        gen = pool[0][1]
        out[ci, :len(gen)] = gen
    return out


@pytest.mark.slow
def test_beam_matches_hf_oracle():
    model, params, cond = setup_model()
    for lp in (0.6, 1.0):
        gcfg = GenerationConfig(max_new_tokens=6, num_beams=3,
                                length_penalty=lp)
        ours = np.asarray(generate(model, params, cond, gcfg))
        ref = hf_beam_oracle(model, params, cond, gcfg, 6)
        np.testing.assert_array_equal(ours, ref)
