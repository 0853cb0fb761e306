"""ITM rerank cell selection per direction (refine_score_matrix parity:
/root/reference/evaluation/evaluation_mm.py:253-319) and per-candidate
K/V-reuse grouping (compute_slice_scores_grouped)."""

import numpy as np

from vast_tpu.evaluation.evaluation_mm import rerank_scores


class FakeModel:
    """Stub whose slice score is a deterministic function of the pair:
    score(t, c) = cond[c,0,0] + ids[t,0] — lets the test check exactly
    which (text, cond) cells got scored. Mirrors the grouped contract:
    cond has G rows, ids G*T rows, row g*T+j pairs with candidate g."""

    def apply(self, variables, cond, ids, mask, method=None):
        import jax.numpy as jnp

        t = ids.shape[0] // cond.shape[0]
        return jnp.repeat(cond[:, 0, 0], t) + ids[:, 0]


def _setup(n_text=6, n_cond=4, seed=0):
    rs = np.random.RandomState(seed)
    itc = rs.randn(n_text, n_cond)
    cond_seqs = rs.randn(n_cond, 3, 2).astype(np.float32)
    ids = rs.randint(0, 50, (n_text, 5)).astype(np.int32)
    mask = np.ones((n_text, 5), np.int32)
    return itc, cond_seqs, ids, mask


def test_forward_scores_topk_per_text():
    itc, cseq, ids, mask = _setup()
    # texts_per_seg=2 < top_k exercises multi-segment candidates
    out = rerank_scores(FakeModel(), {}, cseq, ids, mask, itc, top_k=2,
                        direction="forward", texts_per_seg=2,
                        conds_per_call=3)
    for t in range(itc.shape[0]):
        top = np.argsort(-itc[t])[:2]
        for c in range(itc.shape[1]):
            if c in top:
                np.testing.assert_allclose(
                    out[t, c], cseq[c, 0, 0] + ids[t, 0], rtol=1e-5)
            else:
                assert out[t, c] == 0.0


def test_backward_scores_topk_per_cond():
    itc, cseq, ids, mask = _setup()
    out = rerank_scores(FakeModel(), {}, cseq, ids, mask, itc, top_k=3,
                        direction="backward", texts_per_seg=2,
                        conds_per_call=2)
    for c in range(itc.shape[1]):
        top = np.argsort(-itc[:, c])[:3]
        for t in range(itc.shape[0]):
            if t in top:
                np.testing.assert_allclose(
                    out[t, c], cseq[c, 0, 0] + ids[t, 0], rtol=1e-5)
            else:
                assert out[t, c] == 0.0


def test_directions_disagree():
    # the two directions generally score different cell sets — the round-1
    # implementation reused the forward matrix for backward metrics
    itc, cseq, ids, mask = _setup(n_text=8, n_cond=3)
    fwd = rerank_scores(FakeModel(), {}, cseq, ids, mask, itc, top_k=2,
                        direction="forward", texts_per_seg=4)
    bwd = rerank_scores(FakeModel(), {}, cseq, ids, mask, itc, top_k=2,
                        direction="backward", texts_per_seg=4)
    assert (fwd != 0).sum() == 8 * 2
    assert (bwd != 0).sum() == 3 * 2
    assert ((fwd != 0) != (bwd != 0)).any()


def test_grouped_scores_match_per_pair():
    """The grouped path (K/V computed once per candidate, texts folded
    onto the shared K/V) must reproduce compute_slice_scores pair by
    pair — a mismatch would silently corrupt every reranked metric."""
    import jax

    from tests.helpers import tiny_batch, tiny_vast_config
    from vast_tpu.models.vast import VASTModel

    model = VASTModel(tiny_vast_config())
    rs = np.random.RandomState(3)
    batch = tiny_batch(rs, b=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch, "ret%tva", compute_loss=True, deterministic=True,
        step_rngs={"mask": jax.random.PRNGKey(1),
                   "negatives": jax.random.PRNGKey(2)})["params"]

    g, t, lc, ltxt = 3, 4, 6, 12
    d = model.cfg.resolved_bert_cfg().hidden_size
    cond = np.asarray(rs.randn(g, lc, d), np.float32)
    ids = np.concatenate(
        [np.full((g * t, 1), 101), rs.randint(106, 170, (g * t, ltxt - 2)),
         np.full((g * t, 1), 102)], axis=1).astype(np.int32)
    mask = np.ones((g * t, ltxt), np.int32)

    grouped = np.asarray(model.apply(
        {"params": params}, cond, ids, mask,
        method=lambda m, c, i, a: m.compute_slice_scores_grouped(c, i, a)))

    per_pair = np.asarray(model.apply(
        {"params": params}, np.repeat(cond, t, axis=0), ids, mask,
        method=lambda m, c, i, a: m.compute_slice_scores(c, i, a)))

    np.testing.assert_allclose(grouped, per_pair, rtol=2e-5, atol=2e-6)
