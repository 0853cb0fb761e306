"""ITM rerank cell selection per direction (refine_score_matrix parity:
/root/reference/evaluation/evaluation_mm.py:253-319)."""

import numpy as np

from vast_tpu.evaluation.evaluation_mm import rerank_scores


class FakeModel:
    """Stub whose slice score is a deterministic function of the pair:
    score(t, c) = cond[c,0,0] + ids[t,0] — lets the test check exactly
    which (text, cond) cells got scored."""

    def apply(self, variables, cond, ids, mask, method=None):
        return cond[:, 0, 0] + ids[:, 0]


def _setup(n_text=6, n_cond=4, seed=0):
    rs = np.random.RandomState(seed)
    itc = rs.randn(n_text, n_cond)
    cond_seqs = rs.randn(n_cond, 3, 2).astype(np.float32)
    ids = rs.randint(0, 50, (n_text, 5)).astype(np.int32)
    mask = np.ones((n_text, 5), np.int32)
    return itc, cond_seqs, ids, mask


def test_forward_scores_topk_per_text():
    itc, cseq, ids, mask = _setup()
    out = rerank_scores(FakeModel(), {}, cseq, ids, mask, itc, top_k=2,
                        direction="forward", chunk=4)
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
                        direction="backward", chunk=4)
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
                        direction="forward", chunk=8)
    bwd = rerank_scores(FakeModel(), {}, cseq, ids, mask, itc, top_k=2,
                        direction="backward", chunk=8)
    assert (fwd != 0).sum() == 8 * 2
    assert (bwd != 0).sum() == 3 * 2
    assert ((fwd != 0) != (bwd != 0)).any()
