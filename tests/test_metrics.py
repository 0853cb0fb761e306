"""Caption + VQA metric correctness."""

import numpy as np
import pytest

from vast_tpu.evaluation.metrics.coco_eval import compute_caption_metrics
from vast_tpu.evaluation.metrics.text import (
    bleu,
    cider,
    ptb_tokenize,
    rouge_l,
)
from vast_tpu.evaluation.vqa_metrics import (
    exact_match_accuracy,
    normalize_answer,
    vqa_accuracy,
)


def test_ptb_tokenize():
    assert ptb_tokenize("A man, running!") == ["a", "man", "running"]
    assert ptb_tokenize("don't stop...") == ["don't", "stop"]
    assert ptb_tokenize("") == []


def test_bleu_perfect_match():
    gts = {"a": [["the", "cat", "sat", "on", "the", "mat"]]}
    res = {"a": [["the", "cat", "sat", "on", "the", "mat"]]}
    b = bleu(gts, res)
    for v in b:
        assert abs(v - 1.0) < 1e-6


def test_bleu_partial_and_brevity():
    gts = {"a": [["the", "cat", "sat", "on", "the", "mat"]]}
    res = {"a": [["the", "cat"]]}
    b = bleu(gts, res)
    # unigram precision 1.0, but brevity penalty exp(1 - 6/2)
    assert abs(b[0] - np.exp(1 - 3)) < 1e-6


def test_bleu_matches_nltk_when_available():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu

    gts = {"a": [ptb_tokenize("a man rides a horse on the beach"),
                 ptb_tokenize("someone is riding a horse")],
           "b": [ptb_tokenize("two dogs play with a ball")]}
    res = {"a": [ptb_tokenize("a man is riding a horse")],
           "b": [ptb_tokenize("dogs play with a ball")]}
    ours = bleu(gts, res)
    refs = [gts["a"], gts["b"]]
    hyps = [res["a"][0], res["b"][0]]
    for n in range(1, 5):
        w = tuple([1.0 / n] * n)
        theirs = corpus_bleu(refs, hyps, weights=w)
        assert abs(ours[n - 1] - theirs) < 2e-2, (n, ours[n - 1], theirs)


def test_rouge_l_bounds():
    gts = {"a": [["x", "y", "z"]]}
    assert rouge_l(gts, {"a": [["x", "y", "z"]]}) == pytest.approx(1.0)
    assert rouge_l(gts, {"a": [["q", "w", "e"]]}) == 0.0


def test_cider_rewards_matching():
    gts = {f"k{i}": [["a", "cat", "on", "a", "mat"]] for i in range(4)}
    gts["k0"] = [["a", "dog", "in", "the", "park"]]
    good = {k: [v[0]] for k, v in gts.items()}
    bad = {k: [["completely", "unrelated", "words"]] for k in gts}
    assert cider(gts, good) > cider(gts, bad)
    assert cider(gts, good) > 5.0  # perfect match scores high (max 10)


def test_compute_caption_metrics_file(tmp_path):
    import json

    ann = {"annotations": [
        {"image_id": "v1", "caption": "a man is running in the park"},
        {"image_id": "v1", "caption": "someone runs through a park"},
        {"image_id": "v2", "caption": "two dogs play with a ball"},
    ]}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    results = [{"video_id": "v1", "caption": "a man is running in the park"},
               {"video_id": "v2", "caption": "two dogs play with a ball"}]
    m = compute_caption_metrics(results, str(p))
    assert m["Bleu_1"] == pytest.approx(100.0)
    assert m["ROUGE_L"] == pytest.approx(100.0)
    assert m["CIDEr"] > 100.0  # CIDEr scaled x100, max 1000


def test_vqa_normalization_and_accuracy():
    assert normalize_answer("The Cat!") == "cat"
    assert normalize_answer("two") == "2"
    assert normalize_answer("isnt") == "isn't"
    assert exact_match_accuracy(["a", "b"], ["a", "c"]) == 0.5
    acc = vqa_accuracy(["cat"], [["cat", "cat", "cat", "dog"] * 3])
    assert acc == 1.0
    acc = vqa_accuracy(["cat"], [["cat", "dog", "dog", "bird"]])
    assert acc == pytest.approx(1 / 3)
