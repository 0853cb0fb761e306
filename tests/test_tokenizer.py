import numpy as np

from vast_tpu.data.tokenizer import BertTokenizer, tiny_tokenizer


def test_special_ids_match_bert_layout():
    tok = tiny_tokenizer()
    assert tok.pad_token_id == 0
    assert tok.unk_token_id == 100
    assert tok.cls_token_id == 101 == tok.bos_token_id
    assert tok.sep_token_id == 102 == tok.eos_token_id
    assert tok.mask_token_id == 103


def test_wordpiece_matches_hf_reference():
    """Parity with transformers' BertTokenizer on the same vocab."""
    try:
        from transformers import BertTokenizer as HFTok
    except Exception:
        import pytest
        pytest.skip("transformers unavailable")
    import tempfile, os
    tok = tiny_tokenizer()
    with tempfile.TemporaryDirectory() as d:
        vocab_path = os.path.join(d, "vocab.txt")
        with open(vocab_path, "w") as f:
            for i in range(tok.vocab_size):
                f.write(tok.inv_vocab[i] + "\n")
        hf = HFTok(vocab_path, do_lower_case=True)
        for text in [
            "A man is RUNNING in the park!",
            "the dog plays with a ball, near water.",
            "Singing; unknownword guitar music",
            "",
        ]:
            ours = tok.tokenize(text)
            theirs = hf.tokenize(text)
            assert ours == theirs, (text, ours, theirs)
            enc = tok([text], max_length=16)
            henc = hf([text], padding="max_length", truncation=True,
                      max_length=16, return_tensors="np")
            np.testing.assert_array_equal(enc["input_ids"][0],
                                          henc["input_ids"][0])
            np.testing.assert_array_equal(enc["attention_mask"][0],
                                          henc["attention_mask"][0])


def test_encode_decode_roundtrip():
    tok = tiny_tokenizer()
    enc = tok(["a man is running in the park"], max_length=12)
    assert enc["input_ids"].shape == (1, 12)
    assert enc["input_ids"][0, 0] == tok.cls_token_id
    text = tok.batch_decode(enc["input_ids"])[0]
    assert text == "a man is running in the park"


def test_truncation_and_padding():
    tok = tiny_tokenizer()
    long_text = " ".join(["dog"] * 50)
    enc = tok([long_text, "cat"], max_length=10)
    assert enc["input_ids"].shape == (2, 10)
    assert enc["input_ids"][0, -1] == tok.sep_token_id
    assert enc["attention_mask"][1].sum() == 3  # CLS cat SEP
