"""Whole-model assembly parity vs the ASSEMBLED reference torch VAST.

Round-2 verdict #1: every encoder is parity-tested in isolation, but a
wiring bug in the assembly (pooling order, ProjLN placement, frame/type
embedding broadcast, mask polarity, loss reductions) would pass all of
those and still destroy checkpoint-ingested quality. This module builds
the reference's REAL ``model/vast.py:16`` VAST class (tiny encoder
configs, construct_* overridden only to skip the hard-coded
``./pretrained_weights`` checkpoint loads), converts its actual state
dict with ``convert_vast_checkpoint``, feeds both models one identical
batch, and asserts:

* ret eval: feat_t / feat_cond_* / condition_feats_* (model/vast.py:466-483)
* ret train: loss_itc + loss_itm with injected ITM negatives
  (model/vast.py:395-463)
* cap train: loss_cap with injected deterministic masking
  (model/vast.py:485-513)
* qa train: loss_qa incl. the part-causal mask (model/vast.py:556-614)
* cap eval: beam-search caption token sequences via the fork's own HF
  ``generate`` (model/vast.py:536-546)

Stochastic choices (ITM multinomial negatives, TokenMasker corruption)
are pinned to identical values on both sides via torch.multinomial
patching / the batch injection hooks — the parity claim covers every
deterministic operation in the assembled forward.
"""

import logging
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.helpers import TINY_BEATS, TINY_EVA, tiny_vast_config
from tests.test_ref_parity import (
    REF,
    _beats_ref_model,
    _eva_ref_model,
    _load_ref,
    _stub_module,
)
from vast_tpu.convert.torch_ckpt import to_numpy_state_dict
from vast_tpu.convert.vast_ckpt import convert_vast_checkpoint
from vast_tpu.models.vast import VASTModel

pytestmark = pytest.mark.slow

BOS, EOS, PAD, MASK = 101, 102, 0, 103
B, NF, TL, AL = 3, 2, 12, 10


class _StubTok:
    """Stands in for the BertTokenizer the reference loads from disk
    (model/vast.py:72-78): fixed special ids + a lookup table the test
    fills with pre-tokenized batches."""

    bos_token_id = BOS
    eos_token_id = EOS
    sep_token_id = EOS
    pad_token_id = PAD
    mask_token_id = MASK

    def __init__(self):
        self.table = {}

    def convert_tokens_to_ids(self, toks):
        m = {"[CLS]": BOS, "[SEP]": EOS, "[PAD]": PAD, "[MASK]": MASK}
        return [m[t] for t in toks]

    def __call__(self, texts, padding=None, truncation=None, max_length=None,
                 return_tensors=None):
        return self.table[(tuple(texts), max_length)]

    def batch_decode(self, out, skip_special_tokens=True):
        return [" ".join(str(int(t)) for t in row) for row in out]


class _TokBatch(dict):
    def __getattr__(self, k):
        return self[k]

    def to(self, dev):
        return self


@pytest.fixture(scope="module")
def assembled(request):
    """(ref torch VAST, our VASTModel, converted params, shared batch)."""
    ed = _stub_module("easydict")
    if not hasattr(ed, "EasyDict"):
        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v
        ed.EasyDict = EasyDict
    _stub_module("utils")
    _stub_module("utils.logger", LOGGER=logging.getLogger("refvast"))
    _stub_module("utils.distributed",
                 concat_all_gather=lambda x: x.detach(),
                 all_gather_with_grad=lambda x: x,
                 all_gather_list=lambda x: [x])
    sys.modules["utils"].logger = sys.modules["utils.logger"]
    sys.modules["utils"].distributed = sys.modules["utils.distributed"]

    import torch.distributed as dist
    saved = (dist.get_rank, torch.Tensor.cuda, torch.Tensor.half)
    dist.get_rank = lambda *a, **k: 0
    # the reference hard-codes .cuda()/.half() in its loss paths
    # (model/vast.py:453-455, general_module.py:94-95)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.half = lambda self: self

    def restore():
        dist.get_rank, torch.Tensor.cuda, torch.Tensor.half = saved
    request.addfinalizer(restore)

    tv = _stub_module("torchvision")
    ops = _stub_module("torchvision.ops")
    misc = _stub_module("torchvision.ops.misc",
                        FrozenBatchNorm2d=torch.nn.Identity)
    tv.ops = ops
    ops.misc = misc
    ref_eva = _load_ref("refevaclip", f"{REF}/model/vision_encoders/evaclip",
                        "eva_vit_model")
    ta = _stub_module("torchaudio")
    comp = _stub_module("torchaudio.compliance")
    kaldi = _stub_module("torchaudio.compliance.kaldi", fbank=None)
    ta.compliance = comp
    comp.kaldi = kaldi
    ref_beats = _load_ref("refbeats", f"{REF}/model/audio_encoders/beats",
                          "beats")
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu
    for name in ("apply_chunking_to_forward",
                 "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    ref_bert = _load_ref("refbert", f"{REF}/model/text_encoders/bert", "bert")
    refvast = _load_ref("refmodel", f"{REF}/model", "vast")

    class _VisWrap(torch.nn.Module):
        """Mimics the CLIP wrapper shape: forward_vision_encoder calls
        self.vision_encoder.visual(...) (general_module.py:383)."""

        def __init__(self, visual):
            super().__init__()
            self.visual = visual

    class TinyRefVAST(refvast.VAST):
        # construct_* overridden ONLY to skip ./pretrained_weights loads;
        # every forward/pool/projection/loss path is reference code.
        def construct_vision_encoder(self):
            self.vision_encoder = _VisWrap(
                _eva_ref_model(ref_eva, TINY_EVA, seed=21))
            self.vision_dim = TINY_EVA.width

        def construct_audio_encoder(self):
            self.audio_encoder = _beats_ref_model(ref_beats, TINY_BEATS,
                                                  seed=22)
            self.audio_dim = TINY_BEATS.encoder_embed_dim

        def construct_multimodal_encoder(self):
            hf = ref_bert.BertConfig(
                vocab_size=170, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=96, is_decoder=True,
                add_cross_attention=True, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0)
            torch.manual_seed(23)
            self.multimodal_encoder = ref_bert.BertForMaskedLM(hf)
            self.multimodal_encoder.tie_weights()
            self.multimodal_dim = 32
            self.multimodal_encoder.tokenizer = _StubTok()
            self.text_masker = refvast.TokenMasker(
                mask_token=MASK, range_start=106, range_end=170)

    edict = ed.EasyDict
    rcfg = edict(dict(
        vision_encoder_type="evaclip01_giant", audio_encoder_type="beats",
        contra_dim=16, max_vision_sample_num=NF, max_audio_sample_num=1,
        checkpointing=False, frozen_vision=False, frozen_audio=False,
        beam_size=3, itm_ratio=0.1, max_omni_caption_len=14,
        max_caption_len=TL, max_subtitle_len=TL,
        frame_embedding_type="adaptive", captioner_mode=False,
        vision_resolution=32))
    torch.manual_seed(7)
    ref = TinyRefVAST(rcfg).eval()

    cfg = tiny_vast_config(max_vision_sample_num=NF)
    ours = VASTModel(cfg)
    params = convert_vast_checkpoint(
        to_numpy_state_dict(ref.state_dict()), cfg)

    # ---- one shared batch, real padding in the text masks
    rs = np.random.RandomState(0)
    pix = rs.randn(B, NF, 3, 32, 32).astype(np.float32)
    spec = rs.randn(B, 1, 64, 16).astype(np.float32)

    def _tokens(lens, total):
        ids = np.full((B, total), PAD, np.int64)
        mask = np.zeros((B, total), np.int64)
        for i, ln in enumerate(lens):
            ids[i, 0] = BOS
            ids[i, 1:ln - 1] = rs.randint(106, 170, ln - 2)
            ids[i, ln - 1] = EOS
            mask[i, :ln] = 1
        return ids, mask

    cap_ids, cap_mask = _tokens([TL, 9, 11], TL)
    sub_ids, sub_mask = _tokens([8, TL, 10], TL)
    q_ids, q_mask = _tokens([7, TL, 9], TL)
    a_ids, a_mask = _tokens([4, 6, 3], AL)

    data = dict(pix=pix, spec=spec, cap=(cap_ids, cap_mask),
                sub=(sub_ids, sub_mask), q=(q_ids, q_mask),
                a=(a_ids, a_mask))
    return types.SimpleNamespace(ref=ref, ours=ours, params=params,
                                 cfg=cfg, edict=edict, data=data)


def _ref_batch(a):
    ed = a.edict
    batch = ed({})
    batch.vision_pixels = torch.tensor(a.data["pix"])
    batch.audio_spectrograms = torch.tensor(a.data["spec"])
    batch.raw_captions = ["x"] * B
    batch.caption_tokens = _TokBatch(
        input_ids=torch.tensor(a.data["cap"][0]),
        attention_mask=torch.tensor(a.data["cap"][1]))
    batch.subtitle_tokens = _TokBatch(
        input_ids=torch.tensor(a.data["sub"][0]),
        attention_mask=torch.tensor(a.data["sub"][1]))
    return batch


def _our_batch(a, **extra):
    d = a.data
    batch = {
        "vision_pixels": jnp.asarray(d["pix"].transpose(0, 1, 3, 4, 2)),
        "audio_spectrograms": jnp.asarray(d["spec"]),
        "caption_tokens": jnp.asarray(d["cap"][0].astype(np.int32)),
        "caption_attention_mask": jnp.asarray(d["cap"][1].astype(np.int32)),
        "subtitle_tokens": jnp.asarray(d["sub"][0].astype(np.int32)),
        "subtitle_attention_mask": jnp.asarray(d["sub"][1].astype(np.int32)),
    }
    batch.update(extra)
    return batch


def test_ret_eval_features_parity(assembled):
    """feat_t, feat_cond_*, condition_feats_* of the assembled model for
    tva + tvas — covers poolers, contra heads, ProjLN projections,
    frame/type embeddings, and concat order in one shot."""
    a = assembled
    with torch.no_grad():
        want = a.ref.forward(dict(_ref_batch(a)), "ret%tv%tva%tvas",
                             compute_loss=False)
    got = a.ours.apply({"params": a.params}, _our_batch(a), "ret%tv%tva%tvas",
                       compute_loss=False)
    for key in ("feat_t", "feat_cond_tv", "feat_cond_tva", "feat_cond_tvas",
                "condition_feats_tv",
                "condition_feats_tva", "condition_feats_tvas"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(),
            atol=2e-4, rtol=1e-4, err_msg=key)


def test_ret_eval_features_parity_tvs(assembled):
    """Subtitle-bearing group WITHOUT audio (tvs): vision+subtitle concat
    order and the subtitle projection path, no audio branch in the
    condition stream (model/vast.py:264-318 group assembly)."""
    a = assembled
    with torch.no_grad():
        want = a.ref.forward(dict(_ref_batch(a)), "ret%tvs",
                             compute_loss=False)
    got = a.ours.apply({"params": a.params}, _our_batch(a), "ret%tvs",
                       compute_loss=False)
    for key in ("feat_t", "feat_cond_tvs", "condition_feats_tvs"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(),
            atol=2e-4, rtol=1e-4, err_msg=key)


def test_ret_train_loss_parity(assembled):
    """loss_itc + loss_itm with the ITM hard negatives pinned to the same
    indices on both sides (torch.multinomial patched / batch hook)."""
    a = assembled
    rs = np.random.RandomState(3)
    n_sub = 2
    neg_cond = rs.randint(0, B, (n_sub, B))
    neg_text = rs.randint(0, B, (n_sub, B))
    seq = []
    for si in range(n_sub):
        seq.extend(neg_cond[si].tolist())  # cond-neg draws come first
        seq.extend(neg_text[si].tolist())  # (model/vast.py:429-439)
    it = iter(seq)
    orig = torch.multinomial
    torch.multinomial = lambda w, n, **k: torch.tensor([next(it)])
    try:
        with torch.no_grad():
            want = a.ref.forward(dict(_ref_batch(a)), "ret%tva%tvas",
                                 compute_loss=True)
    finally:
        torch.multinomial = orig

    got = a.ours.apply(
        {"params": a.params},
        _our_batch(a,
                   itm_neg_cond_idx=jnp.asarray(neg_cond),
                   itm_neg_text_idx=jnp.asarray(neg_text)),
        "ret%tva%tvas", compute_loss=True)
    np.testing.assert_allclose(float(got["loss_itc"]),
                               float(want["loss_itc"]), rtol=2e-4)
    np.testing.assert_allclose(float(got["loss_itm"]),
                               float(want["loss_itm"]), rtol=2e-4)


def _fixed_caption_mask(ids, mask):
    """Deterministic corruption standing in for TokenMasker: every odd
    interior position of each valid caption -> [MASK]."""
    pos = np.arange(ids.shape[1])[None, :]
    lens = mask.sum(1, keepdims=True)
    m = (pos % 2 == 1) & (pos >= 1) & (pos < lens - 1) & (ids != PAD)
    corrupted = np.where(m, MASK, ids)
    labels = np.where(m, ids, -100)
    return corrupted, labels


def test_cap_train_loss_parity(assembled):
    a = assembled
    cap_ids, cap_mask = a.data["cap"]
    corrupted, labels = _fixed_caption_mask(cap_ids, cap_mask)

    class _FixedMasker(torch.nn.Module):
        def forward(self, tokens, prob):
            return torch.tensor(corrupted), torch.tensor(labels)

    saved = a.ref.text_masker
    a.ref.text_masker = _FixedMasker()
    try:
        with torch.no_grad():
            want = a.ref.forward(dict(_ref_batch(a)), "cap%tva%tvas",
                                 compute_loss=True)
    finally:
        a.ref.text_masker = saved

    got = a.ours.apply(
        {"params": a.params},
        _our_batch(a,
                   caption_masked_tokens=jnp.asarray(
                       corrupted.astype(np.int32)),
                   caption_masked_labels=jnp.asarray(
                       labels.astype(np.int32))),
        "cap%tva%tvas", compute_loss=True)
    np.testing.assert_allclose(float(got["loss_cap"]),
                               float(want["loss_cap"]), rtol=2e-4)


def test_qa_train_loss_parity(assembled):
    """loss_qa incl. the part-causal attention mask construction
    (model/vast.py:594-599) and the -100 question labels."""
    a = assembled
    q_ids, q_mask = a.data["q"]
    a_ids, a_mask = a.data["a"]
    # ~prob-0.99 masking: every non-pad answer token except position 0
    m = (np.arange(AL)[None, :] >= 1) & (a_ids != PAD)
    a_corrupted = np.where(m, MASK, a_ids)
    a_labels = np.where(m, a_ids, -100)

    class _FixedMasker(torch.nn.Module):
        def forward(self, tokens, prob):
            return torch.tensor(a_corrupted), torch.tensor(a_labels)

    questions = [f"q{i}" for i in range(B)]
    answers = [f"a{i}" for i in range(B)]
    tok = a.ref.multimodal_encoder.tokenizer
    tok.table[(tuple(questions), TL)] = _TokBatch(
        input_ids=torch.tensor(q_ids), attention_mask=torch.tensor(q_mask))
    tok.table[(tuple(answers), 10)] = _TokBatch(
        input_ids=torch.tensor(a_ids), attention_mask=torch.tensor(a_mask))

    rb = _ref_batch(a)
    rb.raw_questions = questions
    rb.raw_answers = answers
    saved = a.ref.text_masker
    a.ref.text_masker = _FixedMasker()
    try:
        with torch.no_grad():
            want = a.ref.forward(dict(rb), "qa%tva", compute_loss=True)
    finally:
        a.ref.text_masker = saved

    got = a.ours.apply(
        {"params": a.params},
        _our_batch(a,
                   question_tokens=jnp.asarray(q_ids.astype(np.int32)),
                   question_attention_mask=jnp.asarray(
                       q_mask.astype(np.int32)),
                   answer_tokens=jnp.asarray(a_ids.astype(np.int32)),
                   answer_attention_mask=jnp.asarray(a_mask.astype(np.int32)),
                   answer_masked_tokens=jnp.asarray(
                       a_corrupted.astype(np.int32)),
                   answer_masked_labels=jnp.asarray(
                       a_labels.astype(np.int32))),
        "qa%tva", compute_loss=True)
    np.testing.assert_allclose(float(got["loss_qa"]),
                               float(want["loss_qa"]), rtol=2e-4)


def _ref_beam_search(mm, cond, num_beams, max_new, length_penalty):
    """The 4.21-era HF ``beam_search`` loop the reference's
    ``multimodal_encoder.generate`` ran (model/vast.py:536-546), driving
    the fork's REAL prepare_inputs_for_generation / update_attention_mask
    / forward; hypothesis scoring via transformers' own BeamHypotheses
    (retrocompat branch: score = sum_logprobs / len**penalty). The
    installed transformers (4.57) dropped ``generate`` from the fork's
    base class, so the classic outer loop is reproduced here verbatim."""
    from transformers.generation import BeamHypotheses

    b = cond.shape[0]
    input_ids = torch.full((b * num_beams, 1), BOS, dtype=torch.long)
    attention_mask = torch.ones(b * num_beams, 1, 1, dtype=torch.long)
    cond_exp = cond.repeat_interleave(num_beams, dim=0)
    beam_scores = torch.zeros(b, num_beams)
    beam_scores[:, 1:] = -1e9
    beam_scores = beam_scores.view(-1)
    hyps = [BeamHypotheses(num_beams, length_penalty, False,
                           max_length=1 + max_new) for _ in range(b)]
    done = [False] * b
    max_len = 1 + max_new
    while input_ids.shape[-1] < max_len:
        cur_len = input_ids.shape[-1]
        prep = mm.prepare_inputs_for_generation(
            input_ids, attention_mask=attention_mask, position_ids=None,
            encoder_hidden_states=cond_exp)
        out = mm(input_ids=prep["input_ids"],
                 attention_mask=prep["attention_mask"],
                 encoder_hidden_states=prep["encoder_hidden_states"])
        logits = out.logits if hasattr(out, "logits") else out[0]
        scores = torch.log_softmax(logits[:, -1, :].float(), dim=-1)
        vocab = scores.shape[-1]
        next_scores = (scores + beam_scores[:, None]).view(b,
                                                           num_beams * vocab)
        topv, topi = torch.topk(next_scores, 2 * num_beams, dim=1)

        nb_scores = torch.zeros(b, num_beams)
        nb_tokens = torch.full((b, num_beams), PAD, dtype=torch.long)
        nb_idx = torch.zeros(b, num_beams, dtype=torch.long)
        for bi in range(b):
            if done[bi]:
                nb_idx[bi] = bi * num_beams
                continue
            slot = 0
            for rank in range(2 * num_beams):
                tok = int(topi[bi, rank]) % vocab
                beam = int(topi[bi, rank]) // vocab
                batch_beam = bi * num_beams + beam
                if tok == EOS:
                    if rank >= num_beams:
                        continue
                    hyps[bi].add(input_ids[batch_beam].clone(),
                                 float(topv[bi, rank]))
                else:
                    nb_scores[bi, slot] = topv[bi, rank]
                    nb_tokens[bi, slot] = tok
                    nb_idx[bi, slot] = batch_beam
                    slot += 1
                if slot == num_beams:
                    break
            done[bi] = done[bi] or hyps[bi].is_done(
                float(next_scores[bi].max()), cur_len)
        if all(done):
            break
        input_ids = torch.cat(
            [input_ids[nb_idx.view(-1)], nb_tokens.view(-1, 1)], dim=-1)
        attention_mask = prep["attention_mask"][nb_idx.view(-1)]
        beam_scores = nb_scores.view(-1)

    for bi in range(b):
        if done[bi]:
            continue
        for beam in range(num_beams):
            batch_beam = bi * num_beams + beam
            hyps[bi].add(input_ids[batch_beam].clone(),
                         float(beam_scores[batch_beam]))
    decoded = np.full((b, max_len), PAD, np.int64)
    for bi in range(b):
        best = max(hyps[bi].beams, key=lambda x: x[0])[1].numpy()
        decoded[bi, :len(best)] = best
        if len(best) < max_len:
            decoded[bi, len(best)] = EOS
    return decoded


@pytest.fixture(scope="module")
def assembled_ast(assembled):
    """Second assembly: audio_encoder_type='ast' (round-3 verdict #8).

    Depends on ``assembled`` so the sys.modules stubs / torch patches are
    installed; builds a fresh reference VAST whose audio branch is the
    REAL ast.py AudioEmbeddings + TransformerEncoder (general_module.py
    :257-273 construct path, :405-412 permuted forward, :442-447 CLS-pool)
    and converts its state dict through convert_vast_checkpoint's ast
    branch."""
    _stub_module("ipdb")
    ref_ast = _load_ref("refast", f"{REF}/model/audio_encoders/ast", "ast")
    refvast = sys.modules["refmodel.vast"]
    ref_eva = sys.modules["refevaclip.eva_vit_model"]
    ref_bert = sys.modules["refbert.bert"]
    edict = assembled.edict

    # reference AudioEmbeddings hardcodes patch 16 (ast.py:179); melbins 16
    # x target 64 -> 4 patch tokens + CLS
    acfg = edict(dict(
        attention_dropout=0.0, hidden_act="gelu", hidden_dropout=0.0,
        hidden_size=32, initializer_range=0.02, intermediate_size=64,
        num_attention_heads=4, num_hidden_layers=2, checkpointing=False,
        audio_melbins=16, audio_target_length=64))

    class _VisWrap(torch.nn.Module):
        def __init__(self, visual):
            super().__init__()
            self.visual = visual

    class TinyRefVASTAst(refvast.VAST):
        def construct_vision_encoder(self):
            self.vision_encoder = _VisWrap(
                _eva_ref_model(ref_eva, TINY_EVA, seed=31))
            self.vision_dim = TINY_EVA.width

        def construct_audio_encoder(self):
            torch.manual_seed(32)
            self.audio_embeddings = ref_ast.AudioEmbeddings(acfg)
            self.audio_encoder = ref_ast.TransformerEncoder(
                acfg, mode="prenorm")
            self.audio_dim = acfg.hidden_size

        def construct_multimodal_encoder(self):
            hf = ref_bert.BertConfig(
                vocab_size=170, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=96, is_decoder=True,
                add_cross_attention=True, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0)
            torch.manual_seed(33)
            self.multimodal_encoder = ref_bert.BertForMaskedLM(hf)
            self.multimodal_encoder.tie_weights()
            self.multimodal_dim = 32
            self.multimodal_encoder.tokenizer = _StubTok()
            self.text_masker = refvast.TokenMasker(
                mask_token=MASK, range_start=106, range_end=170)

    rcfg = edict(dict(
        vision_encoder_type="evaclip01_giant", audio_encoder_type="ast",
        contra_dim=16, max_vision_sample_num=NF, max_audio_sample_num=1,
        checkpointing=False, frozen_vision=False, frozen_audio=False,
        beam_size=3, itm_ratio=0.1, max_omni_caption_len=14,
        max_caption_len=TL, max_subtitle_len=TL,
        frame_embedding_type="adaptive", captioner_mode=False,
        vision_resolution=32))
    torch.manual_seed(30)
    ref = TinyRefVASTAst(rcfg).eval()

    from vast_tpu.models.ast import AstConfig

    cfg = tiny_vast_config(
        max_vision_sample_num=NF, audio_encoder_type="ast",
        audio_cfg=AstConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            audio_melbins=16, audio_target_length=64,
                            patch_size=16))
    ours = VASTModel(cfg)
    params = convert_vast_checkpoint(
        to_numpy_state_dict(ref.state_dict()), cfg)
    return types.SimpleNamespace(ref=ref, ours=ours, params=params,
                                 cfg=cfg, edict=assembled.edict,
                                 data=assembled.data)


def test_ast_ret_eval_features_parity(assembled_ast):
    """AST assembly: the permuted (mel, frames) patching, CLS-token audio
    pooling (general_module.py:442-447 vs beats' token mean), and the
    audio projection path, through ta AND tva groups."""
    a = assembled_ast
    with torch.no_grad():
        want = a.ref.forward(dict(_ref_batch(a)), "ret%ta%tva",
                             compute_loss=False)
    got = a.ours.apply({"params": a.params}, _our_batch(a), "ret%ta%tva",
                       compute_loss=False)
    for key in ("feat_t", "feat_cond_ta", "feat_cond_tva",
                "condition_feats_ta", "condition_feats_tva"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(),
            atol=2e-4, rtol=1e-4, err_msg=key)


def test_ast_ret_train_loss_parity(assembled_ast):
    """ITC+ITM losses through the AST audio branch, negatives pinned."""
    a = assembled_ast
    rs = np.random.RandomState(5)
    neg_cond = rs.randint(0, B, (1, B))
    neg_text = rs.randint(0, B, (1, B))
    seq = neg_cond[0].tolist() + neg_text[0].tolist()
    it = iter(seq)
    orig = torch.multinomial
    torch.multinomial = lambda w, n, **k: torch.tensor([next(it)])
    try:
        with torch.no_grad():
            want = a.ref.forward(dict(_ref_batch(a)), "ret%ta",
                                 compute_loss=True)
    finally:
        torch.multinomial = orig

    got = a.ours.apply(
        {"params": a.params},
        _our_batch(a,
                   itm_neg_cond_idx=jnp.asarray(neg_cond),
                   itm_neg_text_idx=jnp.asarray(neg_text)),
        "ret%ta", compute_loss=True)
    np.testing.assert_allclose(float(got["loss_itc"]),
                               float(want["loss_itc"]), rtol=2e-4)
    np.testing.assert_allclose(float(got["loss_itm"]),
                               float(want["loss_itm"]), rtol=2e-4)


def test_cap_beam_generation_parity(assembled):
    """Beam-search captions (beam 3, length_penalty 0.6) vs
    models/generation.py, on identical converted weights and identical
    condition features (model/vast.py:536-546)."""
    from vast_tpu.models.generation import GenerationConfig, generate

    a = assembled
    with torch.no_grad():
        cond = a.ref.batch_get(a.edict(dict(_ref_batch(a))),
                               "condition_feats_va")
        out = _ref_beam_search(a.ref.multimodal_encoder, cond, num_beams=3,
                               max_new=TL, length_penalty=0.6)
    want = out[:, 1:]

    gcfg = GenerationConfig(max_new_tokens=TL, num_beams=3, do_sample=False,
                            length_penalty=0.6, bos_id=BOS, eos_id=EOS,
                            pad_id=PAD, mask_id=MASK)
    got = np.asarray(generate(a.ours, a.params,
                              jnp.asarray(cond.numpy()), gcfg))
    for r in range(B):
        for j in range(min(got.shape[1], want.shape[1])):
            assert got[r, j] == want[r, j], (r, j, got[r], want[r])
            if want[r, j] == EOS:
                break
