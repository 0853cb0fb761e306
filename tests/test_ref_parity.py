"""Activation parity against the ACTUAL reference torch modules.

Imports /root/reference's eva_vit_model.py and beats.py (torch is
installed; xformers is absent so the reference's plain-attention path
runs, torchaudio is stubbed — only its kaldi symbol is referenced at
import), random-inits tiny models, converts their real state dicts via
convert/vast_ckpt.py, and asserts forward parity. This is the test the
round-1 synthetic-layout tests couldn't give: a sign/ordering bug in the
fused-qkv split, q/v-bias handling, rope, gated rel-pos, or deep-norm
would pass structure checks but fail here.

Reference files under test: model/vision_encoders/evaclip/eva_vit_model.py
(Attention:226, Block:368, EVAVisionTransformer:488) and
model/audio_encoders/beats/beats.py (BEATs:1084, TransformerEncoder:272).
"""

import importlib
import sys
import types
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"

from tests.helpers import TINY_BEATS, TINY_EVA
from vast_tpu.convert.torch_ckpt import to_numpy_state_dict
from vast_tpu.convert.vast_ckpt import convert_beats, convert_eva_vit
from vast_tpu.models.beats import BeatsModel
from vast_tpu.models.eva_vit import EvaVisionTransformer, EvaVitConfig


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec(name) keeps working
    # (transformers probes optional deps that way)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load_ref(pkg_name, dir_path, module):
    """Import a reference file with relative-import support, bypassing the
    package __init__ (which pulls heavy unrelated deps)."""
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [dir_path]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{module}")


@pytest.fixture(scope="module")
def ref_eva():
    # evaclip/utils.py imports torchvision only for FrozenBatchNorm2d,
    # which the ViT path never instantiates
    tv = _stub_module("torchvision")
    ops = _stub_module("torchvision.ops")
    misc = _stub_module("torchvision.ops.misc",
                        FrozenBatchNorm2d=torch.nn.Identity)
    tv.ops = ops
    ops.misc = misc
    return _load_ref("refevaclip", f"{REF}/model/vision_encoders/evaclip",
                     "eva_vit_model")


@pytest.fixture(scope="module")
def ref_beats():
    # beats.py imports torchaudio.compliance.kaldi at module level but only
    # calls it inside preprocess(), which these tests never invoke
    ta = _stub_module("torchaudio")
    comp = _stub_module("torchaudio.compliance")
    kaldi = _stub_module("torchaudio.compliance.kaldi", fbank=None)
    ta.compliance = comp
    comp.kaldi = kaldi
    return _load_ref("refbeats", f"{REF}/model/audio_encoders/beats",
                     "beats")


def _eva_ref_model(ref_eva, cfg: EvaVitConfig, seed=0):
    torch.manual_seed(seed)
    model = ref_eva.EVAVisionTransformer(
        img_size=cfg.image_size, patch_size=cfg.patch_size, num_classes=16,
        embed_dim=cfg.width, depth=cfg.layers, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        init_values=cfg.ls_init_value, use_mean_pooling=False,
        xattn=False, rope=cfg.rope, postnorm=cfg.postnorm,
        pt_hw_seq_len=cfg.pt_hw_seq_len, intp_freq=cfg.intp_freq,
        naiveswiglu=cfg.swiglu, subln=cfg.subln).eval()
    # make q/v biases nonzero so bias-placement bugs can't hide
    with torch.no_grad():
        for blk in model.blocks:
            if blk.attn.q_bias is not None:
                blk.attn.q_bias.normal_(0, 0.02)
                blk.attn.v_bias.normal_(0, 0.02)
    return model


def _eva_parity(ref_eva, cfg, atol):
    model = _eva_ref_model(ref_eva, cfg)
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x), return_all_features=True).numpy()

    sd = to_numpy_state_dict(model.state_dict())
    params = convert_eva_vit(sd, "", cfg.layers)
    ours = EvaVisionTransformer(cfg)
    got = np.asarray(ours.apply({"params": params},
                                jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-4)


def test_eva01_reference_parity(ref_eva):
    """EVA01-g layout: fused qkv + q/v bias, pre-norm, plain GELU — the
    flagship tower (general_module.py:348)."""
    _eva_parity(ref_eva, TINY_EVA, atol=2e-5)


def test_eva02_reference_parity(ref_eva):
    """EVA02 layout: subln separate q/k/v + inner LN, SwiGLU, 2-D rope with
    frequency interpolation (eva_vit_model.py:305-322, rope.py:79)."""
    cfg = EvaVitConfig(image_size=32, patch_size=8, width=32, layers=2,
                       head_width=8, mlp_ratio=2.0, subln=True, swiglu=True,
                       rope=True, intp_freq=True, pt_hw_seq_len=16)
    _eva_parity(ref_eva, cfg, atol=2e-5)


def test_eva_postnorm_layerscale_parity(ref_eva):
    """EVA02-bigE layout: post-norm blocks + layer-scale gammas."""
    cfg = EvaVitConfig(image_size=32, patch_size=8, width=32, layers=2,
                       head_width=8, mlp_ratio=2.0, postnorm=True,
                       ls_init_value=0.5)
    _eva_parity(ref_eva, cfg, atol=2e-5)


def _beats_ref_model(ref_beats, cfg, seed=0):
    torch.manual_seed(seed)
    rcfg = ref_beats.BEATsConfig({
        "input_patch_size": cfg.input_patch_size,
        "embed_dim": cfg.embed_dim,
        "encoder_layers": cfg.encoder_layers,
        "encoder_embed_dim": cfg.encoder_embed_dim,
        "encoder_ffn_embed_dim": cfg.encoder_ffn_embed_dim,
        "encoder_attention_heads": cfg.encoder_attention_heads,
        "conv_pos": cfg.conv_pos,
        "conv_pos_groups": cfg.conv_pos_groups,
        "deep_norm": cfg.deep_norm,
        "layer_norm_first": cfg.layer_norm_first,
        "relative_position_embedding": cfg.relative_position_embedding,
        "num_buckets": cfg.num_buckets,
        "max_distance": cfg.max_distance,
        "gru_rel_pos": cfg.gru_rel_pos,
        "dropout": 0.0, "attention_dropout": 0.0,
        "activation_dropout": 0.0, "encoder_layerdrop": 0.0,
        "dropout_input": 0.0,
    })
    return ref_beats.BEATs(rcfg).eval()


def test_beats_reference_parity(ref_beats):
    """Full BEATs stack: weight-normed conv pos embedding, first-layer
    shared T5 bucket bias, GRU-gated rel-pos, deep-norm residual scaling
    (beats.py:272-465, :905-915)."""
    cfg = TINY_BEATS
    model = _beats_ref_model(ref_beats, cfg)
    rs = np.random.RandomState(1)
    fb = rs.randn(2, 64, 16).astype(np.float32)  # (B, frames, mel)
    with torch.no_grad():
        ref = model(torch.tensor(fb)).numpy()

    sd = to_numpy_state_dict(model.state_dict())
    params = convert_beats(sd, "", cfg.encoder_layers)
    got = np.asarray(BeatsModel(cfg).apply({"params": params},
                                           jnp.asarray(fb)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def ref_bert():
    """The reference's forked HF BERT (bert.py) — needs shims for the
    absent easydict and for helpers that moved out of
    transformers.modeling_utils after the fork."""
    ed = _stub_module("easydict")
    if not hasattr(ed, "EasyDict"):
        class EasyDict(dict):
            __getattr__ = dict.__getitem__
        ed.EasyDict = EasyDict
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu
    for name in ("apply_chunking_to_forward",
                 "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    return _load_ref("refbert", f"{REF}/model/text_encoders/bert", "bert")


def test_bert_mask_append_decode_parity(ref_bert):
    """Greedy decode vs the reference's [MASK]-append generation protocol
    (prepare_inputs_for_generation + update_attention_mask,
    bert.py:1011-1044), run on the reference's own forked BertForMaskedLM
    with the weights converted into our fixed-shape lax.scan decoder."""
    import transformers

    from tests.helpers import tiny_vast_config
    from vast_tpu.convert.torch_ckpt import convert_bert_mlm
    from vast_tpu.models.bert import BertConfig
    from vast_tpu.models.generation import GenerationConfig, generate
    from vast_tpu.models.vast import VASTModel

    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, is_decoder=True,
        add_cross_attention=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(3)
    ref = ref_bert.BertForMaskedLM(hf_cfg).eval()
    ref.tie_weights()
    BOS, EOS, PAD, MASK = 101, 102, 0, 103
    ref.tokenizer = types.SimpleNamespace(mask_token_id=MASK)

    b, steps = 2, 8
    rs = np.random.RandomState(5)
    cond = rs.randn(b, 4, 32).astype(np.float32)

    # --- reference decode loop: exactly what HF generate does per step
    # (greedy): prepare_inputs appends [MASK] + grows the square mask,
    # full forward, argmax at the appended slot
    ids = torch.full((b, 1), BOS, dtype=torch.long)
    mask = torch.ones(b, 1, 1, dtype=torch.long)
    ref_toks = []
    with torch.no_grad():
        for _ in range(steps):
            prep = ref.prepare_inputs_for_generation(
                ids, attention_mask=mask, position_ids=None,
                encoder_hidden_states=torch.tensor(cond))
            out = ref(input_ids=prep["input_ids"],
                      attention_mask=prep["attention_mask"],
                      encoder_hidden_states=prep["encoder_hidden_states"])
            logits = out.logits if hasattr(out, "logits") else out[0]
            nxt = logits[:, -1].argmax(-1)
            ref_toks.append(nxt.numpy())
            ids = torch.cat([ids, nxt[:, None]], dim=1)
            mask = prep["attention_mask"]
    ref_toks = np.stack(ref_toks, axis=1)  # (B, steps)

    # --- our decoder on the converted weights
    mm_params = convert_bert_mlm(to_numpy_state_dict(ref.state_dict()),
                                 "bert.", "cls.", 2)
    cfg = tiny_vast_config(bert_cfg=BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0))
    model = VASTModel(cfg)
    gcfg = GenerationConfig(max_new_tokens=steps, num_beams=1,
                            do_sample=False, bos_id=BOS, eos_id=EOS,
                            pad_id=PAD, mask_id=MASK)
    # VASTModel.setup eagerly declares these leaf params; generation only
    # reads the multimodal_encoder subtree but apply() validates setup
    z = lambda *s: np.zeros(s, np.float32)
    params = {"multimodal_encoder": mm_params,
              "contra_temp": np.float32(0.07),
              "vision_frame_embedding": z(1, cfg.max_vision_sample_num, 32),
              "audio_frame_embedding": z(1, cfg.max_audio_sample_num, 32),
              "vision_type_embeddings": z(1, 1, 32),
              "audio_type_embeddings": z(1, 1, 32),
              "subtitle_type_embeddings": z(1, 1, 32)}
    got = np.asarray(generate(model, params, jnp.asarray(cond), gcfg))

    # compare up to the first EOS per row (post-EOS slots are pad-filled)
    for r in range(b):
        row_ref, row_got = ref_toks[r], got[r]
        for j in range(steps):
            assert row_got[j] == row_ref[j], (r, j, row_got, row_ref)
            if row_ref[j] == EOS:
                break


def test_swin_reference_parity():
    """Swin tower vs the vendored swin.py (general_module.py:528-583):
    shifted-window attention, relative bias tables, patch merging."""
    ref_swin = _load_ref("refswin", f"{REF}/model/vision_encoders/swin",
                         "swin")
    torch.manual_seed(7)
    ref = ref_swin.SwinTransformer(
        img_size=32, patch_size=4, in_chans=3, num_classes=0, embed_dim=16,
        depths=(2, 2), num_heads=(2, 4), window_size=4, qkv_bias=True,
        ape=False, patch_norm=True).eval()
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()  # (B, L, C)

    from vast_tpu.convert.vast_ckpt import convert_swin
    from vast_tpu.models.swin import SwinConfig, SwinTransformer
    cfg = SwinConfig(image_size=32, patch_size=4, embed_dim=16,
                     depths=(2, 2), num_heads=(2, 4), window_size=4)
    params = convert_swin(to_numpy_state_dict(ref.state_dict()), "",
                          cfg.depths)
    got = np.asarray(SwinTransformer(cfg).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_videoswin_reference_parity():
    """VideoSwin tower vs the vendored videoswin.py
    (general_module.py:230-243): 3-D shifted windows + 3-D bias."""
    ref_vs = _load_ref("refvideoswin",
                       f"{REF}/model/vision_encoders/videoswin", "videoswin")
    torch.manual_seed(9)
    ref = ref_vs.SwinTransformer3D(
        patch_size=(2, 4, 4), embed_dim=16, depths=[2, 2],
        num_heads=[2, 4], window_size=(2, 2, 2), qkv_bias=True,
        drop_path_rate=0.0, patch_norm=True).eval()
    rs = np.random.RandomState(0)
    x = rs.randn(1, 3, 4, 16, 16).astype(np.float32)  # (B, C, T, H, W)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()  # (B, C', T', H', W')
    b, cc, t, h, w = want.shape
    want = want.transpose(0, 2, 3, 4, 1).reshape(b, t, h * w, cc)

    from vast_tpu.convert.vast_ckpt import convert_videoswin
    from vast_tpu.models.videoswin import (VideoSwinConfig,
                                           VideoSwinTransformer)
    cfg = VideoSwinConfig(patch_size=(2, 4, 4), embed_dim=16,
                          depths=(2, 2), num_heads=(2, 4),
                          window_size=(2, 2, 2))
    params = convert_videoswin(to_numpy_state_dict(ref.state_dict()), "",
                               cfg.depths)
    got = np.asarray(VideoSwinTransformer(cfg).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_beats_relative_bias_matches_reference(ref_beats):
    """The bucketed relative bias tensor itself (layer 0 computes, all
    layers share — beats.py:323-326)."""
    cfg = TINY_BEATS
    model = _beats_ref_model(ref_beats, cfg)
    attn = model.encoder.layers[0].self_attn
    n = 16
    with torch.no_grad():
        ref_bias = attn.compute_bias(n, n).numpy()  # (heads, n, n)

    from vast_tpu.models.beats import relative_position_bucket
    rel = np.arange(n)[None, :] - np.arange(n)[:, None]  # memory - query
    buckets = relative_position_bucket(rel, cfg.num_buckets, cfg.max_distance)
    table = attn.relative_attention_bias.weight.detach().numpy()
    got = table[buckets].transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref_bias, atol=1e-6)
