"""Checkpoint ingestion: released-format torch checkpoints -> flax params.

Covers the reference's three load formats (utils/build_model.py:25-103):
an explicit ``--checkpoint foo.pt`` file, an HF-trainer pretrain dir
(``checkpoint-N/pytorch_model.bin``, incl. the 2-shard variant), and a
native pretrain dir (``ckpt/model_step_N.pt``) — plus the checkpoint
surgery renames (video->vision, evaclip_model->vision_encoder).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.helpers import TINY_BEATS, TINY_EVA, tiny_batch, tiny_vast_config
from tests.test_convert import make_beats_torch_sd, make_eva_torch_sd
from vast_tpu.convert.vast_ckpt import (
    convert_vast_checkpoint,
    find_pretrain_checkpoint,
    ingest_torch_checkpoint,
)
from vast_tpu.models.vast import VASTModel


def make_full_vast_sd(seed=0):
    """Synthetic full-VAST state dict in the released layout, using the
    pre-surgery names (video_*, evaclip_model.*) so the rename path runs."""
    g = torch.Generator().manual_seed(seed)
    cfg = tiny_vast_config()

    sd = dict(make_eva_torch_sd(TINY_EVA, prefix="evaclip_model.visual.",
                                seed=seed))
    sd.update({f"audio_encoder.{k}": v
               for k, v in make_beats_torch_sd(TINY_BEATS, seed=seed).items()})

    hf_cfg = transformers.BertConfig(
        vocab_size=170, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=96, is_decoder=True,
        add_cross_attention=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, attn_implementation="eager")
    hf = transformers.BertForMaskedLM(hf_cfg).eval()
    hf.tie_weights()
    sd.update({f"multimodal_encoder.{k}": v.clone()
               for k, v in hf.state_dict().items()})

    d, mm = cfg.contra_dim, 32
    vision_dim = audio_dim = 32

    def lin(i, o, bias=True):
        out = {"weight": torch.randn(o, i, generator=g) * 0.05}
        if bias:
            out["bias"] = torch.randn(o, generator=g) * 0.05
        return out

    def put(name, t):
        sd[name] = t

    put("contra_temp", torch.tensor(0.07))
    for head, i in (("t", mm), ("s", mm), ("v", vision_dim), ("a", audio_dim)):
        put(f"contra_head_{head}.linear.weight",
            torch.randn(d, i, generator=g) * 0.05)
    for head, i in (("va", vision_dim + audio_dim),
                    ("vs", vision_dim + mm),
                    ("vas", vision_dim + audio_dim + mm)):
        for k, v in lin(i, d).items():
            put(f"contra_head_{head}.{k}", v)
    for k, v in lin(mm, mm).items():
        put(f"itm_head.linear1.{k}", v)
    put("itm_head.layernorm.weight", torch.ones(mm))
    put("itm_head.layernorm.bias", torch.zeros(mm))
    for k, v in lin(mm, 2).items():
        put(f"itm_head.linear2.{k}", v)
    # pre-surgery names: "video" -> "vision"; 8 frames interp to max 2
    put("video_frame_embedding", torch.randn(1, 8, mm, generator=g) * 0.02)
    put("audio_frame_embedding",
        torch.randn(1, cfg.max_audio_sample_num, mm, generator=g) * 0.02)
    for mod in ("video", "audio", "subtitle"):
        put(f"{mod}_type_embeddings", torch.randn(1, 1, mm, generator=g) * .02)
        for k, v in lin(
                {"video": vision_dim, "audio": audio_dim,
                 "subtitle": mm}[mod], mm).items():
            put(f"hidden_trans_{mod}_multimodal.0.{k}", v)
        put(f"hidden_trans_{mod}_multimodal.1.weight", torch.ones(mm))
        put(f"hidden_trans_{mod}_multimodal.1.bias", torch.zeros(mm))
    return sd, cfg


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): np.shape(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture(scope="module")
def full_sd_cfg():
    return make_full_vast_sd()


@pytest.mark.slow
def test_full_conversion_matches_model_init(full_sd_cfg):
    sd, cfg = full_sd_cfg
    params = convert_vast_checkpoint(sd, cfg)
    model = VASTModel(cfg)
    from vast_tpu.config import EasyDict
    from vast_tpu.training.pipeline import init_params
    ref = init_params(model, EasyDict(run_cfg={"seed": 0}), tokenizer=None)
    assert _tree_paths(ref) == _tree_paths(params)

    out = model.apply({"params": params}, tiny_batch(b=2), "ret%tva",
                      compute_loss=False, deterministic=True)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_frame_embedding_interpolated(full_sd_cfg):
    sd, cfg = full_sd_cfg
    params = convert_vast_checkpoint(sd, cfg)
    assert params["vision_frame_embedding"].shape == (1, 2, 32)
    # nearest pick from the 8-slot source (general_module.py:129-145)
    src = sd["video_frame_embedding"].numpy()
    np.testing.assert_allclose(params["vision_frame_embedding"][0, 1],
                               src[0, 4], rtol=1e-6)


def test_pretrain_dir_hf_single(tmp_path, full_sd_cfg):
    sd, cfg = full_sd_cfg
    d = tmp_path / "pre"
    (d / "checkpoint-80").mkdir(parents=True)
    (d / "checkpoint-200").mkdir()
    torch.save(sd, d / "checkpoint-80" / "pytorch_model.bin")
    torch.save(sd, d / "checkpoint-200" / "pytorch_model.bin")
    found = find_pretrain_checkpoint(str(d))
    assert found == [str(d / "checkpoint-200" / "pytorch_model.bin")]
    params = ingest_torch_checkpoint(str(d), cfg)
    assert params["vision_frame_embedding"].shape == (1, 2, 32)


def test_pretrain_dir_hf_two_shard(tmp_path, full_sd_cfg):
    sd, cfg = full_sd_cfg
    d = tmp_path / "pre"
    (d / "checkpoint-10").mkdir(parents=True)
    keys = sorted(sd)
    half = len(keys) // 2
    torch.save({k: sd[k] for k in keys[:half]},
               d / "checkpoint-10" / "pytorch_model-00001-of-00002.bin")
    torch.save({k: sd[k] for k in keys[half:]},
               d / "checkpoint-10" / "pytorch_model-00002-of-00002.bin")
    found = find_pretrain_checkpoint(str(d))
    assert len(found) == 2
    params = ingest_torch_checkpoint(str(d), cfg)
    assert "multimodal_encoder" in params


def test_pretrain_dir_native_and_module_prefix(tmp_path, full_sd_cfg):
    sd, cfg = full_sd_cfg
    d = tmp_path / "pre"
    (d / "ckpt").mkdir(parents=True)
    # DDP-saved checkpoints carry module. prefixes (build_model.py:40)
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    torch.save(wrapped, d / "ckpt" / "model_step_5.pt")
    torch.save(wrapped, d / "ckpt" / "model_step_90.pt")
    found = find_pretrain_checkpoint(str(d))
    assert found == [str(d / "ckpt" / "model_step_90.pt")]
    params = ingest_torch_checkpoint(str(d), cfg)
    assert params["contra_temp"].shape == ()


def test_pretrain_dir_missing_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        find_pretrain_checkpoint(str(tmp_path / "empty"))


@pytest.mark.slow
def test_checkpoint_file_then_train_step(tmp_path, full_sd_cfg):
    """Finetune-from-pretrain: ingest a released-format .pt and take a
    real optimizer step (the --checkpoint CLI path, run.py)."""
    sd, cfg = full_sd_cfg
    p = tmp_path / "vast.pt"
    torch.save(sd, p)
    params = ingest_torch_checkpoint(str(p), cfg)

    import optax

    from vast_tpu.models.vast import VASTModel
    from vast_tpu.training.step import create_train_state, make_train_step

    model = VASTModel(cfg)
    tx = optax.adamw(1e-4)
    state = create_train_state(params, tx)
    step = make_train_step(model, tx, "ret%tva")
    state, metrics = step(state, dict(tiny_batch(b=4)),
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
