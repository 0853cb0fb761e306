"""Shared tiny configs + synthetic data builders for tests."""

import jax.numpy as jnp
import numpy as np

from vast_tpu.models.ast import AstConfig
from vast_tpu.models.beats import BeatsConfig
from vast_tpu.models.bert import BertConfig
from vast_tpu.models.clip_vit import ClipVitConfig
from vast_tpu.models.eva_vit import EvaVitConfig
from vast_tpu.models.vast import VASTConfig

TINY_BERT = BertConfig(vocab_size=170, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       max_position_embeddings=96, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)

TINY_EVA = EvaVitConfig(image_size=32, patch_size=8, width=32, layers=2,
                        head_width=8, mlp_ratio=2.0)

TINY_CLIP = ClipVitConfig(image_size=32, patch_size=8, width=32, layers=2,
                          heads=4)

TINY_BEATS = BeatsConfig(input_patch_size=8, embed_dim=24,
                         encoder_embed_dim=32, encoder_layers=2,
                         encoder_ffn_embed_dim=64, encoder_attention_heads=4,
                         conv_pos=16, conv_pos_groups=4, num_buckets=32,
                         max_distance=64)

TINY_AST = AstConfig(hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     audio_melbins=16, audio_target_length=64, patch_size=8)


def tiny_vast_config(**kw):
    defaults = dict(
        vision_encoder_type="evaclip01_giant",
        audio_encoder_type="beats",
        contra_dim=16,
        max_caption_len=12,
        max_subtitle_len=12,
        max_vision_sample_num=2,
        max_audio_sample_num=1,
        vision_resolution=32,
        audio_melbins=16,
        audio_target_length=64,
        vision_cfg=TINY_EVA,
        audio_cfg=TINY_BEATS,
        bert_cfg=TINY_BERT,
    )
    defaults.update(kw)
    return VASTConfig(**defaults)


def tiny_batch(rs=None, b=4, n_frames=2, n_clips=1, text_len=12,
               with_audio=True, with_subtitle=False, with_qa=False):
    rs = rs or np.random.RandomState(0)
    batch = {
        "vision_pixels": jnp.asarray(
            rs.randn(b, n_frames, 32, 32, 3).astype(np.float32)),
        "caption_tokens": jnp.asarray(
            np.concatenate([np.full((b, 1), 101),
                            rs.randint(106, 170, (b, text_len - 2)),
                            np.full((b, 1), 102)], axis=1).astype(np.int32)),
        "caption_attention_mask": jnp.ones((b, text_len), jnp.int32),
    }
    if with_audio:
        batch["audio_spectrograms"] = jnp.asarray(
            rs.randn(b, n_clips, 64, 16).astype(np.float32))
    if with_subtitle:
        batch["subtitle_tokens"] = batch["caption_tokens"]
        batch["subtitle_attention_mask"] = batch["caption_attention_mask"]
    if with_qa:
        batch["question_tokens"] = batch["caption_tokens"]
        batch["question_attention_mask"] = batch["caption_attention_mask"]
        batch["answer_tokens"] = jnp.asarray(
            np.concatenate([np.full((b, 1), 101),
                            rs.randint(106, 170, (b, 4)),
                            np.full((b, 1), 102)], axis=1).astype(np.int32))
        batch["answer_attention_mask"] = jnp.ones((b, 6), jnp.int32)
    return batch


# ----------------------------------------------------------------------
# synthetic on-disk dataset (tiny Flickr/MSR-VTT stand-in)
# ----------------------------------------------------------------------

CAPTION_WORDS = ["a man is running in the park", "two dogs play at the beach",
                 "a woman rides a bike on the street",
                 "a child eats food at the table",
                 "people sing music with a guitar",
                 "a bird jumps over the water",
                 "three cats walk near the house",
                 "the crowd talks under the tree"]


def make_synth_dataset(root, n=16, with_audio=True, eval_caption_lists=False,
                       resolution=32):
    """Creates images + wavs + annotation JSON + COCO annfile under root.

    Returns (anno_path, annfile_path).
    """
    import json
    import os
    import wave as wave_mod

    from PIL import Image

    img_dir = os.path.join(root, "images")
    wav_dir = os.path.join(root, "audios")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(wav_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    annos, coco = [], []
    for i in range(n):
        vid = f"sample{i:03d}"
        img = (rs.rand(40, 48, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, vid + ".jpg"))
        if with_audio:
            sr = 16000
            t = np.arange(sr // 2, dtype=np.float32) / sr
            tone = (np.sin(2 * np.pi * (200 + 50 * i) * t) * 2000).astype(
                np.int16)
            with wave_mod.open(os.path.join(wav_dir, vid + ".wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(tone.tobytes())
        cap = CAPTION_WORDS[i % len(CAPTION_WORDS)]
        anno = {"video_id": vid,
                "caption": [cap] if eval_caption_lists else cap,
                "question": "what is in the video",
                "answer": cap.split()[1]}
        annos.append(anno)
        coco.append({"image_id": vid, "caption": cap, "id": i})
    anno_path = os.path.join(root, "annos.json")
    with open(anno_path, "w") as f:
        json.dump(annos, f)
    annfile = os.path.join(root, "annfile.json")
    with open(annfile, "w") as f:
        json.dump({"annotations": coco}, f)
    return anno_path, annfile


TINY_MODEL_CFG_JSON = {
    "vision_encoder_type": "evaclip01_giant",
    "audio_encoder_type": "beats",
    "contra_dim": 16,
    "max_caption_len": 12,
    "max_subtitle_len": 12,
    "vision_resolution": 32,
    "audio_melbins": 16,
    "audio_target_length": 64,
    "beam_size": 2,
    "itm_rerank_num": 8,
    "vision_cfg": {"image_size": 32, "patch_size": 8, "width": 32,
                   "layers": 2, "head_width": 8, "mlp_ratio": 2.0},
    "audio_cfg": {"input_patch_size": 8, "embed_dim": 24,
                  "encoder_embed_dim": 32, "encoder_layers": 2,
                  "encoder_ffn_embed_dim": 64, "encoder_attention_heads": 4,
                  "conv_pos": 16, "conv_pos_groups": 4, "num_buckets": 32,
                  "max_distance": 64},
    "bert_cfg": {"vocab_size": 200, "hidden_size": 32,
                 "num_hidden_layers": 2, "num_attention_heads": 4,
                 "intermediate_size": 64, "max_position_embeddings": 96,
                 "hidden_dropout_prob": 0.0,
                 "attention_probs_dropout_prob": 0.0},
}


def make_task_config(root, anno_path, annfile, task="ret%tva",
                     batch_size=8, vision_sample_num=1, audio_sample_num=1,
                     steps=6, with_audio=True):
    import json
    import os

    img_dir = os.path.join(root, "images")
    wav_dir = os.path.join(root, "audios")

    def dset(training):
        d = {"type": "annoindexed", "training": training, "name": "synth",
             "txt": anno_path, "vision": img_dir,
             "vision_format": "image_rawimage",
             "vision_sample_num": vision_sample_num,
             "audio_sample_num": audio_sample_num,
             "task": task, "batch_size": batch_size, "n_workers": 2,
             "annfile": annfile}
        if with_audio:
            d["audio"] = wav_dir
        if training:
            d["steps"] = steps
        return d

    cfg = {
        "run_cfg": {"output_dir": os.path.join(root, "output"),
                    "learning_rate": 1e-3, "bf16": False, "fp16": False,
                    "valid_freq": 2, "first_eval": False, "seed": 7,
                    "num_train_steps": steps},
        "model_cfg": dict(TINY_MODEL_CFG_JSON),
        "data_cfg": {"train": [dset(True)], "val": [dset(False)]},
    }
    path = os.path.join(root, "task.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path
