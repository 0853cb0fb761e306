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
