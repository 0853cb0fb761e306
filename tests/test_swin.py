import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vast_tpu.models.swin import SwinConfig, SwinTransformer, shift_attn_mask
from vast_tpu.models.videoswin import (
    VideoSwinConfig,
    VideoSwinTransformer,
    window_partition_3d,
    window_reverse_3d,
)

TINY_SWIN = SwinConfig(image_size=32, patch_size=4, embed_dim=16,
                       depths=(1, 1), num_heads=(2, 4), window_size=4)

TINY_VSWIN = VideoSwinConfig(patch_size=(2, 4, 4), embed_dim=16,
                             depths=(1, 1), num_heads=(2, 4),
                             window_size=(2, 4, 4))


def test_swin_forward():
    model = SwinTransformer(TINY_SWIN)
    px = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                     jnp.float32)
    params = model.init(jax.random.PRNGKey(0), px)["params"]
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, px)
    # 32/4 = 8 grid, one merge -> 4x4 = 16 tokens, dim 16*2 = 32
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_shift_mask_blocks_cross_region():
    m = shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert m.all(axis=(1, 2)).sum() == 1  # only the top-left window is whole
    assert m[:, np.arange(16), np.arange(16)].all()  # self always visible


def test_videoswin_forward():
    model = VideoSwinTransformer(TINY_VSWIN)
    vid = jnp.asarray(np.random.RandomState(0).randn(2, 4, 32, 32, 3),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), vid)["params"]
    out = model.apply({"params": params}, vid)
    # time_stride=1 + trailing pad keeps T'=T (videoswin.py:354-366);
    # spatial 8x8 -> merge -> 4x4, dim 32
    assert out.shape == (2, 4, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_window_partition_3d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8, 8, 5))
    w = (2, 4, 4)
    parts = window_partition_3d(x, w)
    back = window_reverse_3d(parts, w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(back))


def test_vast_with_videoswin():
    from tests.helpers import TINY_BEATS, TINY_BERT
    from vast_tpu.models.vast import VASTConfig, VASTModel

    cfg = VASTConfig(vision_encoder_type="videoswin_base_k600_22k",
                     contra_dim=16, max_caption_len=12,
                     max_vision_sample_num=2, max_audio_sample_num=1,
                     vision_resolution=32,
                     vision_cfg=dataclasses.replace(TINY_VSWIN),
                     audio_cfg=TINY_BEATS, bert_cfg=TINY_BERT)
    model = VASTModel(cfg)
    rs = np.random.RandomState(0)
    batch = {
        "vision_pixels": jnp.asarray(rs.randn(2, 4, 32, 32, 3), jnp.float32),
        "caption_tokens": jnp.asarray(
            rs.randint(106, 170, (2, 12)).astype(np.int32)),
        "caption_attention_mask": jnp.ones((2, 12), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, "ret%tv",
                        compute_loss=False, deterministic=True)["params"]
    out = model.apply({"params": params}, batch, "ret%tv",
                      compute_loss=False, deterministic=True)
    assert out["feat_cond_tv"].shape == (2, 16)
    assert np.isfinite(np.asarray(out["feat_cond_tv"])).all()
