"""Torch checkpoint conversion: EVA/BEATs/full-VAST state dicts built with
torch modules mirroring the released layouts, converted and verified
against our flax modules (structure + numerics where a torch reference
exists in-env)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.helpers import TINY_BEATS, TINY_BERT, TINY_EVA, tiny_vast_config
from vast_tpu.convert.vast_ckpt import (
    convert_beats,
    convert_eva_vit,
    interp_frame_embedding,
    interp_pos_embed,
    rename_keys,
)
from vast_tpu.models.beats import BeatsModel
from vast_tpu.models.eva_vit import EvaVisionTransformer


def make_eva_torch_sd(cfg, prefix="visual.", seed=0):
    """Synthetic state dict with the released EVA layout/shapes."""
    g = torch.Generator().manual_seed(seed)
    w = cfg.width
    all_dim = cfg.num_heads * cfg.head_width
    sd = {
        f"{prefix}patch_embed.proj.weight":
            torch.randn(w, 3, cfg.patch_size, cfg.patch_size, generator=g),
        f"{prefix}patch_embed.proj.bias": torch.randn(w, generator=g),
        f"{prefix}cls_token": torch.randn(1, 1, w, generator=g),
        f"{prefix}pos_embed":
            torch.randn(1, cfg.num_patches + 1, w, generator=g),
        f"{prefix}norm.weight": torch.randn(w, generator=g),
        f"{prefix}norm.bias": torch.randn(w, generator=g),
    }
    for i in range(cfg.layers):
        bp = f"{prefix}blocks.{i}."
        sd[f"{bp}norm1.weight"] = torch.randn(w, generator=g)
        sd[f"{bp}norm1.bias"] = torch.randn(w, generator=g)
        sd[f"{bp}norm2.weight"] = torch.randn(w, generator=g)
        sd[f"{bp}norm2.bias"] = torch.randn(w, generator=g)
        sd[f"{bp}attn.qkv.weight"] = torch.randn(3 * all_dim, w, generator=g)
        sd[f"{bp}attn.q_bias"] = torch.randn(all_dim, generator=g)
        sd[f"{bp}attn.v_bias"] = torch.randn(all_dim, generator=g)
        sd[f"{bp}attn.proj.weight"] = torch.randn(w, all_dim, generator=g)
        sd[f"{bp}attn.proj.bias"] = torch.randn(w, generator=g)
        hidden = int(w * cfg.mlp_ratio)
        sd[f"{bp}mlp.fc1.weight"] = torch.randn(hidden, w, generator=g)
        sd[f"{bp}mlp.fc1.bias"] = torch.randn(hidden, generator=g)
        sd[f"{bp}mlp.fc2.weight"] = torch.randn(w, hidden, generator=g)
        sd[f"{bp}mlp.fc2.bias"] = torch.randn(w, generator=g)
    return {k: v * 0.02 for k, v in sd.items()}


def test_eva_conversion_structure_matches_flax_init():
    cfg = TINY_EVA
    sd = {k: v.numpy() for k, v in make_eva_torch_sd(cfg).items()}
    params = convert_eva_vit(sd, "visual.", cfg.layers)
    model = EvaVisionTransformer(cfg)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    ref = model.init(jax.random.PRNGKey(0), px)["params"]
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    got_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in got_flat}
    assert ref_paths == got_paths
    # converted params actually run
    out = model.apply({"params": params}, jnp.ones_like(px))
    assert np.isfinite(np.asarray(out)).all()


def test_eva_attention_numerics_vs_torch():
    """The fused-qkv + q/v-bias quirk (eva_vit_model.py:305-312) must give
    the same attention output as the torch computation."""
    cfg = dataclasses.replace(TINY_EVA)
    sd_t = make_eva_torch_sd(cfg)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = convert_eva_vit(sd, "visual.", cfg.layers)

    # torch-side manual attention for block 0 on a fixed input
    rs = np.random.RandomState(0)
    x = rs.randn(2, 17, cfg.width).astype(np.float32)
    xt = torch.tensor(x)
    qkv_w = sd_t["visual.blocks.0.attn.qkv.weight"]
    q_bias = sd_t["visual.blocks.0.attn.q_bias"]
    v_bias = sd_t["visual.blocks.0.attn.v_bias"]
    qkv_bias = torch.cat([q_bias, torch.zeros_like(v_bias), v_bias])
    h, d = cfg.num_heads, cfg.head_width
    with torch.no_grad():
        qkv = torch.nn.functional.linear(xt, qkv_w, qkv_bias)
        qkv = qkv.reshape(2, 17, 3, h, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * d ** -0.5, qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(2, 17, h * d)
        proj_w = sd_t["visual.blocks.0.attn.proj.weight"]
        proj_b = sd_t["visual.blocks.0.attn.proj.bias"]
        ref = torch.nn.functional.linear(out, proj_w, proj_b).numpy()

    from vast_tpu.models.eva_vit import EvaAttention
    attn_mod = EvaAttention(cfg)
    got = attn_mod.apply({"params": params["block_0"]["attn"]},
                         jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def make_beats_torch_sd(cfg, seed=0):
    g = torch.Generator().manual_seed(seed)
    e = cfg.encoder_embed_dim
    sd = {
        "patch_embedding.weight": torch.randn(
            cfg.embed_dim, 1, cfg.input_patch_size, cfg.input_patch_size,
            generator=g),
        "layer_norm.weight": torch.randn(cfg.embed_dim, generator=g),
        "layer_norm.bias": torch.randn(cfg.embed_dim, generator=g),
        "post_extract_proj.weight": torch.randn(e, cfg.embed_dim, generator=g),
        "post_extract_proj.bias": torch.randn(e, generator=g),
        "encoder.pos_conv.0.weight_v": torch.randn(
            e, e // cfg.conv_pos_groups, cfg.conv_pos, generator=g),
        "encoder.pos_conv.0.weight_g": torch.randn(1, 1, cfg.conv_pos,
                                                   generator=g).abs(),
        "encoder.pos_conv.0.bias": torch.randn(e, generator=g),
        "encoder.layer_norm.weight": torch.randn(e, generator=g),
        "encoder.layer_norm.bias": torch.randn(e, generator=g),
    }
    for i in range(cfg.encoder_layers):
        lp = f"encoder.layers.{i}."
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{lp}self_attn.{name}.weight"] = torch.randn(e, e, generator=g)
            sd[f"{lp}self_attn.{name}.bias"] = torch.randn(e, generator=g)
        if i == 0:
            sd[f"{lp}self_attn.relative_attention_bias.weight"] = torch.randn(
                cfg.num_buckets, cfg.encoder_attention_heads, generator=g)
        sd[f"{lp}self_attn.grep_linear.weight"] = torch.randn(
            8, cfg.head_dim, generator=g)
        sd[f"{lp}self_attn.grep_linear.bias"] = torch.randn(8, generator=g)
        sd[f"{lp}self_attn.grep_a"] = torch.ones(
            1, cfg.encoder_attention_heads, 1, 1)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{lp}{ln}.weight"] = torch.randn(e, generator=g)
            sd[f"{lp}{ln}.bias"] = torch.randn(e, generator=g)
        sd[f"{lp}fc1.weight"] = torch.randn(cfg.encoder_ffn_embed_dim, e,
                                            generator=g)
        sd[f"{lp}fc1.bias"] = torch.randn(cfg.encoder_ffn_embed_dim,
                                          generator=g)
        sd[f"{lp}fc2.weight"] = torch.randn(e, cfg.encoder_ffn_embed_dim,
                                            generator=g)
        sd[f"{lp}fc2.bias"] = torch.randn(e, generator=g)
    return {k: v * 0.05 for k, v in sd.items()}


@pytest.mark.slow
def test_beats_conversion_and_pos_conv_weight_norm():
    cfg = TINY_BEATS
    sd_t = make_beats_torch_sd(cfg)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = convert_beats(sd, "", cfg.encoder_layers)
    model = BeatsModel(cfg)
    fb = jnp.zeros((1, 64, 16))
    ref = model.init(jax.random.PRNGKey(0), fb)["params"]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths

    # weight-norm parity: effective kernel equals torch's _weight_norm
    with torch.no_grad():
        v = sd_t["encoder.pos_conv.0.weight_v"]
        gp = sd_t["encoder.pos_conv.0.weight_g"]
        eff = torch._weight_norm(v, gp, 2).numpy()  # (out, in/g, k)
    vj = jnp.asarray(params["encoder"]["pos_conv_v"])
    gj = jnp.asarray(params["encoder"]["pos_conv_g"])
    norm = jnp.sqrt(jnp.sum(vj ** 2, axis=(1, 2), keepdims=True) + 1e-12)
    eff_j = np.asarray((gj / norm) * vj).transpose(2, 1, 0)
    np.testing.assert_allclose(eff_j, eff, atol=1e-5, rtol=1e-4)

    out = model.apply({"params": params},
                      jnp.asarray(np.random.RandomState(1).randn(2, 64, 16),
                                  jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_rename_and_interp_surgery():
    sd = {"video_frame_embedding": np.zeros((1, 8, 4)),
          "clip_model.visual.x": np.ones(3),
          "evaclip_model.visual.y": np.ones(3)}
    out = rename_keys(sd)
    assert "vision_frame_embedding" in out
    assert "vision_encoder.visual.x" in out
    assert "vision_encoder.visual.y" in out

    fe = np.arange(8, dtype=np.float32).reshape(1, 8, 1)
    fe4 = interp_frame_embedding(fe, 4)
    np.testing.assert_array_equal(fe4[0, :, 0], [0, 2, 4, 6])

    pos = np.random.RandomState(0).randn(17, 6).astype(np.float32)  # 4x4+cls
    pos8 = interp_pos_embed(pos, 8)
    assert pos8.shape == (65, 6)
    np.testing.assert_array_equal(pos8[0], pos[0])  # cls untouched


def make_ast_vast_sd(cfg, seed=0):
    """Synthetic VAST-with-AST state dict (load_ast_model's target layout,
    general_module.py:257-316)."""
    g = torch.Generator().manual_seed(seed)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "audio_embeddings.cls_token": torch.randn(1, 1, h, generator=g),
        "audio_embeddings.first_conv.weight":
            torch.randn(h, 1, cfg.patch_size, cfg.patch_size, generator=g),
        "audio_embeddings.first_conv.bias": torch.randn(h, generator=g),
        "audio_embeddings.position_embeddings.weight":
            torch.randn(cfg.tokens_per_clip + 1, h, generator=g),
        "audio_encoder.last_layernorm.weight": torch.randn(h, generator=g),
        "audio_encoder.last_layernorm.bias": torch.randn(h, generator=g),
    }
    for i in range(cfg.num_hidden_layers):
        lp = f"audio_encoder.layer.{i}."
        for j in range(4):
            sd[f"{lp}attention.linears.{j}.weight"] = torch.randn(
                h, h, generator=g)
            sd[f"{lp}attention.linears.{j}.bias"] = torch.randn(h, generator=g)
        sd[f"{lp}ff_layer.linear1.weight"] = torch.randn(inter, h, generator=g)
        sd[f"{lp}ff_layer.linear1.bias"] = torch.randn(inter, generator=g)
        sd[f"{lp}ff_layer.linear2.weight"] = torch.randn(h, inter, generator=g)
        sd[f"{lp}ff_layer.linear2.bias"] = torch.randn(h, generator=g)
        for ln in ("layernorm1", "layernorm2"):
            sd[f"{lp}{ln}.weight"] = torch.randn(h, generator=g)
            sd[f"{lp}{ln}.bias"] = torch.randn(h, generator=g)
    return {k: v * 0.05 for k, v in sd.items()}


@pytest.mark.slow
def test_ast_conversion_structure_and_forward():
    from vast_tpu.convert.vast_ckpt import convert_ast
    from vast_tpu.models.ast import AstConfig, AstModel

    cfg = AstConfig(hidden_size=16, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=32,
                    audio_melbins=32, audio_target_length=32)
    sd = {k: v.numpy() for k, v in make_ast_vast_sd(cfg).items()}
    params = convert_ast(sd, layers=cfg.num_hidden_layers)
    model = AstModel(cfg)
    fb = jnp.zeros((1, cfg.audio_target_length, cfg.audio_melbins))
    ref = model.init(jax.random.PRNGKey(0), fb)["params"]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    out = model.apply(
        {"params": params},
        jnp.asarray(np.random.RandomState(1).randn(
            2, cfg.audio_target_length, cfg.audio_melbins), jnp.float32))
    assert out.shape == (2, 1 + cfg.tokens_per_clip, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_ast_audioset_conversion_drops_distill_and_interps_pos():
    from vast_tpu.convert.vast_ckpt import convert_ast_audioset
    from vast_tpu.models.ast import AstConfig, AstModel

    cfg = AstConfig(hidden_size=16, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=32,
                    audio_melbins=32, audio_target_length=32)
    g = torch.Generator().manual_seed(3)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    p = "module.v."
    # released audioset ckpt layout: cls + distill + 12x101 grid pos
    sd = {
        f"{p}cls_token": torch.randn(1, 1, h, generator=g),
        f"{p}dist_token": torch.randn(1, 1, h, generator=g),
        f"{p}pos_embed": torch.randn(1, 2 + 12 * 101, h, generator=g),
        f"{p}patch_embed.proj.weight":
            torch.randn(h, 1, cfg.patch_size, cfg.patch_size, generator=g),
        f"{p}patch_embed.proj.bias": torch.randn(h, generator=g),
        f"{p}norm.weight": torch.randn(h, generator=g),
        f"{p}norm.bias": torch.randn(h, generator=g),
    }
    for i in range(cfg.num_hidden_layers):
        bp = f"{p}blocks.{i}."
        sd[f"{bp}attn.qkv.weight"] = torch.randn(3 * h, h, generator=g)
        sd[f"{bp}attn.qkv.bias"] = torch.randn(3 * h, generator=g)
        sd[f"{bp}attn.proj.weight"] = torch.randn(h, h, generator=g)
        sd[f"{bp}attn.proj.bias"] = torch.randn(h, generator=g)
        sd[f"{bp}mlp.fc1.weight"] = torch.randn(inter, h, generator=g)
        sd[f"{bp}mlp.fc1.bias"] = torch.randn(inter, generator=g)
        sd[f"{bp}mlp.fc2.weight"] = torch.randn(h, inter, generator=g)
        sd[f"{bp}mlp.fc2.bias"] = torch.randn(h, generator=g)
        for ln in ("norm1", "norm2"):
            sd[f"{bp}{ln}.weight"] = torch.randn(h, generator=g)
            sd[f"{bp}{ln}.bias"] = torch.randn(h, generator=g)
    sd = {k: v * 0.05 for k, v in sd.items()}

    params = convert_ast_audioset(sd, cfg.audio_melbins,
                                  cfg.audio_target_length,
                                  layers=cfg.num_hidden_layers)
    # pos embedding interpolated to (2*2 grid + cls); qkv split matches
    assert params["position_embeddings"]["embedding"].shape == (
        cfg.tokens_per_clip + 1, h)
    np.testing.assert_allclose(
        params["position_embeddings"]["embedding"][0],
        sd[f"{p}pos_embed"][0, 0].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        params["layer_0"]["k"]["bias"],
        sd[f"{p}blocks.0.attn.qkv.bias"][h:2 * h].numpy(), atol=1e-6)

    model = AstModel(cfg)
    out = model.apply(
        {"params": params},
        jnp.asarray(np.random.RandomState(2).randn(
            1, cfg.audio_target_length, cfg.audio_melbins), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()
