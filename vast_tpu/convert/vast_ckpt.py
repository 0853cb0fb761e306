"""Full VAST PyTorch checkpoint -> flax params, including surgery.

Reference ingestion path: utils/build_model.py:19-61 (strict=False load)
+ MMGeneralModule.modify_checkpoint (model/general_module.py:110-190):
key renames (video->vision, evaclip_model/clip_model->vision_encoder),
frame-embedding 1-D nearest interpolation to the run's sample counts, and
ViT pos-embed 2-D interpolation when the resolution changes.
"""

from __future__ import annotations

import numpy as np

from vast_tpu.convert.torch_ckpt import (
    _dense,
    _embed,
    _ln,
    convert_bert_mlm,
    to_numpy_state_dict,
)


def rename_keys(sd: dict) -> dict:
    """modify_checkpoint's renames (general_module.py:113-124)."""
    out = {}
    for k, v in sd.items():
        if "video" in k:
            k = k.replace("video", "vision")
        if "evaclip_model" in k:
            k = k.replace("evaclip_model", "vision_encoder")
        elif "clip_model" in k:
            k = k.replace("clip_model", "vision_encoder")
        out[k] = v
    return out


def interp_frame_embedding(embed: np.ndarray, n: int) -> np.ndarray:
    """(1, N, D) -> (1, n, D) nearest (general_module.py:129-145)."""
    src = embed.shape[1]
    if src == n:
        return embed
    idx = (np.arange(n) * src // n).astype(np.int32)
    return embed[:, idx]


def interp_pos_embed(pos: np.ndarray, new_grid: int) -> np.ndarray:
    """(P+1, D) cls+grid -> bilinear to new grid (general_module.py:147-181)."""
    import jax

    cls_tok, rest = pos[:1], pos[1:]
    grid = round(len(rest) ** 0.5)
    if grid == new_grid:
        return pos
    rest = rest.reshape(grid, grid, -1)
    rest = np.asarray(jax.image.resize(
        rest, (new_grid, new_grid, rest.shape[-1]), method="bilinear"))
    return np.concatenate([cls_tok, rest.reshape(new_grid ** 2, -1)], axis=0)


# ------------------------------------------------------------------
# encoder converters
# ------------------------------------------------------------------

def convert_eva_vit(sd: dict, prefix: str, layers: int,
                    new_grid: int | None = None) -> dict:
    """EVAVisionTransformer torch weights -> models.eva_vit params."""
    p = prefix
    pos = sd[f"{p}pos_embed"][0]
    if new_grid is not None:
        pos = interp_pos_embed(pos, new_grid)
    out = {
        "patch_embed": {
            "kernel": sd[f"{p}patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{p}patch_embed.proj.bias"],
        },
        "cls_token": sd[f"{p}cls_token"],
        "pos_embed": pos[None],
        "norm": _ln(sd, f"{p}norm"),
    }
    for i in range(layers):
        bp = f"{p}blocks.{i}."
        attn = {}
        if f"{bp}attn.qkv.weight" in sd:
            attn["qkv"] = {"kernel": sd[f"{bp}attn.qkv.weight"].T}
        else:
            attn["q_proj"] = {"kernel": sd[f"{bp}attn.q_proj.weight"].T}
            attn["k_proj"] = {"kernel": sd[f"{bp}attn.k_proj.weight"].T}
            attn["v_proj"] = {"kernel": sd[f"{bp}attn.v_proj.weight"].T}
        if f"{bp}attn.q_bias" in sd:
            attn["q_bias"] = sd[f"{bp}attn.q_bias"]
            attn["v_bias"] = sd[f"{bp}attn.v_bias"]
        if f"{bp}attn.inner_attn_ln.weight" in sd:
            attn["inner_ln"] = _ln(sd, f"{bp}attn.inner_attn_ln")
        attn["proj"] = _dense(sd, f"{bp}attn.proj")
        mlp = {}
        if f"{bp}mlp.w1.weight" in sd:  # swiglu
            mlp["w1"] = _dense(sd, f"{bp}mlp.w1")
            mlp["w2"] = _dense(sd, f"{bp}mlp.w2")
            mlp["w3"] = _dense(sd, f"{bp}mlp.w3")
        else:
            mlp["fc1"] = _dense(sd, f"{bp}mlp.fc1")
            mlp["fc2"] = _dense(sd, f"{bp}mlp.fc2")
        if f"{bp}mlp.ffn_ln.weight" in sd:
            mlp["ffn_ln"] = _ln(sd, f"{bp}mlp.ffn_ln")
        block = {"norm1": _ln(sd, f"{bp}norm1"), "norm2": _ln(sd, f"{bp}norm2"),
                 "attn": attn, "mlp": mlp}
        if f"{bp}gamma_1" in sd:
            block["gamma_1"] = sd[f"{bp}gamma_1"]
            block["gamma_2"] = sd[f"{bp}gamma_2"]
        out[f"block_{i}"] = block
    return out


def convert_clip_vit(sd: dict, prefix: str, layers: int,
                     new_grid: int | None = None) -> dict:
    """OpenAI CLIP VisionTransformer torch weights -> models.clip_vit."""
    p = prefix
    pos = sd[f"{p}positional_embedding"]
    if new_grid is not None:
        pos = interp_pos_embed(pos, new_grid)
    out = {
        "conv1": {"kernel": sd[f"{p}conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd[f"{p}class_embedding"],
        "positional_embedding": pos,
        "ln_pre": _ln(sd, f"{p}ln_pre"),
        "ln_post": _ln(sd, f"{p}ln_post"),
    }
    for i in range(layers):
        bp = f"{p}transformer.resblocks.{i}."
        out[f"block_{i}"] = {
            "ln_1": _ln(sd, f"{bp}ln_1"),
            "in_proj": {"kernel": sd[f"{bp}attn.in_proj_weight"].T,
                        "bias": sd[f"{bp}attn.in_proj_bias"]},
            "out_proj": _dense(sd, f"{bp}attn.out_proj"),
            "ln_2": _ln(sd, f"{bp}ln_2"),
            "c_fc": _dense(sd, f"{bp}mlp.c_fc"),
            "c_proj": _dense(sd, f"{bp}mlp.c_proj"),
        }
    return out


def convert_beats(sd: dict, prefix: str, layers: int) -> dict:
    """BEATs torch weights -> models.beats params."""
    p = prefix
    enc = {
        # torch weight_norm(dim=2): v (out, in/g, k) g (1, 1, k)
        "pos_conv_v": sd[f"{p}encoder.pos_conv.0.weight_v"].transpose(2, 1, 0),
        "pos_conv_g": sd[f"{p}encoder.pos_conv.0.weight_g"].transpose(2, 1, 0),
        "pos_conv_bias": sd[f"{p}encoder.pos_conv.0.bias"],
        "layer_norm": _ln(sd, f"{p}encoder.layer_norm"),
    }
    for i in range(layers):
        lp = f"{p}encoder.layers.{i}."
        attn = {
            "q_proj": _dense(sd, f"{lp}self_attn.q_proj"),
            "k_proj": _dense(sd, f"{lp}self_attn.k_proj"),
            "v_proj": _dense(sd, f"{lp}self_attn.v_proj"),
            "out_proj": _dense(sd, f"{lp}self_attn.out_proj"),
        }
        if f"{lp}self_attn.relative_attention_bias.weight" in sd and i == 0:
            attn["relative_attention_bias"] = _embed(
                sd, f"{lp}self_attn.relative_attention_bias")
        if f"{lp}self_attn.grep_linear.weight" in sd:
            attn["grep_linear"] = _dense(sd, f"{lp}self_attn.grep_linear")
            attn["grep_a"] = sd[f"{lp}self_attn.grep_a"]
        enc[f"layer_{i}"] = {
            "self_attn": attn,
            "self_attn_layer_norm": _ln(sd, f"{lp}self_attn_layer_norm"),
            "fc1": _dense(sd, f"{lp}fc1"),
            "fc2": _dense(sd, f"{lp}fc2"),
            "final_layer_norm": _ln(sd, f"{lp}final_layer_norm"),
        }
    out = {
        "patch_embedding": {
            "kernel": sd[f"{p}patch_embedding.weight"].transpose(2, 3, 1, 0)},
        "layer_norm": _ln(sd, f"{p}layer_norm"),
        "encoder": enc,
    }
    if f"{p}post_extract_proj.weight" in sd:
        out["post_extract_proj"] = _dense(sd, f"{p}post_extract_proj")
    return out


def convert_ast(sd: dict, embed_prefix: str = "audio_embeddings.",
                enc_prefix: str = "audio_encoder.",
                layers: int = 12) -> dict:
    """VAST-with-AST torch weights -> models.ast params.

    The reference stores AST as two submodules — ``audio_embeddings``
    (AudioEmbeddings) and ``audio_encoder`` (TransformerEncoder) with
    q/k/v/out packed as ``attention.linears.{0..3}``
    (model/audio_encoders/ast/ast.py:106-201); here both land under one
    ``audio_encoder`` flax module.
    """
    ep, np_ = embed_prefix, enc_prefix
    out = {
        "first_conv": {
            "kernel": sd[f"{ep}first_conv.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{ep}first_conv.bias"],
        },
        "cls_token": sd[f"{ep}cls_token"],
        "position_embeddings": {
            "embedding": sd[f"{ep}position_embeddings.weight"]},
        "last_layernorm": _ln(sd, f"{np_}last_layernorm"),
    }
    for i in range(layers):
        lp = f"{np_}layer.{i}."
        out[f"layer_{i}"] = {
            "ln1": _ln(sd, f"{lp}layernorm1"),
            "q": _dense(sd, f"{lp}attention.linears.0"),
            "k": _dense(sd, f"{lp}attention.linears.1"),
            "v": _dense(sd, f"{lp}attention.linears.2"),
            "proj": _dense(sd, f"{lp}attention.linears.3"),
            "ln2": _ln(sd, f"{lp}layernorm2"),
            "fc1": _dense(sd, f"{lp}ff_layer.linear1"),
            "fc2": _dense(sd, f"{lp}ff_layer.linear2"),
        }
    return out


def convert_ast_audioset(ast_sd: dict, melbins: int = 64,
                         target_length: int = 1024,
                         layers: int = 12) -> dict:
    """Raw AudioSet AST checkpoint (``module.v.*``) -> models.ast params.

    Reproduces load_ast_model's remap (general_module.py:257-316): drop
    the distill token, split the packed qkv, and bilinearly interpolate
    the (12, 101) positional grid of the released audioset_10_10 model to
    (melbins/16, target_length/16).
    """
    sd = to_numpy_state_dict(ast_sd)
    p = "module.v."
    pos = sd[f"{p}pos_embed"][0]
    cls_pos, grid_pos = pos[0:1], pos[2:]  # [1:2] is the distill token
    grid_pos = grid_pos.reshape(12, 101, -1)
    th, tw = melbins // 16, target_length // 16
    if (th, tw) != (12, 101):
        import jax

        grid_pos = np.asarray(jax.image.resize(
            grid_pos, (th, tw, grid_pos.shape[-1]), method="bilinear"))
    pos = np.concatenate([cls_pos, grid_pos.reshape(th * tw, -1)], axis=0)

    out = {
        "first_conv": {
            "kernel": sd[f"{p}patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{p}patch_embed.proj.bias"],
        },
        "cls_token": sd[f"{p}cls_token"],
        "position_embeddings": {"embedding": pos},
        "last_layernorm": _ln(sd, f"{p}norm"),
    }
    h = sd[f"{p}blocks.0.attn.qkv.weight"].shape[0] // 3
    for i in range(layers):
        bp = f"{p}blocks.{i}."
        qkv_w = sd[f"{bp}attn.qkv.weight"]
        qkv_b = sd.get(f"{bp}attn.qkv.bias")
        layer = {
            "ln1": _ln(sd, f"{bp}norm1"),
            "q": {"kernel": qkv_w[:h].T},
            "k": {"kernel": qkv_w[h:2 * h].T},
            "v": {"kernel": qkv_w[2 * h:].T},
            "proj": _dense(sd, f"{bp}attn.proj"),
            "ln2": _ln(sd, f"{bp}norm2"),
            "fc1": _dense(sd, f"{bp}mlp.fc1"),
            "fc2": _dense(sd, f"{bp}mlp.fc2"),
        }
        if qkv_b is not None:
            layer["q"]["bias"] = qkv_b[:h]
            layer["k"]["bias"] = qkv_b[h:2 * h]
            layer["v"]["bias"] = qkv_b[2 * h:]
        out[f"layer_{i}"] = layer
    return out


def convert_swin(sd: dict, prefix: str, depths) -> dict:
    """Official Swin checkpoint (swin_*_patch4_window7_224_22k.pth['model'])
    -> models.swin params. Reference loads these verbatim into its vendored
    swin.py (general_module.py:528-583); classification head keys are
    dropped (they are unexpected_keys there too)."""
    p = prefix
    out = {
        "patch_embed": {
            "kernel": sd[f"{p}patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{p}patch_embed.proj.bias"],
        },
        "patch_norm": _ln(sd, f"{p}patch_embed.norm"),
        "norm": _ln(sd, f"{p}norm"),
    }
    for si, depth in enumerate(depths):
        for bi in range(depth):
            bp = f"{p}layers.{si}.blocks.{bi}."
            out[f"stage_{si}_block_{bi}"] = {
                "norm1": _ln(sd, f"{bp}norm1"),
                "attn": {
                    "qkv": _dense(sd, f"{bp}attn.qkv"),
                    "proj": _dense(sd, f"{bp}attn.proj"),
                    "relative_position_bias_table":
                        sd[f"{bp}attn.relative_position_bias_table"],
                },
                "norm2": _ln(sd, f"{bp}norm2"),
                "fc1": _dense(sd, f"{bp}mlp.fc1"),
                "fc2": _dense(sd, f"{bp}mlp.fc2"),
            }
        if si < len(depths) - 1:
            dp = f"{p}layers.{si}.downsample."
            out[f"merge_norm_{si}"] = _ln(sd, f"{dp}norm")
            out[f"merge_reduction_{si}"] = {
                "kernel": sd[f"{dp}reduction.weight"].T}
    return out


def convert_videoswin(sd: dict, prefix: str, depths) -> dict:
    """VideoSwin checkpoint (videoswin_base_k600_22k.pth['state_dict'],
    ``backbone.`` prefix already stripped — general_module.py:230-243)
    -> models.videoswin params."""
    p = prefix
    out = {
        "patch_embed": {
            # 3-D conv: torch (C, 3, t, h, w) -> flax (t, h, w, 3, C)
            "kernel":
                sd[f"{p}patch_embed.proj.weight"].transpose(2, 3, 4, 1, 0),
            "bias": sd[f"{p}patch_embed.proj.bias"],
        },
        "patch_norm": _ln(sd, f"{p}patch_embed.norm"),
        "norm": _ln(sd, f"{p}norm"),
    }
    for si, depth in enumerate(depths):
        for bi in range(depth):
            bp = f"{p}layers.{si}.blocks.{bi}."
            out[f"stage_{si}_block_{bi}"] = {
                "norm1": _ln(sd, f"{bp}norm1"),
                "attn": {
                    "qkv": _dense(sd, f"{bp}attn.qkv"),
                    "proj": _dense(sd, f"{bp}attn.proj"),
                    "relative_position_bias_table":
                        sd[f"{bp}attn.relative_position_bias_table"],
                },
                "norm2": _ln(sd, f"{bp}norm2"),
                "fc1": _dense(sd, f"{bp}mlp.fc1"),
                "fc2": _dense(sd, f"{bp}mlp.fc2"),
            }
        if si < len(depths) - 1:
            dp = f"{p}layers.{si}.downsample."
            out[f"merge_norm_{si}"] = _ln(sd, f"{dp}norm")
            out[f"merge_reduction_{si}"] = {
                "kernel": sd[f"{dp}reduction.weight"].T}
    return out


# ------------------------------------------------------------------
# checkpoint file/dir ingestion (utils/build_model.py:19-103)
# ------------------------------------------------------------------

def load_torch_state_dict(path: str) -> dict:
    """torch.load a .pt/.bin checkpoint -> flat numpy state dict.

    Applies the reference's generic unwrapping (build_model.py:40-46):
    strip ``module.`` (DDP) prefixes and descend into a ``model`` sub-key.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # older pickles with config objects inside
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(
            ckpt["model"], dict):
        ckpt = ckpt["model"]
    ckpt = {k.replace("module.", ""): v for k, v in ckpt.items()}
    return to_numpy_state_dict(ckpt)


def find_pretrain_checkpoint(pretrain_dir: str) -> list[str]:
    """Locate the newest weight file(s) under a pretrain output dir.

    Formats, in the reference's priority order (build_model.py:65-103):
    HF-trainer ``checkpoint-N/pytorch_model.bin`` (or the 2-shard
    ``pytorch_model-0000i-of-00002.bin`` pair), else native
    ``ckpt/model_step_N.pt``. Returns the file path(s) to load+merge.
    """
    import os
    import re

    steps = []
    for name in os.listdir(pretrain_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and os.path.isdir(os.path.join(pretrain_dir, name)):
            steps.append(int(m.group(1)))
    if steps:
        cdir = os.path.join(pretrain_dir, f"checkpoint-{max(steps)}")
        single = os.path.join(cdir, "pytorch_model.bin")
        if os.path.exists(single):
            return [single]
        shards = [os.path.join(cdir, f"pytorch_model-{i:05d}-of-00002.bin")
                  for i in (1, 2)]
        if all(os.path.exists(s) for s in shards):
            return shards
    ckpt_dir = os.path.join(pretrain_dir, "ckpt")
    if os.path.isdir(ckpt_dir):
        steps = []
        for name in os.listdir(ckpt_dir):
            m = re.fullmatch(r"model_step_(\d+)\.pt", name)
            if m:
                steps.append(int(m.group(1)))
        if steps:
            return [os.path.join(ckpt_dir, f"model_step_{max(steps)}.pt")]
    raise FileNotFoundError(
        f"no checkpoint-N/pytorch_model*.bin or ckpt/model_step_N.pt "
        f"under {pretrain_dir}")


def ingest_torch_checkpoint(path: str, cfg) -> dict:
    """One .pt/.bin file (or pretrain dir) -> flax params for VASTModel(cfg).

    The CLI entry for finetune-from-pretrain: ``--checkpoint foo.pt`` or
    ``--pretrain_dir <dir>`` land here (reference: build_model.py:25-48).
    """
    import os

    paths = (find_pretrain_checkpoint(path) if os.path.isdir(path)
             else [path])
    sd: dict = {}
    for p in paths:  # 2-shard merge = dict update (build_model.py:79-85)
        sd.update(load_torch_state_dict(p))
    return convert_vast_checkpoint(sd, cfg)


# ------------------------------------------------------------------
# full model
# ------------------------------------------------------------------

def convert_vast_checkpoint(state_dict, cfg) -> dict:
    """Released VAST .pt state dict -> params tree for VASTModel(cfg).

    ``state_dict`` may be torch tensors (converted here) or numpy.
    Applies the reference's checkpoint surgery: renames, frame-embedding
    interpolation to cfg.max_*_sample_num, pos-embed interpolation to
    cfg.vision_resolution.
    """
    sd = rename_keys(to_numpy_state_dict(state_dict))
    vc = cfg.resolved_vision_cfg()
    ac = cfg.resolved_audio_cfg()
    bc = cfg.resolved_bert_cfg()
    new_grid = cfg.vision_resolution // vc.patch_size

    if cfg.vision_encoder_type.startswith("evaclip"):
        vision = convert_eva_vit(sd, "vision_encoder.visual.", vc.layers,
                                 new_grid)
    elif cfg.vision_encoder_type.startswith("videoswin"):
        vision = convert_videoswin(sd, "vision_encoder.", vc.depths)
    elif cfg.vision_encoder_type.startswith("swin"):
        vision = convert_swin(sd, "vision_encoder.", vc.depths)
    else:
        vision = convert_clip_vit(sd, "vision_encoder.visual.", vc.layers,
                                  new_grid)
    if cfg.audio_encoder_type.startswith("beats"):
        audio = convert_beats(sd, "audio_encoder.", ac.encoder_layers)
    else:
        audio = convert_ast(sd, layers=ac.num_hidden_layers)

    mm = convert_bert_mlm(sd, "multimodal_encoder.bert.",
                          "multimodal_encoder.cls.", bc.num_hidden_layers)

    params = {
        "vision_encoder": vision,
        "audio_encoder": audio,
        "multimodal_encoder": mm,
        "contra_temp": sd["contra_temp"],
        "itm_head": {
            "linear1": _dense(sd, "itm_head.linear1"),
            "ln": _ln(sd, "itm_head.layernorm"),
            "linear2": _dense(sd, "itm_head.linear2"),
        },
        "vision_frame_embedding": interp_frame_embedding(
            sd["vision_frame_embedding"], cfg.max_vision_sample_num),
        "audio_frame_embedding": interp_frame_embedding(
            sd["audio_frame_embedding"], cfg.max_audio_sample_num),
        "vision_type_embeddings": sd["vision_type_embeddings"],
        "audio_type_embeddings": sd["audio_type_embeddings"],
        "subtitle_type_embeddings": sd["subtitle_type_embeddings"],
    }
    for head in ("t", "s", "v", "a"):
        params[f"contra_head_{head}"] = {
            "kernel": sd[f"contra_head_{head}.linear.weight"].T}
    for head in ("va", "vs", "vas"):
        params[f"contra_head_{head}"] = _dense(sd, f"contra_head_{head}")
    for mod in ("vision", "audio", "subtitle"):
        params[f"hidden_trans_{mod}_multimodal"] = {
            "dense": _dense(sd, f"hidden_trans_{mod}_multimodal.0"),
            "ln": _ln(sd, f"hidden_trans_{mod}_multimodal.1"),
        }
    return params
