"""PyTorch checkpoint -> JAX pytree conversion.

Ingests the released VAST/HF/BEATs/EVA-CLIP PyTorch weights into this
framework's flax param trees, including the reference's checkpoint surgery
(key renames video->vision etc., frame-embedding and pos-embed
interpolation — model/general_module.py:110-190, utils/build_model.py).

All functions accept a flat ``state_dict``-like mapping of numpy arrays
(call :func:`to_numpy_state_dict` on a torch state dict first) so torch is
only required at ingestion time, never at runtime.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def to_numpy_state_dict(state_dict) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def _dense(sd, name):
    """torch Linear -> flax Dense {'kernel': W.T, 'bias': b}."""
    p = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _embed(sd, name):
    return {"embedding": sd[f"{name}.weight"]}


# --------------------------------------------------------------------
# BERT (HF layout -> vast_tpu.models.bert)
# --------------------------------------------------------------------

def convert_bert_model(sd: Mapping[str, np.ndarray], prefix: str = "bert.",
                       num_layers: int = 12,
                       add_cross_attention: bool = True) -> dict:
    """HF ``BertModel`` weights -> params for ``models.bert.BertModel``."""
    p = prefix
    out = {
        "embeddings": {
            "word_embeddings": _embed(sd, f"{p}embeddings.word_embeddings"),
            "position_embeddings": _embed(sd, f"{p}embeddings.position_embeddings"),
            "token_type_embeddings": _embed(sd, f"{p}embeddings.token_type_embeddings"),
            "ln": _ln(sd, f"{p}embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}."
        layer = {
            "attention": {
                "query": _dense(sd, f"{lp}attention.self.query"),
                "key": _dense(sd, f"{lp}attention.self.key"),
                "value": _dense(sd, f"{lp}attention.self.value"),
                "out": _dense(sd, f"{lp}attention.output.dense"),
                "out_ln": _ln(sd, f"{lp}attention.output.LayerNorm"),
            },
            "mlp": {
                "intermediate": _dense(sd, f"{lp}intermediate.dense"),
                "output": _dense(sd, f"{lp}output.dense"),
                "output_ln": _ln(sd, f"{lp}output.LayerNorm"),
            },
        }
        if add_cross_attention and f"{lp}crossattention.self.query.weight" in sd:
            layer["crossattention"] = {
                "query": _dense(sd, f"{lp}crossattention.self.query"),
                "key": _dense(sd, f"{lp}crossattention.self.key"),
                "value": _dense(sd, f"{lp}crossattention.self.value"),
                "out": _dense(sd, f"{lp}crossattention.output.dense"),
                "out_ln": _ln(sd, f"{lp}crossattention.output.LayerNorm"),
            }
        out[f"layer_{i}"] = layer
    return out


def convert_bert_mlm(sd: Mapping[str, np.ndarray], bert_prefix: str = "bert.",
                     cls_prefix: str = "cls.", num_layers: int = 12) -> dict:
    """HF ``BertForMaskedLM`` -> params for ``models.bert.BertForMaskedLM``."""
    out = {
        "bert": convert_bert_model(sd, bert_prefix, num_layers),
        "cls": {
            "transform": _dense(sd, f"{cls_prefix}predictions.transform.dense"),
            "transform_ln": _ln(sd, f"{cls_prefix}predictions.transform.LayerNorm"),
        },
    }
    bias_key = f"{cls_prefix}predictions.bias"
    if bias_key in sd:
        out["decoder_bias"] = sd[bias_key]
    else:
        vocab = sd[f"{bert_prefix}embeddings.word_embeddings.weight"].shape[0]
        out["decoder_bias"] = np.zeros((vocab,), np.float32)
    return out
