"""Every shipped catalog config must parse AND build its dataloaders.

The catalog roots dataset paths at ``${VAST_DATA:-datasets}`` (expanded by
config.expand_env); this test points VAST_DATA at a synthetic tree, writes
annotation files at exactly the paths each config names, and instantiates
the train/val loaders. Reference analogue: the configs under
/root/reference/config/vast/ are the de-facto public API (SURVEY §2.1).
"""

import glob
import json
import os

import pytest

from vast_tpu.config import expand_env, parse_with_config
from vast_tpu.data.tokenizer import tiny_tokenizer
from vast_tpu.training.pipeline import (create_train_dataloaders,
                                        create_val_dataloaders)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "vast_tpu",
                          "configs")
CATALOG = sorted(
    glob.glob(os.path.join(CONFIG_DIR, "finetune_cfg", "*.json"))
    + glob.glob(os.path.join(CONFIG_DIR, "captioner_cfg", "*.json"))
    + glob.glob(os.path.join(CONFIG_DIR, "pretrain_cfg", "*.json")))

ANNO = [
    {"video_id": f"vid{i:03d}",
     "caption": f"a person does thing number {i}",
     "subtitle": f"someone speaks about {i}",
     "question": "what is happening",
     "answer": "something",
     "question_id": i}
    for i in range(8)
]


def test_expand_env_forms(monkeypatch):
    monkeypatch.delenv("VAST_DATA", raising=False)
    assert expand_env("${VAST_DATA:-datasets}/x") == "datasets/x"
    monkeypatch.setenv("VAST_DATA", "/data")
    assert expand_env("${VAST_DATA:-datasets}/x") == "/data/x"
    assert expand_env({"a": ["${VAST_DATA}"]}) == {"a": ["/data"]}
    assert expand_env(7) == 7


@pytest.mark.parametrize(
    "cfg_path", CATALOG, ids=[os.path.basename(p) for p in CATALOG])
def test_catalog_config_builds(cfg_path, tmp_path, monkeypatch):
    monkeypatch.setenv("VAST_DATA", str(tmp_path))
    opts = parse_with_config(cfg_path)
    # keep loader construction cheap
    opts.run_cfg.gradient_accumulation_steps = 1

    for d in list(opts.data_cfg.train) + list(opts.data_cfg.val):
        assert "${" not in d["txt"], "env placeholder not expanded"
        os.makedirs(os.path.dirname(d["txt"]), exist_ok=True)
        with open(d["txt"], "w") as f:
            json.dump(ANNO, f)
        for key in ("vision", "audio"):
            if key in d:
                os.makedirs(d[key], exist_ok=True)
        d["n_workers"] = 0

    tok = tiny_tokenizer()
    meta = create_train_dataloaders(opts, tok)
    vals = create_val_dataloaders(opts, tok)
    assert len(vals) == len(opts.data_cfg.val)
    assert meta is not None
    assert opts.model_cfg.max_vision_sample_num >= 1
