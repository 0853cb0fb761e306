import json
import os

import pytest

from vast_tpu.config import (
    EasyDict,
    get_args,
    parse_task_string,
    parse_with_config,
)

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "vast_tpu", "configs")


def write_task_cfg(tmp_path, run=None, model=None, data=None):
    cfg = {
        "run_cfg": {"default": os.path.join(CFG_DIR, "default_run_cfg.json"),
                    **(run or {})},
        "model_cfg": {"default": os.path.join(CFG_DIR, "default_model_cfg.json"),
                      **(model or {})},
        "data_cfg": data or {"train": [], "val": [
            {"type": "annoindexed", "training": False, "name": "d",
             "task": "ret%tv", "batch_size": 4}]},
    }
    p = tmp_path / "task.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_task_string_grammar():
    heads = parse_task_string("ret%tvas%tvs%tv%ta_cap%tvas%tvs%tv%ta")
    assert heads[0] == ("ret", ["tvas", "tvs", "tv", "ta"])
    assert heads[1] == ("cap", ["tvas", "tvs", "tv", "ta"])
    with pytest.raises(ValueError):
        parse_task_string("ret%bogus")


def test_layered_merge_and_cli_override(tmp_path):
    path = write_task_cfg(
        tmp_path,
        run={"learning_rate": 2e-5},
        model={"contra_dim": 256},
    )
    opts = parse_with_config(path)
    assert opts.run_cfg.learning_rate == 2e-5
    assert opts.model_cfg.contra_dim == 256
    # defaults survive where not overridden
    assert opts.run_cfg.optim == "adamw"
    assert opts.model_cfg.itm_ratio == 0.1

    # CLI overrides only when the flag was explicitly given
    opts = parse_with_config(path, {"learning_rate": 9e-9}, explicit_keys=set())
    assert opts.run_cfg.learning_rate == 2e-5
    opts = parse_with_config(path, {"learning_rate": 9e-9},
                             explicit_keys={"learning_rate"})
    assert opts.run_cfg.learning_rate == 9e-9


def test_derived_sample_nums_and_bf16_rule(tmp_path):
    data = {
        "train": [
            {"type": "annoindexed", "training": True, "name": "a",
             "task": "ret%tv", "batch_size": 8, "vision_sample_num": 8,
             "audio_sample_num": 2},
        ],
        "val": [
            {"type": "annoindexed", "training": False, "name": "a",
             "task": "ret%tv", "batch_size": 8, "vision_sample_num": 16,
             "audio_sample_num": 1},
        ],
    }
    path = write_task_cfg(tmp_path, data=data)
    opts = parse_with_config(path)
    assert opts.model_cfg.max_vision_sample_num == 8  # train list wins
    assert opts.model_cfg.max_audio_sample_num == 2
    assert opts.run_cfg.fp16 is False  # bf16 default disables fp16


def test_pretrain_inherit_keys(tmp_path):
    pretrain_dir = tmp_path / "pt"
    (pretrain_dir / "log").mkdir(parents=True)
    hps = {"model_cfg": {"vision_encoder_type": "clip_vit_base_16",
                         "audio_encoder_type": "ast",
                         "audio_melbins": 64,
                         "audio_target_length": 512,
                         "contra_dim": 1234}}
    (pretrain_dir / "log" / "hps.json").write_text(json.dumps(hps))
    path = write_task_cfg(tmp_path)
    opts = parse_with_config(path, {"pretrain_dir": str(pretrain_dir)},
                             explicit_keys={"pretrain_dir"})
    assert opts.model_cfg.vision_encoder_type == "clip_vit_base_16"
    assert opts.model_cfg.audio_encoder_type == "ast"
    assert opts.model_cfg.audio_target_length == 512
    # contra_dim is NOT in inherit_keys -> stays default
    assert opts.model_cfg.contra_dim == 512


def test_cli_fanout_flags(tmp_path):
    data = {
        "train": [{"type": "annoindexed", "training": True, "name": "a",
                   "task": "ret%tv", "batch_size": 8}],
        "val": [{"type": "annoindexed", "training": False, "name": "a",
                 "task": "ret%tv", "batch_size": 8}],
    }
    path = write_task_cfg(tmp_path, data=data)
    opts = get_args(["--config", path, "--train_batch_size", "32",
                     "--test_task", "ret%tva"])
    assert opts.data_cfg.train[0].batch_size == 32
    assert opts.data_cfg.val[0].task == "ret%tva"


def test_easydict_nesting():
    d = EasyDict({"a": {"b": [{"c": 1}]}})
    assert d.a.b[0].c == 1
    d.x = {"y": 2}
    assert d.x.y == 2
