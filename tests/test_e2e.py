"""End-to-end: synthetic dataset -> run.py training + testing via the CLI
entry (in-process), exercising config, data, model, losses, eval, ckpt."""

import json
import os
import sys

import numpy as np
import pytest

from tests.helpers import make_synth_dataset, make_task_config


def run_main(argv):
    import run as run_module

    old = sys.argv
    sys.argv = ["run.py"] + argv
    try:
        run_module.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    anno, annfile = make_synth_dataset(root, n=16)
    return root, anno, annfile


@pytest.mark.slow
def test_training_ret_cap_end_to_end(synth):
    root, anno, annfile = synth
    cfg_path = make_task_config(root, anno, annfile, task="ret%tva_cap%tva",
                                steps=4)
    run_main(["--config", cfg_path])
    out = os.path.join(root, "output")
    # hps dumped (doubles as inherit-keys source)
    hps = json.load(open(os.path.join(out, "log", "hps.json")))
    assert hps["model_cfg"]["contra_dim"] == 16
    # checkpoint written at the final step
    ckpts = os.listdir(os.path.join(out, "ckpt"))
    assert any(c.startswith("model_step_") for c in ckpts), ckpts
    # caption predictions dumped
    results_dirs = [d for d in os.listdir(out) if d.startswith("results_test")]
    assert results_dirs


@pytest.mark.slow
def test_resume_continues_from_checkpoint(synth):
    """--resume via the CLI: picks up the step-4 checkpoint written by the
    training test above and trains on to step 6 (restore happens inside
    pipeline.train AFTER shard_state — the round-3 moment-wipe fix)."""
    root, anno, annfile = synth
    # precondition, NOT vacuous: the step-4 checkpoint from the training
    # test must exist, or this would silently train 0->6 from scratch
    assert os.path.isdir(os.path.join(root, "output", "ckpt",
                                      "model_step_4"))
    cfg_path = make_task_config(root, anno, annfile, task="ret%tva_cap%tva",
                                steps=4)
    run_main(["--config", cfg_path, "--resume", "--num_train_steps", "6"])
    ckpts = os.listdir(os.path.join(root, "output", "ckpt"))
    assert "model_step_6" in ckpts, ckpts
    assert "model_step_4" not in ckpts  # delete-previous still applies


@pytest.mark.slow
def test_finetune_from_own_pretrain_dir(synth):
    """The reference's finetune-from-own-pretrain chain
    (build_model.py:96-103): --pretrain_dir pointing at a PREVIOUS run of
    THIS framework must load its orbax ckpt/model_step_N weights (not
    just inherit the config). Proven by equality: finetuning at lr 0
    for 2 steps must write out exactly the pretrain params."""
    import orbax.checkpoint as ocp

    import jax

    root, anno, annfile = synth
    pre_out = os.path.join(root, "output")
    pre_ckpts = [c for c in os.listdir(os.path.join(pre_out, "ckpt"))
                 if c.startswith("model_step_")]
    assert pre_ckpts, "needs the checkpoint from the training test above"
    cfg_path = make_task_config(root, anno, annfile, task="ret%tva", steps=2)
    cfg = json.load(open(cfg_path))
    ft_out = os.path.join(root, "output_ft")
    cfg["run_cfg"]["output_dir"] = ft_out
    p = os.path.join(root, "task_ft.json")
    json.dump(cfg, open(p, "w"))
    run_main(["--config", p, "--pretrain_dir", pre_out,
              "--learning_rate", "0", "--clip_lr", "0", "--new_lr", "0"])
    ft_ckpt = os.path.join(ft_out, "ckpt", "model_step_2")
    assert os.path.isdir(ft_ckpt), os.listdir(os.path.join(ft_out, "ckpt"))
    ckptr = ocp.StandardCheckpointer()
    pre = ckptr.restore(os.path.join(pre_out, "ckpt", sorted(pre_ckpts)[-1]))
    ft = ckptr.restore(ft_ckpt)
    flat_pre = jax.tree_util.tree_leaves_with_path(pre)
    flat_ft = dict(jax.tree_util.tree_leaves_with_path(ft))
    assert len(flat_pre) == len(flat_ft)
    for path_, leaf in flat_pre:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_ft[path_]),
            err_msg=jax.tree_util.keystr(path_))


@pytest.mark.slow
def test_testing_mode_full_eval(synth, capsys):
    root, anno, annfile = synth
    out2 = os.path.join(root, "output_test")
    cfg_path = make_task_config(root, anno, annfile,
                                task="ret%tva_cap%tva_qa%tva", steps=2)
    # rewrite output dir so runs don't clash; a val batch size that does
    # NOT divide the 16 eval samples drives the ragged-final-batch path
    # (evaluation_mm._full_batches repeat-pads to the static shape and
    # trims outputs) through all three eval drivers
    cfg = json.load(open(cfg_path))
    cfg["run_cfg"]["output_dir"] = out2
    cfg["data_cfg"]["val"][0]["batch_size"] = 6
    cfg_path2 = os.path.join(root, "task_test.json")
    json.dump(cfg, open(cfg_path2, "w"))
    run_main(["--config", cfg_path2, "--mode", "testing"])
    # caption metric file exists and has BLEU/CIDEr keys implicitly through
    # logged eval; check generated captions json
    rdir = os.path.join(out2, "results_test_synth")
    files = os.listdir(rdir)
    assert files
    results = json.load(open(os.path.join(rdir, sorted(files)[0])))
    assert {"video_id", "caption"} <= set(results[0])
    # every eval sample captioned exactly once despite the padding
    assert len(results) == 16
    assert len({r["video_id"] for r in results}) == 16


def test_zero_shot_flag(synth):
    root, anno, annfile = synth
    cfg_path = make_task_config(root, anno, annfile, task="ret%tv", steps=2)
    cfg = json.load(open(cfg_path))
    cfg["run_cfg"]["output_dir"] = os.path.join(root, "output_zs")
    cfg["run_cfg"]["zero_shot"] = True
    cfg["run_cfg"]["first_eval"] = True
    p = os.path.join(root, "task_zs.json")
    json.dump(cfg, open(p, "w"))
    run_main(["--config", p])  # must not train (returns after eval)
    assert not os.listdir(os.path.join(root, "output_zs", "ckpt"))


@pytest.mark.slow
def test_captioner_mode_gencap_files(synth):
    """captioner_mode writes the reference's output contract: per-rank
    {video_id: [generate_nums sampled captions]} gencap files and NO
    metrics (evaluation_mm.py:111-154)."""
    root, anno, annfile = synth
    out3 = os.path.join(root, "output_captioner")
    cfg_path = make_task_config(root, anno, annfile, task="cap%tva", steps=2)
    cfg = json.load(open(cfg_path))
    cfg["run_cfg"]["output_dir"] = out3
    cfg["model_cfg"]["captioner_mode"] = True
    cfg["model_cfg"]["generate_nums"] = 2
    p = os.path.join(root, "task_captioner.json")
    json.dump(cfg, open(p, "w"))
    run_main(["--config", p, "--mode", "testing"])
    rdir = os.path.join(out3, "results_test_synth")
    files = [f for f in os.listdir(rdir) if f.startswith("gencap_rank0_")]
    assert files, os.listdir(rdir)
    merged = {}
    for f in files:
        merged.update(json.load(open(os.path.join(rdir, f))))
    assert len(merged) == 16
    assert all(len(v) == 2 for v in merged.values())


@pytest.mark.slow
def test_pretrain_step_from_video_tar(tmp_path):
    """Pretrain-style e2e: a srcindexed VIDEO tar (mp4 members + in-tar
    captions, the reference's webvid/laion streaming layout, IndexSrc.py
    :163-175) trains ret%tv for 2 steps end-to-end through run.py."""
    import runtime

    if not runtime.media_available():
        pytest.skip("native media runtime unavailable")
    from tests.test_src_dataset import make_video_shard

    root = str(tmp_path)
    shard_dir = os.path.join(root, "shards")
    os.makedirs(shard_dir)
    make_video_shard(os.path.join(shard_dir, "v0.tar"), 8, 0, n_frames=24)
    # eval set: tiny annoindexed image dataset (mixed-pipeline pretrain)
    anno, annfile = make_synth_dataset(root, n=8, with_audio=False)
    cfg_path = make_task_config(root, anno, annfile, task="ret%tv",
                                steps=2, with_audio=False)
    cfg = json.load(open(cfg_path))
    cfg["data_cfg"]["train"] = [{
        "type": "srcindexed", "training": True, "name": "webvid_tar",
        "vision": shard_dir, "vision_format": "video_rawvideo",
        # the generated catalog's default wire for rawvideo: packed
        # YUV420 planes, expanded to RGB inside the jitted step — this
        # e2e covers host tar decode -> yuv wire -> device expand -> train
        "pixel_format": "yuv420",
        "vision_sample_num": 2, "task": "ret%tv", "batch_size": 4,
        "steps": 2, "shuffle_buffer": 4,
    }]
    p = os.path.join(root, "task_vtar.json")
    json.dump(cfg, open(p, "w"))
    run_main(["--config", p])
    ckpts = os.listdir(os.path.join(root, "output", "ckpt"))
    assert any(c.startswith("model_step_") for c in ckpts), ckpts
