"""Dry-run of the weights-day runbook (scripts/verify_release_parity.py).

PARITY.md Known-gaps #1 can only be *proven* on a machine with the
released VAST weights; this test keeps the one-command check itself
honest by driving the full runbook path — torch .pt ingest -> retrieval
eval -> caption eval -> range assertion -> JSON report — on a synthetic
release-format checkpoint (pre-surgery names, like the real release) and
a synthetic dataset.
"""

import json
import os

import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from tests.helpers import make_synth_dataset, make_task_config


@pytest.mark.slow
def test_release_parity_dry_run(tmp_path, capsys):
    from scripts.verify_release_parity import main
    from tests.test_ingest import make_full_vast_sd

    root = str(tmp_path)
    anno, annfile = make_synth_dataset(root, n=8)

    def cfg_for(task, name):
        p = make_task_config(root, anno, annfile, task=task, batch_size=4,
                             steps=2)
        cfg = json.load(open(p))
        # match the synthetic release checkpoint (make_full_vast_sd uses
        # the tiny_vast_config shapes: bert vocab 170)
        cfg["model_cfg"]["bert_cfg"]["vocab_size"] = 170
        cfg["model_cfg"]["itm_rerank_num"] = 4
        cfg["run_cfg"]["output_dir"] = os.path.join(root, f"out_{name}")
        out = os.path.join(root, f"{name}.json")
        json.dump(cfg, open(out, "w"))
        return out

    sd, _ = make_full_vast_sd()
    ckpt = os.path.join(root, "released.pt")
    torch.save({"model": sd}, ckpt)

    rc = main(["--checkpoint", ckpt,
               "--ret_config", cfg_for("ret%tva", "ret"),
               "--cap_config", cfg_for("cap%tva", "cap"),
               # random-ish tiny weights: accept any finite value — the
               # dry run certifies the plumbing, not the quality bar
               "--expect_r1", "0:100", "--expect_cider", "0:1000"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, report
    assert report["ok"] and report["ret_ok"] and report["cap_ok"], report
    assert report["video_r1"] is not None
    assert report["CIDEr"] is not None
    # the retrieval number the runbook reports is the ITM-reranked one
    # when present (what the reference reports)
    assert "itm" in report["ret_metric_key"], report


@pytest.mark.slow
def test_release_parity_range_enforced(tmp_path, capsys):
    """Out-of-range metrics must fail the runbook (nonzero exit)."""
    from scripts.verify_release_parity import main
    from tests.test_ingest import make_full_vast_sd

    root = str(tmp_path)
    anno, annfile = make_synth_dataset(root, n=8)
    p = make_task_config(root, anno, annfile, task="ret%tva", batch_size=4,
                         steps=2)
    cfg = json.load(open(p))
    cfg["model_cfg"]["bert_cfg"]["vocab_size"] = 170
    cfg["model_cfg"]["itm_rerank_num"] = 4
    ret_cfg = os.path.join(root, "ret.json")
    json.dump(cfg, open(ret_cfg, "w"))

    sd, _ = make_full_vast_sd()
    ckpt = os.path.join(root, "released.pt")
    torch.save({"model": sd}, ckpt)

    rc = main(["--checkpoint", ckpt, "--ret_config", ret_cfg, "--skip_cap",
               # random weights cannot hit the real release range
               "--expect_r1", "99.5:100"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and not report["ok"], report
