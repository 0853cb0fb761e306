#!/usr/bin/env python3
"""Released-checkpoint quality-parity check (PARITY.md Known-gaps #1).

One command on any weights-bearing machine: ingest a released VAST .pt,
run retrieval-msrvtt + caption-msrvtt eval, print R@1/CIDEr, and assert
they land in the expected ranges (VAST paper, NeurIPS'23: MSR-VTT t2v
R@1 63.9, caption CIDEr 78.0 — reference computes them via
evaluation/evaluation_mm.py:326-393).

    python scripts/verify_release_parity.py --checkpoint vast.pt \
        --data_root /datasets

Exit code 0 = both metrics in range; 1 = out of range; the JSON line on
stdout carries the measured numbers either way. The dry-run path
(--ret_config/--cap_config overrides + --expect relaxations) is exercised
by tests/test_release_parity.py with a tiny synthetic release-format
checkpoint, so the weights-day invocation is a tested code path, not a
hope.
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_RET = os.path.join(
    REPO, "vast_tpu/configs/finetune_cfg/retrieval-msrvtt.json")
DEFAULT_CAP = os.path.join(
    REPO, "vast_tpu/configs/finetune_cfg/caption-msrvtt.json")


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        elif not isinstance(v, str):
            out[key] = float(v)
    return out


def _pick(flat, substrings, prefer=None):
    """Best metric whose key contains all substrings; prefer keys
    containing `prefer` (e.g. the ITM-reranked retrieval number, which is
    what the reference reports)."""
    cands = {k: v for k, v in flat.items()
             if all(s in k for s in substrings)}
    if prefer:
        preferred = {k: v for k, v in cands.items() if prefer in k}
        if preferred:
            cands = preferred
    if not cands:
        return None, None
    k = max(cands, key=cands.get)
    return k, cands[k]


def run_eval(config, checkpoint, extra):
    """Build model + val loaders from `config`, ingest `checkpoint`, run
    pipeline.test, return the flattened metric dict."""
    import jax

    from vast_tpu.config import get_args
    from vast_tpu.training import pipeline

    with tempfile.TemporaryDirectory() as out_dir:
        argv = ["--config", config, "--mode", "testing",
                "--output_dir", out_dir, "--checkpoint", checkpoint] + extra
        opts = get_args(argv)
        pipeline.initialize(opts)
        tokenizer = pipeline.build_tokenizer(opts)
        model = pipeline.build_model(opts, tokenizer=tokenizer)
        val_loaders = pipeline.create_val_dataloaders(opts, tokenizer)

        from vast_tpu.convert.vast_ckpt import ingest_torch_checkpoint
        params = ingest_torch_checkpoint(checkpoint, model.cfg)

        mesh = None
        if jax.device_count() > 1:
            from vast_tpu.parallel.mesh import create_mesh
            mesh = create_mesh()
        eval_log = pipeline.test(model, opts, tokenizer, val_loaders,
                                 params, mesh=mesh)
        return _flatten(eval_log)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="released torch .pt/.bin (or pretrain dir)")
    p.add_argument("--data_root", default=None,
                   help="datasets root; exported as $VAST_DATA for the "
                        "${VAST_DATA:-datasets} config paths")
    p.add_argument("--ret_config", default=DEFAULT_RET)
    p.add_argument("--cap_config", default=DEFAULT_CAP)
    p.add_argument("--expect_r1", default="58:70",
                   help="lo:hi accepted video R@1 range (paper: 63.9)")
    p.add_argument("--expect_cider", default="70:86",
                   help="lo:hi accepted CIDEr range (paper: 78.0)")
    p.add_argument("--skip_ret", action="store_true")
    p.add_argument("--skip_cap", action="store_true")
    p.add_argument("--extra", nargs="*", default=[],
                   help="extra run.py-style CLI flags for both evals")
    args = p.parse_args(argv)

    if args.data_root:
        os.environ["VAST_DATA"] = args.data_root

    report = {"checkpoint": args.checkpoint, "ok": True}

    if not args.skip_ret:
        flat = run_eval(args.ret_config, args.checkpoint, args.extra)
        key, r1 = _pick(flat, ["video_r1"], prefer="itm")
        lo, hi = map(float, args.expect_r1.split(":"))
        report["ret_metric_key"] = key
        report["video_r1"] = r1
        report["expect_r1"] = [lo, hi]
        report["ret_ok"] = r1 is not None and lo <= r1 <= hi
        report["ok"] &= report["ret_ok"]

    if not args.skip_cap:
        flat = run_eval(args.cap_config, args.checkpoint, args.extra)
        key, cid = _pick(flat, ["CIDEr"])
        lo, hi = map(float, args.expect_cider.split(":"))
        report["cap_metric_key"] = key
        report["CIDEr"] = cid
        report["expect_cider"] = [lo, hi]
        report["cap_ok"] = cid is not None and lo <= cid <= hi
        report["ok"] &= report["cap_ok"]

    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
