#!/usr/bin/env python3
"""Entry point (reference: run.py — the ONLY entry point).

Usage mirrors the reference:
    python run.py --config config/vast/finetune_cfg/retrieval-msrvtt.json \
        [--output_dir ... --mode training|testing --checkpoint ... ...]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    import os

    # multi-host SPMD: every host runs this same entry; initialize the
    # distributed runtime when a coordinator is configured (replaces
    # torch.distributed.launch + NCCL init, utils/initialize.py:14-16)
    if os.environ.get("VAST_COORDINATOR"):
        import jax
        jax.distributed.initialize(
            coordinator_address=os.environ["VAST_COORDINATOR"],
            num_processes=int(os.environ.get("VAST_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("VAST_PROCESS_ID", "0")))

    import jax

    from vast_tpu.config import dump_hps, get_args
    from vast_tpu.logger import LOGGER
    from vast_tpu.training import pipeline
    from vast_tpu.training.saver import restore_params_from

    def load_checkpoint_params(path, model, opts, tokenizer):
        """--checkpoint dispatch: released torch .pt/.bin files and
        pretrain dirs convert through the surgery pipeline
        (utils/build_model.py:25-48); anything else is an orbax dir."""
        from vast_tpu.convert.vast_ckpt import (find_pretrain_checkpoint,
                                                ingest_torch_checkpoint)
        if os.path.isfile(path):
            LOGGER.info("ingesting torch checkpoint %s", path)
            return ingest_torch_checkpoint(path, model.cfg)
        try:
            find_pretrain_checkpoint(path)
            is_pretrain_dir = True
        except (FileNotFoundError, NotADirectoryError):
            is_pretrain_dir = False
        if is_pretrain_dir:
            LOGGER.info("ingesting pretrain dir %s", path)
            return ingest_torch_checkpoint(path, model.cfg)
        from vast_tpu.training.saver import latest_model_dir
        # a training-output ROOT (not the model_step_N dir itself)
        # resolves to its newest saved step, like --pretrain_dir
        path = latest_model_dir(path) or path
        return restore_params_from(
            path, pipeline.init_params(model, opts, tokenizer))

    opts = get_args()
    pipeline.initialize(opts)
    if opts.run_cfg.output_dir and opts.run_cfg.output_dir != "none" \
            and jax.process_index() == 0:  # one writer on shared FS
        dump_hps(opts)

    tokenizer = pipeline.build_tokenizer(opts)
    model = pipeline.build_model(opts, tokenizer=tokenizer)

    val_loaders = pipeline.create_val_dataloaders(opts, tokenizer)

    if opts.run_cfg.mode == "training":
        train_loader = pipeline.create_train_dataloaders(opts, tokenizer)
        state = None
        start_step = 0
        params = None
        if opts.run_cfg.get("checkpoint"):
            params = load_checkpoint_params(opts.run_cfg.checkpoint, model,
                                            opts, tokenizer)
        elif opts.run_cfg.get("pretrain_dir"):
            # finetune-from-pretrain: weights come from the pretrain dir in
            # addition to the inherit_keys config merge (build_model.py:25-27)
            from vast_tpu.convert.vast_ckpt import ingest_torch_checkpoint
            from vast_tpu.training.saver import latest_model_dir
            try:
                params = ingest_torch_checkpoint(opts.run_cfg.pretrain_dir,
                                                 model.cfg)
                LOGGER.info("loaded pretrain weights from %s",
                            opts.run_cfg.pretrain_dir)
            except FileNotFoundError as e:
                # not a torch-format dir: our OWN pretrain outputs save
                # orbax ckpt/model_step_N dirs — the finetune-from-own-
                # pretrain chain must load those too, not just inherit
                # the config (reference loads its native .pt the same
                # way, build_model.py:96-103)
                orbax_dir = latest_model_dir(opts.run_cfg.pretrain_dir)
                if orbax_dir:
                    params = restore_params_from(
                        orbax_dir,
                        pipeline.init_params(model, opts, tokenizer))
                    LOGGER.info("loaded pretrain weights (orbax) from %s",
                                orbax_dir)
                else:
                    LOGGER.warning("pretrain_dir has no weight files (%s); "
                                   "config inherited only", e)
        # --resume is handled INSIDE pipeline.train, after shard_state:
        # restoring first would (a) have the sharding step's optimizer
        # re-init wipe the restored Adam moments on any multi-device run
        # and (b) restore into host-local arrays on pods, which orbax
        # rejects; restoring into the mesh-placed state does neither
        if params is not None:
            from vast_tpu.training.optimizer import build_optimizer
            from vast_tpu.training.step import create_train_state
            tx, _ = build_optimizer(params, opts.run_cfg, opts.model_cfg,
                                    opts.run_cfg.num_train_steps or 1)
            state = create_train_state(params, tx)

        # first_eval / zero_shot run INSIDE pipeline.train, after
        # shard_state and the resume restore: restoring into host-local
        # arrays for a pre-training eval is rejected by orbax on pods
        pipeline.train(model, opts, tokenizer, train_loader, val_loaders,
                       state=state, start_step=start_step)
    elif opts.run_cfg.mode == "testing":
        if opts.run_cfg.get("checkpoint"):
            params = load_checkpoint_params(opts.run_cfg.checkpoint, model,
                                            opts, tokenizer)
        else:
            params = pipeline.init_params(model, opts, tokenizer)
            LOGGER.warning("testing with randomly initialized params "
                           "(no --checkpoint given)")
        pipeline.test(model, opts, tokenizer, val_loaders, params)
    else:
        raise NotImplementedError(opts.run_cfg.mode)


if __name__ == "__main__":
    main()
