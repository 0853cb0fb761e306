"""Train step: convergence, multi-device equivalence, optimizer groups,
checkpoint save/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import tiny_batch, tiny_vast_config
from vast_tpu.config import EasyDict
from vast_tpu.models.vast import VASTModel
from vast_tpu.parallel.mesh import create_mesh, shard_batch
from vast_tpu.training.optimizer import build_optimizer, param_labels
from vast_tpu.training.saver import ModelSaver
from vast_tpu.training.sched import get_lr_ratio
from vast_tpu.training.step import (
    TrainState,
    create_train_state,
    make_train_step,
    shard_state,
)

RUN_CFG = EasyDict({
    "learning_rate": 1e-3, "clip_lr": 1e-3, "new_lr": 0.0,
    "new_params_name": [], "betas": [0.9, 0.98], "weight_decay": 0.01,
    "optim": "adamw", "scheduler": "warmup_linear", "warmup_ratio": 0.1,
})
MODEL_CFG = EasyDict({"vision_encoder_type": "evaclip01_giant"})


def build(task="ret%tva", seed=0):
    cfg = tiny_vast_config()
    model = VASTModel(cfg)
    batch = tiny_batch(b=8, with_subtitle=True, with_qa=True)
    params = model.init(
        {"params": jax.random.PRNGKey(seed)}, batch,
        "ret%tvas%tvs%tva%tv%ta_cap%tvas_qa%tvas", compute_loss=True,
        deterministic=True,
        step_rngs={"mask": jax.random.PRNGKey(2),
                   "negatives": jax.random.PRNGKey(3)})["params"]
    tx, labels = build_optimizer(params, RUN_CFG, MODEL_CFG, 100)
    state = create_train_state(params, tx)
    step = make_train_step(model, tx, task)
    return model, state, step, batch, labels


@pytest.mark.slow
def test_loss_decreases_over_steps():
    model, state, step, batch, _ = build("ret%tva_cap%tva")
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
@pytest.mark.parametrize(
    "policy", ["full", "dots", "attn", "attn_offload", "dots_offload"])
def test_remat_policy_grads_match_no_remat(policy):
    """Remat must be a memory/compute trade only: gradients under every
    policy equal the no-remat gradients. 'attn' is the flagship default
    (the only selective policy fitting one v5e — vast.py VASTConfig);
    the *_offload policies park residuals in pinned host memory."""
    import dataclasses

    from tests.helpers import tiny_vast_config

    batch = tiny_batch(b=4)
    rngs = {"mask": jax.random.PRNGKey(2), "negatives": jax.random.PRNGKey(3)}

    def grads(cfg):
        model = VASTModel(cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, batch,
                            "ret%tva", compute_loss=True, deterministic=True,
                            step_rngs=rngs)["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, batch, "ret%tva",
                              compute_loss=True, deterministic=True,
                              step_rngs=rngs)
            return sum(jnp.asarray(v) for v in out.values())

        return params, jax.grad(loss_fn)(params)

    base_cfg = tiny_vast_config()
    p0, g0 = grads(dataclasses.replace(base_cfg, checkpointing=False))
    p1, g1 = grads(dataclasses.replace(base_cfg, checkpointing=True,
                                       remat_policy=policy))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6),
        g0, g1)


def test_sched_ratios():
    assert get_lr_ratio(0, 100, "warmup_linear", 0.1) == 0.0
    assert get_lr_ratio(10, 100, "warmup_linear", 0.1) == 1.0
    assert abs(get_lr_ratio(55, 100, "warmup_linear", 0.1) - 0.5) < 1e-9
    assert get_lr_ratio(100, 100, "warmup_linear", 0.1) == 0.0


def test_param_group_labels():
    # labels depend only on the param tree structure — eval_shape the init
    # instead of compiling the full multi-head init program
    cfg = tiny_vast_config()
    model = VASTModel(cfg)
    batch = tiny_batch(b=8, with_subtitle=True, with_qa=True)
    shapes = jax.eval_shape(
        lambda r: model.init(
            {"params": r}, batch, "ret%tvas%tvs%tva%tv%ta_cap%tvas_qa%tvas",
            compute_loss=True, deterministic=True,
            step_rngs={"mask": jax.random.PRNGKey(2),
                       "negatives": jax.random.PRNGKey(3)}),
        jax.random.PRNGKey(0))["params"]
    labels = param_labels(shapes, (), vision_is_clip=True)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    groups = {}
    for path, lab in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        groups.setdefault(lab, []).append(".".join(keys))
    # vision encoder -> clip groups (evaclip type)
    assert all(p.startswith("vision_encoder") for p in groups["clip"])
    assert any("bias" in p for p in groups["clip_nd"])
    # LayerNorm scales land in no-decay
    assert any(p.endswith("scale") for p in groups["basic_nd"])
    assert not any(p.endswith("scale") for p in groups.get("basic", []))


@pytest.mark.slow
def test_multidevice_matches_single_device():
    """The global-batch loss must be identical when the batch is sharded
    over an 8-device dp mesh (GSPMD inserts the gathers)."""
    model, state, step, batch, _ = build("ret%tva")
    rng = jax.random.PRNGKey(0)

    # single-device result
    s1, m1 = step(state, batch, rng)

    # sharded result
    mesh = create_mesh(dp=8)
    model2, state2, step2, _, _ = build("ret%tva")
    state2 = shard_state(mesh, state2)
    sbatch = shard_batch(mesh, batch)
    s2, m2 = step2(state2, sbatch, rng)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                   err_msg=k)
    # params after update match too
    d1 = jax.tree.leaves(s1.params)
    d2 = jax.tree.leaves(s2.params)
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_fsdp_sharding_runs():
    mesh = create_mesh(dp=4, fsdp=2)
    model, state, step, batch, _ = build("ret%tva")
    state = shard_state(mesh, state, fsdp=True)
    sbatch = shard_batch(mesh, batch)
    state, metrics = step(state, sbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def light_state(seed=0):
    """Train state without compiling the multi-head init or a train step
    (those cost ~2.5 min of the fast tier): eval_shape the init, fill
    params randomly in one cheap jit, then one apply_gradients with
    synthetic grads so the optimizer moments/step are nonzero."""
    cfg = tiny_vast_config()
    model = VASTModel(cfg)
    batch = tiny_batch(b=2)
    shapes = jax.eval_shape(
        lambda r: model.init({"params": r}, batch, "ret%tva",
                             compute_loss=False, deterministic=True),
        jax.random.PRNGKey(0))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def fill(rng):
        keys = jax.random.split(rng, len(leaves))
        return [jax.random.normal(k, l.shape, l.dtype) * 0.02
                for k, l in zip(keys, leaves)]

    params = jax.tree_util.tree_unflatten(treedef,
                                          fill(jax.random.PRNGKey(seed)))
    tx, _ = build_optimizer(params, RUN_CFG, MODEL_CFG, 100)
    state = create_train_state(params, tx)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-3), state.params)

    @jax.jit
    def one_update(s):
        import optax
        updates, opt = tx.update(grads, s.opt_state, s.params)
        return s.replace(step=s.step + 1,
                         params=optax.apply_updates(s.params, updates),
                         opt_state=opt)

    return one_update(state), tx


def test_saver_roundtrip(tmp_path):
    state, _ = light_state()
    saver = ModelSaver(str(tmp_path))
    saver.save(state, 1)
    # fresh state, restore
    state2, _ = light_state(seed=1)
    restored, start = saver.restore_latest(state2)
    assert start == 1
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_restores_moments_into_sharded_state(tmp_path):
    """The resume order bug (round 3): shard_state re-inits the optimizer
    tree, so restoring BEFORE sharding silently wiped the resumed Adam
    moments on any multi-device run. pipeline.train now restores after
    shard_state; this reproduces that flow and checks the moments (and
    step counter) survive onto the mesh-sharded layout."""
    state, _ = light_state()  # apply_gradients -> nonzero moments
    saver = ModelSaver(str(tmp_path))
    saver.save(state, 1)

    fresh, tx = light_state(seed=1)
    mesh = create_mesh(dp=4, fsdp=2)
    sharded = shard_state(mesh, fresh, fsdp=True, tx=tx)  # re-inits moments
    restored, start = saver.restore_latest(sharded)
    assert start == 1 and int(restored.step) == 1
    ref = jax.tree.leaves(state.opt_state)
    got = jax.tree.leaves(restored.opt_state)
    assert any(np.abs(np.asarray(a)).max() > 0 for a in ref
               if hasattr(a, "shape") and getattr(a, "ndim", 0) > 0)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_saver_removes_previous(tmp_path):
    state, _ = light_state()
    saver = ModelSaver(str(tmp_path))
    saver.save(state, 1)
    saver.save(state, 2)
    import os
    names = set(os.listdir(saver.ckpt_dir))
    assert "model_step_2" in names and "model_step_1" not in names


def test_latest_model_dir(tmp_path):
    """--pretrain_dir / --checkpoint output-root resolution: newest
    model_step_N dir wins; non-matching names and files are ignored."""
    import os

    from vast_tpu.training.saver import latest_model_dir

    assert latest_model_dir(str(tmp_path)) is None  # no ckpt/ at all
    ck = tmp_path / "ckpt"
    ck.mkdir()
    assert latest_model_dir(str(tmp_path)) is None  # empty ckpt/
    for name in ("model_step_2", "model_step_10", "optimizer_step_10",
                 "best_video_r1"):
        (ck / name).mkdir()
    (ck / "model_step_99.pt").write_bytes(b"")  # a FILE must not match
    got = latest_model_dir(str(tmp_path))
    assert got == str(ck / "model_step_10"), got
    assert os.path.isdir(got)


@pytest.mark.slow
def test_tp_sharding_matches_replicated():
    """Megatron-style tensor parallelism over 'tp': loss must match the
    replicated computation bit-for-bit-ish."""
    mesh = create_mesh(dp=2, fsdp=1, tp=4)
    model, state, step, batch, _ = build("ret%tva")
    s_rep, m_rep = step(state, batch, jax.random.PRNGKey(0))

    from vast_tpu.parallel.mesh import tp_param_sharding
    from jax.sharding import PartitionSpec as P
    model2, state2, step2, _, _ = build("ret%tva")
    sh = tp_param_sharding(mesh, state2.params, min_size=0)
    # at least the big kernels must actually be sharded
    specs = [s.spec for s in jax.tree.leaves(sh)]
    assert any(spec == P(None, "tp") for spec in specs)
    assert any(spec == P("tp", None) for spec in specs)
    state2 = shard_state(mesh, state2, tp=True, min_size=0)
    sbatch = shard_batch(mesh, batch)
    s_tp, m_tp = step2(state2, sbatch, jax.random.PRNGKey(0))
    for k in m_rep:
        np.testing.assert_allclose(float(m_rep[k]), float(m_tp[k]),
                                   rtol=2e-4, err_msg=k)


@pytest.mark.slow
def test_fsdp_with_tx_shards_optimizer_state():
    mesh = create_mesh(dp=4, fsdp=2)
    model, state, step, batch, _ = build("ret%tva")
    from vast_tpu.training.optimizer import build_optimizer as bo
    tx, _ = bo(state.params, RUN_CFG, MODEL_CFG, 100)
    state = shard_state(mesh, state, fsdp=True, tx=tx, min_size=0)
    # find an adam moment leaf and check it is sharded like its param
    import optax
    leaves = jax.tree.leaves(state.opt_state)
    sharded = [l for l in leaves
               if hasattr(l, "sharding") and hasattr(l, "ndim") and l.ndim >= 2
               and not l.sharding.is_fully_replicated]
    assert sharded, "no sharded optimizer moments found"
    state, metrics = step(state, shard_batch(mesh, batch),
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


@pytest.mark.slow
def test_multidevice_eval_matches_single_device():
    """evaluate_ret (jitted cond/text features + batched ITM rerank) on
    the 8-device mesh must produce the same retrieval metrics as the
    plain single-placement run (round-2 verdict weak #5: the eval path
    had never executed on the virtual mesh)."""
    from vast_tpu.evaluation.evaluation_mm import evaluate_ret
    from vast_tpu.parallel.mesh import replicated

    model, state, _, _, _ = build("ret%tva")
    rs = np.random.RandomState(0)

    def loader():
        for s in range(2):
            b = 8
            yield {
                "ids": [f"v{s}_{i}" for i in range(b)],
                "ids_txt": [f"v{s}_{i}" for i in range(b)],
                "vision_pixels": rs.randn(b, 2, 32, 32, 3).astype(np.float32),
                "audio_spectrograms": rs.randn(b, 1, 64, 16).astype(
                    np.float32),
                "caption_tokens": np.concatenate(
                    [np.full((b, 1), 101),
                     rs.randint(106, 170, (b, 10)),
                     np.full((b, 1), 102)], axis=1).astype(np.int32),
                "caption_attention_mask": np.ones((b, 12), np.int32),
            }

    run_cfg = EasyDict({"itm_rerank_num": 4,
                        "ret_bidirection_evaluation": True})
    batches = list(loader())
    single = evaluate_ret(model, state.params, ["tva"], batches, run_cfg)

    mesh = create_mesh(dp=4, fsdp=2, tp=1)
    sharded_params = jax.device_put(state.params, replicated(mesh))
    multi = evaluate_ret(model, sharded_params, ["tva"], batches, run_cfg,
                         mesh=mesh)
    assert single == multi, (single, multi)


@pytest.mark.slow
def test_gradient_accumulation_matches_large_batch():
    """TRUE gradient accumulation (optax.MultiSteps): two micro-steps of
    batch 4 with gradient_accumulation_steps=2 must produce the same
    params as one step of batch 8 (the reference only fakes accumulation
    by shrinking the batch — build_dataloader.py:46). Caption-only task
    with injected equal-count masking so micro-batch loss means compose
    exactly."""
    cfg = tiny_vast_config()
    model = VASTModel(cfg)
    batch = dict(tiny_batch(b=8))
    ids = np.asarray(batch["caption_tokens"])
    m = np.zeros_like(ids, bool)
    m[:, [1, 3, 5]] = True
    batch["caption_masked_tokens"] = jnp.asarray(
        np.where(m, 103, ids).astype(np.int32))
    batch["caption_masked_labels"] = jnp.asarray(
        np.where(m, ids, -100).astype(np.int32))

    sr = {"mask": jax.random.PRNGKey(2), "negatives": jax.random.PRNGKey(3)}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, "cap%tva",
                        compute_loss=True, deterministic=True,
                        step_rngs=sr)["params"]

    # the train step donates its state; give each run its own copy
    p1 = jax.tree.map(jnp.copy, params)
    p2 = jax.tree.map(jnp.copy, params)
    tx1, _ = build_optimizer(params, RUN_CFG, MODEL_CFG, 100)
    step1 = make_train_step(model, tx1, "cap%tva")
    s1, _ = step1(create_train_state(p1, tx1), batch,
                  jax.random.PRNGKey(7))

    # the accum run's budget counts MICRO-batches, so its schedule
    # horizon (num_train_steps // accum, optimizer.py) must be given
    # 2x100 to align its OUTER-update schedule with the big-batch run
    acc_cfg = EasyDict(dict(RUN_CFG, gradient_accumulation_steps=2))
    tx2, _ = build_optimizer(params, acc_cfg, MODEL_CFG, 200)
    step2 = make_train_step(model, tx2, "cap%tva")
    s2 = create_train_state(p2, tx2)
    for half in (slice(0, 4), slice(4, 8)):
        micro = {k: v[half] for k, v in batch.items()}
        s2, _ = step2(s2, micro, jax.random.PRNGKey(7))

    # non-vacuous: the first update must actually move the params
    # (guards the 1-based schedule count — at 0-based the first LR is 0)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(s1.params)))
    assert moved
    # atol: micro-mean vs big-batch grads differ by fp32 reduction-order
    # noise (~1e-8); Adam's eps-dominated elements amplify that linearly
    # (update ≈ lr*g/eps) to ~1e-6. A mechanism bug (missed averaging,
    # wrong count) shows at the 1e-4 update scale — far above this.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-5)
