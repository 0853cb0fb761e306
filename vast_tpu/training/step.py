"""Jitted train/eval step factories.

One jitted step = encoders -> losses -> grads -> optax update
(ARCHITECTURE.md design stance #3). The train state is donated, so
params/optimizer memory is reused in place. With a mesh, the batch is
sharded over ``dp`` (+``fsdp``) and params are replicated or
fsdp-sharded; XLA inserts the ICI collectives for the global-batch
contrastive losses (no explicit collectives anywhere — contrast
utils/pipeline.py:92-99's manual per-param all_reduce).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vast_tpu.parallel.mesh import combined_param_sharding, replicated


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def split_step_rngs(rng):
    ks = jax.random.split(rng, 5)
    return (
        {"mask": ks[0], "negatives": ks[1], "vision": ks[2], "audio": ks[3]},
        ks[4],  # dropout
    )


def make_train_step(model, tx, task: str, mesh=None, fsdp: bool = False,
                    vision_transforms: str = "none"):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    ``vision_transforms`` is static per dataset (batches carry only
    arrays); it selects the on-device augmentation path.
    """

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        step_rngs, dropout_rng = split_step_rngs(rng)
        batch_in = dict(batch)
        batch_in["vision_transforms"] = vision_transforms

        def loss_fn(params):
            out = model.apply(
                {"params": params}, batch_in, task, compute_loss=True,
                deterministic=False, step_rngs=step_rngs,
                rngs={"dropout": dropout_rng})
            total = sum(out.values())
            return total, out

        (total, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(loss_dict)
        metrics["total_loss"] = total
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    # Shardings propagate from the arguments (shard_state / shard_batch put
    # them on the mesh), so one jit covers single-chip and SPMD. When a
    # mesh is given, trace/run under its context so the model's
    # constrain_batch_dim pins activations to the data axes (and GSPMD
    # never reshards them to param layouts).
    del fsdp
    jitted = jax.jit(step_fn, donate_argnums=(0,))
    if mesh is None:
        return jitted

    def run(state, batch, rng):
        with jax.set_mesh(mesh):
            return jitted(state, batch, rng)

    # AOT access for tooling (scripts/collective_stats.py lowers the step
    # on abstract ShapeDtypeStructs to audit GSPMD collectives/memory
    # without materializing flagship-sized params)
    run.jitted = jitted
    return run


def shard_state(mesh, state: TrainState, fsdp: bool = False,
                tp: bool = False, tx=None,
                min_size: int | None = None) -> TrainState:
    """Place the train state on the mesh.

    ``tp`` shards column/row-parallel kernels over the ``tp`` axis
    (Megatron-style); ``fsdp`` shards each param's largest divisible dim
    over ``fsdp`` (ZeRO-3-style). When ``tx`` is given, the optimizer
    state is (re)built under jit from the sharded params, so Adam moments
    inherit the param shardings and optimizer memory scales with the
    shards (call shard_state BEFORE restoring a resume checkpoint so the
    restored moments land on the sharded layout).
    """
    use_tp = tp and mesh.shape["tp"] > 1
    use_fsdp = fsdp and mesh.shape["fsdp"] > 1
    if use_tp or use_fsdp:
        # ONE tree for params AND moments: mixing separate tp/fsdp trees
        # gives conflicting layouts the partitioner resolves by full
        # rematerialization (MULTICHIP_r02 tail, round-2 verdict weak #4)
        param_sh = combined_param_sharding(mesh, state.params,
                                           use_fsdp=use_fsdp, use_tp=use_tp,
                                           min_size=min_size)
    else:
        return jax.device_put(state, replicated(mesh))

    params = jax.tree.map(jax.device_put, state.params, param_sh)
    if tx is not None:
        opt_sh = _opt_state_shardings(state.opt_state, state.params,
                                      param_sh, replicated(mesh))
        opt_state = jax.jit(tx.init, out_shardings=opt_sh)(params)
    else:
        opt_state = jax.device_put(state.opt_state, replicated(mesh))
    return TrainState(step=jax.device_put(state.step, replicated(mesh)),
                      params=params, opt_state=opt_state)


def _opt_state_shardings(opt_state, params, param_sh, rep):
    """Sharding tree for an optimizer state: any leaf whose key path ends
    with a parameter's path (Adam mu/nu mirror the param tree, possibly
    masked by optax.multi_transform) gets that parameter's sharding;
    everything else (counts, scalars) is replicated."""
    def path_keys(path):
        return tuple(str(getattr(p, "key", getattr(p, "name", p)))
                     for p in path)

    param_map = {}
    for path, sh in jax.tree_util.tree_flatten_with_path(param_sh)[0]:
        param_map[path_keys(path)] = sh

    max_depth = max((len(k) for k in param_map), default=0)

    def leaf_sharding(path, leaf):
        keys = path_keys(path)
        for cut in range(max(0, len(keys) - max_depth), len(keys)):
            if keys[cut:] in param_map:
                return param_map[keys[cut:]]
        return rep

    return jax.tree_util.tree_map_with_path(leaf_sharding, opt_state)


def make_eval_step(model, task: str, mesh=None):
    """Jitted eval forward returning the evaluation feature dict."""

    def eval_fn(params, batch):
        return model.apply({"params": params}, batch, task,
                           compute_loss=False, deterministic=True)

    jitted = jax.jit(eval_fn)
    if mesh is None:
        return jitted

    def run(params, batch):
        with jax.set_mesh(mesh):
            return jitted(params, batch)

    return run
