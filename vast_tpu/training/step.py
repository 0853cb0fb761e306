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

from vast_tpu.parallel.mesh import fsdp_param_sharding, replicated


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
    # them on the mesh), so one jit covers single-chip and SPMD.
    del mesh, fsdp
    return jax.jit(step_fn, donate_argnums=(0,))


def shard_state(mesh, state: TrainState, fsdp: bool = False) -> TrainState:
    """Place the train state on the mesh (replicated or fsdp-sharded)."""
    if fsdp and mesh.shape["fsdp"] > 1:
        param_sh = fsdp_param_sharding(mesh, state.params)
        params = jax.tree.map(jax.device_put, state.params, param_sh)
        opt_state = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), state.opt_state)
        return TrainState(step=jax.device_put(state.step, replicated(mesh)),
                          params=params, opt_state=opt_state)
    return jax.device_put(state, replicated(mesh))


def make_eval_step(model, task: str, mesh=None):
    """Jitted eval forward returning the evaluation feature dict."""

    def eval_fn(params, batch):
        return model.apply({"params": params}, batch, task,
                           compute_loss=False, deterministic=True)

    del mesh
    return jax.jit(eval_fn)
