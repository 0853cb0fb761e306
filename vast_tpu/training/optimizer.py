"""Param-grouped AdamW via optax.

Reproduces utils/build_optimizer.py:11-99's three LR groups:

  * ``new``   — params whose path matches any ``new_params_name`` substring
                -> ``new_lr``;
  * ``clip``  — vision-encoder params when the vision tower is a (eva)clip
                model ('visual' in torch names; here the ``vision_encoder``
                subtree) -> ``clip_lr``;
  * ``basic`` — everything else -> ``learning_rate``;

each split into decay / no-decay (bias + LayerNorm params, the torch
``no_decay`` list). AdamW eps 1e-6 and betas from run_cfg match the
reference's custom AdamW (build_optimizer.py:105-196). All groups share
one LR-ratio schedule (utils/sched.py), applied multiplicatively.
"""

from __future__ import annotations

import optax

import jax
import jax.numpy as jnp

from vast_tpu.training.sched import make_optax_schedule

NO_DECAY_LEAVES = ("bias", "scale")  # flax: LN weight=='scale'


def _is_no_decay(path) -> bool:
    leaf = path[-1]
    if leaf in NO_DECAY_LEAVES:
        return True
    # embeddings and 1-d params follow torch AdamW behavior (decayed unless
    # named bias/LayerNorm.*) — keep parity: only bias/scale are exempt.
    return False


def param_labels(params, new_params_name: tuple[str, ...],
                 vision_is_clip: bool):
    def label(path, x):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        path_str = ".".join(str(k) for k in keys)
        nd = "_nd" if _is_no_decay(keys) else ""
        if any(n and n in path_str for n in new_params_name):
            return "new" + nd
        if vision_is_clip and keys and keys[0] == "vision_encoder":
            return "clip" + nd
        return "basic" + nd

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(params, run_cfg, model_cfg, num_train_steps: int):
    """Returns (optax GradientTransformation, labels pytree).

    ``num_train_steps`` counts MICRO-batches (the trainer's step budget).
    Under true gradient accumulation the inner schedule advances once per
    OUTER update (MultiSteps passes through every k-th micro-batch), so
    its horizon is num_train_steps // accum — otherwise a run would end
    with the warmup/decay curve only 1/k complete.
    """
    betas = tuple(run_cfg.get("betas", (0.9, 0.98)))
    wd = run_cfg.get("weight_decay", 0.01)
    accum = int(run_cfg.get("gradient_accumulation_steps", 1) or 1)
    sched = make_optax_schedule(
        max(num_train_steps // accum, 1),
        run_cfg.get("scheduler", "warmup_linear"),
        run_cfg.get("warmup_ratio", 0.1))

    lrs = {
        "basic": run_cfg.get("learning_rate", 1e-4),
        "new": run_cfg.get("new_lr", 0.0) or run_cfg.get("learning_rate", 1e-4),
        "clip": run_cfg.get("clip_lr", 5e-7),
    }

    # low-precision Adam moments: the single-chip memory lever for
    # flagship (1.2B-param) training — fp32 mu+nu alone cost ~9.6 GB of
    # the v5e's 16 GB HBM. mu in bf16 is safe (it's a running mean of
    # grads); nu in bf16 costs ~0.4% relative error on the denominator,
    # so it stays opt-in.
    mu_dtype = run_cfg.get("adam_mu_dtype") or None
    nu_dtype = run_cfg.get("adam_nu_dtype") or None

    def scale_by_adam_general(b1, b2, eps):
        def init(params):
            mu = jax.tree.map(
                lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype),
                params)
            nu = jax.tree.map(
                lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype),
                params)
            return optax.ScaleByAdamState(
                count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

        def update(updates, state, params=None):
            del params
            count = state.count + 1
            mu = jax.tree.map(
                lambda g, m: (b1 * m.astype(g.dtype) + (1 - b1) * g).astype(
                    m.dtype), updates, state.mu)
            nu = jax.tree.map(
                lambda g, n: (b2 * n.astype(g.dtype)
                              + (1 - b2) * g * g).astype(n.dtype),
                updates, state.nu)
            c1 = 1 - b1 ** count.astype(jnp.float32)
            c2 = 1 - b2 ** count.astype(jnp.float32)
            out = jax.tree.map(
                lambda m, n: (m.astype(jnp.float32) / c1)
                / (jnp.sqrt(n.astype(jnp.float32) / c2) + eps),
                mu, nu)
            return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

        return optax.GradientTransformation(init, update)

    def adamw(lr, weight_decay):
        def scaled(count):
            # optax's count is the number of PREVIOUS updates (0 on the
            # first), but the reference evaluates the ratio at the
            # current 1-based step (utils/pipeline.py) — without the +1
            # the first update gets LR=0 and is a silent no-op
            return lr * sched(count + 1)

        name = run_cfg.get("optim", "adamw")
        if name == "adamw":
            if nu_dtype is not None:
                return optax.chain(
                    scale_by_adam_general(betas[0], betas[1], 1e-6),
                    optax.add_decayed_weights(weight_decay),
                    optax.scale_by_learning_rate(scaled))
            return optax.adamw(scaled, b1=betas[0], b2=betas[1], eps=1e-6,
                               weight_decay=weight_decay,
                               mu_dtype=mu_dtype)
        if name == "adam":
            if nu_dtype is not None:
                return optax.chain(
                    scale_by_adam_general(betas[0], betas[1], 1e-6),
                    optax.scale_by_learning_rate(scaled))
            return optax.adam(scaled, b1=betas[0], b2=betas[1], eps=1e-6,
                              mu_dtype=mu_dtype)
        if name == "adamax":
            if nu_dtype is not None:
                raise ValueError(
                    "adam_nu_dtype is not supported for optim='adamax'")
            return optax.adamax(scaled, b1=betas[0], b2=betas[1], eps=1e-6)
        raise ValueError(name)

    transforms = {}
    for g, lr in lrs.items():
        transforms[g] = adamw(lr, wd)
        transforms[g + "_nd"] = adamw(lr, 0.0)

    vision_is_clip = "clip" in model_cfg.get("vision_encoder_type", "")
    labels = param_labels(
        params, tuple(run_cfg.get("new_params_name", [])), vision_is_clip)
    tx = optax.multi_transform(transforms, labels)
    if run_cfg.get("grad_norm", -1) and run_cfg.get("clip_grads", False):
        tx = optax.chain(optax.clip_by_global_norm(run_cfg["grad_norm"]), tx)
    if accum > 1:
        # TRUE gradient accumulation: average grads over `accum`
        # micro-batches, apply one optimizer update (the reference only
        # fakes it by shrinking the batch, build_dataloader.py:46 — every
        # micro-batch there takes its own Adam step). The dataloader still
        # divides the batch; MetaLoader emits `accum` consecutive
        # micro-batches per task (data/loader.py).
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, labels
