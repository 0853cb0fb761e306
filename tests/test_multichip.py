"""Pallas kernels under the data mesh: shard_map partitioning.

A pallas_call lowers to an opaque Mosaic custom call that XLA's SPMD
partitioner cannot split — without help it all-gathers the operands and
runs the full problem replicated on every device. ops/attention.py
wraps each kernel entry in jax.shard_map over the (dp, fsdp) axes so
every device runs only its batch shard. These tests prove, on the
virtual 8-device CPU mesh (kernels in interpret mode):

  * outputs and gradients match the unsharded single-device run,
    including the psummed cotangent of a batch-replicated bias;
  * the sharded path is actually taken (shard_map appears in the jaxpr);
  * ragged batches fall back to the unwrapped call (correctness first).

Reference behavior being replaced: NCCL DataParallel replication in
/root/reference/utils/initialize.py + distributed.py (the reference has
no kernels; this failure mode is specific to the TPU design).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vast_tpu.ops.attention import (
    flash_self_attention_tmajor,
    flash_self_attention_tmajor_biased,
    multi_head_attention_hmajor,
)
from vast_tpu.parallel.mesh import create_mesh


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("bias_batch", [None, 1, 8])
def test_hmajor_sharded_matches_unsharded(bias_batch):
    b, h, l, d = 8, 2, 128, 32
    q, k, v = _rand(0, b, h, l, d), _rand(1, b, h, l, d), _rand(2, b, h, l, d)
    bias = None if bias_batch is None else 0.1 * _rand(3, bias_batch, h, l, l)

    def f(q, k, v, bias):
        out = multi_head_attention_hmajor(q, k, v, bias=bias, impl="pallas",
                                          interpret=True)
        return (out ** 2).sum()

    grad_fn = jax.jit(jax.grad(f, argnums=(0, 1, 2) if bias is None
                               else (0, 1, 2, 3)))
    ref = grad_fn(q, k, v, bias)
    mesh = create_mesh(dp=4, fsdp=2)
    with jax.set_mesh(mesh):
        # structural: the sharded dispatch is actually taken
        jaxpr = str(jax.make_jaxpr(f)(q, k, v, bias))
        assert "shard_map" in jaxpr
        got = grad_fn(q, k, v, bias)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-5, atol=2e-5)


def test_hmajor_ragged_batch_falls_back():
    b, h, l, d = 6, 2, 128, 32  # 6 % 8 != 0 -> unwrapped call
    q, k, v = _rand(0, b, h, l, d), _rand(1, b, h, l, d), _rand(2, b, h, l, d)
    fn = jax.jit(lambda q, k, v: multi_head_attention_hmajor(
        q, k, v, impl="pallas", interpret=True))
    ref = fn(q, k, v)
    mesh = create_mesh(dp=8)
    with jax.set_mesh(mesh):
        jaxpr = str(jax.make_jaxpr(
            lambda q, k, v: multi_head_attention_hmajor(
                q, k, v, impl="pallas", interpret=True))(q, k, v))
        assert "shard_map" not in jaxpr
        got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-5)


def test_hmajor_tp_mesh_splits_batch_over_tp():
    # a Megatron tp layout can't reach inside the opaque kernel, so the
    # wrapper splits the kernel's batch over tp too (strictly better
    # than tp-replicated execution); dp=2 x fsdp=2 x tp=2 = 8 shards
    b, h, l, d = 8, 2, 128, 32
    q, k, v = _rand(0, b, h, l, d), _rand(1, b, h, l, d), _rand(2, b, h, l, d)

    def f(q, k, v):
        out = multi_head_attention_hmajor(q, k, v, impl="pallas",
                                          interpret=True)
        return (out ** 2).sum()

    grad_fn = jax.jit(jax.grad(f, argnums=(0, 1, 2)))
    ref = grad_fn(q, k, v)
    with jax.set_mesh(create_mesh(dp=2, fsdp=2, tp=2)):
        jaxpr = str(jax.make_jaxpr(f)(q, k, v))
        assert "shard_map" in jaxpr and "'tp'" in jaxpr
        got = grad_fn(q, k, v)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-5, atol=2e-5)


def test_tmajor_sharded_matches_unsharded():
    b, l, h, d = 8, 128, 2, 128
    qkv = _rand(0, b, l, 3 * h * d)

    def f(x):
        out = flash_self_attention_tmajor(x, h, 0, d ** -0.5, True)
        return (out ** 2).sum()

    grad_fn = jax.jit(jax.grad(f))
    ref = grad_fn(qkv)
    with jax.set_mesh(create_mesh(dp=4, fsdp=2)):
        assert "shard_map" in str(jax.make_jaxpr(f)(qkv))
        got = grad_fn(qkv)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-5)


def test_remat_policy_composes_with_sharded_kernel():
    # the train step wraps encoder blocks in jax.checkpoint with the
    # 'attn' policy (save only tagged kernel outputs); the tag is applied
    # OUTSIDE the shard_map, so the saved residual is the global-batch
    # activation and the backward must re-enter the sharded kernel only
    # for what the policy discards
    import flax.linen as nn  # noqa: F401 (mirror train-step imports)
    from vast_tpu.models.remat import remat_policy

    b, h, l, d = 8, 2, 128, 32
    q, k, v = _rand(0, b, h, l, d), _rand(1, b, h, l, d), _rand(2, b, h, l, d)
    w = _rand(3, d, d)

    def block(w, q, k, v):
        out = multi_head_attention_hmajor(q, k, v, impl="pallas",
                                          interpret=True)
        return jnp.tanh(out @ w)

    def loss(w, q, k, v, pol):
        blk = jax.checkpoint(block, policy=remat_policy(pol)) \
            if pol != "none" else block
        return (blk(w, q, k, v) ** 2).sum()

    grads = {}
    for where in ("single", "mesh"):
        ctx = jax.set_mesh(create_mesh(dp=4, fsdp=2)) if where == "mesh" \
            else None
        try:
            if ctx is not None:
                ctx.__enter__()
            for pol in ("none", "attn", "dots", "full"):
                grads[(where, pol)] = jax.jit(
                    jax.grad(loss, argnums=(0, 1)), static_argnums=(4,)
                )(w, q, k, v, pol)
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)
    ref = grads[("single", "none")]
    for key, got in grads.items():
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                       rtol=2e-5, atol=2e-5, err_msg=str(key))


def test_tmajor_biased_sharded_matches_unsharded():
    b, l, h, d = 8, 128, 2, 128
    qkv = _rand(0, b, l, 3 * h * d)
    bias = 0.1 * _rand(1, b, h, l, l)

    def f(x, bias):
        out = flash_self_attention_tmajor_biased(x, bias, h, 0, d ** -0.5,
                                                 True)
        return (out ** 2).sum()

    grad_fn = jax.jit(jax.grad(f, argnums=(0, 1)))
    ref = grad_fn(qkv, bias)
    with jax.set_mesh(create_mesh(dp=4, fsdp=2)):
        assert "shard_map" in str(jax.make_jaxpr(f)(qkv, bias))
        got = grad_fn(qkv, bias)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-5, atol=2e-5)
