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
    """Device_put every array in the batch with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return {
        k: (jax.device_put(v, sh) if hasattr(v, "ndim") and v.ndim > 0 else v)
        for k, v in batch.items()
    }


def tp_param_sharding(mesh: Mesh, params) -> dict:
    """Megatron-style tensor parallelism over the ``tp`` axis via param
    shardings — GSPMD propagates activation shardings and inserts the
    collectives.

    Rule (by param path): column-parallel for QKV/up projections (shard
    the output dim), row-parallel for attention-out / MLP-down (shard the
    input dim). Everything else (embeddings, LN, heads) replicated.
    """
    size = mesh.shape["tp"]

    COL = ("query", "key", "value", "qkv", "q_proj", "k_proj", "v_proj",
           "in_proj", "intermediate", "fc1", "w1", "w2", "c_fc")
    ROW = ("out", "out_proj", "output", "proj", "fc2", "w3", "c_proj")

    def rule(path, x):
        if size == 1 or x.ndim != 2:
            return NamedSharding(mesh, P())
        names = [str(getattr(p, "key", p)) for p in path]
        owner = names[-2] if len(names) >= 2 else ""
        if owner in COL and x.shape[1] % size == 0:
            return NamedSharding(mesh, P(None, "tp"))
        if owner in ROW and x.shape[0] % size == 0:
            return NamedSharding(mesh, P("tp", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def fsdp_param_sharding(mesh: Mesh, params) -> dict:
    """Shard each parameter's largest axis over fsdp when divisible.

    Simple ZeRO-3-style rule: pick the largest dim divisible by the fsdp
    axis size; replicate otherwise. Gives memory scaling without a
    per-layer annotation pass.
    """
    size = mesh.shape["fsdp"]

    def rule(x):
        if size == 1 or x.ndim == 0:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % size == 0 and x.shape[d] >= 2 * size:
                spec = [None] * x.ndim
                spec[d] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
