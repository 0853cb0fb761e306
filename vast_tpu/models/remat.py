"""Rematerialization policies for encoder blocks.

The reference toggles torch gradient checkpointing per encoder
(``checkpointing`` — utils/args.py:115, general_module.py:353). Round-2's
port did the same with all-or-nothing ``nn.remat`` per block, which burns
~25% of train FLOPs recomputing everything including the matmuls
(BENCH_NOTES "Known headroom" #4). On TPU the right trade is SELECTIVE:
save the MXU outputs (projections, MLP matmuls) and the flash-attention
kernel outputs — the expensive ops — and recompute only the cheap
VPU elementwise chains (LayerNorm, GELU, residual adds, casts).

``policy('dots')`` is that selective policy; ``policy('attn')`` saves
ONLY the tagged attention-kernel outputs and recomputes the projection/
MLP matmuls — the memory-lean middle ground (on one v5e the flagship
train step OOMs under 'dots': saving every dot output costs ~570 MB per
EVA-g block x 40 blocks ≈ 23 GB vs the 15.75 GB HBM; 'attn' saves
~68 MB/block and skips re-running the Pallas kernels, which full remat
cannot avoid). ``policy('full')`` is the classic save-nothing remat
(minimum memory); ``policy('none')`` disables remat at the call site.

Attention kernel outputs are tagged via ``checkpoint_name(x, 'attn_out')``
in ops/attention.py — Pallas custom calls are not dots, so without the
tag the policy would re-run the whole attention kernel in the backward.
"""

from __future__ import annotations

import jax
from jax.ad_checkpoint import checkpoint_name

try:  # private but stable since the offload policies landed; the string
    # fallback below keeps a JAX rename from silently degrading the policy
    from jax._src.interpreters.partial_eval import Offloadable as _Offloadable
except ImportError:  # pragma: no cover - future JAX refactor
    _Offloadable = None

ATTN_NAME = "attn_out"


def _is_offload_decision(a) -> bool:
    """True when a sub-policy returned an offload sentinel (vs Recompute/
    Saveable booleans). isinstance against the real class when importable;
    name-compare only as the refactor-survival fallback (ADVICE r4)."""
    if _Offloadable is not None:
        return isinstance(a, _Offloadable)
    return type(a).__name__ == "Offloadable"


def remat_policy(name: str):
    """Map a config string to a jax.checkpoint policy (or None = full)."""
    if name in ("full", "", None):
        return None
    if name == "dots":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(ATTN_NAME),
        )
    if name == "attn":
        return jax.checkpoint_policies.save_only_these_names(ATTN_NAME)
    if name == "attn_offload":
        # like 'attn' but the saved attention outputs live in pinned host
        # memory instead of HBM: frees ~68 MB/EVA-block of residuals so
        # larger batches fit, at the cost of d2h/h2d DMA per block
        return jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=[ATTN_NAME],
            offload_src="device", offload_dst="pinned_host")
    if name == "dots_offload":
        # the 'dots' memory footprint (every no-batch-dim matmul output +
        # attention outputs) offloaded to host — the maximum-recompute-
        # avoidance policy that cannot OOM HBM; bandwidth-bound by DMA
        # instead. save_from_both_policies can't combine Offloadable-
        # returning policies (they return enums, not booleans), so this
        # is written directly.
        dots = jax.checkpoint_policies.offload_dot_with_no_batch_dims(
            "device", "pinned_host")
        attn = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=[ATTN_NAME],
            offload_src="device", offload_dst="pinned_host")

        def policy(prim, *args, **kw):
            a = dots(prim, *args, **kw)
            # non-matches return the Recompute sentinel; the two sub-
            # policies match disjoint primitives (dot_general vs name_p)
            if _is_offload_decision(a):
                return a
            return attn(prim, *args, **kw)

        return policy
    raise ValueError(f"unknown remat policy {name!r}")


def tag_attention(x):
    """Mark an attention output saveable under the 'dots' policy."""
    return checkpoint_name(x, ATTN_NAME)
