"""Vectorized MLM token corruption (TokenMasker).

The reference implements this as a per-batch Python double loop on CPU
(model/general_module.py:52-98) — flagged as a perf wart in SURVEY §3.1.
Here it is a fully-vectorized on-device op under jit.

Semantics preserved:
  * only non-pad positions from index 1 onward are candidates;
  * every row is guaranteed at least one masked position (the reference loops
    until one lands; we force-mask the first candidate when none did);
  * of the selected positions: 80% -> [MASK], 10% -> random token in
    [range_start, range_end), 10% -> kept; labels hold the original token,
    -100 elsewhere (model/general_module.py:85-94).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_LABEL = -100


def mask_tokens(rng, tokens, mask_prob: float, *, mask_token: int,
                range_start: int = 106, range_end: int = 30522,
                pad_token: int = 0):
    """tokens: (B, L) int32 -> (corrupted, labels)."""
    b, l = tokens.shape
    k_sel, k_force, k_kind, k_rand = jax.random.split(rng, 4)

    candidate = (tokens != pad_token)
    candidate = candidate.at[:, 0].set(False)

    sel = jax.random.bernoulli(k_sel, mask_prob, (b, l)) & candidate

    # force at least one masked position per row (uniform over candidates)
    none_sel = ~jnp.any(sel, axis=1)
    gumbel = jax.random.gumbel(k_force, (b, l))
    scores = jnp.where(candidate, gumbel, -jnp.inf)
    forced = jax.nn.one_hot(jnp.argmax(scores, axis=1), l, dtype=bool)
    has_candidate = jnp.any(candidate, axis=1)
    sel = sel | (forced & none_sel[:, None] & has_candidate[:, None])

    kind = jax.random.uniform(k_kind, (b, l))
    rand_tok = jax.random.randint(k_rand, (b, l), range_start, range_end,
                                  dtype=tokens.dtype)
    corrupted = jnp.where(sel & (kind < 0.8), mask_token, tokens)
    corrupted = jnp.where(sel & (kind >= 0.8) & (kind < 0.9), rand_tok, corrupted)
    labels = jnp.where(sel, tokens, IGNORE_LABEL)
    return corrupted, labels
