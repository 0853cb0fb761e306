"""Shared activation helpers.

``gelu``: exact-erf in fp32 (torch nn.GELU parity for the parity/eval
paths), tanh-approximation in bf16. Measured on v5e at encoder MLP
shapes: tanh fuses completely into the producing matmul's epilogue
(zero cost) while erf lowers to a separate vector pass (+3.2 ms per
69632x6144 activation); the tanh-vs-erf difference is below bf16
rounding (tests/test_encoders.py::
test_eva_bf16_tanh_gelu_matches_exact_within_bf16_noise).
Replaces torch.nn.GELU / fairseq gelu in the reference encoders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x):
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)
