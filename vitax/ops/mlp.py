"""Transformer feed-forward block: Linear → GELU(exact) → Linear.

TPU-native equivalent of the reference `MlpBlock` (src/model.py:25-51) and
`FeedForward` (res-vit/model.py:302-318). GELU is the exact erf flavor —
`nn.GELU()`'s default — required for ≤1e-3 logit parity at depth 32.

Dropout between the two linears (reference dropout1/dropout2) is applied by
the caller in the model, because all arch presets set dropout 0
(src/config.py:64-65) and the fused kernel path must stay deterministic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vitax.ops.common import default_use_pallas


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    # erf evaluated in fp32 so bf16 activations keep parity-grade accuracy.
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def mlp_ref(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
            w2: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    h = jnp.einsum("...d,dm->...m", x, w1.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    h = gelu_exact(h).astype(x.dtype)
    out = jnp.einsum("...m,md->...d", h, w2.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    out = out + b2.astype(jnp.float32)
    return out.astype(x.dtype)


def mlp_block(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray,
              use_pallas: Optional[bool] = None) -> jnp.ndarray:
    if default_use_pallas(use_pallas):
        from vitax.ops import pallas_kernels
        if pallas_kernels.mlp_supported(x, w1, w2):
            return pallas_kernels.fused_mlp(x, w1, b1, w2, b2)
    return mlp_ref(x, w1, b1, w2, b2)
