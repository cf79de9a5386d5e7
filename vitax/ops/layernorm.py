"""LayerNorm with fp32 accumulation.

TPU-native stand-in for the reference's `nn.LayerNorm` uses
(src/model.py:108,114,146; res-vit/model.py:119-130). Statistics are always
computed in float32 regardless of the compute dtype; the result is cast back.

The Pallas fused kernel lives in `vitax.ops.pallas_kernels` and is selected by
`use_pallas`; the jnp path below is the golden reference implementation.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vitax.ops.common import default_use_pallas


def layer_norm_ref(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-6, use_pallas: Optional[bool] = None) -> jnp.ndarray:
    if default_use_pallas(use_pallas):
        from vitax.ops import pallas_kernels
        if pallas_kernels.layernorm_supported(x):
            return pallas_kernels.layer_norm(x, scale, bias, eps)
    return layer_norm_ref(x, scale, bias, eps)
