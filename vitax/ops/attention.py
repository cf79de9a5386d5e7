"""Multi-head self attention.

TPU-native replacement for the reference's attention math
(`SelfAttention.forward`, src/model.py:83-101; `Attention.forward`,
res-vit/model.py:237-299):

* scores = q·kᵀ / sqrt(head_dim), softmax in float32 (the res-vit reference
  upcasts scores to fp32 before softmax at res-vit/model.py:290; the src
  reference runs fp32 throughout), then ·v and output projection.
* Non-causal, short sequences (≤730 tokens at h14@384), so full attention fits
  VMEM comfortably; the Pallas kernel fuses the whole softmax(QKᵀ)V per
  (batch, head-block) without materializing scores in HBM.
* `q_mask` implements the res-vit asymmetric-attention inference path
  (res-vit/model.py:503-514) the XLA-friendly way: all queries are computed,
  inactive ones are merged away by the caller. Padding-free, static shapes.

Faithful-behavior note: the reference constructs attention dropout but never
applies it inside `SelfAttention.forward` (src/model.py:78-81 vs :83-101), so
this op takes no dropout either.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vitax.ops.common import default_use_pallas


def mha_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q,k,v: [B, S, H, Hd] → [B, S, H, Hd]. Softmax in fp32."""
    head_dim = q.shape[-1]
    scale = 1.0 / (head_dim ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax_nn_softmax_fp32(scores)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def jax_nn_softmax_fp32(scores: jnp.ndarray) -> jnp.ndarray:
    s = scores.astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention: [B,S,H,Hd]³ → [B,S,H,Hd]."""
    if default_use_pallas(use_pallas):
        from vitax.ops import pallas_kernels
        if pallas_kernels.attention_supported(q, k, v):
            return pallas_kernels.flash_attention(q, k, v)
    return mha_ref(q, k, v)


def mha_ref_bhsd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q,k,v: [B, H, S, Hd] → [B, H, S, Hd]. Softmax in fp32."""
    head_dim = q.shape[-1]
    scale = 1.0 / (head_dim ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax_nn_softmax_fp32(scores)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def multi_head_attention_bhsd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              use_pallas: Optional[bool] = None
                              ) -> jnp.ndarray:
    """Fused attention in the kernel-native [B,H,S,Hd] layout — produce QKV
    directly in this layout from the projection einsum so no HBM transpose
    surrounds the kernel."""
    if default_use_pallas(use_pallas):
        from vitax.ops import pallas_kernels
        b, h, s, hd = q.shape
        probe = jnp.zeros((b, s, h, hd), q.dtype)
        if pallas_kernels.attention_supported(probe, probe, probe):
            return pallas_kernels.flash_attention_bhsd(q, k, v)
    return mha_ref_bhsd(q, k, v)
