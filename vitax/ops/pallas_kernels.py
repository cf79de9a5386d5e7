"""Fused Pallas/Mosaic TPU kernels.

This module is the "native" layer of vitax — the TPU analogue of the CUDA
kernels the reference gets transitively through torch. Each kernel has a
`*_supported()` gate; unsupported shapes fall back to the jnp reference
implementation in the sibling modules.

Kernels are added incrementally; gates return False until the kernel lands.
"""

from __future__ import annotations

import jax.numpy as jnp


def layernorm_supported(x: jnp.ndarray) -> bool:
    return False


def layer_norm(x, scale, bias, eps):  # pragma: no cover - gated off
    raise NotImplementedError


def attention_supported(q, k, v) -> bool:
    return False


def flash_attention(q, k, v):  # pragma: no cover - gated off
    raise NotImplementedError


def mlp_supported(x, w1, w2) -> bool:
    return False


def fused_mlp(x, w1, b1, w2, b2):  # pragma: no cover - gated off
    raise NotImplementedError
