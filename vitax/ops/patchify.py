"""Patch embedding as a single matmul.

The reference patchifies with `nn.Conv2d(3, D, kernel=P, stride=P)`
(src/model.py:179; res-vit/model.py:543). On TPU a stride-P conv with a P×P
kernel is exactly a reshape + one big matmul that lands on the MXU:

    [B, gh·P, gw·P, 3] → [B, gh, gw, P, P, 3] → [B, N, P·P·3] @ [P·P·3, D]

The kernel parameter stays in HWIO layout `[P, P, 3, D]` — the layout of the
ViT npz checkpoints (src/checkpoint.py:110-111 shows the torch side permuting
HWIO→OIHW; we keep HWIO so npz weights load with zero conversion).
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(images: jnp.ndarray, patch: tuple) -> jnp.ndarray:
    """[B, H, W, C] → [B, N, ph*pw*C] with (ph, pw, c) flattened row-major,
    matching a row-major reshape of the HWIO conv kernel.

    Non-divisible sizes crop the remainder, exactly like a strided conv
    floors its output size (h14 @ 384: 384//14 = 27 grid, 6 px dropped —
    the reference's Conv2d does the same, src/model.py:179)."""
    b, h, w, c = images.shape
    ph, pw = patch
    gh, gw = h // ph, w // pw
    if h != gh * ph or w != gw * pw:
        images = images[:, :gh * ph, :gw * pw]
    x = images.reshape(b, gh, ph, gw, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # [B, gh, gw, ph, pw, C]
    return x.reshape(b, gh * gw, ph * pw * c)


def patchify_matmul(images: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """images [B,H,W,3] (NHWC), kernel [ph,pw,3,D] (HWIO), bias [D]
    → patch tokens [B, N, D]."""
    ph, pw, c, d = kernel.shape
    patches = extract_patches(images, (ph, pw)).astype(dtype)
    w = kernel.reshape(ph * pw * c, d).astype(dtype)
    out = jnp.einsum("bnp,pd->bnd", patches, w,
                     preferred_element_type=jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(dtype)
