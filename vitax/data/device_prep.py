"""On-device preprocessing — uint8 batches, normalize/augment inside jit.

The reference normalizes on the host inside DataLoader workers
(src/data_loaders.py:41-47: ToTensor + Normalize(0.5, 0.5)). On TPU the
float32 batch costs 4× the host→device bandwidth of the raw uint8 pixels;
vitax can ship uint8 and fold `(x/255 − .5)/.5` (and the training-time
horizontal flip) into the jit step, where XLA fuses it into the patchify
matmul's producer.

Usage: construct loaders with `raw=True` (images stay uint8, flips deferred)
and wrap the train/eval step with `preprocess` — or use
`make_preprocessed_train_step`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def normalize_device(images_u8: jnp.ndarray,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 [0,255] → dtype in [-1,1]; ToTensor+Normalize(0.5,0.5)
    semantics on device."""
    x = images_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    return x.astype(dtype)


def random_hflip(images: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Per-sample horizontal flip with p=0.5 (RandomHorizontalFlip)."""
    b = images.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (b,))
    flipped = images[:, :, ::-1, :]
    return jnp.where(flip[:, None, None, None], flipped, images)


def preprocess(images_u8: jnp.ndarray, *, train: bool,
               rng: Optional[jax.Array] = None,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """Full on-device transform: (flip if train) + normalize."""
    x = images_u8
    if train:
        if rng is None:
            raise ValueError("training preprocess needs an rng")
        x = random_hflip(x, rng)
    return normalize_device(x, dtype)
