"""PRNG key threading.

The reference seeds python/numpy/torch/cuda and forces cuDNN determinism
(src/data_loaders.py:13-29). In JAX, determinism is by construction: one root
`PRNGKey(seed)` is split into named streams (params, dropout, gumbel, data
shuffling), each threaded explicitly.
"""

from __future__ import annotations

import os
import random
from typing import Dict

import jax
import numpy as np


def set_seed(seed: int = 42) -> jax.Array:
    """Seed host-side RNGs (python/numpy, for data order) and return the root
    JAX key. Mirrors the reference's `set_seed` observable contract."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


class KeyChain:
    """Named, stateful key dispenser for host-side loop code.

    Inside jit everything stays functional; the chain is only consumed at
    trace/dispatch boundaries (one `next(name)` per step).
    """

    def __init__(self, root: jax.Array):
        self._root = root
        self._counters: Dict[str, int] = {}

    def next(self, name: str) -> jax.Array:
        i = self._counters.get(name, 0)
        self._counters[name] = i + 1
        return jax.random.fold_in(jax.random.fold_in(self._root, _tag(name)), i)


def _tag(name: str) -> int:
    # Stable 31-bit tag for a stream name.
    h = 0
    for ch in name.encode():
        h = (h * 131 + ch) & 0x7FFFFFFF
    return h
