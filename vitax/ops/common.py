"""Shared helpers for the ops layer.

Every hot op in vitax has two implementations behind one API:
  * a pure-XLA (jnp) reference implementation — correct everywhere (CPU tests,
    fake multi-device meshes), and the golden value for kernel unit tests;
  * a fused Pallas/Mosaic TPU kernel — the performance path.

`use_pallas=None` resolves to "True iff running on a TPU backend".
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax


@functools.lru_cache(maxsize=None)
def _backend_is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def default_use_pallas(flag: Optional[bool] = None) -> bool:
    if flag is not None:
        return flag
    if os.environ.get("VITAX_DISABLE_PALLAS", "0") == "1":
        return False
    return _backend_is_tpu()
