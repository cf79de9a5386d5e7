"""Device memory introspection — TPU analogue of the reference's
`print_gpu_memory_usage` breakdown (res-vit/utils.py:487-555).

Model/gradient/optimizer sizes are computed exactly from the pytrees (they
are static); live HBM usage comes from `device.memory_stats()` where the
backend exposes it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def tree_bytes(tree: Any) -> int:
    return sum(np.size(x) * np.dtype(getattr(x, "dtype", np.float32)).itemsize
               for x in jax.tree.leaves(tree))


def device_memory_stats(device=None) -> Optional[dict]:
    d = device or jax.local_devices()[0]
    try:
        return d.memory_stats()
    except Exception:
        return None


def format_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.2f} {unit}"
        n /= 1024
    return f"{n:.2f} TiB"


def print_memory_usage(params: Any = None, opt_state: Any = None,
                       grads: Any = None, log=print) -> dict:
    """Breakdown print in the reference's spirit: model / optimizer / grads
    statics plus live device stats."""
    report = {}
    if params is not None:
        report["model_bytes"] = tree_bytes(params)
    if opt_state is not None:
        report["optimizer_bytes"] = tree_bytes(opt_state)
    if grads is not None:
        report["gradient_bytes"] = tree_bytes(grads)
    stats = device_memory_stats()
    if stats:
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                report[k] = stats[k]
    for k, v in report.items():
        log(f"  {k:>20}: {format_bytes(v)}")
    return report
