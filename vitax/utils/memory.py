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


def optimize_memory_usage() -> Optional[dict]:
    """Host-side GC + live device stats — the reference's
    `optimize_memory_usage` (res-vit/utils.py:558-573: gc.collect +
    empty_cache + synchronize). XLA owns its arena, so the actionable parts
    are collecting host garbage (drops donated-buffer handles) and reporting
    stats."""
    import gc
    gc.collect()
    return device_memory_stats()


def log_model_layers(params: Any, log=print) -> int:
    """Per-leaf shape/param-count report — the reference's
    `log_model_layers` (src/utils.py:311-320). Returns total param count."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        n = int(np.size(leaf))
        total += n
        log(f"  {key:<60} {str(np.shape(leaf)):<20} {n:>12,}")
    log(f"  {'TOTAL':<60} {'':<20} {total:>12,}")
    return total


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
