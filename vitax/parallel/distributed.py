"""Multi-host (DCN) initialization.

The reference is single-process (SURVEY §2.3); vitax scales across hosts the
idiomatic JAX way: `jax.distributed.initialize` + the same Mesh code — XLA
routes intra-slice collectives over ICI and cross-host ones over DCN. No
custom comm layer.

Call `init_distributed()` once at program start (no-op when the environment
has no coordinator configured, so single-host runs are unchanged).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX. Returns True when distributed mode is on.

    Explicit args win; otherwise standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a TPU
    pod environment that jax auto-detects) are used. With neither, this is a
    no-op single-process setup."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else \
        _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if addr is None and nproc is None:
        return False
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
