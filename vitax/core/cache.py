"""Persistent XLA compilation cache.

The reference pays no compile cost (PyTorch eager); under XLA every CLI
invocation re-traces and re-compiles its train/eval step — 40-250 s for a
b16-sized fused-kernel program, ~470 s for the compact eval loop (PERF.md).
JAX's on-disk compilation cache removes that for every invocation after the
first: measured through the axon TPU tunnel, a 256 s cold compile+claim
became 2.4 s warm in a fresh process. Every vitax CLI and bench harness
calls :func:`enable_compilation_cache` at startup.

Knobs:
  VITAX_CACHE_DIR  — cache directory (default: <repo>/.jax_cache when the
                     package lives in a git checkout, else ~/.cache/vitax).
  VITAX_NO_CACHE=1 — disable entirely.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED_DIR: str | None = None


def default_cache_dir() -> str:
    env = os.environ.get("VITAX_CACHE_DIR")
    if env:
        return env
    repo_root = Path(__file__).resolve().parents[2]
    if (repo_root / ".git").exists():
        return str(repo_root / ".jax_cache")
    return str(Path.home() / ".cache" / "vitax" / "jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a stable directory.

    Idempotent; safe to call before or after jax initializes a backend.
    Returns the directory in use, or None when disabled.
    """
    global _ENABLED_DIR
    if os.environ.get("VITAX_NO_CACHE") == "1":
        return None
    if _ENABLED_DIR is not None and cache_dir in (None, _ENABLED_DIR):
        return _ENABLED_DIR
    path = cache_dir or default_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took a nontrivial compile; tiny entries are
        # cheap to keep and CLI startup dominates otherwise
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:                                    # pragma: no cover
        return None        # cache is QoL only — never fail the program
    _ENABLED_DIR = path
    return path
