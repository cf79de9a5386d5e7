"""High-level checkpoint loading — format dispatch.

Mirrors the reference's `load_checkpoint` (src/checkpoint.py:7-17): `.npz`
loads the JAX-native ViT checkpoint (zero conversion — SURVEY §5 notes the
npz layout *is* our layout); `.pth` goes through the pure-python codec +
torch-layout conversion. Also provides the converter-CLI capability
(`save_jax_to_pytorch`, src/checkpoint.py:28-33): npz → torch-layout .pth.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from vitax.checkpointing.convert import (params_from_torch_state_dict,
                                         params_to_torch_state_dict)
from vitax.checkpointing.npz import flat_npz_to_params, load_npz_params
from vitax.checkpointing.pth import load_state_dict_pth, save_pth
from vitax.core.config import ViTConfig


def load_checkpoint(path: str, cfg: ViTConfig) -> Dict[str, Any]:
    """Load pretrained ViT weights from `.npz` or `.pth` into the vitax param
    pytree. If the checkpoint head does not match `cfg.num_classes` the
    `classifier` entry is absent — callers re-init it
    (src/train.py:117-121)."""
    if path.endswith(".npz"):
        return load_npz_params(path, cfg)
    sd = load_state_dict_pth(path)
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not hasattr(v, "module")}  # drop opaque stubs
    return params_from_torch_state_dict(sd, cfg.num_layers, cfg.num_classes)


def save_jax_to_pytorch(npz_path: str, save_path: str,
                        num_layers: Optional[int] = None) -> None:
    """npz ViT checkpoint → reference-loadable `.pth` with torch layouts
    (the reference converter's exact output contract,
    src/checkpoint.py:28-33 + 80-115)."""
    with open(npz_path, "rb") as f:
        flat = dict(np.load(f))
    if num_layers is None:
        num_layers = 1 + max(
            int(k.split("encoderblock_")[1].split("/")[0])
            for k in flat if "encoderblock_" in k)
    params = flat_npz_to_params(flat, num_layers)
    sd = params_to_torch_state_dict(params)
    save_pth({"state_dict": sd}, save_path)


def export_pth(params: Dict[str, Any], save_path: str) -> None:
    """vitax params → reference-loadable `.pth` (torch layouts)."""
    sd = params_to_torch_state_dict(params)
    save_pth({"state_dict": sd}, save_path)
