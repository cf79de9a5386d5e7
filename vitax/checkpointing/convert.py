"""Two-way conversion between the reference's torch `state_dict` layout and
the vitax param pytree.

The reference's torch model stores (src/checkpoint.py:80-115):
  * 2-D linear weights transposed (`[out, in]`),
  * q/k/v weights in 3-D npz layout `[D, H, Hd]` (kept as-is),
  * out-proj weights `[H, Hd, D]` (kept as-is),
  * conv patch-embedding OIHW (npz is HWIO, permuted (3,2,0,1)).

vitax's canonical layout *is* the npz layout, so this module inverts exactly
those rules. Works on dicts of numpy arrays — no torch dependency; use
`vitax.checkpointing.pth` to read/write actual `.pth` archives.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def params_from_torch_state_dict(sd: Dict[str, np.ndarray], num_layers: int,
                                 num_classes: int = None) -> Dict[str, Any]:
    """torch-layout state_dict (numpy values) → vitax ViT param pytree.

    Key naming follows the reference model (src/model.py):
    `transformer.encoder_layers.{i}.{norm1,attn,norm2,mlp}...`.
    """
    g = lambda k: np.asarray(sd[k])
    L = num_layers

    def stack(fmt, transform=lambda a: a):
        return np.stack([transform(g(fmt.format(i=i))) for i in range(L)], axis=0)

    t = lambda a: a.T  # undo the 2-D transpose rule

    params: Dict[str, Any] = {
        "embedding": {
            # OIHW → HWIO
            "kernel": np.transpose(g("embedding.weight"), (2, 3, 1, 0)),
            "bias": g("embedding.bias"),
        },
        "cls_token": g("cls_token"),
        "pos_embedding": g("transformer.pos_embedding.pos_embedding"),
        "layers": {
            "ln1": {
                "scale": stack("transformer.encoder_layers.{i}.norm1.weight"),
                "bias": stack("transformer.encoder_layers.{i}.norm1.bias"),
            },
            "attn": {
                name: {
                    # 3-D qkv/out weights are stored untransposed in torch too
                    "kernel": stack("transformer.encoder_layers.{i}.attn.%s.weight" % name),
                    "bias": stack("transformer.encoder_layers.{i}.attn.%s.bias" % name),
                }
                for name in ("query", "key", "value", "out")
            },
            "ln2": {
                "scale": stack("transformer.encoder_layers.{i}.norm2.weight"),
                "bias": stack("transformer.encoder_layers.{i}.norm2.bias"),
            },
            "mlp": {
                "fc1": {
                    "kernel": stack("transformer.encoder_layers.{i}.mlp.fc1.weight", t),
                    "bias": stack("transformer.encoder_layers.{i}.mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": stack("transformer.encoder_layers.{i}.mlp.fc2.weight", t),
                    "bias": stack("transformer.encoder_layers.{i}.mlp.fc2.bias"),
                },
            },
        },
        "encoder_norm": {"scale": g("transformer.norm.weight"),
                         "bias": g("transformer.norm.bias")},
    }
    cw = sd.get("classifier.weight")
    if cw is not None and (num_classes is None or
                           np.asarray(cw).shape[0] == num_classes):
        params["classifier"] = {"kernel": np.asarray(cw).T,
                                "bias": g("classifier.bias")}
    return params


def params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """vitax ViT param pytree → torch-layout state_dict (numpy values)."""
    sd: Dict[str, np.ndarray] = {
        "embedding.weight": np.transpose(np.asarray(params["embedding"]["kernel"]),
                                         (3, 2, 0, 1)),  # HWIO → OIHW
        "embedding.bias": np.asarray(params["embedding"]["bias"]),
        "cls_token": np.asarray(params["cls_token"]),
        "transformer.pos_embedding.pos_embedding": np.asarray(params["pos_embedding"]),
        "transformer.norm.weight": np.asarray(params["encoder_norm"]["scale"]),
        "transformer.norm.bias": np.asarray(params["encoder_norm"]["bias"]),
    }
    if "classifier" in params:
        sd["classifier.weight"] = np.asarray(params["classifier"]["kernel"]).T
        sd["classifier.bias"] = np.asarray(params["classifier"]["bias"])
    layers = params["layers"]
    L = np.asarray(layers["ln1"]["scale"]).shape[0]
    for i in range(L):
        pre = f"transformer.encoder_layers.{i}"
        sd[f"{pre}.norm1.weight"] = np.asarray(layers["ln1"]["scale"][i])
        sd[f"{pre}.norm1.bias"] = np.asarray(layers["ln1"]["bias"][i])
        sd[f"{pre}.norm2.weight"] = np.asarray(layers["ln2"]["scale"][i])
        sd[f"{pre}.norm2.bias"] = np.asarray(layers["ln2"]["bias"][i])
        for name in ("query", "key", "value", "out"):
            sd[f"{pre}.attn.{name}.weight"] = np.asarray(layers["attn"][name]["kernel"][i])
            sd[f"{pre}.attn.{name}.bias"] = np.asarray(layers["attn"][name]["bias"][i])
        sd[f"{pre}.mlp.fc1.weight"] = np.asarray(layers["mlp"]["fc1"]["kernel"][i]).T
        sd[f"{pre}.mlp.fc1.bias"] = np.asarray(layers["mlp"]["fc1"]["bias"][i])
        sd[f"{pre}.mlp.fc2.weight"] = np.asarray(layers["mlp"]["fc2"]["kernel"][i]).T
        sd[f"{pre}.mlp.fc2.bias"] = np.asarray(layers["mlp"]["fc2"]["bias"][i])
    return sd
