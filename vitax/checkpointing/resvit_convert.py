"""Res-ViT checkpoint conversion.

Three directions:
  * torch res-vit state_dict → vitax params (read reference-trained models)
  * vitax params → torch res-vit state_dict (parity tests, export)
  * std-ViT params → res-vit params — the reference's
    `load_pretrained_with_mapping` (res-vit/utils.py:158-443): pretrained
    plain-ViT weights seed the res-vit backbone (qkv `[D,H,Hd]` reshaped to
    `[D,D]`, out `[H,Hd,D]` to `[D,D]`), while routers/approximators/LoRA
    keep their fresh init. Returns the same JSON-able mapping log the
    reference writes (weight_mapping_log.json).

torch Linear weights are `[out,in]`; vitax kernels are `[in,out]` — every 2-D
projection transposes (the rule src/checkpoint.py:97-99 applies in reverse).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from vitax.core.config import ResViTConfig
from vitax.models.resvit import layer_roles


def _ln_from(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _lin_from(sd, name):
    p = {"kernel": np.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def resvit_params_from_torch_state_dict(sd: Dict[str, np.ndarray],
                                        cfg: ResViTConfig) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    roles = layer_roles(cfg)
    layers = []
    for i, role in enumerate(roles):
        pre = f"layers.{i}"
        lp: Dict[str, Any] = {
            "attention_norm": _ln_from(sd, f"{pre}.attention_norm.layer_norm"),
            "ffn_norm": _ln_from(sd, f"{pre}.ffn_norm.layer_norm"),
            "attention": {
                w: _lin_from(sd, f"{pre}.attention.{w}")
                for w in ("wq", "wk", "wv", "wo")
            },
            "feed_forward": {
                "fc1": _lin_from(sd, f"{pre}.feed_forward.fc1"),
                "fc2": _lin_from(sd, f"{pre}.feed_forward.fc2"),
            },
        }
        if cfg.use_lora:
            for l in ("lora_q", "lora_k", "lora_v"):
                lp["attention"][l] = {
                    "a": _lin_from(sd, f"{pre}.attention.{l}.lora_A"),
                    "b": _lin_from(sd, f"{pre}.attention.{l}.lora_B"),
                }
        if role.get("routed") and role.get("is_block_head"):
            rp = f"{pre}.router"
            lp["router"] = {
                "in_norm": _ln_from(sd, f"{rp}.in_conv.0.layer_norm"),
                "in_proj": _lin_from(sd, f"{rp}.in_conv.1"),
                "out1": _lin_from(sd, f"{rp}.out_conv.0"),
                "out2": _lin_from(sd, f"{rp}.out_conv.2"),
                "out3": _lin_from(sd, f"{rp}.out_conv.4"),
            }
            e = 2 ** cfg.block_size
            d, r = cfg.dim, cfg.low_rank_dim
            down = np.zeros((e, d, r), np.float32)
            up = np.zeros((e, r, d), np.float32)
            ap = f"{pre}.block_path_approximators.approximators"
            for k in range(e - 1):  # all-keep slot has no reference module
                down[k] = np.asarray(sd[f"{ap}.{k}.down_proj.weight"]).T
                up[k] = np.asarray(sd[f"{ap}.{k}.up_proj.weight"]).T
            lp["approximators"] = {"down": down, "up": up}
        layers.append(lp)

    return {
        "embedding": {
            "kernel": np.transpose(sd["embedding.weight"], (2, 3, 1, 0)),
            "bias": sd["embedding.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embedding": sd["pos_embedding.pos_embedding"],
        "layers": layers,
        "norm": _ln_from(sd, "norm.layer_norm"),
        "classifier": _lin_from(sd, "classifier"),
    }


def _ln_to(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["scale"])
    sd[f"{name}.bias"] = np.asarray(p["bias"])


def _lin_to(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{name}.bias"] = np.asarray(p["bias"])


def resvit_params_to_torch_state_dict(params: Dict[str, Any],
                                      cfg: ResViTConfig) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {
        "embedding.weight": np.transpose(
            np.asarray(params["embedding"]["kernel"]), (3, 2, 0, 1)),
        "embedding.bias": np.asarray(params["embedding"]["bias"]),
        "cls_token": np.asarray(params["cls_token"]),
        "pos_embedding.pos_embedding": np.asarray(params["pos_embedding"]),
    }
    _ln_to(sd, "norm.layer_norm", params["norm"])
    _lin_to(sd, "classifier", params["classifier"])
    roles = layer_roles(cfg)
    for i, role in enumerate(roles):
        pre = f"layers.{i}"
        lp = params["layers"][i]
        _ln_to(sd, f"{pre}.attention_norm.layer_norm", lp["attention_norm"])
        _ln_to(sd, f"{pre}.ffn_norm.layer_norm", lp["ffn_norm"])
        for w in ("wq", "wk", "wv", "wo"):
            _lin_to(sd, f"{pre}.attention.{w}", lp["attention"][w])
        _lin_to(sd, f"{pre}.feed_forward.fc1", lp["feed_forward"]["fc1"])
        _lin_to(sd, f"{pre}.feed_forward.fc2", lp["feed_forward"]["fc2"])
        if cfg.use_lora:
            for l in ("lora_q", "lora_k", "lora_v"):
                _lin_to(sd, f"{pre}.attention.{l}.lora_A",
                        lp["attention"][l]["a"])
                _lin_to(sd, f"{pre}.attention.{l}.lora_B",
                        lp["attention"][l]["b"])
        if role.get("routed") and role.get("is_block_head"):
            rp = f"{pre}.router"
            _ln_to(sd, f"{rp}.in_conv.0.layer_norm", lp["router"]["in_norm"])
            _lin_to(sd, f"{rp}.in_conv.1", lp["router"]["in_proj"])
            _lin_to(sd, f"{rp}.out_conv.0", lp["router"]["out1"])
            _lin_to(sd, f"{rp}.out_conv.2", lp["router"]["out2"])
            _lin_to(sd, f"{rp}.out_conv.4", lp["router"]["out3"])
            ap = f"{pre}.block_path_approximators.approximators"
            e = 2 ** cfg.block_size
            for k in range(e - 1):
                sd[f"{ap}.{k}.down_proj.weight"] = np.asarray(
                    lp["approximators"]["down"][k]).T
                sd[f"{ap}.{k}.up_proj.weight"] = np.asarray(
                    lp["approximators"]["up"][k]).T
    return sd


def resvit_params_from_vit(vit_params: Dict[str, Any],
                           resvit_params: Dict[str, Any],
                           cfg: ResViTConfig
                           ) -> Tuple[Dict[str, Any], Dict[str, str]]:
    """Seed res-vit params with a pretrained std-ViT pytree — the reference's
    `load_pretrained_with_mapping` (res-vit/utils.py:228-324): backbone
    weights map over (qkv `[D,H,Hd]`→`[D,D]`, out `[H,Hd,D]`→`[D,D]`),
    everything res-vit-specific keeps its fresh init from `resvit_params`.
    Returns (params, mapping_log)."""
    import copy
    p = copy.deepcopy(resvit_params)
    log: Dict[str, str] = {}
    d = cfg.dim

    def take(dst_keys, src, src_name):
        node = p
        for k in dst_keys[:-1]:
            node = node[k]
        node[dst_keys[-1]] = np.asarray(src)
        log["/".join(map(str, dst_keys))] = src_name

    take(["embedding", "kernel"], vit_params["embedding"]["kernel"],
         "embedding/kernel")
    take(["embedding", "bias"], vit_params["embedding"]["bias"],
         "embedding/bias")
    take(["cls_token"], vit_params["cls_token"], "cls_token")
    take(["pos_embedding"], vit_params["pos_embedding"], "pos_embedding")
    take(["norm", "scale"], vit_params["encoder_norm"]["scale"],
         "encoder_norm/scale")
    take(["norm", "bias"], vit_params["encoder_norm"]["bias"],
         "encoder_norm/bias")
    if "classifier" in vit_params and (
            np.asarray(vit_params["classifier"]["kernel"]).shape[-1]
            == cfg.num_classes):
        take(["classifier", "kernel"], vit_params["classifier"]["kernel"],
             "classifier/kernel")
        take(["classifier", "bias"], vit_params["classifier"]["bias"],
             "classifier/bias")

    vl = vit_params["layers"]
    for i in range(cfg.n_layers):
        pre = ["layers", i]
        take(pre + ["attention_norm", "scale"], vl["ln1"]["scale"][i],
             f"encoderblock_{i}/ln1/scale")
        take(pre + ["attention_norm", "bias"], vl["ln1"]["bias"][i],
             f"encoderblock_{i}/ln1/bias")
        take(pre + ["ffn_norm", "scale"], vl["ln2"]["scale"][i],
             f"encoderblock_{i}/ln2/scale")
        take(pre + ["ffn_norm", "bias"], vl["ln2"]["bias"][i],
             f"encoderblock_{i}/ln2/bias")
        for src, dst in (("query", "wq"), ("key", "wk"), ("value", "wv")):
            k3 = np.asarray(vl["attn"][src]["kernel"][i])  # [D,H,Hd]
            b2 = np.asarray(vl["attn"][src]["bias"][i])    # [H,Hd]
            take(pre + ["attention", dst, "kernel"], k3.reshape(d, -1),
                 f"encoderblock_{i}/attn/{src}/kernel")
            take(pre + ["attention", dst, "bias"], b2.reshape(-1),
                 f"encoderblock_{i}/attn/{src}/bias")
        ko = np.asarray(vl["attn"]["out"]["kernel"][i])     # [H,Hd,D]
        take(pre + ["attention", "wo", "kernel"], ko.reshape(-1, d),
             f"encoderblock_{i}/attn/out/kernel")
        take(pre + ["attention", "wo", "bias"],
             vl["attn"]["out"]["bias"][i], f"encoderblock_{i}/attn/out/bias")
        take(pre + ["feed_forward", "fc1", "kernel"],
             vl["mlp"]["fc1"]["kernel"][i], f"encoderblock_{i}/mlp/fc1/kernel")
        take(pre + ["feed_forward", "fc1", "bias"],
             vl["mlp"]["fc1"]["bias"][i], f"encoderblock_{i}/mlp/fc1/bias")
        take(pre + ["feed_forward", "fc2", "kernel"],
             vl["mlp"]["fc2"]["kernel"][i], f"encoderblock_{i}/mlp/fc2/kernel")
        take(pre + ["feed_forward", "fc2", "bias"],
             vl["mlp"]["fc2"]["bias"][i], f"encoderblock_{i}/mlp/fc2/bias")
    return p, log
