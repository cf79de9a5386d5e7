"""Token-compaction inference for Residual ViT — the performance path.

The reference's inference (res-vit/model.py:493-529) gathers each sample's
active tokens into a shorter Q and runs asymmetric attention (Q = active,
KV = all), but with data-dependent shapes and a per-sample Python loop —
unjittable and batch-size-1 math. The default vitax path (models/resvit.py)
uses the masked-dense formulation: bit-identical outputs, but inactive tokens
still cost compute.

This module adds the TPU-native *compaction* mode (SURVEY §5 "sort-based
token dropping"): a static `capacity` fraction C of tokens is kept per
sample. Tokens are ranked by the router's keep decision (active first —
stable order preserved within each group by index-biased sort keys), the top
N·C are gathered, attention runs with Q = compacted / KV = all tokens, the
FFN runs on compacted tokens only, and results scatter back into place.
Inactive tokens keep x and take their low-rank path-id approximators exactly
as in the dense path.

Equivalence: when every active token fits in the capacity (and reserved
tokens always do — they sort first), outputs equal the dense path exactly.
Overflowing tokens are dropped to identity, the standard DynamicViT-style
capacity trade-off; tests cover both regimes.

FLOPs: attention Q-side, output projection and FFN scale by C; KV stays
full. At the recipe's active target 0.4–0.6 this is a real ~40% compute cut
on routed layers.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitax.core.config import ResViTConfig
from vitax.models import resvit
from vitax.models.resvit_utils import lra_path_ids
from vitax.ops import layer_norm
from vitax.ops.mlp import gelu_exact


def _gather_tokens(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [B,N,D], idx [B,C] → [B,C,D]."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _scatter_tokens(full: jnp.ndarray, idx: jnp.ndarray,
                    values: jnp.ndarray) -> jnp.ndarray:
    """full [B,N,D] with rows at idx replaced by values [B,C,D]."""
    b = full.shape[0]
    batch_idx = jnp.arange(b)[:, None]
    return full.at[batch_idx, idx].set(values)


def _compact_attention(xq: jnp.ndarray, x_all: jnp.ndarray, p: Any,
                       cfg: ResViTConfig) -> jnp.ndarray:
    """Asymmetric attention: Q from compacted tokens [B,C,D], KV from all
    tokens [B,N,D] (res-vit/model.py:237-299 with x_kv)."""
    b, c, _ = xq.shape
    n = x_all.shape[1]
    h, hkv, hd = cfg.n_heads, (cfg.n_kv_heads or cfg.n_heads), cfg.head_dim
    from vitax.models.resvit import _linear, _lora, _repeat_kv
    q = _linear(xq, p["wq"])
    k = _linear(x_all, p["wk"])
    v = _linear(x_all, p["wv"])
    if cfg.use_lora and "lora_q" in p:
        q = q + _lora(xq, p["lora_q"])
        k = k + _lora(x_all, p["lora_k"])
        v = v + _lora(x_all, p["lora_v"])
    q = q.reshape(b, c, h, hd)
    k = _repeat_kv(k.reshape(b, n, hkv, hd), h // hkv)
    v = _repeat_kv(v.reshape(b, n, hkv, hd), h // hkv)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(xq.dtype)
    return _linear(out.reshape(b, c, h * hd), p["wo"])


def apply_compact(params: Any, images: jnp.ndarray, cfg: ResViTConfig, *,
                  capacity: float = 0.75
                  ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Inference forward with token compaction. NHWC images → (logits, aux).

    `capacity` is the kept-token fraction per routed layer (static shape:
    C = ceil(capacity · N)). Reserved tokens always rank first."""
    if not cfg.use_reslr:
        raise ValueError("compaction requires use_reslr")
    roles = resvit.layer_roles(cfg)
    lra = lra_path_ids(cfg.block_size)

    x = resvit.embed(params, images, cfg)
    b, n, d = x.shape
    cap = min(n, max(1, math.ceil(capacity * n)))
    res = cfg.dynamic_reserve_initials

    acts = []
    routing_maps: Dict[int, jnp.ndarray] = {}
    r_entropy = jnp.zeros((), jnp.float32)
    block_ctx: Dict[str, Any] = {}

    for lid, role in enumerate(roles):
        lp = params["layers"][lid]
        if not role["routed"]:
            x = resvit.plain_block(x, lp, cfg)
            acts.append(jnp.ones((b, n, 1), jnp.float32))
            continue

        if role["is_block_head"]:
            hard, path_ids, entropy, _soft = resvit.router_forward(
                x, lp["router"], cfg, train=False, rng=None)
            block_ctx = {"hard": hard[..., 1], "path_ids": path_ids,
                         "approx": lp["approximators"]}
            r_entropy = r_entropy + entropy
            routing_maps[role["block_id"]] = block_ctx["hard"]

        pos = role["block_pos"]
        lora_ids, trans_ids, _ = lra[pos]
        path_ids = block_ctx["path_ids"]
        active = jnp.isin(path_ids, jnp.asarray(trans_ids, jnp.int32))
        if res > 0:  # reserved tokens always active & first
            forced = jnp.arange(n) < res
            active = active | forced[None, :]

        # rank: active tokens first, stable by original index
        rank_key = (~active).astype(jnp.int32) * n + jnp.arange(n)[None, :]
        order = jnp.argsort(rank_key, axis=-1)          # [B, N]
        keep_idx = order[:, :cap]                       # [B, C]

        # compacted pre-LN block on kept tokens, KV over all tokens
        xq = _gather_tokens(x, keep_idx)                # [B, C, D]
        x_norm = layer_norm(x, lp["attention_norm"]["scale"],
                            lp["attention_norm"]["bias"], cfg.norm_eps,
                            use_pallas=cfg.use_pallas)
        xq_norm = _gather_tokens(x_norm, keep_idx)
        h = xq + _compact_attention(xq_norm, x_norm, lp["attention"], cfg)
        h_norm = layer_norm(h, lp["ffn_norm"]["scale"],
                            lp["ffn_norm"]["bias"], cfg.norm_eps,
                            use_pallas=cfg.use_pallas)
        out_c = h + resvit.feed_forward(h_norm, lp["feed_forward"])

        # scatter back; tokens that were gathered but NOT active keep x
        kept_active = jnp.take_along_axis(active, keep_idx, axis=1)
        xq_orig = xq
        out_c = jnp.where(kept_active[..., None], out_c, xq_orig)
        x = _scatter_tokens(x, keep_idx, out_c)

        # low-rank approximators on their path ids (dense, cheap)
        x = resvit.apply_approximators(x, block_ctx["approx"], path_ids,
                                       lora_ids)
        acts.append(block_ctx["hard"][:, :, pos:pos + 1])

    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                   cfg.norm_eps, use_pallas=cfg.use_pallas)
    from vitax.models.resvit import _linear
    logits = _linear(x[:, 0].astype(jnp.float32), params["classifier"],
                     dtype=jnp.float32)
    aux = {"r_entropy": r_entropy, "acts": jnp.concatenate(acts, axis=-1),
           "routing_maps": routing_maps, "capacity": cap / n}
    return logits, aux


def apply_compact_nchw(params, images_nchw, cfg, **kw):
    return apply_compact(params, jnp.transpose(images_nchw, (0, 2, 3, 1)),
                         cfg, **kw)
