"""Standard Vision Transformer — TPU-native functional implementation.

Capability-parity rebuild of the reference `VisionTransformer`
(src/model.py:159-211) and its sub-modules:

* `PositionEmbs`    (src/model.py:7-22)   → param add inside jit
* `MlpBlock`        (src/model.py:25-51)  → `vitax.ops.mlp_block`
* `LinearGeneral`   (src/model.py:54-63)  → einsum against `[D,H,Hd]` weights;
  the weight layout is kept exactly as the ViT npz checkpoints store it
  (src/checkpoint.py:100-109 confirms torch keeps it untransposed), so npz
  weights load with zero conversion.
* `SelfAttention`   (src/model.py:66-101) → `vitax.ops.multi_head_attention`
* `EncoderBlock`    (src/model.py:104-130) → pre-LN residual block
* `Encoder`         (src/model.py:133-156) → `lax.scan` over stacked layers

Design: params are a plain pytree (dict) with layer-stacked leaves
(`[L, ...]`), applied by pure functions. The encoder iterates with
`jax.lax.scan` (one compiled block body regardless of depth) and can
rematerialize blocks (`cfg.remat`) to trade FLOPs for HBM on h14@384.

Faithful-behavior notes carried over from the reference:
  * attention dropout is constructed but never applied (src/model.py:78-101) —
    we do not apply it either;
  * block dropout is applied after attention output only (src/model.py:123),
    MLP has its own two dropouts (src/model.py:45-50), position embedding has
    one (src/model.py:19-20). All presets set every rate to 0.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from vitax.core.config import ViTConfig
from vitax.ops import layer_norm, mlp_block, patchify_matmul
from vitax.ops.attention import multi_head_attention_bhsd

Params = Dict[str, Any]

# The reference's `nn.LayerNorm(dim)` uses torch's default eps = 1e-5
# (src/model.py:108,114,146). Logit parity requires matching it exactly.
LN_EPS = 1e-5


def init_params(key: jax.Array, cfg: ViTConfig) -> Params:
    """Initialize a parameter pytree.

    Weight layouts match the ViT npz checkpoint format so pretrained weights
    load without transposition. Inits are sensible modern defaults (the
    reference's `torch.randn` std-1.0 init for LinearGeneral is an accident of
    the codebase, never used — every recipe loads a checkpoint)."""
    d, m = cfg.emb_dim, cfg.mlp_dim
    h, hd = cfg.num_heads, cfg.head_dim
    L = cfg.num_layers
    ph, pw = cfg.patch_size
    n = cfg.num_patches
    pdt = cfg.param_dtype

    keys = jax.random.split(key, 12)

    def lecun(k, shape, fan_in):
        return (jax.random.truncated_normal(k, -2.0, 2.0, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(pdt)

    zeros = lambda shape: jnp.zeros(shape, pdt)

    params: Params = {
        "embedding": {
            "kernel": lecun(keys[0], (ph, pw, 3, d), ph * pw * 3),
            "bias": zeros((d,)),
        },
        "cls_token": zeros((1, 1, d)),
        "pos_embedding": (jax.random.normal(keys[1], (1, n + 1, d), jnp.float32)
                          * 0.02).astype(pdt),
        "layers": {
            "ln1": {"scale": jnp.ones((L, d), pdt), "bias": zeros((L, d))},
            "attn": {
                "query": {"kernel": lecun(keys[2], (L, d, h, hd), d),
                          "bias": zeros((L, h, hd))},
                "key": {"kernel": lecun(keys[3], (L, d, h, hd), d),
                        "bias": zeros((L, h, hd))},
                "value": {"kernel": lecun(keys[4], (L, d, h, hd), d),
                          "bias": zeros((L, h, hd))},
                "out": {"kernel": lecun(keys[5], (L, h, hd, d), d),
                        "bias": zeros((L, d))},
            },
            "ln2": {"scale": jnp.ones((L, d), pdt), "bias": zeros((L, d))},
            "mlp": {
                "fc1": {"kernel": lecun(keys[6], (L, d, m), d), "bias": zeros((L, m))},
                "fc2": {"kernel": lecun(keys[7], (L, m, d), m), "bias": zeros((L, d))},
            },
        },
        "encoder_norm": {"scale": jnp.ones((d,), pdt), "bias": zeros((d,))},
        "classifier": {"kernel": lecun(keys[8], (d, cfg.num_classes), d),
                       "bias": zeros((cfg.num_classes,))},
    }
    return params


def reinit_classifier(params: Params, key: jax.Array, num_classes: int) -> Params:
    """Re-initialize the classification head for a new class count —
    the reference's head re-init on class mismatch (src/train.py:117-121)."""
    d = params["classifier"]["kernel"].shape[0]
    pdt = params["classifier"]["kernel"].dtype
    new = dict(params)
    new["classifier"] = {
        "kernel": (jax.random.truncated_normal(key, -2.0, 2.0, (d, num_classes),
                                               jnp.float32) * (d ** -0.5)).astype(pdt),
        "bias": jnp.zeros((num_classes,), pdt),
    }
    return new


def _dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
             deterministic: bool) -> jnp.ndarray:
    if deterministic or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _attention(x: jnp.ndarray, p: Params, cfg: ViTConfig) -> jnp.ndarray:
    """SelfAttention with LinearGeneral-layout weights (src/model.py:66-101).

    QKV are produced directly in the kernel-native [B,H,S,Hd] layout by the
    projection einsums (the transpose fuses into the matmul's output write),
    so no standalone HBM transpose surrounds the attention kernel."""
    dt = x.dtype
    if cfg.fused_qkv:
        from vitax.ops import pallas_kernels as pk
        b, s, d = x.shape
        h, hd = cfg.num_heads, cfg.head_dim
        wq = p["query"]["kernel"].astype(dt).reshape(d, h * hd)
        wk = p["key"]["kernel"].astype(dt).reshape(d, h * hd)
        wv = p["value"]["kernel"].astype(dt).reshape(d, h * hd)
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)
        if pk.qkv_attention_supported(x, wqkv):
            bqkv = jnp.concatenate(
                [p["query"]["bias"].reshape(-1), p["key"]["bias"].reshape(-1),
                 p["value"]["bias"].reshape(-1)]).astype(jnp.float32)
            wo = p["out"]["kernel"].astype(dt).reshape(h * hd, d)
            bo = p["out"]["bias"].astype(jnp.float32)
            spq = (s + 7) // 8 * 8
            xp = jnp.pad(x, ((0, 0), (0, spq - s), (0, 0))) if spq != s else x
            out = pk.fused_qkvo_attention(xp, wqkv, bqkv, wo, bo,
                                          s, h, hd)[:, :s]
            return out.astype(dt)
    q = jnp.einsum("bnd,dhk->bhnk", x, p["query"]["kernel"].astype(dt),
                   preferred_element_type=jnp.float32) \
        + p["query"]["bias"].astype(jnp.float32)[None, :, None, :]
    k = jnp.einsum("bnd,dhk->bhnk", x, p["key"]["kernel"].astype(dt),
                   preferred_element_type=jnp.float32) \
        + p["key"]["bias"].astype(jnp.float32)[None, :, None, :]
    v = jnp.einsum("bnd,dhk->bhnk", x, p["value"]["kernel"].astype(dt),
                   preferred_element_type=jnp.float32) \
        + p["value"]["bias"].astype(jnp.float32)[None, :, None, :]
    out = multi_head_attention_bhsd(q.astype(dt), k.astype(dt), v.astype(dt),
                                    use_pallas=cfg.use_pallas)
    y = jnp.einsum("bhnk,hkd->bnd", out, p["out"]["kernel"].astype(dt),
                   preferred_element_type=jnp.float32) + p["out"]["bias"].astype(jnp.float32)
    return y.astype(dt)


def _fused_block_attention(x: jnp.ndarray, lp: Params, cfg: ViTConfig,
                           mesh=None,
                           seq_len: Optional[int] = None
                           ) -> Optional[jnp.ndarray]:
    """LN1 + QKV + attention + out-projection in ONE Pallas kernel
    (ops.pallas_kernels.fused_ln_qkvo_attention) — neither x̂ nor any
    per-head intermediate touches HBM; LN and all projection weight grads
    accumulate in VMEM. Returns None when the shape gate rejects.
    With a model-parallel mesh, runs per-shard via shard_map (Megatron
    head/row split + one psum) instead of letting XLA all-gather wqkv.
    `seq_len`: padded-stream mode — x already carries zero/garbage pad rows
    up to the kernel row granularity (apply() pads ONCE before the layer
    loop); skip the per-layer pad/slice and return [B, spq, D]."""
    from vitax.ops import pallas_kernels as pk
    dt = x.dtype
    b, s, d = x.shape
    if seq_len is not None:
        s = seq_len  # x.shape[1] is the padded spq
    h, hd = cfg.num_heads, cfg.head_dim
    p = lp["attn"]

    tp = 1
    if mesh is not None:
        from vitax.parallel.tp_kernels import tp_size
        tp = tp_size(mesh)
    if tp > 1 and h % tp == 0:
        if not pk.qkv_attention_supported(
                x, jnp.zeros((d, 3 * (h // tp) * hd), dt)):
            return None
        from vitax.parallel.tp_kernels import fused_ln_qkvo_attention_tp
        spq = (s + 7) // 8 * 8
        xp = jnp.pad(x, ((0, 0), (0, spq - s), (0, 0))) if spq != s else x
        out = fused_ln_qkvo_attention_tp(
            xp, lp["ln1"]["scale"].astype(jnp.float32),
            lp["ln1"]["bias"].astype(jnp.float32),
            p["query"]["kernel"].astype(dt), p["key"]["kernel"].astype(dt),
            p["value"]["kernel"].astype(dt),
            p["query"]["bias"].astype(jnp.float32),
            p["key"]["bias"].astype(jnp.float32),
            p["value"]["bias"].astype(jnp.float32),
            p["out"]["kernel"].astype(dt),
            p["out"]["bias"].astype(jnp.float32),
            mesh, LN_EPS, s, h, hd,
            cfg.int8_attn, cfg.int8_attn_grad, cfg.int8_dw,
            cfg.int4_attn,
            cfg.int4_grad and cfg.int4_attn)[:, :s]
        return out.astype(dt)

    wq = p["query"]["kernel"].astype(dt).reshape(d, h * hd)
    wk = p["key"]["kernel"].astype(dt).reshape(d, h * hd)
    wv = p["value"]["kernel"].astype(dt).reshape(d, h * hd)
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    use_flash = False
    if not pk.qkv_attention_supported(x, wqkv):
        # big-d geometries (h14: d=1280, s=736) exceed the whole-seq
        # kernel's VMEM probs — fall through to the KV-blocked
        # online-softmax variant (VERDICT r4 #6)
        if not pk.qkv_attention_flash_supported(x, wqkv):
            return None
        use_flash = True
    bqkv = jnp.concatenate(
        [p["query"]["bias"].reshape(-1), p["key"]["bias"].reshape(-1),
         p["value"]["bias"].reshape(-1)]).astype(jnp.float32)
    wo = p["out"]["kernel"].astype(dt).reshape(h * hd, d)
    bo = p["out"]["bias"].astype(jnp.float32)
    spq = (s + 7) // 8 * 8
    # zero-pad: LN of a zero row is finite, and padded-row cotangents are
    # zero, so no gradient leaks from padding (kernel docstring). In
    # padded-stream mode x already has the pad rows (apply() pads once).
    if seq_len is not None:
        xp = x
    else:
        xp = jnp.pad(x, ((0, 0), (0, spq - s), (0, 0))) if spq != s else x
    if use_flash:
        out = pk.fused_ln_qkvo_attention_flash(
            xp, lp["ln1"]["scale"].astype(jnp.float32),
            lp["ln1"]["bias"].astype(jnp.float32), wqkv, bqkv, wo, bo,
            LN_EPS, s, h, hd)
    else:
        out = pk.fused_ln_qkvo_attention(
            xp, lp["ln1"]["scale"].astype(jnp.float32),
            lp["ln1"]["bias"].astype(jnp.float32), wqkv, bqkv, wo, bo,
            LN_EPS, s, h, hd, cfg.int8_attn, cfg.int8_attn_grad,
            cfg.int8_dw, cfg.int4_attn,
            cfg.int4_grad and cfg.int4_attn)
    if seq_len is None:
        out = out[:, :s]
    return out.astype(dt)


def _fused_block_mlp(x: jnp.ndarray, lp: Params, cfg: ViTConfig,
                     mesh=None) -> Optional[jnp.ndarray]:
    """LN2 + fc1 + GELU + fc2 + residual in ONE Pallas kernel
    (ops.pallas_kernels.fused_ln_mlp): neither the LN output, the GELU
    pre-activations, nor the [N,M] intermediate gradient ever touch HBM;
    dW1/dW2 accumulate in VMEM. Returns None when the shape gate rejects.
    Only valid with the block dropouts inactive (all presets set them 0,
    src/config.py:64-65). With a model-parallel mesh, runs per-shard
    (fc1 column- / fc2 row-parallel + one psum) via shard_map."""
    from vitax.ops import pallas_kernels as pk
    w1 = lp["mlp"]["fc1"]["kernel"].astype(x.dtype)
    w2 = lp["mlp"]["fc2"]["kernel"].astype(x.dtype)

    tp = 1
    if mesh is not None:
        from vitax.parallel.tp_kernels import tp_size
        tp = tp_size(mesh)
    if tp > 1 and w1.shape[1] % tp == 0:
        m_local = w1.shape[1] // tp
        if not pk.ln_mlp_supported(x, w1[:, :m_local], w2[:m_local]):
            return None
        from vitax.parallel.tp_kernels import fused_ln_mlp_tp
        return fused_ln_mlp_tp(
            x, lp["ln2"]["scale"].astype(jnp.float32),
            lp["ln2"]["bias"].astype(jnp.float32),
            w1, lp["mlp"]["fc1"]["bias"].astype(jnp.float32),
            w2, lp["mlp"]["fc2"]["bias"].astype(jnp.float32), mesh, LN_EPS,
            int8=cfg.int8_mlp, int8_grad=cfg.int8_mlp_grad,
            int8_dw=cfg.int8_dw, int4=cfg.int4_mlp,
            int4_grad=cfg.int4_grad)

    if not pk.ln_mlp_supported(x, w1, w2):
        return None
    return pk.fused_ln_mlp(
        x, lp["ln2"]["scale"].astype(jnp.float32),
        lp["ln2"]["bias"].astype(jnp.float32),
        w1, lp["mlp"]["fc1"]["bias"].astype(jnp.float32),
        w2, lp["mlp"]["fc2"]["bias"].astype(jnp.float32), LN_EPS,
        save_acts=cfg.fused_mlp_save, int8=cfg.int8_mlp,
        int8_grad=cfg.int8_mlp_grad, int8_dw=cfg.int8_dw,
        int4=cfg.int4_mlp, int4_grad=cfg.int4_grad)


def _block(x: jnp.ndarray, lp: Params, cfg: ViTConfig,
           rng: Optional[jax.Array], deterministic: bool,
           mesh=None, seq_len: Optional[int] = None) -> jnp.ndarray:
    """Pre-LN encoder block (src/model.py:117-130)."""
    r1 = r2 = r3 = None
    if rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    h = (_fused_block_attention(x, lp, cfg, mesh, seq_len)
         if cfg.fused_qkv else None)
    if h is None and seq_len is not None:
        # padded-stream eligibility mirrors the fused gates; the XLA paths
        # have no seq mask, so reaching them here would leak pad K/V
        raise RuntimeError("padded-stream block requires the fused "
                           "attention kernel; gate mismatch in apply()")
    if h is None:
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], LN_EPS,
                       use_pallas=cfg.use_pallas)
        h = _attention(h, lp["attn"], cfg)
    # named residual: the selective-remat policy keeps attention outputs and
    # recomputes the (cheaper, memory-fat) LN+MLP half of the block
    h = checkpoint_name(h, "attn_out")
    h = _dropout(h, cfg.dropout_rate, r1, deterministic)
    x = x + h
    if cfg.fused_mlp and (deterministic or cfg.dropout_rate <= 0.0):
        y = _fused_block_mlp(x, lp, cfg, mesh)
        if y is not None:
            return y
    if seq_len is not None:
        raise RuntimeError("padded-stream block requires the fused MLP "
                           "kernel; gate mismatch in apply()")
    h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], LN_EPS,
                   use_pallas=cfg.use_pallas)
    # MlpBlock with its two dropouts (src/model.py:41-51)
    h1 = jnp.einsum("bnd,dm->bnm", h, lp["mlp"]["fc1"]["kernel"].astype(h.dtype),
                    preferred_element_type=jnp.float32) + lp["mlp"]["fc1"]["bias"].astype(jnp.float32)
    h1 = jax.nn.gelu(h1, approximate=False)
    h1 = _dropout(h1.astype(x.dtype), cfg.dropout_rate, r2, deterministic)
    h2 = jnp.einsum("bnm,md->bnd", h1, lp["mlp"]["fc2"]["kernel"].astype(h1.dtype),
                    preferred_element_type=jnp.float32) + lp["mlp"]["fc2"]["bias"].astype(jnp.float32)
    h2 = _dropout(h2.astype(x.dtype), cfg.dropout_rate, r3, deterministic)
    return x + h2


def embed(params: Params, images: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """Patchify + cls token + position embedding → [B, N+1, D] tokens."""
    if images.ndim != 4 or images.shape[1:] != (*cfg.image_size, 3):
        raise ValueError(
            f"expected NHWC images [B, {cfg.image_size[0]}, {cfg.image_size[1]}, 3] "
            f"for this config, got {images.shape}")
    tokens = patchify_matmul(images, params["embedding"]["kernel"],
                             params["embedding"]["bias"], dtype=cfg.dtype)
    b = tokens.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(cfg.dtype),
                           (b, 1, tokens.shape[-1]))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    # fp32 add of the position embedding, then back to compute dtype
    tokens = (tokens.astype(jnp.float32)
              + params["pos_embedding"].astype(jnp.float32)).astype(cfg.dtype)
    return tokens


def drop_tokens(x: jnp.ndarray, rng: jax.Array, keep_ratio: float,
                n_pinned: int = 1) -> jnp.ndarray:
    """PatchDropout/FLIP-style token dropping (train only).

    Keeps the first `n_pinned` tokens (cls by default) plus a fresh
    uniform-random round(keep_ratio·n) subset of the remaining n tokens per
    image, in their original order, and returns the gathered
    [B, n_pinned+k, D] sequence. The encoder then runs at the reduced
    length — attention FLOPs scale ~keep², MLP ~keep — through the
    unchanged kernels. One gather per step (its backward is one scatter-add
    into the full sequence); dropped tokens receive zero gradient, exactly
    the PatchDropout formulation (arXiv:2208.07220; FLIP, arXiv:2212.00794).

    `n_pinned > 1` pins extra leading positions the way cls is pinned —
    res-vit uses it so `dynamic_reserve_initials` slots keep landing on the
    same physical tokens the reference's reserve/entropy/active-loss
    semantics assume (see router_forward).
    """
    b, s, d = x.shape
    n_pinned = max(1, min(n_pinned, s))
    n = s - n_pinned
    if n <= 0:
        return x
    k = max(1, min(n, int(round(keep_ratio * n))))
    if k >= n:
        return x
    noise = jax.random.uniform(rng, (b, n))
    idx = jnp.argsort(noise, axis=1)[:, :k]     # uniform k-subset per image
    idx = jnp.sort(idx, axis=1) + n_pinned      # original order, past pins
    pins = jnp.broadcast_to(jnp.arange(n_pinned, dtype=idx.dtype)[None],
                            (b, n_pinned))
    idx = jnp.concatenate([pins, idx], axis=1)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def _padded_stream_len(x: jnp.ndarray, params: Params, cfg: ViTConfig,
                       mesh, deterministic: bool) -> Optional[int]:
    """Return spq if the whole encoder can run on a single zero-padded
    [B, spq, D] residual stream, else None.

    Today both fused kernels re-pad/slice their input EVERY layer (197→200
    rows for attention, row-block alignment for the MLP) — four ~60 MB HBM
    copies per layer at the bench config. Padding ONCE before the layer
    loop removes them all: the attention kernel masks pad K/V columns via
    seq_len (probs exactly 0 ⇒ no value leak, no gradient leak), pad-row
    outputs stay confined to pad rows (LN/MLP are row-wise), and the head
    reads only the cls row. Measured −10% forward (scripts/handoff_probe.py
    variant D). Requires BOTH fused kernels — the XLA fallbacks have no
    sequence mask — so the gates here mirror _fused_block_attention /
    _fused_block_mlp exactly."""
    from vitax.ops import pallas_kernels as pk
    import os
    if os.environ.get("VITAX_PADDED_STREAM", "1") == "0":
        return None  # A/B knob
    b, s, d = x.shape
    spq = (s + 7) // 8 * 8
    if spq == s:
        return None  # nothing to pad
    if not (cfg.fused_qkv and cfg.fused_mlp):
        return None
    if not (deterministic or cfg.dropout_rate <= 0.0):
        return None
    if mesh is not None:
        from vitax.parallel.tp_kernels import tp_size
        if tp_size(mesh) > 1:
            return None  # TP shard_map kernels keep their own glue
    h, hd = cfg.num_heads, cfg.head_dim
    xp = jax.ShapeDtypeStruct((b, spq, d), cfg.dtype)
    wqkv = jax.ShapeDtypeStruct((d, 3 * h * hd), cfg.dtype)
    if not (pk.qkv_attention_supported(xp, wqkv)
            or pk.qkv_attention_flash_supported(xp, wqkv)):
        return None
    lp0 = jax.tree.map(lambda a: a[0], params["layers"])
    w1 = lp0["mlp"]["fc1"]["kernel"]
    w2 = lp0["mlp"]["fc2"]["kernel"]
    if not pk.ln_mlp_supported(xp, w1, w2):
        return None
    return spq


def apply(params: Params, images: jnp.ndarray, cfg: ViTConfig, *,
          train: bool = False, rng: Optional[jax.Array] = None,
          mesh=None) -> jnp.ndarray:
    """Forward pass: NHWC images [B,H,W,3] → logits [B, num_classes].
    `mesh`: optional device mesh — with a model axis >1 the fused kernels
    run per-shard via shard_map (no weight all-gather)."""
    deterministic = not train or cfg.dropout_rate <= 0.0
    x = embed(params, images, cfg)
    if train and cfg.token_keep < 1.0:
        if rng is None:
            raise ValueError("token_keep < 1.0 requires an rng in training")
        rng, tok_rng = jax.random.split(rng)
        x = drop_tokens(x, tok_rng, cfg.token_keep)
    if not deterministic and rng is not None:
        rng, pos_rng = jax.random.split(rng)
        x = _dropout(x, cfg.dropout_rate, pos_rng, deterministic)

    L = cfg.num_layers
    if deterministic:
        layer_rngs = None
    else:
        layer_rngs = jax.random.split(rng, L)

    # padded residual stream: pad once here instead of per-layer pad/slice
    # inside every kernel call (see _padded_stream_len)
    seq_len = None
    spq = _padded_stream_len(x, params, cfg, mesh, deterministic)
    if spq is not None:
        seq_len = x.shape[1]
        x = jnp.pad(x, ((0, 0), (0, spq - seq_len), (0, 0)))

    def _wrap(f):
        if cfg.remat == "selective":
            # keep attention outputs, recompute LN/MLP/GELU in the backward —
            # drops the fp32 GELU activations (the largest saved tensors, e.g.
            # f32[12,B,197,3072]) at ~half the recompute cost of full remat.
            # mlp_h1/mlp_gp only exist under fused_mlp_save: keeping them lets
            # the remat backward DCE the MLP forward kernel entirely
            return jax.checkpoint(
                f, policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "mlp_h1", "mlp_gp"))
        if cfg.remat:
            return jax.checkpoint(f)
        return f

    def body(x, inputs):
        lp, r = inputs
        return _block(x, lp, cfg, r, deterministic, mesh, seq_len), None

    # int8 activation handoff (VERDICT r4 #1): on the padded stream with
    # the full int8 stack, each kernel's epilogue emits the next kernel's
    # pre-quantized input, so no kernel pays an input LN+pack. Forward
    # values and gradients are bit-identical to the non-handoff int8 path
    # (pallas_kernels.fused_block_int8_handoff). Measured: forward −9%/layer
    # (probe) and 74.6% of the int8 floor (step_split, vs 67.8% without) —
    # but the WHOLE-PROGRAM backward is a few ms slower with the handoff
    # program at exactly the b192 dense shape (per-kernel bwd times
    # unchanged; an XLA scheduling artifact, PERF.md round-5 — measured
    # 1445 vs 1465 at b192 yet +1.7% at b320 and +1.2% at b256), so the
    # default gate is: short sequences (the token-drop phase) OR streams
    # of >= 51200 rows (b256+ dense, where it measured positive).
    # VITAX_INT8_HANDOFF=1 forces it everywhere, =0 disables.
    import os as _os
    _ho_env = _os.environ.get("VITAX_INT8_HANDOFF", "auto")
    handoff = (seq_len is not None and layer_rngs is None
               and cfg.int8_attn and cfg.int8_mlp
               and cfg.int8_attn_grad and cfg.int8_mlp_grad
               and not (cfg.int4_mlp or cfg.int4_attn or cfg.int4_grad)
               and not cfg.fused_mlp_save
               and _ho_env != "0"
               and (_ho_env == "1" or x.shape[1] <= 128
                    or x.shape[0] * x.shape[1] >= 51200))
    if handoff:
        from vitax.ops import pallas_kernels as pk
        handoff = pk.block_handoff_supported(x)
    if handoff:
        f32 = jnp.float32
        dt = cfg.dtype
        h, hd = cfg.num_heads, cfg.head_dim
        ln1_g = params["layers"]["ln1"]["scale"].astype(f32)
        ln1_b = params["layers"]["ln1"]["bias"].astype(f32)
        # next layer's LN1 per layer; the last layer gets the final encoder
        # norm (its packed epilogue output is discarded)
        gn = jnp.concatenate(
            [ln1_g[1:], params["encoder_norm"]["scale"].astype(f32)[None]])
        bn = jnp.concatenate(
            [ln1_b[1:], params["encoder_norm"]["bias"].astype(f32)[None]])
        xq0, sx0 = pk.pack_stream(x, ln1_g[0], ln1_b[0], LN_EPS)

        def body_ho(carry, inputs):
            lp, g_next, b_next = inputs
            xc, xq, sx = carry
            p = lp["attn"]
            d = xc.shape[-1]
            wqkv = jnp.concatenate(
                [p["query"]["kernel"].astype(dt).reshape(d, h * hd),
                 p["key"]["kernel"].astype(dt).reshape(d, h * hd),
                 p["value"]["kernel"].astype(dt).reshape(d, h * hd)], axis=1)
            bqkv = jnp.concatenate(
                [p["query"]["bias"].reshape(-1),
                 p["key"]["bias"].reshape(-1),
                 p["value"]["bias"].reshape(-1)]).astype(f32)
            out = pk.fused_block_int8_handoff(
                xc, xq, sx,
                lp["ln1"]["scale"].astype(f32), lp["ln1"]["bias"].astype(f32),
                wqkv, bqkv,
                p["out"]["kernel"].astype(dt).reshape(h * hd, d),
                p["out"]["bias"].astype(f32),
                lp["ln2"]["scale"].astype(f32), lp["ln2"]["bias"].astype(f32),
                lp["mlp"]["fc1"]["kernel"].astype(dt),
                lp["mlp"]["fc1"]["bias"].astype(f32),
                lp["mlp"]["fc2"]["kernel"].astype(dt),
                lp["mlp"]["fc2"]["bias"].astype(f32),
                g_next, b_next,
                LN_EPS, seq_len, h, hd, cfg.int8_dw)
            return out, None

        carry, _ = jax.lax.scan(_wrap(body_ho), (x, xq0, sx0),
                                (params["layers"], gn, bn))
        x = carry[0]
    elif layer_rngs is None:
        def body_nr(x, lp):
            return _block(x, lp, cfg, None, True, mesh, seq_len), None
        x, _ = jax.lax.scan(_wrap(body_nr), x, params["layers"])
    else:
        x, _ = jax.lax.scan(_wrap(body), x, (params["layers"], layer_rngs))

    # pad rows (if any) carry confined garbage; the head reads only cls
    x = layer_norm(x, params["encoder_norm"]["scale"],
                   params["encoder_norm"]["bias"], LN_EPS,
                   use_pallas=cfg.use_pallas)
    cls = x[:, 0].astype(jnp.float32)
    logits = cls @ params["classifier"]["kernel"].astype(jnp.float32) \
        + params["classifier"]["bias"].astype(jnp.float32)
    return logits


def apply_nchw(params: Params, images_nchw: jnp.ndarray, cfg: ViTConfig,
               **kw) -> jnp.ndarray:
    """Convenience wrapper accepting the reference's NCHW layout."""
    return apply(params, jnp.transpose(images_nchw, (0, 2, 3, 1)), cfg, **kw)
