"""Model/arch configuration dataclasses and preset registry.

Mirrors the capability surface of the reference's config layer
(`src/config.py:57-104` arch presets, `res-vit/config.py:4-66` presets and
dataset→classes table) but uses typed dataclasses and a registry dict instead
of string-`eval` dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Standard Vision Transformer configuration.

    Matches the constructor surface of the reference `VisionTransformer`
    (src/model.py:159-211). Extra TPU-specific knobs: `dtype` (compute
    precision — matmuls in bf16, softmax/LN accumulate fp32), `param_dtype`,
    `remat` (rematerialize encoder blocks to trade FLOPs for HBM) and
    `use_pallas` (fused Pallas kernels vs pure-XLA ops).
    """

    image_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    emb_dim: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    num_classes: int = 1000
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.1
    # TPU-specific
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # False | True (full block remat) | "selective" (keep attention
    # outputs, recompute LN/MLP — best memory/FLOPs middle ground)
    remat: object = False
    use_pallas: Optional[bool] = None  # None = auto (True on TPU backends)
    # fused QKV-projection + attention-core Pallas kernel (weight grads
    # accumulated in VMEM; see ops/pallas_kernels.fused_qkv_attention)
    fused_qkv: bool = False
    # fused LN2+fc1+GELU+fc2+residual Pallas kernel (dW1/dW2 accumulated in
    # VMEM; see ops/pallas_kernels.fused_ln_mlp)
    fused_mlp: bool = False
    # persist h1/GELU' in the fwd kernel => pure-matmul bwd (8NDM, no
    # transcendentals). Pair with remat=None — under selective remat the
    # saved activations would be recomputed, running the fwd kernel twice.
    fused_mlp_save: bool = False
    # W8A8 int8 MLP forward matmuls (v5e int8 MXU ~2x bf16); backward stays
    # bf16 recompute. Accuracy-affecting — experimental, off by default.
    int8_mlp: bool = False
    # W8A8 qkv/out projections in the fused attention forward (scores,
    # softmax, PV stay bf16/fp32); backward stays bf16 recompute.
    int8_attn: bool = False
    # SwitchBack-style int8 dL/dx-path in the MLP backward (dW matmuls and
    # the fc1 recompute stay bf16). Requires int8_mlp.
    int8_mlp_grad: bool = False
    # same split for the attention backward: qkv recompute + dattn/dxn
    # projections W8A8, dW/dWo and the attention-core grads bf16.
    int8_attn_grad: bool = False
    # Jetfire-style per-block int8 dW matmuls in the MLP backward (deepest
    # quantization tier). Requires int8_mlp_grad.
    int8_dw: bool = False
    # A4W4 int4 MLP forward matmuls (v5e int4 MXU ~1.32x int8 — probe-
    # measured); overrides int8_mlp in the forward, backward still follows
    # int8_mlp_grad/int8_dw. Deepest-precision tier; accuracy evidence in
    # PERF.md. Experimental, off by default.
    int4_mlp: bool = False
    # A4W4 int4 qkv/out-projection forward matmuls in the fused attention
    # kernel (the attention core stays bf16/fp32); backward follows
    # int8_attn_grad/int8_dw. Same opt-in tier as int4_mlp.
    int4_attn: bool = False
    # A4W4 int4 backward dx-path matmuls: in the fused MLP (fc1 recompute,
    # dh1, dxn) and — when int4_attn is also set — the fused attention
    # backward's qkv recompute + dattn/dxn projections; dW stays >=8-bit,
    # the attention-core grads stay bf16. Requires int4_mlp. Deepest
    # gradient tier — 4-bit gradients are where quantized training
    # diverges; see PERF.md for the convergence evidence before using.
    int4_grad: bool = False
    # PatchDropout/FLIP-style train-time token dropping: each train step
    # keeps the cls token plus a fresh random round(token_keep*num_patches)
    # subset of patch tokens per image; eval always runs the full sequence.
    # The whole encoder then runs at the reduced sequence length (attention
    # FLOPs scale ~keep², MLP ~keep) through the same kernels. 1.0 = off
    # (exact reference semantics). Accuracy-affecting fine-tune lever
    # (arXiv:2208.07220, arXiv:2212.00794) — opt-in; evidence in PERF.md.
    token_keep: float = 1.0

    def __post_init__(self):
        if not (0.0 < self.token_keep <= 1.0):
            raise ValueError(
                f"token_keep must be in (0, 1], got {self.token_keep!r} — "
                "values <= 0 would train on cls + a single patch token and "
                "values > 1 would silently no-op")

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.image_size[0] // self.patch_size[0],
                self.image_size[1] // self.patch_size[1])

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # +1 cls token

    @property
    def head_dim(self) -> int:
        return self.emb_dim // self.num_heads

    def replace(self, **kw) -> "ViTConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ResViTConfig:
    """Residual-ViT configuration.

    Field-compatible with the reference `ModelArgs` (res-vit/model.py:13-37);
    `device` is intentionally absent (JAX arrays carry placement).
    """

    dim: int = 768
    mlp_dim: int = 3072
    n_layers: int = 12
    n_heads: int = 12
    n_kv_heads: Optional[int] = 12
    norm_eps: float = 1e-5
    lora_rank: int = 8
    dynamic_active_target: float = 0.4
    dynamic_start_layer: int = 2
    dynamic_router_hdim: int = 512
    dynamic_reserve_initials: int = 1
    low_rank_dim: int = 256
    block_size: int = 2
    use_lora: bool = False
    use_reslr: bool = False
    image_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    num_classes: int = 100
    dropout: float = 0.15
    # TPU-specific
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # False | True (full block remat) | "selective" (keep attention outputs,
    # recompute LN/MLP — same policy as ViTConfig; essential for the
    # teacher+student forward, which is the most activation-fat path here)
    remat: object = False
    use_pallas: Optional[bool] = None
    # fused QKV+attention kernel; LoRA folds into the base weights exactly
    # (W_eff = W + A@B — LoRA a/b carry no bias) so the kernel serves the
    # default --use_lora recipe too
    fused_qkv: bool = False
    # also subsume the out-projection AND the pre-attention LayerNorm in
    # the kernel (round-1's opaque compile failures were the 16MB
    # scoped-VMEM default, since raised)
    fused_qkvo: bool = False
    # fused LN+fc1+GELU+fc2+residual kernel for the feed-forward half
    fused_mlp: bool = False
    # W8A8 int8 projections in the fused attention kernel (forward / both
    # dL/dx-path backward projections). Experimental, off by default.
    int8_attn: bool = False
    int8_attn_grad: bool = False
    # same tiers for the fused MLP kernel (requires fused_mlp; the MLP is
    # the largest FLOPs chunk of the teacher+student step)
    int8_mlp: bool = False
    int8_mlp_grad: bool = False
    int8_dw: bool = False
    # A4W4 int4 MLP forward matmuls (see ViTConfig.int4_mlp — deepest-
    # precision tier, wide quantization band, opt-in)
    int4_mlp: bool = False
    # A4W4 int4 qkv/out-projection forward matmuls (see ViTConfig.int4_attn)
    int4_attn: bool = False
    # A4W4 int4 backward dx-path matmuls (see ViTConfig.int4_grad)
    int4_grad: bool = False
    # persist (quantized) GELU activations/derivative in the fused MLP
    # forward so the backward skips the fc1 recompute (see ViTConfig)
    fused_mlp_save: bool = False
    # with compact_capacity set: run the attention Q rows / core / out-proj
    # only on the gathered rows too (rect fused kernel) — bit-exact vs the
    # square kernel + gather because dropped rows' attention outputs are
    # discarded by the merge anyway. Off switch exists for A/B only.
    compact_attention: bool = True
    # Token compaction for routed-layer MLP halves (TRAIN and the masked
    # apply path; SURVEY §5 token sparsity generalized from the
    # inference-only resvit_compact): the student FFN runs only on the
    # top-ceil(C·N) tokens ranked active-first. Exact vs the dense path
    # while the active set fits in capacity. None = dense.
    compact_capacity: Optional[float] = None
    # Overflow semantics when actives exceed capacity: True (default)
    # DEMOTES the overflow token to the inactive branch — its path bit is
    # cleared so it takes the low-rank approximator trained for exactly
    # that skip pattern, and later layers see the executed path. False =
    # identity fallback (DynamicViT capacity semantics; the legacy
    # resvit_compact behavior). Identity measured to collapse TRAINING
    # when per-layer actives overflow (distill loss explodes —
    # scripts/compact_convergence.py, PERF.md); demotion is the fix.
    compact_demote_overflow: bool = True
    # PatchDropout/FLIP-style train-time token dropping, same semantics as
    # ViTConfig.token_keep: each train step keeps cls + a fresh random
    # round(token_keep·num_patches) patch-token subset per image; teacher
    # AND student run at the reduced sequence (the per-layer cls distill
    # loss is unaffected — cls is always kept). Eval is full-sequence.
    # Stacks with compact_capacity (capacity applies to the kept tokens).
    token_keep: float = 1.0

    def __post_init__(self):
        if not (0.0 < self.token_keep <= 1.0):
            raise ValueError(
                f"token_keep must be in (0, 1], got {self.token_keep!r} — "
                "values <= 0 would train on cls + a single patch token and "
                "values > 1 would silently no-op")

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.image_size[0] // self.patch_size[0],
                self.image_size[1] // self.patch_size[1])

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    def replace(self, **kw) -> "ResViTConfig":
        return dataclasses.replace(self, **kw)


# Arch presets — identical numerology to the reference
# (src/config.py:57-104, res-vit/config.py:15-44). All presets use
# dropout_rate = attn_dropout_rate = 0.0 as the reference does.
ARCH_PRESETS = {
    # "tiny" is vitax-only: CPU-runnable smoke/integration tests
    "tiny": dict(patch=16, emb_dim=96, mlp_dim=192, num_heads=3, num_layers=3),
    "b16": dict(patch=16, emb_dim=768, mlp_dim=3072, num_heads=12, num_layers=12),
    "b32": dict(patch=32, emb_dim=768, mlp_dim=3072, num_heads=12, num_layers=12),
    "l16": dict(patch=16, emb_dim=1024, mlp_dim=4096, num_heads=16, num_layers=24),
    "l32": dict(patch=32, emb_dim=1024, mlp_dim=4096, num_heads=16, num_layers=24),
    "h14": dict(patch=14, emb_dim=1280, mlp_dim=5120, num_heads=16, num_layers=32),
}

# Dataset → number of classes (res-vit/config.py:58-66).
DATASET_NUM_CLASSES = {
    "CIFAR10": 10,
    "CIFAR100": 100,
    "ImageNet": 1000,
    "TinyImageNet": 200,
    "Synthetic": 10,
}


def num_classes_for_dataset(dataset: str, default: int = 1000) -> int:
    return DATASET_NUM_CLASSES.get(dataset, default)


def arch_config(arch: str, image_size: int = 224, num_classes: int = 1000,
                **overrides) -> ViTConfig:
    """Build a ViTConfig from a preset name ('b16'..'h14')."""
    if arch not in ARCH_PRESETS:
        raise ValueError(f"unknown arch {arch!r}; choose from {sorted(ARCH_PRESETS)}")
    p = ARCH_PRESETS[arch]
    return ViTConfig(
        image_size=(image_size, image_size),
        patch_size=(p["patch"], p["patch"]),
        emb_dim=p["emb_dim"],
        mlp_dim=p["mlp_dim"],
        num_heads=p["num_heads"],
        num_layers=p["num_layers"],
        num_classes=num_classes,
        attn_dropout_rate=0.0,
        dropout_rate=0.0,
        **overrides,
    )


def resvit_arch_config(arch: str, image_size: int = 224, num_classes: int = 100,
                       **overrides) -> ResViTConfig:
    """Build a ResViTConfig from a preset name (res-vit/config.py:4-46)."""
    if arch not in ARCH_PRESETS:
        raise ValueError(f"unknown arch {arch!r}; choose from {sorted(ARCH_PRESETS)}")
    p = ARCH_PRESETS[arch]
    kw = dict(
        dim=p["emb_dim"],
        mlp_dim=p["mlp_dim"],
        n_heads=p["num_heads"],
        n_kv_heads=p["num_heads"],
        n_layers=p["num_layers"],
        image_size=(image_size, image_size),
        patch_size=(p["patch"], p["patch"]),
        num_classes=num_classes,
    )
    kw.update(overrides)
    return ResViTConfig(**kw)
