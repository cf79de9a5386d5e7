"""Res-ViT train-step throughput bench (default recipe: LoRA + routing).

Measures the full jitted 3-loss AdamW train step on the reference's
ft_resvit.sh-shaped workload (b16 @224, lora_rank 48, block_size 4,
start_layer 1, reserve 2, active target 0.4) with vitax kernel knobs.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/resvit_bench.py \
      [--batch 96] [--remat selective|none|full] [--fused-mlp] [--int8-grad]
      [--no-fused] [--scan] [--steps 40] [--compile-only]
"""

from __future__ import annotations

import argparse
import time
import traceback

import jax

from vitax.core.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--remat", type=str, default="none",
                   choices=["selective", "none", "full"])
    p.add_argument("--fused-mlp", action="store_true")
    p.add_argument("--no-fused", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8-grad", action="store_true")
    p.add_argument("--int8-dw", action="store_true")
    p.add_argument("--int4", action="store_true",
                   help="A4W4 int4 MLP forward (needs --fused-mlp)")
    p.add_argument("--int4-attn", action="store_true",
                   help="A4W4 int4 qkv/out-proj forward (square kernel; "
                        "the rect compact kernel stays int8)")
    p.add_argument("--int4-grad", action="store_true",
                   help="A4W4 int4 backward dx-path (MLP + attention, "
                        "square and rect kernels)")
    p.add_argument("--scan", type=str, default="off",
                   choices=["off", "restack", "stacked"],
                   help="off = unrolled loop; restack = scan with per-step "
                        "param stacking; stacked = scan with pre-stacked "
                        "params")
    p.add_argument("--token-keep", type=float, default=1.0,
                   help="PatchDropout/FLIP train-time token dropping")
    p.add_argument("--compact", type=float, default=None,
                   help="compact_capacity: student-MLP token compaction")
    p.add_argument("--no-compact-attn", action="store_true",
                   help="A/B: disable the rect (compacted-Q) attention "
                        "kernel inside the compact path")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--compile-only", action="store_true")
    p.add_argument("--lora-rank", type=int, default=48)
    p.add_argument("--block-size", type=int, default=4)
    a = p.parse_args()

    from vitax.core.config import resvit_arch_config
    from vitax.models import resvit
    from vitax.train.resvit_steps import (Lambdas, create_state,
                                          make_adamw_for, make_train_step)
    from vitax.train.schedules import cosine_with_warmup_lr

    remat = {"selective": "selective", "none": False, "full": True}[a.remat]
    cfg = resvit_arch_config(
        "b16", image_size=224, num_classes=100, dtype=jnp.bfloat16,
        use_lora=True, use_reslr=True, lora_rank=a.lora_rank,
        dynamic_active_target=0.4, dynamic_start_layer=1,
        dynamic_reserve_initials=2, block_size=a.block_size,
        fused_qkv=not a.no_fused, fused_qkvo=not a.no_fused,
        fused_mlp=a.fused_mlp, remat=remat,
        int8_attn=a.int8 or a.int8_grad or a.int8_dw,
        int8_attn_grad=a.int8_grad or a.int8_dw,
        int8_mlp=a.fused_mlp and (a.int8 or a.int8_grad or a.int8_dw),
        int8_mlp_grad=a.fused_mlp and (a.int8_grad or a.int8_dw),
        int8_dw=a.int8_dw,
        int4_mlp=a.fused_mlp and (a.int4 or a.int4_grad),
        int4_attn=a.int4_attn,
        int4_grad=a.fused_mlp and a.int4_grad,
        compact_capacity=a.compact,
        compact_attention=not a.no_compact_attn,
        token_keep=a.token_keep,
        use_pallas=False)
    print(f"backend={jax.default_backend()} batch={a.batch} remat={remat} "
          f"fused={not a.no_fused} fused_mlp={a.fused_mlp} "
          f"int8={cfg.int8_attn} int8_grad={cfg.int8_attn_grad} "
          f"int8_dw={cfg.int8_dw} scan={a.scan}", flush=True)

    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_adamw_for(cfg, params, cosine_with_warmup_lr(1e-4, 500, 15000),
                        clip_grad_norm=1.0)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    images = jax.random.normal(key, (a.batch, 224, 224, 3), jnp.bfloat16)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (a.batch,),
                                0, 100)

    if a.scan == "stacked":
        params = resvit.stack_params(params, cfg)
        tx = make_adamw_for(cfg, params,
                            cosine_with_warmup_lr(1e-4, 500, 15000),
                            clip_grad_norm=1.0)
        state = create_state(params, tx, jax.random.PRNGKey(1))
    elif a.scan == "restack":
        import functools
        resvit.apply = functools.partial(resvit.apply, scan_layers=True)
    train_step = make_train_step(cfg, tx, Lambdas(1.0, 10.0, 1.0),
                                 donate=True)

    t0 = time.perf_counter()
    try:
        compiled = train_step.lower(state, images, labels).compile()
        print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    except Exception:
        print("=== COMPILE FAILED ===", flush=True)
        traceback.print_exc()
        return 1
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"temp: {mem.temp_size_in_bytes / 1e9:.3f} GB", flush=True)
    if a.compile_only:
        return 0

    for _ in range(a.warmup):
        state, metrics = compiled(state, images, labels)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(a.steps):
        state, metrics = compiled(state, images, labels)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(f"img/s = {a.batch * a.steps / dt:.1f} "
          f"({dt / a.steps * 1e3:.1f} ms/step)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
