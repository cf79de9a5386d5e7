"""Res-ViT inference throughput: dense masked vs token-compaction paths.

Two compaction implementations exist:
  * legacy: models/resvit_compact.apply_compact — reference-shaped XLA
    (unfused attention/FFN, take_along_axis gather + .at[].set scatter)
  * modern: models/resvit.apply(train=False, compact_capacity=C) — the
    training compact path at eval: fused int8 kernels, rect compacted-Q
    attention, one-hot-matmul gather/merge

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/resvit_infer_bench.py \
      [--batch 64] [--capacity 0.5] [--path modern|legacy|dense] [--steps 30]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--capacity", type=float, default=0.5)
    p.add_argument("--path", type=str, default="modern",
                   choices=["modern", "legacy", "dense"])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--bf16-only", action="store_true",
                   help="disable the int8 forward tiers")
    p.add_argument("--no-compact-attn", action="store_true")
    p.add_argument("--lora-rank", type=int, default=48)
    p.add_argument("--block-size", type=int, default=4)
    a = p.parse_args()

    from vitax.core.config import resvit_arch_config
    from vitax.models import resvit
    from vitax.models.resvit_compact import apply_compact

    int8 = not a.bf16_only
    cfg = resvit_arch_config(
        "b16", image_size=224, num_classes=100, dtype=jnp.bfloat16,
        use_lora=True, use_reslr=True, lora_rank=a.lora_rank,
        dynamic_active_target=0.4, dynamic_start_layer=1,
        dynamic_reserve_initials=2, block_size=a.block_size,
        fused_qkv=True, fused_qkvo=True, fused_mlp=int8, remat=False,
        int8_attn=int8, int8_mlp=int8,
        compact_capacity=(a.capacity if a.path == "modern" else None),
        compact_attention=not a.no_compact_attn,
        use_pallas=False)
    print(f"backend={jax.default_backend()} path={a.path} batch={a.batch} "
          f"capacity={a.capacity} int8={int8} "
          f"compact_attn={cfg.compact_attention}", flush=True)

    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    # randomize router bias so routing is non-trivial (~active target)
    for lid, role in enumerate(resvit.layer_roles(cfg)):
        if role.get("is_block_head"):
            k = jax.random.fold_in(jax.random.PRNGKey(5), lid)
            params["layers"][lid]["router"]["out3"]["bias"] = \
                jax.random.uniform(k, (cfg.block_size * 2,), jnp.float32,
                                   -1.0, 0.2)
    images = jax.random.normal(jax.random.PRNGKey(2),
                               (a.batch, 224, 224, 3), jnp.bfloat16)

    if a.path == "legacy":
        fn = jax.jit(lambda p_, x: apply_compact(p_, x, cfg,
                                                 capacity=a.capacity)[0])
    else:
        fn = jax.jit(lambda p_, x: resvit.apply(p_, x, cfg,
                                                train=False)[0])

    t0 = time.perf_counter()
    logits = fn(params, images)
    float(jnp.sum(logits))
    print(f"compiled+first in {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(a.warmup):
        logits = fn(params, images)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(a.steps):
        logits = fn(params, images)
    float(jnp.sum(logits))
    dt = time.perf_counter() - t0
    print(f"img/s = {a.batch * a.steps / dt:.1f} "
          f"({dt / a.steps * 1000:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
