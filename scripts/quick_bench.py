"""Quick A/B bench: ONE config (the bench primary), fewer steps.

For env-knob sweeps (VITAX_INT8_SIGMOID_GELU, geometry
knobs) without bench.py's full ladder + bf16 secondary. Prints one JSON
line. Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/quick_bench.py [--batch 192]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

from vitax.core.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--arch", type=str, default="b16",
                    help="arch preset (b16/b32/l16/l32/h14)")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--no-int8-dw", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--save-acts", action="store_true",
                    help="fused_mlp_save: backward from saved int8 h1q/gpq")
    ap.add_argument("--int4", action="store_true",
                    help="A4W4 int4 MLP forward (overrides int8 fwd)")
    ap.add_argument("--int4-attn", action="store_true",
                    help="A4W4 int4 qkv/out-projection forward too")
    ap.add_argument("--int4-grad", action="store_true",
                    help="A4W4 int4 backward dx-path in the fused MLP too")
    ap.add_argument("--remat", type=str, default=None,
                    choices=["none", "selective", "full"],
                    help="override remat (default none like the bench)")
    ap.add_argument("--token-keep", type=float, default=1.0,
                    help="PatchDropout/FLIP token-drop keep ratio (train)")
    args = ap.parse_args()

    from vitax.core.config import arch_config
    from vitax.models import vit
    from vitax.train import (create_train_state, make_train_step,
                             onecycle_lr, onecycle_momentum, sgd_momentum)

    remat = {None: False, "none": False, "full": True,
             "selective": "selective"}[args.remat]
    kw = dict(fused_qkv=True, fused_mlp=True, remat=remat,
              fused_mlp_save=args.save_acts)
    if not args.bf16:
        kw.update(int8_mlp=True, int8_attn=True, int8_mlp_grad=True,
                  int8_attn_grad=True, int8_dw=not args.no_int8_dw,
                  int4_mlp=args.int4 or args.int4_grad,
                  int4_attn=args.int4_attn, int4_grad=args.int4_grad)
    cfg = arch_config(args.arch, image_size=args.image_size,
                      num_classes=100, dtype=jnp.bfloat16, use_pallas=False,
                      token_keep=args.token_keep, **kw)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    total_steps = 15000
    tx = sgd_momentum(
        onecycle_lr(0.03, total_steps, pct_start=500 / total_steps),
        momentum_schedule=onecycle_momentum(total_steps,
                                            pct_start=500 / total_steps))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    images = jax.random.normal(
        key, (args.batch, args.image_size, args.image_size, 3),
        jnp.bfloat16)
    labels = jax.random.randint(jax.random.fold_in(key, 1),
                                (args.batch,), 0, 100)
    train_step = make_train_step(cfg, tx, donate=True)
    for _ in range(args.warmup):
        state, metrics = train_step(state, images, labels)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_step(state, images, labels)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "img_per_sec": round(args.batch * args.steps / dt, 1),
        "ms_per_step": round(dt / args.steps * 1e3, 2),
        "loss": round(loss, 4),
        "batch": args.batch, "arch": args.arch,
        "image_size": args.image_size,
        "token_keep": args.token_keep,
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("VITAX_")},
    }), flush=True)


if __name__ == "__main__":
    main()
