"""Probe: root-cause the fused_mlp_save full-program compile failure.

Round-2 shelved fused_mlp_save (pure-matmul MLP backward, the direct
answer to the backward-recompute FLOPs) because "the full-program compile
trips the remote helper at batch >= 64" — an opaque HTTP 500. Round-1's
identical-looking failure was the 16 MB scoped-VMEM default, i.e. findable.
This script compiles the EXACT bench train step with save-acts enabled at
a given batch size, with full tracebacks, so the real error (if any)
becomes visible, then times it if it runs.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/save_acts_probe.py \
      --batch 64 [--remat selective|none|full] [--steps 30] [--compile-only]
"""

from __future__ import annotations

import argparse
import time
import traceback

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", type=str, default="b16")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--remat", type=str, default="selective",
                   choices=["selective", "none", "full"])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--compile-only", action="store_true")
    p.add_argument("--no-save", action="store_true",
                   help="control: same config without save_acts")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8-dw", action="store_true")
    p.add_argument("--scoped-vmem-kib", type=int, default=0,
                   help="forward xla_tpu_scoped_vmem_limit_kib per-compile")
    a = p.parse_args()

    from vitax.core.config import arch_config
    from vitax.models import vit
    from vitax.train import (create_train_state, make_train_step, onecycle_lr,
                             onecycle_momentum, sgd_momentum)

    remat = {"selective": "selective", "none": False, "full": True}[a.remat]
    int8_kw = dict(int8_mlp=True, int8_attn=True, int8_mlp_grad=True,
                   int8_attn_grad=True) if a.int8 else {}
    if a.int8_dw:
        int8_kw["int8_dw"] = True
    cfg = arch_config(a.arch, image_size=a.image_size, num_classes=100,
                      dtype=jnp.bfloat16, use_pallas=False,
                      fused_qkv=True, fused_mlp=True,
                      fused_mlp_save=not a.no_save, remat=remat, **int8_kw)
    print(f"backend={jax.default_backend()} arch={a.arch}@{a.image_size} "
          f"batch={a.batch} remat={remat} "
          f"save={not a.no_save} int8={a.int8}", flush=True)

    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    tx = sgd_momentum(onecycle_lr(0.03, 15000, pct_start=500 / 15000),
                      momentum_schedule=onecycle_momentum(15000,
                                                          pct_start=500 / 15000))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    images = jax.random.normal(key, (a.batch, a.image_size, a.image_size, 3),
                               jnp.bfloat16)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (a.batch,), 0, 100)

    train_step = make_train_step(cfg, tx, donate=True)

    t0 = time.perf_counter()
    try:
        lowered = train_step.lower(state, images, labels)
        print(f"lowered in {time.perf_counter() - t0:.1f}s", flush=True)
        t1 = time.perf_counter()
        opts = ({"xla_tpu_scoped_vmem_limit_kib": str(a.scoped_vmem_kib)}
                if a.scoped_vmem_kib else None)
        compiled = lowered.compile(compiler_options=opts)
        print(f"compiled in {time.perf_counter() - t1:.1f}s", flush=True)
    except Exception:
        print("=== COMPILE FAILED ===", flush=True)
        traceback.print_exc()
        return 1

    mem = compiled.memory_analysis()
    if mem is not None:
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                print(f"{attr}: {v / 1e9:.3f} GB", flush=True)

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
