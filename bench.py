"""Headline benchmark: ViT-B/16 @ 224 fine-tune train-step throughput.

Workload mirrors the reference's CIFAR-100 fine-tune recipe
(src/FT_CIFAR100.sh: b16, 224px, CE + SGD(momentum)+OneCycle) on synthetic
data (zero-egress environment). Measures steady-state images/sec for the full
jitted train step (fwd + bwd + optimizer) on the available chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): ≥ 2000 images/sec/chip on TPU v5e.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 2000.0


def main():
    from vitax.core.config import arch_config
    from vitax.models import vit
    from vitax.train import (create_train_state, make_train_step, onecycle_lr,
                             onecycle_momentum, sgd_momentum)

    on_tpu = jax.default_backend() not in ("cpu",)
    steps = 60 if on_tpu else 3
    warmup = 5 if on_tpu else 1

    # Primary config: BOTH block halves fused into Pallas kernels (weight
    # grads accumulated in VMEM; GELU activations/probs never touch HBM)
    # with the SwitchBack int8 stack — W8A8 forward matmuls + int8 dL/dx
    # paths, dW matmuls and all statistics bf16/fp32 (training-convergence
    # validated: held-out top-1 98.4% int8 vs 96.9% bf16 on the synthetic
    # class task, identical loss curves — see PERF.md). Fallbacks degrade
    # to pure-bf16 fused, then pure XLA; the JSON line records which
    # config actually ran so a fused-path regression is visible.
    int8_kw = dict(int8_mlp=True, int8_attn=True, int8_mlp_grad=True,
                   int8_attn_grad=True)
    configs = ([(192, True, True, int8_kw), (128, True, True, {}),
                (96, True, False, {}), (32, False, False, {})]
               if on_tpu else [(16, False, False, {})])
    for batch, fused, fused_mlp, extra in configs:
        try:
            cfg = arch_config("b16", image_size=224, num_classes=100,
                              dtype=jnp.bfloat16, remat="selective",
                              use_pallas=False, fused_qkv=fused,
                              fused_mlp=fused_mlp, **extra)
            return _measure(cfg, batch, steps, warmup)
        except Exception as e:  # compile-helper flakiness: try the fallback
            last_err = e
    raise last_err


def _measure(cfg, batch, steps, warmup):
    from vitax.models import vit
    from vitax.train import (create_train_state, make_train_step, onecycle_lr,
                             onecycle_momentum, sgd_momentum)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    total_steps = 15000
    tx = sgd_momentum(
        onecycle_lr(0.03, total_steps, pct_start=500 / total_steps),
        momentum_schedule=onecycle_momentum(total_steps,
                                            pct_start=500 / total_steps))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))

    key = jax.random.PRNGKey(2)
    images = jax.random.normal(key, (batch, 224, 224, 3), jnp.bfloat16)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (batch,), 0, 100)

    train_step = make_train_step(cfg, tx, donate=True)

    for _ in range(warmup):
        state, metrics = train_step(state, images, labels)
    # force a real device→host readback: block_until_ready alone does not
    # guarantee execution completion through the axon tunnel
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, images, labels)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = batch * steps / dt
    print(json.dumps({
        "metric": "vit_b16_224_train_throughput",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 4),
        "config": {"batch": batch, "fused_qkv": cfg.fused_qkv,
                   "fused_mlp": cfg.fused_mlp, "remat": cfg.remat,
                   "int8": cfg.int8_mlp or cfg.int8_attn,
                   "int8_grad": cfg.int8_mlp_grad or cfg.int8_attn_grad},
    }))
    return img_per_sec


if __name__ == "__main__":
    main()
