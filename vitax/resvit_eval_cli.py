"""Residual-ViT evaluation CLI.

The reference README claims a `res-vit/eval.py` that does not exist (its
eval.sh calls src/eval.py; SURVEY §2.2 "Recipes" row) — res-vit evaluation
only happens inside valid_epoch. vitax provides the real entry point: load a
res-vit checkpoint (vitax store or reference .pth), run the val split with
argmax routing, report top-1/top-5 + active ratio + router entropy.

Run: `python -m vitax.resvit_eval_cli --dataset CIFAR100 ...`
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vitax.core.cache import enable_compilation_cache
from vitax.checkpointing import CheckpointStore, load_state_dict_pth
from vitax.checkpointing.resvit_convert import resvit_params_from_torch_state_dict
from vitax.core.config import num_classes_for_dataset
from vitax.core.prng import set_seed
from vitax.data import get_dataloader
from vitax.models import resvit
from vitax.resvit_train_cli import config_to_model_args
from vitax.train.resvit_steps import make_eval_step

DATASETS = ["CIFAR10", "CIFAR100", "ImageNet", "TinyImageNet", "Synthetic"]


def get_eval_config(argv=None):
    p = argparse.ArgumentParser("vitax res-vit eval")
    p.add_argument("--model-arch", type=str, default="b16",
                   choices=["tiny", "b16", "b32", "l16", "l32", "h14"])
    p.add_argument("--checkpoint-path", type=str, default=None)
    p.add_argument("--image-size", type=int, default=224,
                   choices=[32, 64, 224, 384])
    p.add_argument("--num-workers", type=int, default=1)
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--dataset", type=str, default="CIFAR100",
                   choices=DATASETS)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_gpu", type=int, default=1)
    # model args (same underscore surface as training)
    p.add_argument("--use_lora", type=lambda s: s != "False", default=True)
    p.add_argument("--use_reslr", type=lambda s: s != "False", default=True)
    p.add_argument("--dynamic_active_target", type=float, default=0.6)
    # None = follow the arch preset (12 for b16, 16 for l16/h14)
    p.add_argument("--n_heads", type=int, default=None)
    p.add_argument("--n_kv_heads", type=int, default=None)
    p.add_argument("--norm_eps", type=float, default=1e-5)
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--dynamic_start_layer", type=int, default=2)
    p.add_argument("--dynamic_router_hdim", type=int, default=512)
    p.add_argument("--dynamic_reserve_initials", type=int, default=1)
    p.add_argument("--low_rank_dim", type=int, default=256)
    p.add_argument("--block_size", type=int, default=1)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--synthetic-samples", type=int, default=512)
    p.add_argument("--fused-qkv", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused LN+QKV+attention+out-proj kernel (default: "
                        "on when running on TPU)")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 int8 projections in the fused kernels")
    p.add_argument("--compact-capacity", type=float, default=None,
                   help="enable token-compaction inference with this kept "
                        "fraction (e.g. 0.5); exact when it covers the "
                        "active ratio — see models/resvit_compact.py")
    p.add_argument("--legacy-compact", action="store_true",
                   help="use the reference-shaped apply_compact instead of "
                        "the fused-kernel compact path (A/B; measured 2603 "
                        "vs 4334 img/s @ b64 C=0.5)")
    p.add_argument("--compact-overflow", type=str, default="demote",
                   choices=["demote", "identity"],
                   help="overflowing active tokens take the low-rank "
                        "approximator path (demote, default) or stay "
                        "identity (the legacy apply_compact semantics — "
                        "use for exact legacy A/B)")
    cfg = p.parse_args(argv)
    cfg.num_classes = num_classes_for_dataset(cfg.dataset)
    return cfg


def main(argv=None):
    enable_compilation_cache()
    config = get_eval_config(argv)
    set_seed(config.seed)
    cfg = config_to_model_args(config)
    params = resvit.init_params(jax.random.PRNGKey(config.seed), cfg)

    if config.checkpoint_path:
        if os.path.isdir(config.checkpoint_path):
            from vitax.checkpointing.store import coerce_like
            store = CheckpointStore(os.path.dirname(config.checkpoint_path)
                                    or ".")
            name = os.path.basename(config.checkpoint_path)
            restored = store.restore_params(name)
            params = coerce_like(params, restored)
        else:
            sd = load_state_dict_pth(config.checkpoint_path)
            params = resvit_params_from_torch_state_dict(
                {k: np.asarray(v) for k, v in sd.items()}, cfg)
    params = jax.tree.map(jnp.asarray, params)

    extra = ({"num_samples": config.synthetic_samples}
             if config.dataset == "Synthetic" else {})
    loader = get_dataloader(config.dataset, split="val",
                            data_dir=config.data_dir,
                            image_size=config.image_size,
                            batch_size=config.batch_size,
                            num_workers=config.num_workers, seed=config.seed,
                            **extra)
    if config.compact_capacity is not None:
        import dataclasses
        import jax as _jax
        from vitax.models.resvit_compact import apply_compact
        from vitax.train.resvit_steps import _metrics

        # With the fused kernels available, compaction rides the modern
        # compact path (fused int8 kernels + rect compacted-Q attention +
        # one-hot-matmul merge): measured 4334 vs 2603 img/s legacy @ b64
        # C=0.5. The reference-shaped apply_compact stays as the fallback
        # (and for --legacy-compact A/B).
        use_modern = (cfg.fused_qkv and cfg.fused_qkvo
                      and not getattr(config, "legacy_compact", False))
        ccfg = dataclasses.replace(
            cfg, compact_capacity=config.compact_capacity,
            compact_demote_overflow=(getattr(config, "compact_overflow",
                                             "demote") != "identity"))

        def _compact_step(params, images, labels, weight):
            if use_modern:
                logits, aux = resvit.apply(params, images, ccfg,
                                           train=False)
            else:
                logits, aux = apply_compact(
                    params, images, cfg, capacity=config.compact_capacity)
            zero = jnp.zeros((), jnp.float32)
            logp = _jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            c = (nll * weight).sum() / jnp.maximum(weight.sum(), 1.0)
            m = _metrics(cfg, logits, labels, c, zero, zero, aux,
                         weight=weight)
            m["loss"] = c
            return m, aux["routing_maps"]

        eval_step = _jax.jit(_compact_step)
    else:
        eval_step = make_eval_step(cfg)

    totals: dict = {}
    n = 0.0
    for i, batch in enumerate(loader):
        metrics, _ = eval_step(params, jnp.asarray(batch.images, cfg.dtype),
                               jnp.asarray(batch.labels),
                               jnp.asarray(batch.weight))
        bs = float(batch.weight.sum())
        for k, v in metrics.items():
            v = np.asarray(v)
            if v.ndim == 0:
                totals[k] = totals.get(k, 0.0) + float(v) * bs
        n += bs
        if i % 50 == 0:
            print(f"batch {i}/{len(loader)}: "
                  f"acc1={totals.get('acc1', 0) / max(n, 1):.4f}", flush=True)
    result = {k: v / max(n, 1) for k, v in totals.items()}
    print(f"Top-1 accuracy: {result.get('acc1', 0):.4f}")
    print(f"Top-5 accuracy: {result.get('acc5', 0):.4f}")
    print(f"Active ratio:  {result.get('non_low_rank_ratio', 0):.4f}")
    print(f"Router entropy: {result.get('router_entropy', 0):.4f}")
    return result


if __name__ == "__main__":
    main()
