"""Evaluation CLI — the vitax counterpart of src/eval.py.

Loads a checkpoint (npz/.pth/vitax store), evaluates top-1/top-5 on the val
split and prints the means (src/eval.py:57-77). Defaults mirror the
reference's eval config: ImageNet @ 384, b16 (src/config.py:5-25).

Run: `python -m vitax.eval_cli --dataset CIFAR10 --checkpoint-path ...`
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from vitax.core.cache import enable_compilation_cache
from vitax import cli
from vitax.checkpointing import CheckpointStore, load_checkpoint
from vitax.core.config import arch_config
from vitax.core.prng import set_seed
from vitax.data import get_dataloader
from vitax.models import vit
from vitax.train_cli import make_weighted_eval_step


def main(argv=None):
    enable_compilation_cache()
    config = cli.get_eval_config(argv)
    cli.print_config(config)
    set_seed(config.seed)

    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    on_tpu = jax.default_backend() not in ("cpu",)
    fused_qkv = getattr(config, "fused_qkv", None)
    fused_mlp = getattr(config, "fused_mlp", None)
    cfg = arch_config(config.model_arch, image_size=config.image_size,
                      num_classes=config.num_classes, dtype=dtype,
                      fused_qkv=on_tpu if fused_qkv is None else fused_qkv,
                      fused_mlp=on_tpu if fused_mlp is None else fused_mlp,
                      int8_mlp=getattr(config, "int8", False),
                      int8_attn=getattr(config, "int8", False),
                      use_pallas=False if config.no_pallas else None)

    params = vit.init_params(jax.random.PRNGKey(config.seed), cfg)
    if config.checkpoint_path:
        if os.path.isdir(config.checkpoint_path):
            # vitax checkpoint store dir: restore params subtree only
            from vitax.checkpointing.store import coerce_like
            store = CheckpointStore(os.path.dirname(config.checkpoint_path)
                                    or ".")
            name = os.path.basename(config.checkpoint_path)
            restored = store.restore_params(name)
            params = jax.tree.map(jnp.asarray, coerce_like(params, restored))
        else:
            loaded = load_checkpoint(config.checkpoint_path, cfg)
            if "classifier" not in loaded:
                raise ValueError(
                    "checkpoint head does not match --num-classes "
                    f"{config.num_classes} (strict eval, src/eval.py:34-38)")
            params = jax.tree.map(jnp.asarray, loaded)

    extra = ({"num_samples": config.synthetic_samples}
             if config.dataset == "Synthetic" else {})
    loader = get_dataloader(config.dataset, split="val",
                            data_dir=config.data_dir,
                            image_size=config.image_size,
                            batch_size=config.batch_size,
                            num_workers=config.num_workers, seed=config.seed,
                            **extra)

    # data-parallel eval over all devices (supersedes the reference's
    # DataParallel eval wrap, src/eval.py:42-43); XLA all-reduces the
    # weighted metric sums over the mesh
    from vitax.parallel import mesh as pmesh
    devices = jax.devices()
    if config.n_gpu > 0:
        devices = devices[:config.n_gpu]
    m = pmesh.make_mesh(n_data=len(devices), n_model=1, devices=devices)
    dp = len(devices) > 1
    if dp and config.batch_size % len(devices):
        raise SystemExit("--batch-size must divide the device count for "
                         "data-parallel eval")
    params = jax.device_put(params, pmesh.replicated(m))

    eval_step = make_weighted_eval_step(cfg)
    totals = {"loss": 0.0, "acc1": 0.0, "acc5": 0.0}
    n = 0.0
    t0 = time.time()
    for i, batch in enumerate(loader):
        images = jax.device_put(jnp.asarray(batch.images, cfg.dtype),
                                pmesh.batch_sharding(m))
        labels = jax.device_put(jnp.asarray(batch.labels),
                                pmesh.batch_sharding(m))
        weight = jax.device_put(jnp.asarray(batch.weight),
                                pmesh.batch_sharding(m))
        metrics = eval_step(params, images, labels, weight)
        bs = float(weight.sum())
        for k in totals:
            totals[k] += float(metrics[k]) * bs
        n += bs
        if i % 50 == 0:
            print(f"batch {i}/{len(loader)}: "
                  f"acc1={totals['acc1'] / max(n, 1):.4f}", flush=True)
    dt = time.time() - t0
    result = {k: v / max(n, 1) for k, v in totals.items()}
    print(f"Top-1 accuracy: {result['acc1']:.4f}")
    print(f"Top-5 accuracy: {result['acc5']:.4f}")
    print(f"({n:.0f} images in {dt:.1f}s, {n / dt:.0f} img/s)")
    return result


if __name__ == "__main__":
    main()
