"""Cross-framework parity harness — the inverse of the reference's
`src/check_jax.py` (which compared torch vs flax vit_jax): vitax compares its
JAX model against the PyTorch reference model on identical inputs and
weights, with the tolerance asserts the reference left commented out
(src/check_jax.py:72-77) made real and tightened to the ≤1e-3 BASELINE
target.

Run: `python -m vitax.check_torch --reference-dir /root/reference \
       [--checkpoint-path weights.npz] [--dataset CIFAR10 --data-dir data]`

Without a dataset it compares on synthetic batches (logit parity needs
identical preprocessed tensors, not identical raw images — SURVEY §7
"input-pipeline parity").
"""

from __future__ import annotations

import argparse
import importlib.util
import sys

import numpy as np


def load_reference_vit(reference_dir: str):
    spec = importlib.util.spec_from_file_location(
        "ref_src_model", f"{reference_dir}/src/model.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_src_model"] = mod
    spec.loader.exec_module(mod)
    return mod


from vitax.core.cache import enable_compilation_cache
def main(argv=None):
    enable_compilation_cache()
    p = argparse.ArgumentParser("vitax torch-parity check")
    p.add_argument("--reference-dir", type=str, default="/root/reference")
    p.add_argument("--model-arch", type=str, default="b16",
                   choices=["tiny", "b16", "b32", "l16", "l32", "h14"])
    p.add_argument("--checkpoint-path", type=str, default=None,
                   help=".npz or .pth weights; random if omitted")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-batches", type=int, default=4)
    p.add_argument("--dataset", type=str, default=None,
                   help="optional real dataset for the comparison batches")
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--logit-atol", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="also shard each comparison batch over an N-device "
                        "data mesh and assert the sharded logits equal the "
                        "single-device ones (the vitax inversion of the "
                        "reference's pmap replication, src/check_jax.py:29-31)")
    p.add_argument("--mesh-atol", type=float, default=1e-5,
                   help="sharded-vs-single-device tolerance: the math is "
                        "per-example but XLA tiles the smaller per-device "
                        "batch differently, so reduction order shifts by a "
                        "few float32 ulps")
    config = p.parse_args(argv)

    import torch

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from vitax.checkpointing import (load_checkpoint,
                                     params_to_torch_state_dict)
    from vitax.core.config import arch_config
    from vitax.models import vit

    cfg = arch_config(config.model_arch, image_size=config.image_size,
                      num_classes=config.num_classes, dtype=jnp.float32,
                      use_pallas=False)

    ref = load_reference_vit(config.reference_dir)
    tmodel = ref.VisionTransformer(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        emb_dim=cfg.emb_dim, mlp_dim=cfg.mlp_dim, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, num_classes=cfg.num_classes,
        dropout_rate=0.0, attn_dropout_rate=0.0)
    tmodel.eval()

    if config.checkpoint_path:
        params = load_checkpoint(config.checkpoint_path, cfg)
        if "classifier" not in params:
            raise SystemExit("checkpoint head does not match --num-classes")
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in params_to_torch_state_dict(params).items()}
        tmodel.load_state_dict(sd)
    else:
        params = vit.init_params(jax.random.PRNGKey(config.seed), cfg)
        sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
              params_to_torch_state_dict(
                  jax.tree.map(np.asarray, params)).items()}
        tmodel.load_state_dict(sd)
    params = jax.tree.map(jnp.asarray, params)

    if config.dataset:
        from vitax.data import get_dataloader
        loader = get_dataloader(config.dataset, split="val",
                                data_dir=config.data_dir,
                                image_size=config.image_size,
                                batch_size=config.batch_size,
                                num_workers=0, seed=config.seed)
        def batches():
            for i, b in enumerate(loader):
                if i >= config.num_batches:
                    break
                yield b.images.transpose(0, 3, 1, 2)  # NHWC → NCHW
    else:
        rng = np.random.RandomState(config.seed)
        def batches():
            for _ in range(config.num_batches):
                yield rng.randn(config.batch_size, 3, config.image_size,
                                config.image_size).astype(np.float32)

    jit_apply = jax.jit(lambda p, x: vit.apply_nchw(p, x, cfg))

    mesh_apply = None
    if config.mesh:
        # multi-device leg (VERDICT r4 #7): batch sharded over an N-device
        # data mesh, params replicated — the eval math is per-example, so
        # the sharded logits must match single-device to float32 ulps
        from vitax.parallel import mesh as pmesh
        devices = jax.devices()
        if len(devices) < config.mesh:
            raise SystemExit(f"--mesh {config.mesh} needs {config.mesh} "
                             f"devices, found {len(devices)}")
        if config.batch_size % config.mesh:
            raise SystemExit("--batch-size must divide --mesh")
        m = pmesh.make_mesh(n_data=config.mesh, n_model=1,
                            devices=devices[:config.mesh])
        mesh_params = jax.device_put(params,
                                     pmesh.vit_param_shardings(params, m))

        def mesh_apply(x):
            xs = jax.device_put(x, pmesh.batch_sharding(m))
            with m:
                return np.asarray(jit_apply(mesh_params, xs))

    max_abs = 0.0
    argmax_diffs = 0
    mesh_max_abs = 0.0
    total = 0
    for x in batches():
        with torch.no_grad():
            ref_logits = tmodel(torch.from_numpy(x)).numpy()
        logits = np.asarray(jit_apply(params, jnp.asarray(x)))
        max_abs = max(max_abs, float(np.max(np.abs(logits - ref_logits))))
        argmax_diffs += int((logits.argmax(-1) != ref_logits.argmax(-1)).sum())
        total += len(x)
        if mesh_apply is not None:
            mesh_logits = mesh_apply(jnp.asarray(x))
            mesh_max_abs = max(mesh_max_abs, float(
                np.max(np.abs(mesh_logits - logits))))

    print(f"max |logit diff| = {max_abs:.3e} (tolerance {config.logit_atol})")
    print(f"argmax mismatches: {argmax_diffs}/{total}")
    ok = max_abs <= config.logit_atol and argmax_diffs == 0
    if mesh_apply is not None:
        print(f"mesh({config.mesh}) vs single-device max |logit diff| = "
              f"{mesh_max_abs:.3e} (tolerance {config.mesh_atol})")
        ok = ok and mesh_max_abs <= config.mesh_atol
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
