"""Residual-ViT fine-tune CLI — the vitax counterpart of res-vit/train.py.

Same observable behavior: AdamW(+warmup-cosine or cosine-annealing), total =
λc·c + λa·a + λd·d with constant λ (res-vit/train.py:51-52,296), grad-clip
1.0, LoRA freezing of base weights, per-layer activation-rate logging,
routing-viz PNGs per epoch, best-checkpoint on val acc1 — with the reference's
exact flag surface including its hyphen/underscore quirks
(res-vit/config.py:122-184: `--use_lora` but `--batch-size`).

Also writes the reference's JSON diagnostics (res-vit/utils.py:182-205,
440-441,445-485): model_structure.json, weight_mapping_log.json,
trainable_weights_info.json.

Run: `python -m vitax.resvit_train_cli --dataset CIFAR100 ...`
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vitax.core.cache import enable_compilation_cache
from vitax.checkpointing import CheckpointStore, load_checkpoint
from vitax.checkpointing.resvit_convert import resvit_params_from_vit
from vitax.core.config import (arch_config, num_classes_for_dataset,
                               resvit_arch_config)
from vitax.core.prng import set_seed
from vitax.data import get_dataloader
from vitax.models import resvit
from vitax.train.resvit_steps import (Lambdas, create_state, make_adamw_for,
                                      make_eval_step, make_train_step)
from vitax.train.schedules import (cosine_annealing_lr,
                                   cosine_with_warmup_lr,
                                   token_keep_switch_epoch)
from vitax.utils import (ExperimentWriter, process_config, tree_bytes,
                         write_json)
from vitax.utils.routing_viz import save_routing_visualization

DATASETS = ["CIFAR10", "CIFAR100", "ImageNet", "TinyImageNet", "Synthetic"]


def get_train_config(argv=None):
    p = argparse.ArgumentParser("vitax res-vit train")
    p.add_argument("--exp-name", type=str, default="reslr")
    p.add_argument("--swanlab", action="store_true")
    p.add_argument("--tensorboard", action="store_true")
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
    p.add_argument("--train-steps", type=int, default=15000)
    p.add_argument("--warmup-steps", type=int, default=500)
    p.add_argument("--print-freq", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    # optimizer (res-vit/config.py:146-156)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.05)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--eps", type=float, default=1e-8)
    p.add_argument("--lr-scheduler", type=str, default="cosine_with_warmup",
                   choices=["cosine", "cosine_with_warmup"])
    p.add_argument("--min-lr", type=float, default=1e-6)
    p.add_argument("--clip-grad-norm", type=lambda s: s != "False",
                   default=True)
    # lora / reslr (reference's underscore flags kept verbatim)
    p.add_argument("--use_lora", type=lambda s: s != "False", default=True)
    p.add_argument("--use_reslr", type=lambda s: s != "False", default=True)
    p.add_argument("--initial-lambda-active", type=float, default=1e-4)
    p.add_argument("--initial-lambda-distill", type=float, default=0.01)
    p.add_argument("--initial-lambda-class", type=float, default=1.0)
    p.add_argument("--dynamic_active_target", type=float, default=0.6)
    # None = follow the arch preset (12 for b16, 16 for l16/h14, 3 for tiny)
    p.add_argument("--n_heads", type=int, default=None)
    p.add_argument("--n_kv_heads", type=int, default=None)
    p.add_argument("--norm_eps", type=float, default=1e-5)
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--dynamic_start_layer", type=int, default=2)
    p.add_argument("--dynamic_router_hdim", type=int, default=512)
    p.add_argument("--dynamic_reserve_initials", type=int, default=1)
    p.add_argument("--low_rank_dim", type=int, default=256)
    p.add_argument("--block_size", type=int, default=1)
    p.add_argument("--save-routing-viz", action="store_true")
    # vitax extras
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--fused-qkv", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused LN+QKV+attention+out-proj kernel (LoRA folds "
                        "in exactly; default: on when running on TPU)")
    p.add_argument("--fused-mlp", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused LN+fc1+GELU+fc2 kernel for the feed-forward "
                        "half (default: on when running on TPU with "
                        "selective remat)")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 int8 projections in the fused attention kernel")
    p.add_argument("--int8-grad", action="store_true",
                   help="int8 dL/dx-path attention backward (implies --int8; "
                        "the measured-fastest res-vit config)")
    p.add_argument("--int8-dw", action="store_true",
                   help="Jetfire per-block int8 dW matmuls in the MLP and "
                        "attention backwards (implies --int8-grad)")
    p.add_argument("--int4", action="store_true",
                   help="A4W4 int4 MLP forward matmuls (implies --int8; "
                        "deepest-precision tier, wide quantization band — "
                        "see PERF.md before using for real training)")
    p.add_argument("--int4-attn", action="store_true",
                   help="A4W4 int4 qkv/out-projection forward matmuls too "
                        "(implies --int4; the attention core stays bf16)")
    p.add_argument("--int4-grad", action="store_true",
                   help="A4W4 int4 backward dx-path matmuls in the fused "
                        "MLP too (implies --int4; dW stays >=8-bit). "
                        "Deepest gradient tier — see PERF.md before using")
    p.add_argument("--save-acts", action="store_true",
                   help="persist (quantized) GELU activations in the fused "
                        "MLP forward; backward skips the fc1 recompute")
    p.add_argument("--compact-warmup", type=int, default=500,
                   help="with --compact-capacity: train WITHOUT compaction "
                        "for this many steps first. The fresh router's "
                        "keep-bias 5.0 init marks ~all tokens active, so "
                        "capacity C<1 demotes most tokens from step 0 and "
                        "training collapses to chance (measured: "
                        "scripts/compact_convergence.py). Warmup lets the "
                        "router leave that init before capacity applies; "
                        "see PERF.md for the measured convergence story")
    p.add_argument("--token-keep", type=float, default=1.0,
                   help="PatchDropout/FLIP train-time token dropping: keep "
                        "cls + a fresh random round(r*num_patches) patch "
                        "subset per image per step (teacher AND student run "
                        "at the reduced sequence; eval is full-sequence). "
                        "Accuracy-affecting opt-in — see PERF.md")
    p.add_argument("--token-keep-schedule", type=float, default=None,
                   metavar="FRAC",
                   help="train with --token-keep for the first FRAC of "
                        "epochs, then full-sequence for the rest (the "
                        "PatchDropout fine-tune recipe — same semantics "
                        "as the ViT trainer's flag)")
    p.add_argument("--compact-capacity", type=float, default=None,
                   help="train-time token compaction: the student FFN on "
                        "routed layers runs only on the top-ceil(C*N) "
                        "tokens ranked active-first (exact vs the dense "
                        "path while the active set fits)")
    p.add_argument("--router-lr-scale", type=float, default=1.0,
                   help="scale the ROUTER params' effective learning rate "
                        "(post-Adam masked update scaling). 0.3 is the "
                        "measured fix for COMPACT-ALONE training: at "
                        "C=0.5 the undamped run recovers only to 0.77 vs "
                        "the 0.84 dense control; with 0.3 it reaches 0.92 "
                        "(1500-step harness, PERF.md). Do NOT combine "
                        "with --token-keep: damping collapses the "
                        "compact+token-drop stack (measured 0.17-0.31). "
                        "Default 1.0 = reference-exact optimizer")
    p.add_argument("--compact-capacity-start", type=float, default=None,
                   metavar="C_HI",
                   help="capacity ANNEAL (round-5 spike fix): run the "
                        "first --compact-capacity-anneal steps at this "
                        "higher capacity (slack above the target), then "
                        "drop to --compact-capacity. Capacity slack is the "
                        "measured mitigation for the router-shift distill "
                        "spike (C=0.625 recovers to dense parity where "
                        "C=0.5 does not — PERF.md); annealing keeps the "
                        "C=0.5 steady-state throughput with the slack "
                        "phase's convergence")
    p.add_argument("--compact-capacity-anneal", type=int, default=0,
                   metavar="STEPS",
                   help="steps spent at --compact-capacity-start before "
                        "dropping to the target capacity (after the "
                        "--compact-warmup dense phase)")
    p.add_argument("--compact-overflow", type=str, default="demote",
                   choices=["demote", "identity"],
                   help="overflowing active tokens take the low-rank "
                        "approximator path (demote, default — the "
                        "convergence-safe semantics) or stay identity "
                        "(DynamicViT; measured to collapse training, "
                        "scripts/compact_convergence.py)")
    p.add_argument("--remat", type=str, nargs="?", const="full",
                   default=None, choices=["none", "full", "selective"],
                   help="block rematerialization (default: none — measured "
                        "best for res-vit; the fused kernels keep residuals "
                        "small without it)")
    p.add_argument("--scan-layers", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="lax.scan over blocks with PRE-STACKED params "
                        "(compile ~5x faster; params stored stacked in "
                        "memory, converted at the checkpoint boundary)")
    p.add_argument("--exp-root", type=str, default="experiments")
    p.add_argument("--synthetic-samples", type=int, default=512)
    cfg = p.parse_args(argv)
    cfg.num_classes = num_classes_for_dataset(cfg.dataset)
    return process_config(cfg, root=cfg.exp_root)


def config_to_model_args(c) -> "resvit_arch_config":
    """res-vit/config.py:68-96 equivalent: argparse config → ResViTConfig.

    Fused kernels and the int8 attention tiers default to the measured-
    fastest on-TPU configuration; every kernel keeps its shape gate + XLA
    fallback. `--int8-grad` implies `--int8`."""
    dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
    on_tpu = jax.default_backend() not in ("cpu",)
    fused_qkv = getattr(c, "fused_qkv", None)
    if fused_qkv is None:
        fused_qkv = on_tpu
    int8_dw = getattr(c, "int8_dw", False)
    int8_grad = getattr(c, "int8_grad", False) or int8_dw
    int4_attn = getattr(c, "int4_attn", False)
    int4_grad = getattr(c, "int4_grad", False)
    int4 = getattr(c, "int4", False) or int4_attn or int4_grad
    int8 = getattr(c, "int8", False) or int8_grad or int4
    fused_mlp = getattr(c, "fused_mlp", None)
    if fused_mlp is None:
        # bf16 fused_mlp regresses res-vit (in-kernel recompute vs XLA's
        # saved activations, PERF.md); the int8 MLP tiers flip it to the
        # best measured config (+0.5% at HALF the activation memory,
        # round-3 matrix) — so default it on exactly when int8 is on
        fused_mlp = on_tpu and int8
    remat = getattr(c, "remat", None)
    if remat is None:
        # measured (round 3, batch 96 int8 recipe): selective remat LOSES
        # for res-vit both without fused_mlp (830->750) and with it
        # (768->754) — the custom-VJP kernels already keep residuals tiny,
        # so remat only adds replay work. Off unless explicitly requested.
        remat = "none"
    remat = {"none": False, "full": True}.get(remat, remat)
    head_kw = {}
    if c.n_heads is not None:
        head_kw["n_heads"] = c.n_heads
    if c.n_kv_heads is not None or c.n_heads is not None:
        head_kw["n_kv_heads"] = (c.n_kv_heads if c.n_kv_heads is not None
                                 else c.n_heads)
    return resvit_arch_config(
        c.model_arch, image_size=c.image_size, num_classes=c.num_classes,
        **head_kw, norm_eps=c.norm_eps, lora_rank=c.lora_rank,
        dynamic_active_target=c.dynamic_active_target,
        dynamic_start_layer=c.dynamic_start_layer,
        dynamic_router_hdim=c.dynamic_router_hdim,
        dynamic_reserve_initials=c.dynamic_reserve_initials,
        low_rank_dim=c.low_rank_dim, block_size=c.block_size,
        use_lora=c.use_lora, use_reslr=c.use_reslr,
        dtype=dtype, fused_qkv=fused_qkv,
        # qkvo (out-proj + LN subsumed) measured fastest for res-vit
        fused_qkvo=fused_qkv,
        fused_mlp=fused_mlp, remat=remat,
        int8_attn=int8, int8_attn_grad=int8_grad,
        int8_mlp=int8, int8_mlp_grad=int8_grad, int8_dw=int8_dw,
        int4_mlp=int4, int4_attn=int4_attn, int4_grad=int4_grad,
        fused_mlp_save=getattr(c, "save_acts", False),
        compact_capacity=getattr(c, "compact_capacity", None),
        token_keep=getattr(c, "token_keep", 1.0),
        compact_demote_overflow=(getattr(c, "compact_overflow", "demote")
                                 != "identity"),
        use_pallas=False if c.no_pallas else None)


def _structure_report(params) -> dict:
    rep = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        rep[key] = {"shape": list(np.shape(leaf)),
                    "dtype": str(np.asarray(leaf).dtype)}
    return rep


def main(argv=None):
    enable_compilation_cache()
    config = get_train_config(argv)
    print("----- Configuration -----")
    for k, v in sorted(vars(config).items()):
        print(f"{k}: {v}")
    root_key = set_seed(config.seed)

    cfg = config_to_model_args(config)
    if cfg.int4_mlp or cfg.int4_attn or cfg.int4_grad:
        print("WARNING: the int4 tiers MEASURED DIVERGENT for routed "
              "(res-vit) training — held-out accuracy flat-lines on the "
              "convergence harness with or without compaction (PERF.md "
              "'int4 x res-vit' section). They are validated for plain-ViT "
              "training only; use the int8 tiers for res-vit recipes.")
    params = resvit.init_params(root_key, cfg)

    mapping_log = {}
    if config.checkpoint_path:
        vit_cfg = arch_config(config.model_arch, image_size=config.image_size,
                              num_classes=config.num_classes)
        vit_params = load_checkpoint(config.checkpoint_path, vit_cfg)
        params, mapping_log = resvit_params_from_vit(vit_params, params, cfg)
        print(f"loaded pretrained backbone: {len(mapping_log)} tensors mapped")
    params = jax.tree.map(jnp.asarray, params)

    # JSON diagnostics (res-vit/utils.py:182-205,440-441,445-485)
    write_json(_structure_report(params),
               f"{config.result_dir}/model_structure.json")
    write_json(mapping_log, f"{config.result_dir}/weight_mapping_log.json")
    mask = resvit.trainable_mask(params, cfg)
    trainable = {
        "trainable": [k for k, v in zip(_structure_report(params),
                                        jax.tree.leaves(mask)) if v],
        "frozen": [k for k, v in zip(_structure_report(params),
                                     jax.tree.leaves(mask)) if not v],
        "trainable_bytes": int(sum(
            np.size(p) * 4 for p, m in zip(jax.tree.leaves(params),
                                           jax.tree.leaves(mask)) if m)),
        "total_bytes": int(tree_bytes(params)),
    }
    write_json(trainable, f"{config.result_dir}/trainable_weights_info.json")

    common = dict(data_dir=config.data_dir, image_size=config.image_size,
                  batch_size=config.batch_size,
                  num_workers=config.num_workers, seed=config.seed)
    if config.dataset == "Synthetic":
        common["num_samples"] = config.synthetic_samples
    train_loader = get_dataloader(config.dataset, split="train", **common)
    valid_loader = get_dataloader(config.dataset, split="val", **common)

    epochs = max(1, config.train_steps // max(1, len(train_loader)))

    if config.lr_scheduler == "cosine_with_warmup":
        lr_sched = cosine_with_warmup_lr(config.lr, config.warmup_steps,
                                         config.train_steps)
        per_epoch_lr = False
    else:  # CosineAnnealingLR stepped per epoch (res-vit/train.py:287-291)
        lr_sched = cosine_annealing_lr(config.lr, epochs,
                                       eta_min=config.min_lr)
        per_epoch_lr = True

    steps_per_epoch = max(1, len(train_loader))
    if per_epoch_lr:
        inner = lr_sched
        lr_sched = lambda step: inner(step // steps_per_epoch)

    if config.scan_layers and resvit._scan_eligible(cfg):
        # pre-stacked layout: the scan apply runs with zero per-step
        # restacking; list layout stays canonical at the checkpoint/
        # diagnostics boundary (stack_params docstring)
        params = resvit.stack_params(params, cfg)
    tx = make_adamw_for(cfg, params, lr_sched,
                        router_lr_scale=getattr(config, "router_lr_scale",
                                                1.0),
                        betas=(config.beta1, config.beta2), eps=config.eps,
                        weight_decay=config.wd,
                        clip_grad_norm=1.0 if config.clip_grad_norm else None)
    state = create_state(params, tx, jax.random.fold_in(root_key, 7))

    lambdas = Lambdas(classification=config.initial_lambda_class,
                      active=config.initial_lambda_active,
                      distill=config.initial_lambda_distill)
    train_step = make_train_step(cfg, tx, lambdas, donate=True)

    # PatchDropout keep schedule (same semantics as train_cli): --token-keep
    # for the first FRAC of epochs, dense for the rest; epoch-boundary
    # switch keeps each phase one static-shape program.
    sched = getattr(config, "token_keep_schedule", None)
    dense_from_epoch = token_keep_switch_epoch(sched, cfg.token_keep, epochs)
    dense_step = None
    if dense_from_epoch < epochs:
        import dataclasses as _dc
        dense_step = make_train_step(_dc.replace(cfg, token_keep=1.0), tx,
                                     lambdas, donate=True)
        print(f"token-keep schedule: keep {cfg.token_keep} for epochs "
              f"0..{dense_from_epoch - 1}, dense from epoch "
              f"{dense_from_epoch}")

    warm_train_step = None
    compact_warmup = getattr(config, "compact_warmup", 0) or 0
    if cfg.compact_capacity is not None and compact_warmup > 0:
        # dense warmup step: same param/opt pytree, compaction off, so the
        # router leaves its ~all-active init before capacity starts
        # dropping overflow tokens (see --compact-warmup help)
        import dataclasses as _dc
        warm_train_step = make_train_step(
            _dc.replace(cfg, compact_capacity=None), tx, lambdas,
            donate=True)
    hi_train_step = None
    cap_anneal_until = 0
    cap_hi = getattr(config, "compact_capacity_start", None)
    cap_anneal = getattr(config, "compact_capacity_anneal", 0) or 0
    if cfg.compact_capacity is not None and cap_hi and cap_anneal > 0:
        if cap_hi < cfg.compact_capacity:
            raise ValueError("--compact-capacity-start must be >= "
                             "--compact-capacity (it is the slack phase)")
        import dataclasses as _dc
        hi_train_step = make_train_step(
            _dc.replace(cfg, compact_capacity=cap_hi), tx, lambdas,
            donate=True)
        cap_anneal_until = compact_warmup + cap_anneal
        print(f"capacity anneal: C={cap_hi} for steps "
              f"{compact_warmup}..{cap_anneal_until - 1}, then "
              f"C={cfg.compact_capacity}")
    eval_step = make_eval_step(cfg, lambdas)

    writer = ExperimentWriter(
        config.summary_dir,
        backend=("swanlab" if config.swanlab else
                 "tensorboard" if config.tensorboard else "none"),
        project=f"vit-{config.dataset}", exp_name=config.exp_name)
    store = CheckpointStore(config.checkpoint_dir)

    best_acc = 0.0
    steps_done = 0
    print(f"training {epochs} epochs x {steps_per_epoch} steps")
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        for i, batch in enumerate(train_loader):
            if batch.weight.sum() < len(batch.weight):
                continue
            images = jnp.asarray(batch.images, cfg.dtype)
            labels = jnp.asarray(batch.labels)
            fn = train_step
            if warm_train_step is not None and steps_done < compact_warmup:
                fn = warm_train_step
            elif hi_train_step is not None and steps_done < cap_anneal_until:
                fn = hi_train_step
            if dense_step is not None and epoch >= dense_from_epoch:
                fn = dense_step
            state, metrics = fn(state, images, labels)
            steps_done += 1
            if i % config.print_freq == config.print_freq - 1:
                mh = {k: np.asarray(v) for k, v in metrics.items()}
                step = int(state.step)
                writer.set_step(step, "train")
                for k, v in mh.items():
                    if v.ndim == 0:
                        writer.add_scalar(k, float(v))
                writer.add_scalars("layer_activation_rates", {
                    f"layer_{j}": float(v) for j, v in
                    enumerate(mh["layer_activation_rates"])})
                rate = (i + 1) * len(batch.weight) / (time.time() - t0)
                print(f"epoch {epoch} step {step}: "
                      f"loss={float(mh['loss']):.4f} "
                      f"c={float(mh['c_loss']):.4f} "
                      f"a={float(mh['a_loss']):.6f} "
                      f"d={float(mh['d_loss']):.4f} "
                      f"H={float(mh['router_entropy']):.4f} "
                      f"active={float(mh['non_low_rank_ratio']):.3f} "
                      f"acc1={float(mh['acc1']):.3f} ({rate:.0f} img/s)",
                      flush=True)

        # validation (res-vit/train.py:321-341)
        totals: dict = {}
        n = 0.0
        viz_done = not config.save_routing_viz
        for batch in valid_loader:
            images = jnp.asarray(batch.images, cfg.dtype)
            labels = jnp.asarray(batch.labels)
            weight = jnp.asarray(batch.weight)
            metrics, routing_maps = eval_step(state.params, images, labels,
                                              weight)
            bs = float(weight.sum())
            for k, v in metrics.items():
                v = np.asarray(v)
                if v.ndim == 0:
                    totals[k] = totals.get(k, 0.0) + float(v) * bs
            n += bs
            if not viz_done and routing_maps:
                save_routing_visualization(
                    batch.images, {k: np.asarray(v)
                                   for k, v in routing_maps.items()},
                    epoch, f"{config.result_dir}/routing_viz",
                    patch_size=config.patch_size,
                    reserve_initials=config.dynamic_reserve_initials)
                viz_done = True
        vr = {k: v / max(n, 1) for k, v in totals.items()}
        writer.set_step(int(state.step), "valid")
        for k, v in vr.items():
            writer.add_scalar(k, v)
        print(f"epoch {epoch} valid: "
              + " ".join(f"{k}={v:.4f}" for k, v in sorted(vr.items())),
              flush=True)

        is_best = vr.get("acc1", 0.0) > best_acc
        best_acc = max(best_acc, vr.get("acc1", 0.0))
        store.save_model(state, epoch, is_best=is_best,
                         metrics={"best_acc": best_acc, **vr},
                         async_save=True)
    store.wait_until_finished()
    writer.close()
    print(f"done; best acc1 = {best_acc:.4f}")
    return best_acc


if __name__ == "__main__":
    main()
