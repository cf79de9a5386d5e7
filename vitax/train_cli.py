"""Fine-tune CLI — the vitax counterpart of src/train.py.

Same observable behavior (src/train.py:84-195): build model from arch preset,
load pretrained checkpoint with classifier re-init on class mismatch, epochs =
train_steps // len(train_loader), per-epoch train/valid with top-1/top-5,
save `current`/`best` checkpoints keyed on val acc1 — plus vitax capabilities
the reference lacks: exact resume, data+tensor-parallel mesh, bf16 compute,
orbax checkpoints and `.pth` export.

Run: `python -m vitax.train_cli --dataset CIFAR100 --model-arch b16 ...`
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vitax.core.cache import enable_compilation_cache
from vitax import cli
from vitax.checkpointing import CheckpointStore, export_pth, load_checkpoint
from vitax.core.config import arch_config
from vitax.core.prng import set_seed
from vitax.data import get_dataloader
from vitax.models import vit
from vitax.parallel import mesh as pmesh
from vitax.train.schedules import token_keep_switch_epoch
from vitax.train import (create_train_state, make_train_step,
                         onecycle_lr, onecycle_momentum, sgd_momentum)
from vitax.utils import ExperimentWriter, MetricTracker, print_memory_usage


def _put(state, m):
    pshard = pmesh.vit_param_shardings(state.params, m)
    return state._replace(
        params=jax.device_put(state.params, pshard),
        opt_state=jax.device_put(
            state.opt_state,
            pmesh.opt_state_shardings(state.opt_state, state.params, pshard, m)),
        step=jax.device_put(state.step, pmesh.replicated(m)),
        rng=jax.device_put(state.rng, pmesh.replicated(m)),
    )


def train_epoch(epoch, state, train_step, loader, m, writer, tracker,
                print_freq=100):
    from vitax.data.device_feed import device_feed
    tracker.reset()
    loader.set_epoch(epoch)
    t0 = time.time()
    feed = device_feed(loader, pmesh.batch_sharding(m))
    for i, (images, labels, weight) in enumerate(feed):
        if weight.sum() < len(weight):
            continue  # partial final train batch: skip like drop_last
        state, metrics = train_step(state, images, labels)
        if i % print_freq == print_freq - 1:
            # device sync (int/float readbacks) only at print frequency —
            # per-step syncs would stall the async dispatch pipeline
            step = int(state.step)
            writer.set_step(step, "train")
            mh = {k: float(v) for k, v in metrics.items()}
            for k, v in mh.items():
                tracker.update(k, v)
                writer.add_scalar(k, v)
            rate = (i + 1) * len(weight) / (time.time() - t0)
            print(f"epoch {epoch} step {step}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in mh.items())
                  + f" ({rate:.0f} img/s)", flush=True)
    return state, tracker.result()


def valid_epoch(epoch, state, eval_step, loader, writer, tracker):
    tracker.reset()
    totals = {"loss": 0.0, "acc1": 0.0, "acc5": 0.0}
    n = 0
    for batch in loader:
        images = jnp.asarray(batch.images)
        labels = jnp.asarray(batch.labels)
        weight = jnp.asarray(batch.weight)
        metrics = eval_step(state.params, images, labels, weight)
        bs = float(weight.sum())
        for k in totals:
            totals[k] += float(metrics[k]) * bs
        n += bs
    result = {k: v / max(n, 1) for k, v in totals.items()}
    writer.set_step(int(state.step), "valid")
    for k, v in result.items():
        tracker.update(k, v)
        writer.add_scalar(k, v)
    print(f"epoch {epoch} valid: "
          + " ".join(f"{k}={v:.4f}" for k, v in result.items()), flush=True)
    return result


def make_weighted_eval_step(cfg, device_prep: bool = False):
    """Eval step with a padding mask so the padded final batch counts only
    real samples."""

    def step_fn(params, images, labels, weight):
        if device_prep:
            from vitax.data.device_prep import preprocess
            images = preprocess(images, train=False, dtype=cfg.dtype)
        logits = vit.apply(params, images, cfg, train=False)
        logits32 = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits32, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        wsum = jnp.maximum(weight.sum(), 1.0)
        out = {"loss": (nll * weight).sum() / wsum}
        _, top = jax.lax.top_k(logits32, 5)
        correct = top == labels[:, None]
        out["acc1"] = (correct[:, 0] * weight).sum() / wsum
        out["acc5"] = (jnp.any(correct, axis=-1) * weight).sum() / wsum
        return out

    return jax.jit(step_fn)


def model_config_from_cli(config):
    """CLI flags → ViTConfig. Split out so tests can assert the plumbing.

    Fused kernels default ON when running on a TPU backend (the measured-
    fastest configuration; the per-shape `*_supported` gates keep the XLA
    fallback for unsupported geometries). `--int8-dw` implies `--int8-grad`
    implies `--int8` — each tier builds on the previous one."""
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    on_tpu = jax.default_backend() not in ("cpu",)
    fused_qkv = config.fused_qkv if config.fused_qkv is not None else on_tpu
    fused_mlp = (config.fused_mlp if getattr(config, "fused_mlp", None)
                 is not None else on_tpu)
    int8_dw = getattr(config, "int8_dw", False)
    int8_grad = getattr(config, "int8_grad", False) or int8_dw
    int4_attn = getattr(config, "int4_attn", False)
    int4_grad = getattr(config, "int4_grad", False)
    int4 = getattr(config, "int4", False) or int4_attn or int4_grad
    int8 = getattr(config, "int8", False) or int8_grad or int4
    remat = config.remat
    if remat is None:
        # auto: with both custom-VJP fused kernels the residuals are tiny
        # and remat replay re-runs the MLP forward kernel per layer —
        # measured no-remat 1174 vs selective 1094 img/s (int8 b192) and
        # 1007 vs 946 (bf16); selective stays best for the XLA path
        remat = "none" if (fused_qkv and fused_mlp) else "selective"
    remat = {"none": False, "full": True}.get(remat, remat)
    return arch_config(config.model_arch, image_size=config.image_size,
                       num_classes=config.num_classes, dtype=dtype,
                       remat=remat, fused_qkv=fused_qkv,
                       fused_mlp=fused_mlp,
                       int8_mlp=int8, int8_attn=int8,
                       int8_mlp_grad=int8_grad, int8_attn_grad=int8_grad,
                       int8_dw=int8_dw, int4_mlp=int4, int4_attn=int4_attn,
                       int4_grad=int4_grad,
                       fused_mlp_save=getattr(config, "save_acts", False),
                       token_keep=getattr(config, "token_keep", 1.0),
                       use_pallas=False if config.no_pallas else None)


def main(argv=None):
    enable_compilation_cache()
    config = cli.get_train_config(argv)
    cli.print_config(config)
    root_key = set_seed(config.seed)

    cfg = model_config_from_cli(config)

    # model init / pretrained load (head re-init on class mismatch,
    # src/train.py:117-121)
    params = vit.init_params(root_key, cfg)
    if config.checkpoint_path:
        loaded = load_checkpoint(config.checkpoint_path, cfg)
        if "classifier" not in loaded:
            print(f"re-initializing classifier head for "
                  f"{config.num_classes} classes")
            loaded["classifier"] = params["classifier"]
        params = jax.tree.map(jnp.asarray, loaded)

    # layer report + structure dump (src/utils.py:311-320 equivalent)
    from vitax.utils import log_model_layers, write_json
    n_params = log_model_layers(params, log=lambda *_: None)
    print(f"model: {config.model_arch} with {n_params:,} parameters")
    write_json({"arch": config.model_arch, "parameters": n_params},
               f"{config.result_dir}/model_info.json")

    # data
    common = dict(data_dir=config.data_dir, image_size=config.image_size,
                  batch_size=config.batch_size,
                  num_workers=config.num_workers, seed=config.seed)
    if config.dataset == "Synthetic":
        common["num_samples"] = config.synthetic_samples
    if config.device_prep:
        common["raw"] = True  # uint8 batches; flip+normalize run on device
    train_loader = get_dataloader(config.dataset, split="train", **common)
    valid_loader = get_dataloader(config.dataset, split="val", **common)

    # epoch plan. Reference semantics: epochs = train_steps // len(loader)
    # (src/train.py:168). With a heterogeneous-batch token-keep schedule
    # (--dense-batch-size != --batch-size) the dense tail's loader has a
    # different number of steps per epoch, so the reference formula would
    # overrun the optimizer-step budget (~1.3x for the 768/192 recipe) and
    # clamp OneCycle at min_lr; instead solve the epoch count from
    #   sched*E*len(drop_loader) + (1-sched)*E*len(dense_loader) = steps
    # and size OneCycle to the actual planned step count.
    sched = getattr(config, "token_keep_schedule", None)
    dense_bs = getattr(config, "dense_batch_size", None)
    dense_loader = None
    if sched is not None and dense_bs and dense_bs != config.batch_size:
        dense_loader = get_dataloader(config.dataset, split="train",
                                      **{**common, "batch_size": dense_bs})
        per_epoch = (sched * len(train_loader)
                     + (1.0 - sched) * len(dense_loader))
        epochs = max(2, int(round(config.train_steps / per_epoch)))
    else:
        epochs = max(1, config.train_steps // max(1, len(train_loader)))

    # PatchDropout keep schedule: --token-keep for the first FRAC of epochs,
    # full-sequence for the rest (dense tail = the PatchDropout fine-tune
    # recipe, arXiv:2208.07220 §4.4; accuracy evidence in PERF.md). The
    # switch is at an epoch boundary so each phase is one static-shape
    # jitted program.
    dense_from_epoch = token_keep_switch_epoch(sched, cfg.token_keep, epochs)
    if dense_loader is not None:
        total = (dense_from_epoch * len(train_loader)
                 + (epochs - dense_from_epoch) * len(dense_loader))
    else:
        total = config.train_steps
    print(f"training {epochs} epochs "
          f"({dense_from_epoch} x {len(train_loader)} steps"
          + (f" + {epochs - dense_from_epoch} x {len(dense_loader)} "
             f"dense-tail steps" if dense_loader is not None else "")
          + f"; schedule total {total})")
    if dense_from_epoch < epochs:
        print(f"token-keep schedule: keep {cfg.token_keep} for epochs "
              f"0..{dense_from_epoch - 1}, dense from epoch "
              f"{dense_from_epoch}")

    # optimizer: SGD(momentum=0.9) + OneCycle (src/train.py:154-163)
    pct = config.warmup_steps / total
    tx = sgd_momentum(onecycle_lr(config.lr, total, pct),
                      momentum_schedule=onecycle_momentum(total, pct),
                      weight_decay=config.wd)
    state = create_train_state(params, tx, jax.random.fold_in(root_key, 1))

    # mesh: data (+ optional tensor) parallel
    devices = jax.devices()
    if config.n_gpu > 0:
        devices = devices[:config.n_gpu]
    m = pmesh.make_mesh(n_data=len(devices) // config.n_model,
                        n_model=config.n_model, devices=devices)
    print(f"mesh: {dict(m.shape)} over {len(devices)} {devices[0].platform} "
          f"device(s)")

    store = CheckpointStore(config.checkpoint_dir)
    start_epoch = 0
    best_acc = 0.0
    if config.resume:
        rstore = CheckpointStore(config.resume)
        state = rstore.restore("current", state)
        meta = rstore.metadata("current")
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_acc = float(meta.get("best_acc", 0.0))
        print(f"resumed from {config.resume} at epoch {start_epoch}")

    writer = ExperimentWriter(
        config.summary_dir,
        backend=("swanlab" if config.swanlab else
                 "tensorboard" if config.tensorboard else "none"),
        exp_name=config.exp_name)
    train_tracker = MetricTracker("loss", "acc1", "acc5")
    valid_tracker = MetricTracker("loss", "acc1", "acc5")

    with m:
        state = _put(state, m)
        train_step = make_train_step(cfg, tx, donate=True,
                                     device_prep=config.device_prep,
                                     mesh=m)
        dense_step = None
        eval_step = make_weighted_eval_step(cfg,
                                            device_prep=config.device_prep)
        for epoch in range(start_epoch, epochs):
            step_fn, loader = train_step, train_loader
            if epoch >= dense_from_epoch:
                if dense_step is None:
                    dense_step = make_train_step(
                        cfg.replace(token_keep=1.0), tx, donate=True,
                        device_prep=config.device_prep, mesh=m)
                    if dense_loader is not None:
                        # FLIP recipe: the dropped phase runs a larger
                        # batch (halved activation memory); the dense tail
                        # returns to its own batch (arXiv:2212.00794 §3)
                        print(f"dense tail batch size: {dense_bs}")
                step_fn = dense_step
                loader = dense_loader or train_loader
            state, tr = train_epoch(epoch, state, step_fn, loader,
                                    m, writer, train_tracker)
            vr = valid_epoch(epoch, state, eval_step, valid_loader, writer,
                             valid_tracker)
            is_best = vr["acc1"] > best_acc
            best_acc = max(best_acc, vr["acc1"])
            # async: the epoch's eval already synced the step stream; the
            # disk write overlaps the next epoch (best-copies force a wait)
            store.save_model(state, epoch, is_best=is_best,
                             metrics={"best_acc": best_acc, **vr},
                             async_save=True)
            if is_best and config.export_pth:
                export_pth(jax.device_get(state.params),
                           f"{config.checkpoint_dir}/best.pth")
        store.wait_until_finished()
        print_memory_usage(state.params, state.opt_state)
    writer.close()
    print(f"done; best acc1 = {best_acc:.4f}")
    return best_acc


if __name__ == "__main__":
    main()
