"""End-to-end CLI integration tests (CPU, tiny arch, synthetic data).

SURVEY §4: "CPU-runnable integration tests" — the full train → checkpoint →
eval → resume loop for both model families through the real CLI entry
points.
"""

import os

import numpy as np
import pytest


def test_vit_train_eval_resume(tmp_path):
    from vitax import eval_cli, train_cli

    args = ["--dataset", "Synthetic", "--model-arch", "tiny",
            "--image-size", "32", "--batch-size", "8",
            "--synthetic-samples", "64", "--train-steps", "16",
            "--lr", "0.01", "--warmup-steps", "2",
            "--num-workers", "0", "--dtype", "float32", "--no-pallas",
            "--exp-name", "citest", "--exp-root", str(tmp_path)]
    best = train_cli.main(args)
    assert 0.0 <= best <= 1.0

    # find the checkpoint dir the run created
    save_root = tmp_path / "save"
    exp_dirs = list(save_root.iterdir())
    assert len(exp_dirs) == 1
    ckpt_dir = exp_dirs[0] / "checkpoints"
    assert (ckpt_dir / "current").is_dir()
    assert (ckpt_dir / "best").is_dir()
    assert (exp_dirs[0] / "config.json").is_file()

    # eval from the saved checkpoint
    result = eval_cli.main([
        "--dataset", "Synthetic", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "8",
        "--synthetic-samples", "64",
        "--num-workers", "0", "--dtype", "float32", "--no-pallas",
        "--checkpoint-path", str(ckpt_dir / "best")])
    assert abs(result["acc1"] - best) < 0.2  # same data, same params

    # resume continues from saved state (epoch counter advances)
    best2 = train_cli.main(args + ["--resume", str(ckpt_dir),
                                   "--train-steps", "32"])
    assert 0.0 <= best2 <= 1.0


def test_resvit_train_and_eval(tmp_path):
    from vitax import resvit_eval_cli, resvit_train_cli

    args = ["--dataset", "Synthetic", "--model-arch", "tiny",
            "--image-size", "32", "--batch-size", "8",
            "--synthetic-samples", "64", "--train-steps", "16",
            "--print-freq", "4",
            "--lr", "0.001", "--warmup-steps", "2", "--num-workers", "0",
            "--dtype", "float32", "--no-pallas",
            "--use_lora", "False", "--use_reslr", "True",
            "--dynamic_start_layer", "1", "--block_size", "1",
            "--dynamic_router_hdim", "32", "--low_rank_dim", "8",
            "--n_heads", "3", "--n_kv_heads", "3",
            "--save-routing-viz",
            "--exp-name", "citest", "--exp-root", str(tmp_path)]
    best = resvit_train_cli.main(args)
    assert 0.0 <= best <= 1.0

    exp_dirs = list((tmp_path / "save").iterdir())
    assert len(exp_dirs) == 1
    results = exp_dirs[0] / "results"
    # JSON diagnostics written (reference parity)
    assert (results / "model_structure.json").is_file()
    assert (results / "weight_mapping_log.json").is_file()
    assert (results / "trainable_weights_info.json").is_file()
    # routing viz PNGs
    viz = list((results / "routing_viz").glob("*.png"))
    assert viz, "expected routing visualization PNGs"

    ckpt_dir = exp_dirs[0] / "checkpoints"
    result = resvit_eval_cli.main([
        "--dataset", "Synthetic", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "8",
        "--synthetic-samples", "64", "--num-workers", "0",
        "--dtype", "float32", "--no-pallas",
        "--use_lora", "False", "--use_reslr", "True",
        "--dynamic_start_layer", "1", "--block_size", "1",
        "--dynamic_router_hdim", "32", "--low_rank_dim", "8",
        "--n_heads", "3", "--n_kv_heads", "3",
        "--checkpoint-path", str(ckpt_dir / "best")])
    assert "acc1" in result


def test_resvit_lora_freezing_smoke(tmp_path):
    """With use_lora the frozen base weights must not change over steps."""
    import jax
    import jax.numpy as jnp
    from vitax.core.config import resvit_arch_config
    from vitax.models import resvit
    from vitax.train.resvit_steps import (create_state, make_adamw_for,
                                          make_train_step)

    cfg = resvit_arch_config("tiny", image_size=32, num_classes=10,
                             use_lora=True, use_reslr=True,
                             dynamic_start_layer=1, block_size=1,
                             dynamic_router_hdim=32, low_rank_dim=8,
                             lora_rank=4, dtype=jnp.float32,
                             use_pallas=False)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_adamw_for(cfg, params, lambda _: 1e-3)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, donate=False)

    key = jax.random.PRNGKey(2)
    images = jax.random.normal(key, (4, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (4,), 0, 10)
    before = jax.tree.map(np.asarray, state.params)
    for _ in range(3):
        state, metrics = step(state, images, labels)
    after = jax.tree.map(np.asarray, state.params)

    wq_b = before["layers"][0]["attention"]["wq"]["kernel"]
    wq_a = after["layers"][0]["attention"]["wq"]["kernel"]
    np.testing.assert_array_equal(wq_a, wq_b)  # frozen base
    lora_b = before["layers"][0]["attention"]["lora_q"]["a"]["kernel"]
    lora_a = after["layers"][0]["attention"]["lora_q"]["a"]["kernel"]
    assert not np.array_equal(lora_a, lora_b)  # LoRA trains
    cls_b = before["classifier"]["kernel"]
    cls_a = after["classifier"]["kernel"]
    assert not np.array_equal(cls_a, cls_b)  # head trains


def test_vit_train_with_device_prep(tmp_path):
    """--device-prep: uint8 batches + on-device flip/normalize end to end."""
    from vitax import train_cli

    best = train_cli.main([
        "--dataset", "Synthetic", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "8",
        "--synthetic-samples", "48", "--train-steps", "12",
        "--lr", "0.01", "--warmup-steps", "2",
        "--num-workers", "0", "--dtype", "float32", "--no-pallas",
        "--device-prep",
        "--exp-name", "devprep", "--exp-root", str(tmp_path)])
    assert 0.0 <= best <= 1.0
