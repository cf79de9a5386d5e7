"""Res-ViT under the data-parallel mesh: training on 8 fake devices must
match single-device training (gradient all-reduce correctness for the full
router/LoRA/approximator model)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitax.core.config import ResViTConfig
from vitax.models import resvit
from vitax.parallel import mesh as pmesh
from vitax.train.resvit_steps import (Lambdas, create_state, make_adamw_for,
                                      make_train_step)

CFG = ResViTConfig(dim=48, mlp_dim=96, n_layers=3, n_heads=4, n_kv_heads=4,
                   lora_rank=4, dynamic_start_layer=1,
                   dynamic_router_hdim=32, dynamic_reserve_initials=1,
                   low_rank_dim=8, block_size=1, use_lora=True,
                   use_reslr=True, image_size=(32, 32), patch_size=(16, 16),
                   num_classes=7, dropout=0.0, dtype=jnp.float32,
                   param_dtype=jnp.float32, use_pallas=False)


def _setup():
    params = resvit.init_params(jax.random.PRNGKey(0), CFG)
    tx = make_adamw_for(CFG, params, lambda _: 1e-3)
    return create_state(params, tx, jax.random.PRNGKey(1)), tx


def test_resvit_dp_matches_single_device():
    devices = jax.devices()
    assert len(devices) >= 8

    key = jax.random.PRNGKey(2)
    images = jax.random.normal(key, (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (16,), 0, 7)

    state1, tx1 = _setup()
    step1 = make_train_step(CFG, tx1, Lambdas(), donate=False)
    for _ in range(2):
        state1, m1 = step1(state1, images, labels)

    m = pmesh.make_mesh(n_data=8, n_model=1, devices=devices[:8])
    state8, tx8 = _setup()
    with m:
        repl = jax.tree.map(lambda _: pmesh.replicated(m), state8.params)
        state8 = state8._replace(
            params=jax.device_put(state8.params, repl),
            opt_state=jax.device_put(
                state8.opt_state,
                jax.tree.map(lambda x: pmesh.replicated(m)
                             if np.ndim(x) >= 0 else None, state8.opt_state)))
        step8 = make_train_step(CFG, tx8, Lambdas(), donate=False)
        imgs = jax.device_put(images, pmesh.batch_sharding(m))
        lbls = jax.device_put(labels, pmesh.batch_sharding(m))
        for _ in range(2):
            state8, m8 = step8(state8, imgs, lbls)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_resvit_tp_matches_single_device():
    """data=4 x model=2 mesh with Megatron-style res-vit shardings must
    match single-device training."""
    devices = jax.devices()
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 7)

    state1, tx1 = _setup()
    step1 = make_train_step(CFG, tx1, Lambdas(), donate=False)
    state1, m1 = step1(state1, images, labels)

    m = pmesh.make_mesh(n_data=4, n_model=2, devices=devices[:8])
    state2, tx2 = _setup()
    with m:
        pshard = pmesh.resvit_param_shardings(state2.params, m)
        state2 = state2._replace(
            params=jax.device_put(state2.params, pshard),
            opt_state=jax.device_put(
                state2.opt_state,
                pmesh.opt_state_shardings(state2.opt_state, state2.params,
                                          pshard, m)))
        step2 = make_train_step(CFG, tx2, Lambdas(), donate=False)
        state2, m2 = step2(state2,
                           jax.device_put(images, pmesh.batch_sharding(m)),
                           jax.device_put(labels, pmesh.batch_sharding(m)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def _tp_equality(cfg, lambdas=Lambdas(), steps=1, batch=8):
    """Train `steps` on one device and on a data=4 x model=2 mesh; assert
    loss + updated params equal (GSPMD XLA path; the shard_map fused-kernel
    TP path is gated to mesh-aware square attention — compaction and
    token-drop ride this same sharded program)."""
    devices = jax.devices()
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (batch, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (batch,), 0, 7)

    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    tx1 = make_adamw_for(cfg, params, lambda _: 1e-3)
    state1 = create_state(params, tx1, jax.random.PRNGKey(1))
    step1 = make_train_step(cfg, tx1, lambdas, donate=False)
    for _ in range(steps):
        state1, m1 = step1(state1, images, labels)

    m = pmesh.make_mesh(n_data=4, n_model=2, devices=devices[:8])
    params2 = resvit.init_params(jax.random.PRNGKey(0), cfg)
    tx2 = make_adamw_for(cfg, params2, lambda _: 1e-3)
    state2 = create_state(params2, tx2, jax.random.PRNGKey(1))
    with m:
        pshard = pmesh.resvit_param_shardings(state2.params, m)
        state2 = state2._replace(
            params=jax.device_put(state2.params, pshard),
            opt_state=jax.device_put(
                state2.opt_state,
                pmesh.opt_state_shardings(state2.opt_state, state2.params,
                                          pshard, m)))
        step2 = make_train_step(cfg, tx2, lambdas, donate=False)
        for _ in range(steps):
            state2, m2 = step2(
                state2, jax.device_put(images, pmesh.batch_sharding(m)),
                jax.device_put(labels, pmesh.batch_sharding(m)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_resvit_tp_compact_training_matches_single_device():
    """VERDICT r3 #6: TP-2 equality for the COMPACT training step (capacity
    0.75 + demotion + rect/matmul-merge machinery on the sharded program)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, compact_capacity=0.75)
    _tp_equality(cfg)


def test_resvit_tp_token_drop_matches_single_device():
    """VERDICT r3 #6: TP-2 equality for the token-drop training step (the
    per-image gather shards over the data axis; indices derive from the
    replicated per-step rng, so model-axis shards agree)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, token_keep=0.5)
    _tp_equality(cfg)
