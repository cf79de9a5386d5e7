"""Train/eval step + multi-device mesh tests (8 fake CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitax.core.config import ViTConfig
from vitax.models import vit
from vitax.parallel import mesh as pmesh
from vitax.train import (create_train_state, cross_entropy, make_eval_step,
                         make_train_step, onecycle_lr, onecycle_momentum,
                         sgd_momentum, topk_accuracy)

TINY = ViTConfig(image_size=(32, 32), patch_size=(16, 16), emb_dim=64,
                 mlp_dim=128, num_heads=4, num_layers=2, num_classes=10,
                 dropout_rate=0.0, dtype=jnp.float32, use_pallas=False)


def _setup(total=100):
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    tx = sgd_momentum(onecycle_lr(0.01, total, 0.1),
                      momentum_schedule=onecycle_momentum(total, 0.1))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    return state, tx


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 1.0, 0.0], [0.0, 0.0, 5.0]])
    labels = jnp.asarray([0, 2])
    expect = -np.mean([np.log(np.exp(2) / np.exp([2, 1, 0]).sum()),
                       np.log(np.exp(5) / np.exp([0, 0, 5]).sum())])
    assert abs(float(cross_entropy(logits, labels)) - expect) < 1e-6


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0, 0, 0, 0],
                          [0.9, 0.1, 0.0, 0, 0, 0]])
    labels = jnp.asarray([1, 1])
    acc = topk_accuracy(logits, labels)
    assert float(acc["acc1"]) == 0.5
    assert float(acc["acc5"]) == 1.0


def test_train_step_reduces_loss():
    state, tx = _setup()
    step = make_train_step(TINY, tx, donate=False)
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 10)
    losses = []
    for _ in range(10):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 10


def test_eval_step():
    state, _ = _setup()
    estep = make_eval_step(TINY)
    key = jax.random.PRNGKey(4)
    images = jax.random.normal(key, (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 10)
    m = estep(state.params, images, labels)
    assert 0.0 <= float(m["acc1"]) <= float(m["acc5"]) <= 1.0


def test_data_parallel_matches_single_device():
    """DP over the 8-device fake mesh must produce the same params as
    single-device training (the collectives are pure all-reduces)."""
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must fake 8 devices"

    key = jax.random.PRNGKey(5)
    images = jax.random.normal(key, (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (16,), 0, 10)

    # single device
    state1, tx1 = _setup()
    step1 = make_train_step(TINY, tx1, donate=False)
    for _ in range(3):
        state1, _ = step1(state1, images, labels)

    # 8-device data parallel
    m = pmesh.make_mesh(n_data=8, n_model=1, devices=devices[:8])
    state8, tx8 = _setup()
    with m:
        pshard = pmesh.vit_param_shardings(state8.params, m)
        state8 = state8._replace(
            params=jax.device_put(state8.params, pshard),
            opt_state=jax.device_put(
                state8.opt_state,
                pmesh.opt_state_shardings(state8.opt_state, state8.params,
                                          pshard, m)))
        step8 = make_train_step(TINY, tx8, donate=False)
        imgs = jax.device_put(images, pmesh.batch_sharding(m))
        lbls = jax.device_put(labels, pmesh.batch_sharding(m))
        for _ in range(3):
            state8, _ = step8(state8, imgs, lbls)

    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_tensor_parallel_matches_single_device():
    """data=4 × model=2 mesh (TP on heads/mlp) must match single-device."""
    devices = jax.devices()
    key = jax.random.PRNGKey(6)
    images = jax.random.normal(key, (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 10)

    state1, tx1 = _setup()
    step1 = make_train_step(TINY, tx1, donate=False)
    state1, m1 = step1(state1, images, labels)

    m = pmesh.make_mesh(n_data=4, n_model=2, devices=devices[:8])
    state2, tx2 = _setup()
    with m:
        pshard = pmesh.vit_param_shardings(state2.params, m)
        state2 = state2._replace(
            params=jax.device_put(state2.params, pshard),
            opt_state=jax.device_put(
                state2.opt_state,
                pmesh.opt_state_shardings(state2.opt_state, state2.params,
                                          pshard, m)))
        step2 = make_train_step(TINY, tx2, donate=False)
        state2, m2 = step2(state2,
                           jax.device_put(images, pmesh.batch_sharding(m)),
                           jax.device_put(labels, pmesh.batch_sharding(m)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_graft_entry_traces():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)  # abstract trace: shape errors surface here
    assert out.shape == (8, 100)


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_tensor_parallel_token_drop_matches_single_device():
    """VERDICT r3 #6: TP-2 equality with token dropping active — the
    per-image gather shards over the data axis; its indices come from the
    replicated per-step rng so model-axis shards pick identical subsets."""
    devices = jax.devices()
    cfg = TINY.replace(token_keep=0.5)
    key = jax.random.PRNGKey(6)
    images = jax.random.normal(key, (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 10)

    state1, tx1 = _setup()
    step1 = make_train_step(cfg, tx1, donate=False)
    state1, m1 = step1(state1, images, labels)

    m = pmesh.make_mesh(n_data=4, n_model=2, devices=devices[:8])
    state2, tx2 = _setup()
    with m:
        pshard = pmesh.vit_param_shardings(state2.params, m)
        state2 = state2._replace(
            params=jax.device_put(state2.params, pshard),
            opt_state=jax.device_put(
                state2.opt_state,
                pmesh.opt_state_shardings(state2.opt_state, state2.params,
                                          pshard, m)))
        step2 = make_train_step(cfg, tx2, donate=False)
        state2, m2 = step2(state2,
                           jax.device_put(images, pmesh.batch_sharding(m)),
                           jax.device_put(labels, pmesh.batch_sharding(m)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
