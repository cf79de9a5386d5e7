"""PatchDropout/FLIP-style train-time token dropping (`ViTConfig.token_keep`).

The lever is opt-in and accuracy-affecting (it changes the training FLOP
count — the only axis left that moves the throughput floor, PERF.md). These
tests pin the semantics: exact no-op at keep=1.0, cls always kept, kept
patch tokens are an order-preserving uniform subset, dropped tokens get
zero gradient, eval is always full-sequence, and the CLI plumbs the flag.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vitax.core.config import ViTConfig
from vitax.models import vit

TINY = ViTConfig(image_size=(32, 32), patch_size=(8, 8), emb_dim=64,
                 mlp_dim=128, num_heads=4, num_layers=2, num_classes=10,
                 dropout_rate=0.0, dtype=jnp.float32, use_pallas=False)


def _params():
    return vit.init_params(jax.random.PRNGKey(0), TINY)


def test_keep_one_is_bitwise_noop():
    params = _params()
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    base = vit.apply(params, images, TINY, train=True,
                     rng=jax.random.PRNGKey(2))
    kept = vit.apply(params, images, TINY.replace(token_keep=1.0), train=True,
                     rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(kept))


def test_drop_tokens_subset_semantics():
    b, n, d = 3, 16, 8
    x = jnp.arange(b * (n + 1) * d, dtype=jnp.float32).reshape(b, n + 1, d)
    out = vit.drop_tokens(x, jax.random.PRNGKey(0), 0.5)
    k = round(0.5 * n)
    assert out.shape == (b, 1 + k, d)
    for i in range(b):
        # cls row preserved
        np.testing.assert_array_equal(np.asarray(out[i, 0]), np.asarray(x[i, 0]))
        # every kept row is one of the original patch rows, in original order
        # (rows of x are distinct by construction)
        orig = np.asarray(x[i]).tolist()
        positions = [orig.index(r) for r in np.asarray(out[i, 1:]).tolist()]
        assert all(p >= 1 for p in positions)
        assert positions == sorted(positions)
        assert len(set(positions)) == k


def test_drop_tokens_uniform_over_steps():
    # different rngs pick different subsets (w.h.p.)
    x = jnp.arange(1 * 17 * 4, dtype=jnp.float32).reshape(1, 17, 4)
    a = vit.drop_tokens(x, jax.random.PRNGKey(0), 0.5)
    b = vit.drop_tokens(x, jax.random.PRNGKey(1), 0.5)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_dropped_tokens_get_zero_grad():
    params = _params()
    cfg = TINY.replace(token_keep=0.5)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    labels = jnp.asarray([1, 2])
    rng = jax.random.PRNGKey(7)

    def loss_fn(p):
        logits = vit.apply(p, images, cfg, train=True, rng=rng)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    g = jax.grad(loss_fn)(params)["pos_embedding"][0]  # [n+1, d]
    row_norm = np.asarray(jnp.linalg.norm(g.astype(jnp.float32), axis=-1))
    # cls row always trained; with B=2 and keep 8/16, between 8 and 16 patch
    # rows saw a gradient; the rest are exactly zero (gather backward)
    assert row_norm[0] > 0
    nonzero = int((row_norm[1:] > 0).sum())
    assert 8 <= nonzero <= 16
    assert np.all(row_norm[1:][row_norm[1:] <= 0] == 0.0)


def test_eval_is_full_sequence():
    params = _params()
    cfg = TINY.replace(token_keep=0.25)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    base = vit.apply(params, images, TINY, train=False)
    dropped_cfg_eval = vit.apply(params, images, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(base),
                                  np.asarray(dropped_cfg_eval))


def test_train_step_runs_and_learns():
    from vitax.train import (create_train_state, make_train_step, onecycle_lr,
                             onecycle_momentum, sgd_momentum)
    cfg = TINY.replace(token_keep=0.5)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    tx = sgd_momentum(onecycle_lr(0.05, 100, 0.1),
                      momentum_schedule=onecycle_momentum(100, 0.1))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, donate=False)
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 10)
    losses = []
    for _ in range(20):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # memorizing 8 images with half the tokens still learns
    assert losses[-1] < losses[0]


def test_requires_rng():
    params = _params()
    cfg = TINY.replace(token_keep=0.5)
    images = jnp.zeros((1, 32, 32, 3))
    try:
        vit.apply(params, images, cfg, train=True, rng=None)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_data_parallel_matches_single_device():
    """Token dropping under the 8-device DP mesh == single device: the
    per-image drop indices derive from the replicated step rng, so the
    sharded gather must not change the math."""
    from vitax.parallel import mesh as pmesh
    from vitax.train import (create_train_state, make_train_step, onecycle_lr,
                             onecycle_momentum, sgd_momentum)
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must fake 8 devices"
    cfg = TINY.replace(token_keep=0.5)
    key = jax.random.PRNGKey(5)
    images = jax.random.normal(key, (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (16,), 0, 10)

    def setup():
        params = vit.init_params(jax.random.PRNGKey(0), cfg)
        tx = sgd_momentum(onecycle_lr(0.01, 100, 0.1),
                          momentum_schedule=onecycle_momentum(100, 0.1))
        return create_train_state(params, tx, jax.random.PRNGKey(1)), tx

    state1, tx1 = setup()
    step1 = make_train_step(cfg, tx1, donate=False)
    for _ in range(2):
        state1, _ = step1(state1, images, labels)

    m = pmesh.make_mesh(n_data=8, n_model=1, devices=devices[:8])
    state8, tx8 = setup()
    with m:
        pshard = pmesh.vit_param_shardings(state8.params, m)
        state8 = state8._replace(
            params=jax.device_put(state8.params, pshard),
            opt_state=jax.device_put(
                state8.opt_state,
                pmesh.opt_state_shardings(state8.opt_state, state8.params,
                                          pshard, m)))
        step8 = make_train_step(cfg, tx8, donate=False)
        imgs = jax.device_put(images, pmesh.batch_sharding(m))
        lbls = jax.device_put(labels, pmesh.batch_sharding(m))
        for _ in range(2):
            state8, _ = step8(state8, imgs, lbls)

    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_cli_plumbs_token_keep(tmp_path):
    from vitax import cli
    from vitax.train_cli import model_config_from_cli
    config = cli.get_train_config(
        ["--dataset", "Synthetic", "--exp-root", str(tmp_path),
         "--token-keep", "0.5"])
    assert model_config_from_cli(config).token_keep == 0.5
    config = cli.get_train_config(
        ["--dataset", "Synthetic", "--exp-root", str(tmp_path)])
    assert model_config_from_cli(config).token_keep == 1.0


# ---- res-vit (`ResViTConfig.token_keep`): teacher AND student run at the
# ---- reduced sequence; cls is kept so per-layer cls distill is unaffected.

import dataclasses

from vitax.core.config import ResViTConfig
from vitax.models import resvit

RV = ResViTConfig(dim=48, mlp_dim=96, n_layers=3, n_heads=4, n_kv_heads=4,
                  lora_rank=4, dynamic_start_layer=1, dynamic_router_hdim=32,
                  dynamic_reserve_initials=1, low_rank_dim=8, block_size=1,
                  use_lora=True, use_reslr=True, image_size=(32, 32),
                  patch_size=(8, 8), num_classes=7, dropout=0.0,
                  dtype=jnp.float32, param_dtype=jnp.float32,
                  use_pallas=False)


def _rv_params():
    return resvit.init_params(jax.random.PRNGKey(0), RV)


def test_resvit_keep_one_is_bitwise_noop():
    params = _rv_params()
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    base, _ = resvit.apply(params, images, RV, train=True,
                           rng=jax.random.PRNGKey(2))
    kept, _ = resvit.apply(params, images,
                           dataclasses.replace(RV, token_keep=1.0),
                           train=True, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(kept))


def test_resvit_drop_reduces_sequence_for_both_paths():
    params = _rv_params()
    cfg = dataclasses.replace(RV, token_keep=0.5)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits, aux = resvit.apply(params, images, cfg, train=True,
                               rng=jax.random.PRNGKey(2))
    n_patches = RV.num_patches           # 16
    k = round(0.5 * n_patches)
    assert logits.shape == (2, 7)
    # acts are emitted per kept token — the routed (student) path saw the
    # reduced sequence; the distill loss came from the reduced teacher too
    assert aux["acts"].shape[1] == 1 + k
    assert np.isfinite(float(aux["d_loss"]))


def test_resvit_eval_is_full_sequence():
    params = _rv_params()
    cfg = dataclasses.replace(RV, token_keep=0.25)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    base, _ = resvit.apply(params, images, RV, train=False)
    dropped, _ = resvit.apply(params, images, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(dropped))


def test_resvit_scan_form_matches_loop_with_drop():
    params = _rv_params()
    cfg = dataclasses.replace(RV, token_keep=0.5)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rng = jax.random.PRNGKey(2)
    loop_logits, loop_aux = resvit.apply(params, images, cfg, train=True,
                                         rng=rng)
    scan_logits, scan_aux = resvit.apply(params, images, cfg, train=True,
                                         rng=rng, scan_layers=True)
    np.testing.assert_allclose(np.asarray(loop_logits),
                               np.asarray(scan_logits), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(loop_aux["d_loss"]),
                               float(scan_aux["d_loss"]), rtol=1e-6)


def test_resvit_train_step_runs_and_learns_with_drop():
    from vitax.train.resvit_steps import (Lambdas, create_state,
                                          make_adamw_for, make_train_step)
    cfg = dataclasses.replace(RV, token_keep=0.5)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_adamw_for(cfg, params, lambda _: 1e-3)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, Lambdas(1.0, 10.0, 1.0), donate=False)
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 7)
    losses = []
    for _ in range(15):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_resvit_drop_stacks_with_compaction():
    # capacity applies to the KEPT tokens: cap = ceil(C * (1+k)); the step
    # must compile and produce finite losses with both levers active
    from vitax.train.resvit_steps import (Lambdas, create_state,
                                          make_adamw_for, make_train_step)
    cfg = dataclasses.replace(RV, token_keep=0.5, compact_capacity=0.75)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_adamw_for(cfg, params, lambda _: 1e-3)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, Lambdas(1.0, 10.0, 1.0), donate=False)
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (4, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (4,), 0, 7)
    for _ in range(3):
        state, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_resvit_cli_plumbs_token_keep(tmp_path):
    from vitax.resvit_train_cli import config_to_model_args, get_train_config
    cfg = get_train_config(["--dataset", "Synthetic",
                            "--exp-root", str(tmp_path),
                            "--token-keep", "0.5"])
    assert config_to_model_args(cfg).token_keep == 0.5
    cfg = get_train_config(["--dataset", "Synthetic",
                            "--exp-root", str(tmp_path)])
    assert config_to_model_args(cfg).token_keep == 1.0


# ---- round-4 hardening (ADVICE r3): range validation + reserve pinning


def test_token_keep_out_of_range_raises():
    import pytest
    from vitax.core.config import ResViTConfig
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="token_keep"):
            TINY.replace(token_keep=bad)
        with pytest.raises(ValueError, match="token_keep"):
            dataclasses.replace(RV, token_keep=bad)
    # boundary 1.0 stays valid (= off)
    TINY.replace(token_keep=1.0)
    dataclasses.replace(RV, token_keep=1.0)


def test_drop_tokens_pins_reserved_initials():
    # n_pinned > 1: the first n_pinned sequence positions are always kept
    # (res-vit passes dynamic_reserve_initials so the router's forced slots
    # land on fixed physical tokens every step)
    b, s, d = 2, 17, 4
    x = jnp.arange(b * s * d, dtype=jnp.float32).reshape(b, s, d)
    for pin in (1, 2, 3):
        out = vit.drop_tokens(x, jax.random.PRNGKey(0), 0.5, n_pinned=pin)
        k = round(0.5 * (s - pin))
        assert out.shape == (b, pin + k, d)
        np.testing.assert_array_equal(np.asarray(out[:, :pin]),
                                      np.asarray(x[:, :pin]))
        # sampled rows come from past the pinned prefix, in order
        for i in range(b):
            orig = np.asarray(x[i]).tolist()
            pos = [orig.index(r) for r in np.asarray(out[i, pin:]).tolist()]
            assert all(p >= pin for p in pos)
            assert pos == sorted(pos)


def test_resvit_drop_keeps_reserved_tokens_fixed():
    # with dynamic_reserve_initials=2 the reserved slot beyond cls must be
    # the SAME physical token every step (position 1), not a random patch
    cfg = dataclasses.replace(RV, token_keep=0.5, dynamic_reserve_initials=2)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    x = resvit.embed(params, images, cfg)
    kept = vit.drop_tokens(x, jax.random.PRNGKey(2), 0.5,
                           n_pinned=cfg.dynamic_reserve_initials)
    np.testing.assert_array_equal(np.asarray(kept[:, :2]), np.asarray(x[:, :2]))


def test_cli_token_keep_schedule(tmp_path):
    # schedule switches to the dense step at the epoch boundary and the run
    # completes end-to-end (4 epochs x small synthetic set, switch at 0.5)
    from vitax import train_cli
    best = train_cli.main([
        "--dataset", "Synthetic", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "8",
        "--synthetic-samples", "32", "--train-steps", "16",
        "--token-keep", "0.5", "--token-keep-schedule", "0.5",
        "--no-pallas", "--exp-root", str(tmp_path)])
    assert 0.0 <= best <= 1.0


def test_cli_token_keep_schedule_validates(tmp_path):
    import pytest
    from vitax import train_cli
    with pytest.raises(ValueError, match="token-keep-schedule"):
        train_cli.main([
            "--dataset", "Synthetic", "--model-arch", "tiny",
            "--image-size", "32", "--batch-size", "8",
            "--synthetic-samples", "32", "--train-steps", "16",
            "--token-keep", "0.5", "--token-keep-schedule", "1.5",
            "--no-pallas", "--exp-root", str(tmp_path)])


def test_cli_schedule_rejects_missing_token_keep(tmp_path):
    import pytest
    from vitax import train_cli
    with pytest.raises(ValueError, match="requires --token-keep"):
        train_cli.main([
            "--dataset", "Synthetic", "--model-arch", "tiny",
            "--image-size", "32", "--batch-size", "8",
            "--synthetic-samples", "32", "--train-steps", "16",
            "--token-keep-schedule", "0.9",
            "--no-pallas", "--exp-root", str(tmp_path)])


def test_cli_schedule_rejects_single_epoch(tmp_path):
    import pytest
    from vitax import train_cli
    with pytest.raises(ValueError, match="epochs"):
        train_cli.main([
            "--dataset", "Synthetic", "--model-arch", "tiny",
            "--image-size", "32", "--batch-size", "8",
            "--synthetic-samples", "32", "--train-steps", "4",
            "--token-keep", "0.5", "--token-keep-schedule", "0.9",
            "--no-pallas", "--exp-root", str(tmp_path)])


def test_cli_schedule_dense_batch_size(tmp_path):
    # per-phase batches (the FLIP recipe): dropped phase at --batch-size,
    # dense tail at --dense-batch-size — run completes end-to-end
    from vitax import train_cli
    best = train_cli.main([
        "--dataset", "Synthetic", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "16",
        "--synthetic-samples", "64", "--train-steps", "16",
        "--token-keep", "0.5", "--token-keep-schedule", "0.5",
        "--dense-batch-size", "8",
        "--no-pallas", "--exp-root", str(tmp_path)])
    assert 0.0 <= best <= 1.0


def test_cli_dense_batch_keeps_step_budget(tmp_path, capsys):
    # ADVICE r4: with heterogeneous batches the dense tail's loader has more
    # steps per epoch; the epoch plan must solve for the TOTAL optimizer
    # step budget instead of reference epochs = steps // len(drop_loader)
    # (which would run ~1.5x train_steps here). 64 samples, drop b16
    # (4 steps/epoch), dense b8 (8 steps/epoch), sched 0.5, budget 16:
    # per-epoch avg 6 -> 3 epochs, switch at 2 -> 2*4 + 1*8 = 16 steps.
    from vitax import train_cli
    train_cli.main([
        "--dataset", "Synthetic", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "16",
        "--synthetic-samples", "64", "--train-steps", "16",
        "--token-keep", "0.5", "--token-keep-schedule", "0.5",
        "--dense-batch-size", "8",
        "--no-pallas", "--exp-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert "schedule total 16" in out
    assert "training 3 epochs (2 x 4 steps + 1 x 8 dense-tail steps" in out


def test_resvit_cli_token_keep_schedule(tmp_path):
    from vitax import resvit_train_cli
    resvit_train_cli.main([
        "--dataset", "Synthetic", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "8",
        "--synthetic-samples", "32", "--train-steps", "16",
        "--token-keep", "0.5", "--token-keep-schedule", "0.5",
        "--no-pallas", "--exp-root", str(tmp_path)])


def test_resvit_cli_schedule_validates(tmp_path):
    import pytest
    from vitax import resvit_train_cli
    with pytest.raises(ValueError, match="requires --token-keep"):
        resvit_train_cli.main([
            "--dataset", "Synthetic", "--model-arch", "tiny",
            "--image-size", "32", "--batch-size", "8",
            "--synthetic-samples", "32", "--train-steps", "16",
            "--token-keep-schedule", "0.5",
            "--no-pallas", "--exp-root", str(tmp_path)])
