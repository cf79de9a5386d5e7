"""Token-compaction inference: exact match to the dense path when capacity
covers all active tokens; graceful capacity-drop otherwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.core.config import ResViTConfig
from vitax.models import resvit, resvit_compact


def cfg_(**kw):
    base = dict(dim=48, mlp_dim=96, n_layers=4, n_heads=4, n_kv_heads=4,
                lora_rank=4, dynamic_start_layer=1, dynamic_router_hdim=32,
                dynamic_reserve_initials=1, low_rank_dim=8, block_size=1,
                use_lora=False, use_reslr=True, image_size=(32, 32),
                patch_size=(8, 8), num_classes=7, dropout=0.0,
                dtype=jnp.float32, param_dtype=jnp.float32, use_pallas=False)
    base.update(kw)
    return ResViTConfig(**base)


def _randomized_router(params, cfg, key):
    """Randomize router final bias so routing is non-trivial."""
    for lid, role in enumerate(resvit.layer_roles(cfg)):
        if role.get("is_block_head"):
            k = jax.random.fold_in(key, lid)
            params["layers"][lid]["router"]["out3"]["bias"] = \
                jax.random.uniform(k, (cfg.block_size * 2,), jnp.float32,
                                   -0.3, 0.3)
    return params


def test_full_capacity_matches_dense():
    cfg = cfg_()
    params = _randomized_router(
        resvit.init_params(jax.random.PRNGKey(0), cfg), cfg,
        jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    dense_logits, dense_aux = resvit.apply(params, x, cfg, train=False)
    comp_logits, comp_aux = resvit_compact.apply_compact(params, x, cfg,
                                                         capacity=1.0)
    np.testing.assert_allclose(np.asarray(comp_logits),
                               np.asarray(dense_logits), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp_aux["acts"]),
                               np.asarray(dense_aux["acts"]), atol=0)


def test_capacity_covers_active_matches_dense():
    """With capacity ≥ max active fraction, compaction is exact."""
    cfg = cfg_()
    params = _randomized_router(
        resvit.init_params(jax.random.PRNGKey(2), cfg), cfg,
        jax.random.PRNGKey(10))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    _, dense_aux = resvit.apply(params, x, cfg, train=False)
    max_active = float(np.asarray(dense_aux["acts"]).mean(axis=(1,)).max())
    capacity = min(1.0, max_active + 0.3)
    dense_logits, _ = resvit.apply(params, x, cfg, train=False)
    comp_logits, _ = resvit_compact.apply_compact(params, x, cfg,
                                                  capacity=capacity)
    np.testing.assert_allclose(np.asarray(comp_logits),
                               np.asarray(dense_logits), rtol=1e-4, atol=1e-5)


def test_low_capacity_still_finite_and_jits():
    cfg = cfg_()
    params = resvit.init_params(jax.random.PRNGKey(4), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    f = jax.jit(lambda p, x: resvit_compact.apply_compact(p, x, cfg,
                                                          capacity=0.4))
    logits, aux = f(params, x)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()
    assert aux["capacity"] <= 0.45


def test_rejects_without_reslr():
    cfg = cfg_(use_reslr=False)
    params = resvit.init_params(jax.random.PRNGKey(6), cfg)
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError):
        resvit_compact.apply_compact(params, x, cfg)


# ---------------------------------------------------------------------------
# Train-time MLP-half compaction (resvit.compact_routed_block / cfg.compact_capacity)
# ---------------------------------------------------------------------------

def _train_loss(params, x, cfg, rng):
    logits, aux = resvit.apply(params, x, cfg, train=True, rng=rng)
    return (jnp.sum(logits ** 2) * 1e-2 + aux["d_loss"]
            + aux["r_entropy"]), logits


def test_train_compact_full_capacity_exact():
    """cap = N: gather is a permutation; logits AND grads match the dense
    masked path bitwise (per-row math on gathered rows)."""
    import dataclasses
    cfg = cfg_(use_lora=True, block_size=2, n_layers=5,
               dynamic_start_layer=1)
    ccfg = dataclasses.replace(cfg, compact_capacity=1.0)
    params = _randomized_router(
        resvit.init_params(jax.random.PRNGKey(0), cfg), cfg,
        jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rng = jax.random.PRNGKey(7)
    (l0, lg0), g0 = jax.value_and_grad(_train_loss, has_aux=True)(
        params, x, cfg, rng)
    (l1, lg1), g1 = jax.value_and_grad(_train_loss, has_aux=True)(
        params, x, ccfg, rng)
    np.testing.assert_array_equal(np.asarray(lg0), np.asarray(lg1))
    # weight grads sum rows in gathered (permuted) order — bitwise equality
    # holds for the forward, grads only up to reduction reassociation
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_train_compact_eval_full_capacity_exact():
    import dataclasses
    cfg = cfg_()
    ccfg = dataclasses.replace(cfg, compact_capacity=1.0)
    params = _randomized_router(
        resvit.init_params(jax.random.PRNGKey(0), cfg), cfg,
        jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    e0, _ = resvit.apply(params, x, cfg, train=False)
    e1, _ = resvit.apply(params, x, ccfg, train=False)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_compact_block_overflow_drops_to_identity():
    """Active tokens beyond capacity fall back to identity; active tokens in
    capacity get the full block; inactive tokens keep x."""
    cfg = cfg_()
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    lp = params["layers"][1]  # a routed layer's params
    b, n, d = 2, 16, cfg.dim
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, d), cfg.dtype)
    # sample 0: tokens 0..5 active; sample 1: tokens 3..10 active
    active = jnp.zeros((b, n), bool).at[0, :6].set(True).at[1, 3:11].set(True)
    cap = 4
    out = resvit.compact_routed_block(x, lp, cfg, active, cap)
    dense = resvit.plain_block(x, lp, cfg)
    exp = np.asarray(x).copy()
    exp[0, :4] = np.asarray(dense)[0, :4]       # first 4 actives fit
    exp[1, 3:7] = np.asarray(dense)[1, 3:7]
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5, atol=1e-5)


def test_compact_rejects_stacked_and_forces_loop():
    import dataclasses
    cfg = cfg_(block_size=1, dynamic_start_layer=1)
    ccfg = dataclasses.replace(cfg, compact_capacity=0.5)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    # scan_layers=True is silently overridden to the loop form
    a_loop, _ = resvit.apply(params, x, ccfg, train=False)
    a_scan, _ = resvit.apply(params, x, ccfg, train=False, scan_layers=True)
    np.testing.assert_array_equal(np.asarray(a_loop), np.asarray(a_scan))
    stacked = resvit.stack_params(params, cfg)
    with pytest.raises(ValueError, match="compact_capacity"):
        resvit.apply(stacked, x, ccfg, train=False)


def test_compact_capacity_cli_plumbing(tmp_path):
    from vitax.resvit_train_cli import config_to_model_args, get_train_config
    c = get_train_config(["--dataset", "Synthetic", "--exp-root",
                          str(tmp_path), "--compact-capacity", "0.625"])
    assert config_to_model_args(c).compact_capacity == 0.625
    c2 = get_train_config(["--dataset", "Synthetic", "--exp-root",
                           str(tmp_path)])
    assert config_to_model_args(c2).compact_capacity is None


def test_compact_rect_attention_matches_square(monkeypatch):
    """With the fused qkvo kernels active (interpret mode), the rect
    (compacted-Q) attention path must reproduce the square-kernel-then-
    gather compact path: same logits (tight) and same grads (up to fp
    reassociation — the LN backward is split across the Q/KV row sets)."""
    import dataclasses
    from vitax.ops import pallas_kernels as pk
    monkeypatch.setattr(pk, "_INTERPRET", True)
    cfg = cfg_(use_lora=True, n_layers=3, dynamic_start_layer=1,
               fused_qkv=True, fused_qkvo=True,
               compact_capacity=0.6, compact_attention=True)
    scfg = dataclasses.replace(cfg, compact_attention=False)
    params = _randomized_router(
        resvit.init_params(jax.random.PRNGKey(0), cfg), cfg,
        jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rng = jax.random.PRNGKey(7)
    (l0, lg0), g0 = jax.value_and_grad(_train_loss, has_aux=True)(
        params, x, scfg, rng)
    (l1, lg1), g1 = jax.value_and_grad(_train_loss, has_aux=True)(
        params, x, cfg, rng)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg0),
                               rtol=1e-5, atol=1e-6)
    for (ka, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                               jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=str(ka))


def test_compact_rect_attention_int8_close(monkeypatch):
    """Same comparison with the int8 tiers on: forward row-quantization is
    identical per row (tight), grads within an int8-noise band (the dq/dkv
    rows quantize separately in the rect backward)."""
    import dataclasses
    from vitax.ops import pallas_kernels as pk
    monkeypatch.setattr(pk, "_INTERPRET", True)
    cfg = cfg_(use_lora=True, n_layers=3, dynamic_start_layer=1,
               fused_qkv=True, fused_qkvo=True,
               int8_attn=True, int8_attn_grad=True, int8_dw=True,
               compact_capacity=0.6, compact_attention=True)
    scfg = dataclasses.replace(cfg, compact_attention=False)
    params = _randomized_router(
        resvit.init_params(jax.random.PRNGKey(0), cfg), cfg,
        jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rng = jax.random.PRNGKey(7)
    (l0, lg0), g0 = jax.value_and_grad(_train_loss, has_aux=True)(
        params, x, scfg, rng)
    (l1, lg1), g1 = jax.value_and_grad(_train_loss, has_aux=True)(
        params, x, cfg, rng)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg0),
                               rtol=1e-4, atol=1e-5)
    for (ka, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                               jax.tree_util.tree_leaves_with_path(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.max(np.abs(a))) + 1e-6
        err = float(np.max(np.abs(b - a)))
        assert err < 0.06 * scale + 1e-6, (str(ka), err, scale)


def test_eval_cli_compact_paths():
    """resvit_eval_cli --compact-capacity runs on both the fused-kernel
    compact path (when fused kernels are available) and the legacy
    apply_compact path (--legacy-compact); on CPU the fused gate is off so
    both resolve to legacy — this asserts the flag plumbing + metrics."""
    from vitax import resvit_eval_cli
    args = ["--dataset", "Synthetic", "--model-arch", "tiny",
            "--image-size", "32", "--batch-size", "8",
            "--synthetic-samples", "32", "--num-workers", "0",
            "--dtype", "float32", "--no-pallas",
            "--use_lora", "False", "--use_reslr", "True",
            "--dynamic_start_layer", "1", "--block_size", "1",
            "--dynamic_router_hdim", "32", "--low_rank_dim", "8",
            "--n_heads", "3", "--n_kv_heads", "3",
            "--compact-capacity", "0.75"]
    r1 = resvit_eval_cli.main(args)
    r2 = resvit_eval_cli.main(args + ["--legacy-compact"])
    assert "acc1" in r1 and "acc1" in r2
    np.testing.assert_allclose(r1["acc1"], r2["acc1"], atol=1e-6)


def test_compact_warmup_cli_smoke(tmp_path):
    """--compact-capacity with --compact-warmup trains dense for the
    warmup steps then switches to the compact step (smoke: runs, both
    jitted steps execute, metrics finite)."""
    from vitax import resvit_train_cli
    best = resvit_train_cli.main(
        ["--dataset", "Synthetic", "--model-arch", "tiny",
         "--image-size", "32", "--batch-size", "8",
         "--synthetic-samples", "32", "--train-steps", "8",
         "--print-freq", "4", "--lr", "0.001", "--warmup-steps", "2",
         "--num-workers", "0", "--dtype", "float32", "--no-pallas",
         "--use_lora", "False", "--use_reslr", "True",
         "--dynamic_start_layer", "1", "--block_size", "1",
         "--dynamic_router_hdim", "32", "--low_rank_dim", "8",
         "--n_heads", "3", "--n_kv_heads", "3",
         "--compact-capacity", "0.75", "--compact-warmup", "4",
         "--exp-name", "cw", "--exp-root", str(tmp_path)])
    assert 0.0 <= best <= 1.0


# ---------------------------------------------------------------------------
# Capacity-overflow demotion (cfg.compact_demote_overflow, default True)
# ---------------------------------------------------------------------------

def _forced_router(active_mask):
    """router_forward stand-in that returns a fixed routing decision
    (block_size-1 shapes), so overflow composition is controlled exactly."""
    def f(x, p, cfg, *, train, rng):
        b, n, _ = x.shape
        keep = jnp.broadcast_to(active_mask.astype(jnp.float32)[..., None],
                                (b, n, 1))
        hard = jnp.stack([1.0 - keep, keep], axis=-1)      # [B,N,1,2]
        path_ids = jnp.broadcast_to(active_mask.astype(jnp.int32), (b, n))
        return hard, path_ids, jnp.zeros((), jnp.float32), hard
    return f


def test_overflow_demotes_to_approximator_path(monkeypatch):
    """Demotion semantics, exactly: compaction with an ALL-ACTIVE router at
    capacity `cap` must equal the DENSE path under a router that activates
    exactly the first `cap` tokens — the overflow token executes the
    inactive branch (LRA for its cleared path bit), not identity."""
    import dataclasses
    cfg = cfg_()
    n = cfg.num_patches + 1                                 # 17 tokens
    cap_frac = 0.5
    cap = int(np.ceil(cap_frac * n))                        # 9
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    all_active = jnp.ones((1, n), bool)
    first_cap = (jnp.arange(n) < cap)[None, :]

    ccfg = dataclasses.replace(cfg, compact_capacity=cap_frac)
    monkeypatch.setattr(resvit, "router_forward", _forced_router(all_active))
    got, _ = resvit.apply(params, x, ccfg, train=False)
    got_t, _ = resvit.apply(params, x, ccfg, train=True,
                            rng=jax.random.PRNGKey(3))

    monkeypatch.setattr(resvit, "router_forward", _forced_router(first_cap))
    exp, _ = resvit.apply(params, x, cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=1e-5, atol=1e-6)
    # train-mode forward takes the same executed path
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(exp),
                               rtol=1e-5, atol=1e-6)


def test_overflow_demote_grads_match_dense_equivalent(monkeypatch):
    """Grads of the demoted compact program equal the dense program run at
    the demoted routing (the executed functions are identical)."""
    import dataclasses
    cfg = cfg_(use_lora=True)
    n = cfg.num_patches + 1
    cap = int(np.ceil(0.5 * n))
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rng = jax.random.PRNGKey(7)

    ccfg = dataclasses.replace(cfg, compact_capacity=0.5)
    monkeypatch.setattr(resvit, "router_forward",
                        _forced_router(jnp.ones((1, n), bool)))
    (l1, _), g1 = jax.value_and_grad(_train_loss, has_aux=True)(
        params, x, ccfg, rng)

    monkeypatch.setattr(resvit, "router_forward",
                        _forced_router((jnp.arange(n) < cap)[None, :]))
    (l0, _), g0 = jax.value_and_grad(_train_loss, has_aux=True)(
        params, x, cfg, rng)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for (ka, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                               jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-7, err_msg=str(ka))


def test_overflow_identity_mode_differs(monkeypatch):
    """compact_demote_overflow=False restores the identity fallback: the
    overflow tokens get neither the block nor the LRA, so the output
    deviates from the demoted run (sharpness check for the tests above)."""
    import dataclasses
    cfg = cfg_()
    n = cfg.num_patches + 1
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    monkeypatch.setattr(resvit, "router_forward",
                        _forced_router(jnp.ones((1, n), bool)))
    dem = dataclasses.replace(cfg, compact_capacity=0.5)
    idn = dataclasses.replace(cfg, compact_capacity=0.5,
                              compact_demote_overflow=False)
    a, _ = resvit.apply(params, x, dem, train=False)
    b, _ = resvit.apply(params, x, idn, train=False)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4


def test_compact_overflow_cli_plumbing(tmp_path):
    from vitax.resvit_train_cli import config_to_model_args, get_train_config
    base = ["--dataset", "Synthetic", "--exp-root", str(tmp_path),
            "--compact-capacity", "0.5"]
    assert config_to_model_args(
        get_train_config(base)).compact_demote_overflow is True
    assert config_to_model_args(
        get_train_config(base + ["--compact-overflow", "identity"])
    ).compact_demote_overflow is False


def test_capacity_anneal_cli_smoke(tmp_path):
    """Round-5 spike fix: --compact-capacity-start/--compact-capacity-anneal
    run a slack-capacity phase between the dense warmup and the target
    capacity (3 jitted steps share one state; smoke: all three execute)."""
    from vitax import resvit_train_cli
    best = resvit_train_cli.main(
        ["--dataset", "Synthetic", "--model-arch", "tiny",
         "--image-size", "32", "--batch-size", "8",
         "--synthetic-samples", "32", "--train-steps", "12",
         "--print-freq", "4", "--lr", "0.001", "--warmup-steps", "2",
         "--num-workers", "0", "--dtype", "float32", "--no-pallas",
         "--use_lora", "False", "--use_reslr", "True",
         "--dynamic_start_layer", "1", "--block_size", "1",
         "--dynamic_router_hdim", "32", "--low_rank_dim", "8",
         "--n_heads", "3", "--n_kv_heads", "3",
         "--compact-capacity", "0.5", "--compact-warmup", "4",
         "--compact-capacity-start", "0.75",
         "--compact-capacity-anneal", "4",
         "--exp-name", "ca", "--exp-root", str(tmp_path)])
    assert 0.0 <= best <= 1.0


def test_capacity_anneal_validates(tmp_path):
    import pytest as _pytest

    from vitax import resvit_train_cli
    with _pytest.raises(ValueError, match="compact-capacity-start"):
        resvit_train_cli.main(
            ["--dataset", "Synthetic", "--model-arch", "tiny",
             "--image-size", "32", "--batch-size", "8",
             "--synthetic-samples", "32", "--train-steps", "8",
             "--num-workers", "0", "--dtype", "float32", "--no-pallas",
             "--use_lora", "False", "--use_reslr", "True",
             "--dynamic_start_layer", "1", "--block_size", "1",
             "--dynamic_router_hdim", "32", "--low_rank_dim", "8",
             "--n_heads", "3", "--n_kv_heads", "3",
             "--compact-capacity", "0.75", "--compact-warmup", "2",
             "--compact-capacity-start", "0.5",
             "--compact-capacity-anneal", "2",
             "--exp-name", "cav", "--exp-root", str(tmp_path)])
