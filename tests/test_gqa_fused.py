"""GQA (n_kv_heads < n_heads) through the fused attention kernel.

VERDICT r4 Missing #1: the reference's `repeat_kv` scaffolding
(res-vit/model_utils.py:3-12, used at res-vit/model.py:220-223,281-282)
was only covered by the unfused/XLA path. The fused LN+qkvo kernel now
takes the packed [q (h·hd) | k (hkv·hd) | v (hkv·hd)] layout directly —
no repeat_kv materialization; the backward accumulates each kv group's
dk/dv over its query heads in fp32 (the transpose of repeat_kv).

Interpret mode on CPU, like the other fused-kernel suites."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.core.config import ResViTConfig
from vitax.models import resvit
from vitax.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


# dim 128: the fused gate requires d % 128 == 0 — smaller dims silently
# fall back to the unfused path and the tests would compare it to itself
BASE = dict(dim=128, mlp_dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
            lora_rank=4, dynamic_start_layer=0, dynamic_router_hdim=32,
            dynamic_reserve_initials=1, low_rank_dim=8, block_size=1,
            use_lora=True, use_reslr=True, image_size=(32, 32),
            patch_size=(8, 8), num_classes=7, dropout=0.0,
            dtype=jnp.float32, param_dtype=jnp.float32, use_pallas=False)


def _x():
    return jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))


def test_gqa_fused_matches_unfused(monkeypatch):
    cfg_u = ResViTConfig(**BASE)
    cfg_f = ResViTConfig(**BASE, fused_qkv=True, fused_qkvo=True)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg_u)
    x = _x()
    calls = []
    orig = pk.fused_ln_qkvo_attention
    monkeypatch.setattr(pk, "fused_ln_qkvo_attention",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    lf, _ = resvit.apply(params, x, cfg_f, train=False)
    assert len(calls) == cfg_f.n_layers      # the GQA fused path ENGAGED
    monkeypatch.setattr(pk, "fused_ln_qkvo_attention", orig)
    lu, _ = resvit.apply(params, x, cfg_u, train=False)
    # fp32 reassociation band (kernel op order vs XLA einsum; measured 3e-7)
    np.testing.assert_allclose(np.asarray(lu), np.asarray(lf),
                               rtol=1e-5, atol=1e-5)

    def loss(p, cfg):
        l, _ = resvit.apply(p, x, cfg, train=False)
        return jnp.sum(l ** 2)

    gu = jax.grad(lambda p: loss(p, cfg_u))(params)
    gf = jax.grad(lambda p: loss(p, cfg_f))(params)
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gqa_fused_train_step_matches():
    # routed training forward (teacher+student, 3-loss aux) with GQA:
    # fused == unfused on losses and gradients
    cfg_u = ResViTConfig(**BASE)
    cfg_f = ResViTConfig(**BASE, fused_qkv=True, fused_qkvo=True)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg_u)
    x = _x()
    rng = jax.random.PRNGKey(3)

    def loss(p, cfg):
        logits, aux = resvit.apply(p, x, cfg, train=True, rng=rng)
        return (jnp.sum(logits ** 2) + aux["d_loss"]
                + jnp.sum(aux["soft_probs"] ** 2))

    lu, gu = jax.value_and_grad(lambda p: loss(p, cfg_u))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(p, cfg_f))(params)
    np.testing.assert_allclose(float(lu), float(lf), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_gqa_int8_tier_runs_and_tracks_fp32():
    cfg32 = ResViTConfig(**BASE, fused_qkv=True, fused_qkvo=True)
    cfg8 = dataclasses.replace(cfg32, int8_attn=True, int8_attn_grad=True)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg32)
    x = _x()
    l32, _ = resvit.apply(params, x, cfg32, train=False)
    l8, _ = resvit.apply(params, x, cfg8, train=False)
    # int8 band: same output up to the W8A8 quantization error
    assert np.isfinite(np.asarray(l8)).all()
    err = float(jnp.max(jnp.abs(l32 - l8)))
    scale = float(jnp.max(jnp.abs(l32))) + 1e-6
    assert err / scale < 0.15, (err, scale)

    g = jax.grad(lambda p: jnp.sum(
        resvit.apply(p, x, cfg8, train=False)[0] ** 2))(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_gqa_supported_gate():
    x = jax.ShapeDtypeStruct((2, 24, 128), jnp.float32)
    w_gqa = jax.ShapeDtypeStruct((128, (4 + 2 * 2) * 32), jnp.float32)
    assert pk.qkv_attention_supported(x, w_gqa, heads=4, kv_heads=2)
    # packed width not divisible by (h + 2*hkv) rejected
    w_bad = jax.ShapeDtypeStruct((128, (4 + 2 * 2) * 32 + 4), jnp.float32)
    assert not pk.qkv_attention_supported(x, w_bad, heads=4, kv_heads=2)
