"""Padded residual stream + cross-kernel int8 activation handoff (round 5).

The padded stream keeps the encoder's [B, spq, D] zero-padded residual
stream across the whole layer loop (no per-layer pad/slice); the handoff
additionally has each fused kernel's epilogue emit the next kernel's
pre-quantized int8 input (skipping the consumer's LN + input pack). Both
must be bit-exact vs the unchanged paths in values AND gradients — the
handoff is straight-through forward data, and its backward reuses the
existing backward kernels on the saved bf16 stream.

All tests run the kernels in interpret mode on CPU (like the other fused
kernel suites)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.core.config import ViTConfig
from vitax.models import vit
from vitax.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


BASE = dict(image_size=(32, 32), patch_size=(8, 8), emb_dim=128,
            mlp_dim=256, num_heads=2, num_layers=3, num_classes=10,
            dropout_rate=0.0, dtype=jnp.float32, use_pallas=False,
            fused_qkv=True, fused_mlp=True)
INT8 = dict(int8_mlp=True, int8_attn=True, int8_mlp_grad=True,
            int8_attn_grad=True, int8_dw=True)


def _grads(cfg, params, x):
    def loss(p):
        return jnp.sum(vit.apply(p, x, cfg).astype(jnp.float32) ** 2)
    return jax.grad(loss)(params)


def _max_tree_diff(a, b):
    return max(float(jnp.max(jnp.abs(u.astype(jnp.float32)
                                     - v.astype(jnp.float32))))
               for u, v in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_padded_stream_is_bitexact(monkeypatch):
    # fp32 fused path: padded stream on vs off — FORWARD agrees exactly
    # (row-wise math is identical; pad K/V probs are exactly zero).
    # Gradients agree to fp32 ulps: the dW kernels accumulate over
    # different row-block groupings (68 vs 96 rows here), so the fp32
    # summation ORDER differs — same values, few-ulp reassociation.
    cfg = ViTConfig(**BASE)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    monkeypatch.setenv("VITAX_PADDED_STREAM", "0")
    base = vit.apply(params, x, cfg)
    gb = _grads(cfg, params, x)
    monkeypatch.setenv("VITAX_PADDED_STREAM", "1")
    padded = vit.apply(params, x, cfg)
    gp = _grads(cfg, params, x)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(padded))
    for u, v in zip(jax.tree.leaves(gb), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-5)


def test_handoff_is_bitexact_vs_int8_path(monkeypatch):
    cfg = ViTConfig(**BASE, **INT8)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    monkeypatch.setenv("VITAX_INT8_HANDOFF", "0")
    base = vit.apply(params, x, cfg)
    gb = _grads(cfg, params, x)
    monkeypatch.setenv("VITAX_INT8_HANDOFF", "1")
    ho = vit.apply(params, x, cfg)
    gh = _grads(cfg, params, x)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ho))
    assert _max_tree_diff(gb, gh) == 0.0


def test_handoff_auto_gate_engages_on_short_seq(monkeypatch):
    # 32px/8patch -> s=17, spq=24 <= 128: auto gate must engage (this is
    # what makes the equality tests above actually cover the handoff path)
    cfg = ViTConfig(**BASE, **INT8)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    monkeypatch.delenv("VITAX_INT8_HANDOFF", raising=False)
    calls = []
    orig = pk.fused_block_int8_handoff

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pk, "fused_block_int8_handoff", spy)
    vit.apply(params, x, cfg)
    # the scan traces the block body once; >=1 proves the handoff engaged
    assert len(calls) >= 1


def test_handoff_with_token_drop(monkeypatch):
    # the drop phase is where the handoff defaults ON — reduced sequence,
    # train-mode, rng-threaded; values must match the non-handoff path
    cfg = ViTConfig(**BASE, **INT8, token_keep=0.5)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    rng = jax.random.PRNGKey(7)
    monkeypatch.setenv("VITAX_INT8_HANDOFF", "0")
    base = vit.apply(params, x, cfg, train=True, rng=rng)
    monkeypatch.setenv("VITAX_INT8_HANDOFF", "1")
    ho = vit.apply(params, x, cfg, train=True, rng=rng)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ho))


def test_pack_stream_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 128), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    q, s = pk.pack_stream(x, g, b, 1e-5)
    x2 = x.reshape(-1, 128)
    mu = jnp.mean(x2, axis=-1, keepdims=True)
    xc = x2 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + 1e-5)) * g + b
    qr, sr = pk._quant_rows(xn)
    np.testing.assert_array_equal(np.asarray(q.reshape(-1, 128)),
                                  np.asarray(qr))
    np.testing.assert_allclose(np.asarray(s.reshape(-1, s.shape[-1])[:, :1]),
                               np.asarray(sr))


def test_handoff_respects_disable(monkeypatch):
    cfg = ViTConfig(**BASE, **INT8)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    monkeypatch.setenv("VITAX_INT8_HANDOFF", "0")
    calls = []
    orig = pk.fused_block_int8_handoff
    monkeypatch.setattr(pk, "fused_block_int8_handoff",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    vit.apply(params, x, cfg)
    assert not calls
