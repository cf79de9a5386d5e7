"""KV-blocked (online-softmax) fused attention half (VERDICT r4 #6).

`fused_ln_qkvo_attention_flash` serves the big-d geometries the whole-seq
kernel's VMEM probs gate off (h14: d=1280, s=736 @384). Math identical —
LN + qkv + core + out-proj with grad accumulation — but the core runs the
flash recurrence (running row max/normalizer, per-KV-chunk probs) and the
backward recomputes m/l chunked. These tests pin equality against the
whole-seq kernel and the model-level fallback wiring. Interpret mode."""

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


def _setup(b=2, s=21, d=128, h=4):
    hd = d // h
    spq = (s + 7) // 8 * 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, spq, d), jnp.float32).at[:, s:].set(0.0)
    g = jax.random.normal(jax.random.fold_in(key, 1), (d,)) * 0.1 + 1.0
    be = jax.random.normal(jax.random.fold_in(key, 2), (d,)) * 0.1
    wqkv = jax.random.normal(jax.random.fold_in(key, 3),
                             (d, 3 * h * hd)) * d ** -0.5
    bqkv = jax.random.normal(jax.random.fold_in(key, 4),
                             (3 * h * hd,)) * 0.1
    wo = jax.random.normal(jax.random.fold_in(key, 5),
                           (h * hd, d)) * (h * hd) ** -0.5
    bo = jnp.zeros((d,))
    return (x, g, be, wqkv, bqkv, wo, bo), (s, h, hd)


def test_flash_matches_whole_seq_kernel():
    args, (s, h, hd) = _setup()
    sq = pk.fused_ln_qkvo_attention(*args, 1e-5, s, h, hd)
    fl = pk.fused_ln_qkvo_attention_flash(*args, 1e-5, s, h, hd)
    np.testing.assert_allclose(np.asarray(fl[:, :s]), np.asarray(sq[:, :s]),
                               rtol=1e-5, atol=1e-5)


def test_flash_grads_match_whole_seq_kernel():
    args, (s, h, hd) = _setup()

    def loss(fn):
        def f(a):
            out = fn(*a, 1e-5, s, h, hd)
            return jnp.sum(out[:, :s] ** 2)
        return f

    gs = jax.grad(loss(pk.fused_ln_qkvo_attention))(args)
    gf = jax.grad(loss(pk.fused_ln_qkvo_attention_flash))(args)
    for a, b in zip(gs, gf):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=0, atol=1e-5)


def test_flash_chunk_counts_agree(monkeypatch):
    # different KV chunkings are the same math
    args, (s, h, hd) = _setup(s=24)   # spq=24: chunks 1, 2, 3 all divide
    outs = []
    for n in (1, 2, 3):
        monkeypatch.setattr(pk, "_QKVO_FLASH_KV", n)
        outs.append(np.asarray(
            pk.fused_ln_qkvo_attention_flash(*args, 1e-5, s, h, hd)))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[2], outs[0], rtol=1e-5, atol=1e-6)


def test_flash_supported_covers_h14_geometry():
    # the exact geometry the whole-seq gate rejects (h14 @384)
    x = jax.ShapeDtypeStruct((2, 736, 1280), jnp.bfloat16)
    w = jax.ShapeDtypeStruct((1280, 3 * 1280), jnp.bfloat16)
    assert not pk.qkv_attention_supported(x, w)
    assert pk.qkv_attention_flash_supported(x, w)


def test_model_falls_through_to_flash(monkeypatch):
    # force the whole-seq gate shut; the block must route to flash and
    # match the unfused XLA attention path
    cfg_f = ViTConfig(image_size=(32, 32), patch_size=(8, 8), emb_dim=128,
                      mlp_dim=256, num_heads=4, num_layers=2, num_classes=7,
                      dropout_rate=0.0, dtype=jnp.float32, use_pallas=False,
                      fused_qkv=True)
    cfg_u = cfg_f.replace(fused_qkv=False)
    params = vit.init_params(jax.random.PRNGKey(0), cfg_f)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    monkeypatch.setattr(pk, "qkv_attention_supported",
                        lambda *a, **k: False)
    calls = []
    orig = pk.fused_ln_qkvo_attention_flash
    monkeypatch.setattr(pk, "fused_ln_qkvo_attention_flash",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    lf = vit.apply(params, x, cfg_f)
    assert calls, "flash fallback did not engage"
    lu = vit.apply(params, x, cfg_u)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                               rtol=1e-4, atol=1e-4)
