"""Pallas kernel unit tests vs the jnp reference implementations.

Run in interpreter mode on CPU (SURVEY §4: "unit tests per kernel vs jnp
reference impls"). Forward AND backward (custom VJP) must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.ops import pallas_kernels as pk
from vitax.ops.attention import mha_ref
from vitax.ops.layernorm import layer_norm_ref


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


def test_attention_forward_matches_ref():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    shape = (2, 197, 3, 64)  # b16 @224 sequence length
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    out = pk.flash_attention(q, k, v)
    ref = mha_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_forward_aligned_seq():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    shape = (1, 256, 2, 64)  # no padding path
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    np.testing.assert_allclose(np.asarray(pk.flash_attention(q, k, v)),
                               np.asarray(mha_ref(q, k, v)),
                               rtol=2e-5, atol=2e-5)


def test_attention_grads_match_ref():
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 3)
    shape = (2, 130, 2, 32)  # padded seq exercises masking in bwd
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.sin(pk.flash_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_ref(q, k, v)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_attention_bf16():
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 3)
    shape = (2, 197, 2, 64)
    q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)
    out = pk.flash_attention(q, k, v)
    ref = mha_ref(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_attention_supported_gate():
    x = jnp.zeros((1, 197, 3, 64))
    assert pk.attention_supported(x, x, x)
    big = jnp.zeros((1, 2048, 3, 64))
    assert not pk.attention_supported(big, big, big)


def test_layernorm_forward_matches_ref():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (4, 197, 128), jnp.float32) * 3 + 1
    g = jax.random.normal(jax.random.fold_in(key, 1), (128,))
    b = jax.random.normal(jax.random.fold_in(key, 2), (128,))
    out = pk.layer_norm(x, g, b, 1e-5)
    ref = layer_norm_ref(x, g, b, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_layernorm_grads_match_ref():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (600, 128), jnp.float32)  # 2 row-blocks
    g = jax.random.normal(jax.random.fold_in(key, 1), (128,))
    b = jax.random.normal(jax.random.fold_in(key, 2), (128,))

    def loss_pallas(x, g, b):
        return jnp.sum(jnp.cos(pk.layer_norm(x, g, b, 1e-5)))

    def loss_ref(x, g, b):
        return jnp.sum(jnp.cos(layer_norm_ref(x, g, b, 1e-5)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_layernorm_supported_gate():
    assert pk.layernorm_supported(jnp.zeros((4, 128)))
    assert not pk.layernorm_supported(jnp.zeros((4, 100)))


def _mlp_ref(x, g, b, w1, b1, w2, b2, eps=1e-5):
    """jnp composition matching models/vit._block's unfused MLP half."""
    h = layer_norm_ref(x, g, b, eps)
    h1 = jnp.einsum("...d,dm->...m", h, w1,
                    preferred_element_type=jnp.float32) + b1
    h1 = jax.nn.gelu(h1, approximate=False).astype(x.dtype)
    h2 = jnp.einsum("...m,md->...d", h1, w2,
                    preferred_element_type=jnp.float32) + b2
    return x + h2.astype(x.dtype)


def _mlp_args(key, b=2, s=197, d=128, m=256, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (b, s, d), dtype)
    g = jax.random.normal(ks[1], (d,)) * 0.1 + 1.0
    be = jax.random.normal(ks[2], (d,)) * 0.1
    w1 = (jax.random.normal(ks[3], (d, m)) * d ** -0.5).astype(dtype)
    b1 = jax.random.normal(ks[4], (m,)) * 0.1
    w2 = (jax.random.normal(ks[5], (m, d)) * m ** -0.5).astype(dtype)
    b2 = jax.random.normal(ks[6], (d,)) * 0.1
    return x, g, be, w1, b1, w2, b2


def test_ln_mlp_forward_matches_ref():
    args = _mlp_args(jax.random.PRNGKey(6))
    out = pk.fused_ln_mlp(*args, 1e-5)
    ref = _mlp_ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ln_mlp_forward_padded_rows():
    # b*s = 150 rows: not a multiple of the row block — exercises padding
    args = _mlp_args(jax.random.PRNGKey(7), b=1, s=150)
    out = pk.fused_ln_mlp(*args, 1e-5)
    ref = _mlp_ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ln_mlp_grads_match_ref():
    args = _mlp_args(jax.random.PRNGKey(8), b=2, s=100, d=128, m=384)

    def loss_pallas(*a):
        return jnp.sum(jnp.sin(pk.fused_ln_mlp(*a, 1e-5)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_mlp_ref(*a)))

    gp = jax.grad(loss_pallas, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for name, a, b_ in zip("x g be w1 b1 w2 b2".split(), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_ln_mlp_bf16():
    args = _mlp_args(jax.random.PRNGKey(9), dtype=jnp.bfloat16)
    out = pk.fused_ln_mlp(*args, 1e-5)
    ref = _mlp_ref(*args)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_ln_mlp_supported_gate():
    x = jnp.zeros((2, 197, 768))
    assert pk.ln_mlp_supported(x, jnp.zeros((768, 3072)),
                               jnp.zeros((3072, 768)))
    # non-128-multiple width rejected
    assert not pk.ln_mlp_supported(jnp.zeros((2, 197, 100)),
                                   jnp.zeros((100, 256)),
                                   jnp.zeros((256, 100)))
    # VMEM budget gate (accumulators would exceed ~96 MB)
    assert not pk.ln_mlp_supported(jnp.zeros((2, 197, 4096)),
                                   jnp.zeros((4096, 16384)),
                                   jnp.zeros((16384, 4096)))


def test_fused_mlp_model_path_matches_standard():
    """fused_mlp=True model output and gradients equal the standard path."""
    from vitax.core.config import ViTConfig
    from vitax.models import vit

    base = dict(image_size=(32, 32), patch_size=(16, 16), emb_dim=128,
                mlp_dim=256, num_heads=4, num_layers=2, num_classes=10,
                dropout_rate=0.0, dtype=jnp.float32, use_pallas=False)
    p = vit.init_params(jax.random.PRNGKey(0), ViTConfig(**base))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    std = vit.apply(p, x, ViTConfig(**base))
    fused = vit.apply(p, x, ViTConfig(**base, fused_mlp=True))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(std),
                               rtol=2e-4, atol=2e-4)
    g1 = jax.grad(lambda p: jnp.sum(vit.apply(p, x, ViTConfig(**base)) ** 2))(p)
    g2 = jax.grad(lambda p: jnp.sum(
        vit.apply(p, x, ViTConfig(**base, fused_mlp=True)) ** 2))(p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_ln_mlp_save_acts_matches_recompute():
    """save_acts=True (persisted h1/GELU', pure-matmul bwd) must produce the
    same forward and gradients as the recompute variant."""
    args = _mlp_args(jax.random.PRNGKey(10), b=2, s=100, d=128, m=384)
    out_a = pk.fused_ln_mlp(*args, 1e-5)
    out_b = pk.fused_ln_mlp(*args, 1e-5, save_acts=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               rtol=2e-6, atol=2e-6)

    def loss(save):
        def f(*a):
            return jnp.sum(jnp.sin(pk.fused_ln_mlp(*a, 1e-5,
                                                   save_acts=save)))
        return f

    ga = jax.grad(loss(False), argnums=tuple(range(7)))(*args)
    gb = jax.grad(loss(True), argnums=tuple(range(7)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(_mlp_ref(*a))),
                  argnums=tuple(range(7)))(*args)
    for name, a, b_, r in zip("x g be w1 b1 w2 b2".split(), ga, gb, gr):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(b_), np.asarray(r),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_ln_mlp_save_acts_no_residual():
    args = _mlp_args(jax.random.PRNGKey(11), b=1, s=64, d=128, m=256)
    x = args[0]
    full = pk.fused_ln_mlp(*args, 1e-5, save_acts=True)
    part = pk.fused_ln_mlp(*args, 1e-5, residual=False, save_acts=True)
    np.testing.assert_allclose(np.asarray(x + part), np.asarray(full),
                               rtol=2e-6, atol=2e-6)


def test_ln_mlp_int8_close_to_fp_and_grads_exact():
    """W8A8 forward must approximate the fp forward within dynamic-quant
    error; gradients use the same bf16-recompute backward kernel, so they
    must EXACTLY match the recompute variant's."""
    args = _mlp_args(jax.random.PRNGKey(12), b=2, s=64, d=128, m=256)
    out_fp = pk.fused_ln_mlp(*args, 1e-5)
    out_q = pk.fused_ln_mlp(*args, 1e-5, int8=True)
    # int8 dynamic quant: ~1% relative on the matmul outputs
    ref_scale = float(jnp.mean(jnp.abs(out_fp)))
    err = float(jnp.max(jnp.abs(out_q - out_fp)))
    assert err < 0.15 * ref_scale + 0.05, (err, ref_scale)

    # LINEAR loss so the cotangent is identical for both variants — the
    # int8 path shares the bf16-recompute backward kernel, so with equal
    # cotangents the grads must match exactly
    def loss(int8):
        def f(*a):
            return jnp.sum(pk.fused_ln_mlp(*a, 1e-5, int8=int8))
        return f

    ga = jax.grad(loss(False), argnums=(0, 3, 5))(*args)
    gb = jax.grad(loss(True), argnums=(0, 3, 5))(*args)
    for name, a, b_ in zip("x w1 w2".split(), ga, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_ln_qkvo_int8_close_to_fp_and_grads_exact():
    """int8 projections in the attention-half forward: output close to fp,
    gradients exact vs the fp variant under a linear loss (shared backward
    kernel)."""
    import math as _m
    b, s_, d, h, hd = 2, 64, 128, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(13), 6)
    x = jax.random.normal(ks[0], (b, s_, d))
    g = jnp.ones((d,), jnp.float32)
    be = jnp.zeros((d,), jnp.float32)
    wqkv = (jax.random.normal(ks[1], (d, 3 * d)) * d ** -0.5)
    bqkv = jax.random.normal(ks[2], (3 * d,)) * 0.02
    wo = (jax.random.normal(ks[3], (d, d)) * d ** -0.5)
    bo = jax.random.normal(ks[4], (d,)) * 0.02

    out_fp = pk.fused_ln_qkvo_attention(x, g, be, wqkv, bqkv, wo, bo,
                                        1e-5, s_, h, hd)
    out_q = pk.fused_ln_qkvo_attention(x, g, be, wqkv, bqkv, wo, bo,
                                       1e-5, s_, h, hd, True)
    scale = float(jnp.mean(jnp.abs(out_fp)))
    assert float(jnp.max(jnp.abs(out_q - out_fp))) < 0.15 * scale + 0.05

    def loss(int8):
        def f(x, wqkv, wo):
            return jnp.sum(pk.fused_ln_qkvo_attention(
                x, g, be, wqkv, bqkv, wo, bo, 1e-5, s_, h, hd, int8))
        return f

    ga = jax.grad(loss(False), argnums=(0, 1, 2))(x, wqkv, wo)
    gb = jax.grad(loss(True), argnums=(0, 1, 2))(x, wqkv, wo)
    for name, a, b_ in zip("x wqkv wo".split(), ga, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_ln_qkvo_int4_close_to_fp_and_grads_exact():
    """A4W4 projections in the attention-half forward (int4 tier): output
    within the wide 15-level dynamic-quant band of the fp forward (guards
    broken scales, not tight accuracy — PERF.md documents the band), and
    gradients EXACTLY equal to the fp variant's under a linear loss
    (int4 applies to the forward only; the backward kernel is shared)."""
    b, s_, d, h, hd = 2, 64, 128, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(23), 6)
    x = jax.random.normal(ks[0], (b, s_, d))
    g = jnp.ones((d,), jnp.float32)
    be = jnp.zeros((d,), jnp.float32)
    wqkv = (jax.random.normal(ks[1], (d, 3 * d)) * d ** -0.5)
    bqkv = jax.random.normal(ks[2], (3 * d,)) * 0.02
    wo = (jax.random.normal(ks[3], (d, d)) * d ** -0.5)
    bo = jax.random.normal(ks[4], (d,)) * 0.02

    out_fp = pk.fused_ln_qkvo_attention(x, g, be, wqkv, bqkv, wo, bo,
                                        1e-5, s_, h, hd)
    out_q = pk.fused_ln_qkvo_attention(x, g, be, wqkv, bqkv, wo, bo,
                                       1e-5, s_, h, hd, False, False, False,
                                       True)
    scale = float(jnp.mean(jnp.abs(out_fp)))
    assert float(jnp.mean(jnp.abs(out_q - out_fp))) < 0.6 * scale + 0.05

    def loss(**kw):
        def f(x, wqkv, wo):
            return jnp.sum(pk.fused_ln_qkvo_attention(
                x, g, be, wqkv, bqkv, wo, bo, 1e-5, s_, h, hd, **kw))
        return f

    ga = jax.grad(loss(), argnums=(0, 1, 2))(x, wqkv, wo)
    gb = jax.grad(loss(int4=True), argnums=(0, 1, 2))(x, wqkv, wo)
    for name, a, b_ in zip("x wqkv wo".split(), ga, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6, err_msg=name)

    g8 = jax.grad(loss(int8=True, int8_grad=True, int8_dw=True),
                  argnums=(0, 1, 2))(x, wqkv, wo)
    g4 = jax.grad(loss(int4=True, int8=True, int8_grad=True, int8_dw=True),
                  argnums=(0, 1, 2))(x, wqkv, wo)
    for name, a, b_ in zip("x wqkv wo".split(), g8, g4):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6, err_msg=name)

    # int4_grad: backward dx-path A4W4 — grads within the wide 15-level
    # band of the fp grads (guards broken scales/contractions, not tight
    # accuracy); forward unchanged vs int4
    gfp = jax.grad(loss(), argnums=(0, 1, 2))(x, wqkv, wo)
    g4g = jax.grad(loss(int4=True, int8=True, int8_grad=True, int8_dw=True,
                        int4_grad=True), argnums=(0, 1, 2))(x, wqkv, wo)
    for name, a, b_ in zip("x wqkv wo".split(), gfp, g4g):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.5 * scale + 1e-3, (name, err, scale)
    out_g = pk.fused_ln_qkvo_attention(x, g, be, wqkv, bqkv, wo, bo,
                                       1e-5, s_, h, hd, True, True, True,
                                       True, True)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_g))


def test_ln_mlp_int8_grad_close_to_fp():
    """SwitchBack backward (int8 dx-path): dx/dW within quantization error
    of the fp grads; db2 exact (no quantized operand on its path)."""
    args = _mlp_args(jax.random.PRNGKey(14), b=2, s=64, d=128, m=256)

    def loss(int8, int8_grad):
        def f(*a):
            return jnp.sum(pk.fused_ln_mlp(*a, 1e-5, int8=int8,
                                           int8_grad=int8_grad))
        return f

    ga = jax.grad(loss(True, False), argnums=tuple(range(7)))(*args)
    gb = jax.grad(loss(True, True), argnums=tuple(range(7)))(*args)
    for name, a, b_ in zip("x g be w1 b1 w2 b2".split(), ga, gb):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.05 * scale, (name, err, scale)
    np.testing.assert_allclose(np.asarray(gb[6]), np.asarray(ga[6]),
                               rtol=1e-6)  # db2 untouched by quantization


def test_ln_qkvo_int8_grad_close_to_fp():
    """int8 attention backward (recompute + dx-path W8A8): grads within a
    quantization band of the fp grads."""
    b, s_, d, h, hd = 2, 64, 128, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(15), 6)
    x = jax.random.normal(ks[0], (b, s_, d))
    g = jnp.ones((d,), jnp.float32)
    be = jnp.zeros((d,), jnp.float32)
    wqkv = jax.random.normal(ks[1], (d, 3 * d)) * d ** -0.5
    bqkv = jax.random.normal(ks[2], (3 * d,)) * 0.02
    wo = jax.random.normal(ks[3], (d, d)) * d ** -0.5
    bo = jax.random.normal(ks[4], (d,)) * 0.02

    def loss(int8_grad):
        def f(x, wqkv, wo):
            return jnp.sum(pk.fused_ln_qkvo_attention(
                x, g, be, wqkv, bqkv, wo, bo, 1e-5, s_, h, hd, True,
                int8_grad))
        return f

    ga = jax.grad(loss(False), argnums=(0, 1, 2))(x, wqkv, wo)
    gb = jax.grad(loss(True), argnums=(0, 1, 2))(x, wqkv, wo)
    for name, a, b_ in zip("x wqkv wo".split(), ga, gb):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.06 * scale, (name, err, scale)


def test_ln_qkvo_int8_dw_close_to_fp():
    """Per-block int8 dW/dWo in the attention backward (deepest tier):
    weight grads within a quantization band of the int8-grad variant."""
    b, s_, d, h, hd = 2, 64, 128, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(17), 6)
    x = jax.random.normal(ks[0], (b, s_, d))
    g = jnp.ones((d,), jnp.float32)
    be = jnp.zeros((d,), jnp.float32)
    wqkv = jax.random.normal(ks[1], (d, 3 * d)) * d ** -0.5
    bqkv = jax.random.normal(ks[2], (3 * d,)) * 0.02
    wo = jax.random.normal(ks[3], (d, d)) * d ** -0.5
    bo = jax.random.normal(ks[4], (d,)) * 0.02

    def loss(int8_dw):
        def f(x, wqkv, wo):
            return jnp.sum(pk.fused_ln_qkvo_attention(
                x, g, be, wqkv, bqkv, wo, bo, 1e-5, s_, h, hd, True,
                True, int8_dw))
        return f

    ga = jax.grad(loss(False), argnums=(0, 1, 2))(x, wqkv, wo)
    gb = jax.grad(loss(True), argnums=(0, 1, 2))(x, wqkv, wo)
    # dx path identical (int8_dw touches only the dW matmuls)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(ga[0]),
                               rtol=1e-6, atol=1e-6)
    for name, a, b_ in zip("wqkv wo".split(), ga[1:], gb[1:]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.06 * scale, (name, err, scale)


def test_ln_mlp_int8_dw_close_to_fp():
    """Per-block int8 dW (deepest tier): dW within a quantization band of
    the fp weight grads."""
    args = _mlp_args(jax.random.PRNGKey(16), b=2, s=64, d=128, m=256)

    def loss(int8_dw):
        def f(*a):
            return jnp.sum(pk.fused_ln_mlp(*a, 1e-5, int8=True,
                                           int8_grad=True, int8_dw=int8_dw))
        return f

    ga = jax.grad(loss(False), argnums=(3, 5))(*args)
    gb = jax.grad(loss(True), argnums=(3, 5))(*args)
    for name, a, b_ in zip("w1 w2".split(), ga, gb):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.06 * scale, (name, err, scale)


def test_ln_mlp_int4_close_to_fp_and_grads_exact():
    """A4W4 forward (deepest-precision tier): approximates the fp forward
    within the (wide) 15-level dynamic-quant band — this guards against
    broken scales (10x-wrong outputs), not tight accuracy, which PERF.md
    documents honestly. Gradients reuse the bf16-recompute backward, so
    under a LINEAR loss (equal cotangents) they must EXACTLY match the
    plain fused path's; with int8_grad=True they must match the int8-grad
    path's."""
    args = _mlp_args(jax.random.PRNGKey(19), b=2, s=64, d=128, m=256)
    x = args[0]
    out_fp = pk.fused_ln_mlp(*args, 1e-5)
    out_q = pk.fused_ln_mlp(*args, 1e-5, int4=True)
    # compare the MLP contribution (out - x): the residual dominates `out`
    # and would mask a broken MLP path
    delta_fp = out_fp - x
    delta_q = out_q - x
    scale = float(jnp.mean(jnp.abs(delta_fp)))
    err = float(jnp.mean(jnp.abs(delta_q - delta_fp)))
    assert err < 0.6 * scale + 0.05, (err, scale)

    def loss(**kw):
        def f(*a):
            return jnp.sum(pk.fused_ln_mlp(*a, 1e-5, **kw))
        return f

    ga = jax.grad(loss(), argnums=(0, 3, 5))(*args)
    gb = jax.grad(loss(int4=True), argnums=(0, 3, 5))(*args)
    for name, a, b_ in zip("x w1 w2".split(), ga, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6, err_msg=name)

    g8 = jax.grad(loss(int8=True, int8_grad=True, int8_dw=True),
                  argnums=(0, 3, 5))(*args)
    g4 = jax.grad(loss(int4=True, int8_grad=True, int8_dw=True),
                  argnums=(0, 3, 5))(*args)
    for name, a, b_ in zip("x w1 w2".split(), g8, g4):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_ln_mlp_int4_grad_within_band():
    """A4W4 backward dx-path (int4_grad, deepest gradient tier): the
    forward is the unchanged int4 forward (bit-identical), and the grads
    land within the wide 15-level quantization band of the fp grads —
    this guards broken scales / transposed contractions, not tight
    accuracy (PERF.md documents the band). db2's path has no quantized
    operand, so it stays exact."""
    args = _mlp_args(jax.random.PRNGKey(21), b=2, s=64, d=128, m=256)

    def loss(**kw):
        def f(*a):
            return jnp.sum(pk.fused_ln_mlp(*a, 1e-5, **kw))
        return f

    out_a = pk.fused_ln_mlp(*args, 1e-5, int4=True)
    out_b = pk.fused_ln_mlp(*args, 1e-5, int4=True, int4_grad=True)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    gfp = jax.grad(loss(), argnums=tuple(range(7)))(*args)
    for dw_kw in (dict(int8_grad=True, int8_dw=True), dict()):
        g4 = jax.grad(loss(int4=True, int4_grad=True, **dw_kw),
                      argnums=tuple(range(7)))(*args)
        for name, a, b_ in zip("x g be w1 b1 w2 b2".split(), gfp, g4):
            scale = float(jnp.max(jnp.abs(a))) + 1e-6
            err = float(jnp.max(jnp.abs(b_ - a)))
            assert err < 0.5 * scale + 1e-3, (name, err, scale, dw_kw)
        np.testing.assert_allclose(np.asarray(g4[6]), np.asarray(gfp[6]),
                                   rtol=1e-5)  # db2 untouched


def test_ln_mlp_int8_save_matches_int8_recompute():
    """int8 save-acts (h1q/sh/g'q persisted, pure-int8-matmul backward):
    forward identical to the int8 forward; grads within a small band of the
    int8-recompute backward (the only extra error sources are the static
    g' quantization and h1q feeding dW2 directly)."""
    args = _mlp_args(jax.random.PRNGKey(18), b=2, s=64, d=128, m=256)

    def fwd(save):
        return pk.fused_ln_mlp(*args, 1e-5, save_acts=save, int8=True,
                               int8_grad=True)

    np.testing.assert_allclose(np.asarray(fwd(True)), np.asarray(fwd(False)),
                               rtol=1e-6, atol=1e-6)

    def loss(save):
        def f(*a):
            return jnp.sum(pk.fused_ln_mlp(*a, 1e-5, save_acts=save,
                                           int8=True, int8_grad=True))
        return f

    ga = jax.grad(loss(False), argnums=tuple(range(7)))(*args)
    gb = jax.grad(loss(True), argnums=tuple(range(7)))(*args)
    for name, a, b_ in zip("x g be w1 b1 w2 b2".split(), ga, gb):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.08 * scale, (name, err, scale)


def test_ln_mlp_int8_save_int8_dw():
    """int8 save-acts with the int8 dW tier on: weight grads within a
    quantization band of the bf16-dW save variant."""
    args = _mlp_args(jax.random.PRNGKey(19), b=2, s=64, d=128, m=256)

    def loss(int8_dw):
        def f(*a):
            return jnp.sum(pk.fused_ln_mlp(*a, 1e-5, save_acts=True,
                                           int8=True, int8_grad=True,
                                           int8_dw=int8_dw))
        return f

    ga = jax.grad(loss(False), argnums=(3, 5))(*args)
    gb = jax.grad(loss(True), argnums=(3, 5))(*args)
    for name, a, b_ in zip("w1 w2".split(), ga, gb):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.06 * scale, (name, err, scale)


def _rect_setup(key, b=2, s=37, cap=17, d=128, h=4, hd=32):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (b, s, d))
    g = 1.0 + 0.1 * jax.random.normal(ks[5], (d,), jnp.float32)
    be = 0.1 * jax.random.normal(ks[4], (d,), jnp.float32)
    wqkv = jax.random.normal(ks[1], (d, 3 * h * hd)) * d ** -0.5
    bqkv = jax.random.normal(ks[2], (3 * h * hd,)) * 0.02
    wo = jax.random.normal(ks[3], (h * hd, d)) * d ** -0.5
    bo = jnp.zeros((d,), jnp.float32)
    # arbitrary per-image gather indices (unique, unsorted)
    idx = jnp.stack([jax.random.permutation(jax.random.fold_in(key, i), s
                                            )[:cap] for i in range(b)])
    return x, g, be, wqkv, bqkv, wo, bo, idx


def _pad_rows(t, rows):
    return jnp.pad(t, ((0, 0), (0, rows - t.shape[1]), (0, 0)))


def test_ln_qkvo_rect_matches_square_gather():
    """Rect (compacted-Q) fused attention == square kernel + row gather:
    forward bit-close (identical per-row math) for bf16 AND int8 paths."""
    b, s, cap, d, h, hd = 2, 37, 17, 128, 4, 32
    x, g, be, wqkv, bqkv, wo, bo, idx = _rect_setup(
        jax.random.PRNGKey(31), b, s, cap, d, h, hd)
    spq = (s + 7) // 8 * 8
    cpq = (cap + 7) // 8 * 8
    xp = _pad_rows(x, spq)
    xc = jnp.take_along_axis(x, idx[..., None], axis=1)
    xcp = _pad_rows(xc, cpq)
    for int8 in (False, True):
        sq = pk.fused_ln_qkvo_attention(xp, g, be, wqkv, bqkv, wo, bo,
                                        1e-5, s, h, hd, int8)[:, :s]
        ref = jnp.take_along_axis(sq, idx[..., None], axis=1)
        rect = pk.fused_ln_qkvo_attention_rect(
            xcp, xp, g, be, wqkv, bqkv, wo, bo, 1e-5, s, h, hd,
            int8)[:, :cap]
        np.testing.assert_allclose(np.asarray(rect), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"int8={int8}")


def test_ln_qkvo_rect_grads_match_square_gather():
    """Gradients of the rect path == gradients of square+gather (the outer
    one-hot gather transpose scatters dxc; LN backward is linear in the
    cotangent, so the split-row-set formulation is exact up to fp
    associativity)."""
    b, s, cap, d, h, hd = 2, 37, 17, 128, 4, 32
    x, g, be, wqkv, bqkv, wo, bo, idx = _rect_setup(
        jax.random.PRNGKey(32), b, s, cap, d, h, hd)
    spq = (s + 7) // 8 * 8
    cpq = (cap + 7) // 8 * 8
    onehot = (idx[:, :, None] == jnp.arange(s)[None, None, :]
              ).astype(x.dtype)                                # [B, cap, S]

    def loss_sq(x, g, be, wqkv, bqkv, wo, bo):
        out = pk.fused_ln_qkvo_attention(
            _pad_rows(x, spq), g, be, wqkv, bqkv, wo, bo,
            1e-5, s, h, hd)[:, :s]
        kept = jnp.einsum("bcs,bsd->bcd", onehot, out)
        return jnp.sum(kept * (1 + 0.1 * jnp.arange(d)))

    def loss_rect(x, g, be, wqkv, bqkv, wo, bo):
        xc = jnp.einsum("bcs,bsd->bcd", onehot, x)
        out = pk.fused_ln_qkvo_attention_rect(
            _pad_rows(xc, cpq), _pad_rows(x, spq), g, be, wqkv, bqkv,
            wo, bo, 1e-5, s, h, hd)[:, :cap]
        return jnp.sum(out * (1 + 0.1 * jnp.arange(d)))

    args = (x, g, be, wqkv, bqkv, wo, bo)
    ga = jax.grad(loss_sq, argnums=tuple(range(7)))(*args)
    gb = jax.grad(loss_rect, argnums=tuple(range(7)))(*args)
    for name, a, b_ in zip("x g be wqkv bqkv wo bo".split(), ga, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_ln_qkvo_rect_int8_grads_close_to_square():
    """int8-grad (+int8_dw) rect backward vs square+gather: the per-row
    dynamic quantization grids differ (dq/dkv rows are quantized separately
    instead of as one [3·H·Hd] row), so equality holds to an int8-noise
    band, mirroring the TP shard-split tolerance."""
    b, s, cap, d, h, hd = 2, 37, 17, 128, 4, 32
    x, g, be, wqkv, bqkv, wo, bo, idx = _rect_setup(
        jax.random.PRNGKey(33), b, s, cap, d, h, hd)
    spq = (s + 7) // 8 * 8
    cpq = (cap + 7) // 8 * 8
    onehot = (idx[:, :, None] == jnp.arange(s)[None, None, :]
              ).astype(x.dtype)

    def loss_sq(x, wqkv, wo):
        out = pk.fused_ln_qkvo_attention(
            _pad_rows(x, spq), g, be, wqkv, bqkv, wo, bo,
            1e-5, s, h, hd, True, True, True)[:, :s]
        return jnp.sum(jnp.einsum("bcs,bsd->bcd", onehot, out) ** 2)

    def loss_rect(x, wqkv, wo):
        xc = jnp.einsum("bcs,bsd->bcd", onehot, x)
        out = pk.fused_ln_qkvo_attention_rect(
            _pad_rows(xc, cpq), _pad_rows(x, spq), g, be, wqkv, bqkv,
            wo, bo, 1e-5, s, h, hd, True, True, True)[:, :cap]
        return jnp.sum(out ** 2)

    ga = jax.grad(loss_sq, argnums=(0, 1, 2))(x, wqkv, wo)
    gb = jax.grad(loss_rect, argnums=(0, 1, 2))(x, wqkv, wo)
    for name, a, b_ in zip("x wqkv wo".split(), ga, gb):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.06 * scale, (name, err, scale)


def test_ln_qkvo_rect_int4_grad_within_band():
    """A4W4 rect backward dx-path (int4_grad): grads within the wide
    15-level band of the fp square+gather grads — guards broken scales /
    transposed contractions in the quantizer-switched rect backward."""
    b, s, cap, d, h, hd = 2, 37, 17, 128, 4, 32
    x, g, be, wqkv, bqkv, wo, bo, idx = _rect_setup(
        jax.random.PRNGKey(35), b, s, cap, d, h, hd)
    spq = (s + 7) // 8 * 8
    cpq = (cap + 7) // 8 * 8
    onehot = (idx[:, :, None] == jnp.arange(s)[None, None, :]
              ).astype(x.dtype)

    def loss_sq(x, wqkv, wo):
        out = pk.fused_ln_qkvo_attention(
            _pad_rows(x, spq), g, be, wqkv, bqkv, wo, bo,
            1e-5, s, h, hd)[:, :s]
        return jnp.sum(jnp.einsum("bcs,bsd->bcd", onehot, out) ** 2)

    def loss_rect(x, wqkv, wo):
        xc = jnp.einsum("bcs,bsd->bcd", onehot, x)
        out = pk.fused_ln_qkvo_attention_rect(
            _pad_rows(xc, cpq), _pad_rows(x, spq), g, be, wqkv, bqkv,
            wo, bo, 1e-5, s, h, hd, True, True, True, True,
            True)[:, :cap]
        return jnp.sum(out ** 2)

    ga = jax.grad(loss_sq, argnums=(0, 1, 2))(x, wqkv, wo)
    gb = jax.grad(loss_rect, argnums=(0, 1, 2))(x, wqkv, wo)
    for name, a, b_ in zip("x wqkv wo".split(), ga, gb):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(b_ - a)))
        assert err < 0.5 * scale + 1e-3, (name, err, scale)


def test_ln_qkvo_rect_int4_matches_square_int4_gather():
    """A4W4 rect forward == square int4 kernel + gather (per-row int4
    quantization is identical per row), and grads equal the shared
    backward's."""
    b, s, cap, d, h, hd = 2, 37, 17, 128, 4, 32
    x, g, be, wqkv, bqkv, wo, bo, idx = _rect_setup(
        jax.random.PRNGKey(34), b, s, cap, d, h, hd)
    spq = (s + 7) // 8 * 8
    cpq = (cap + 7) // 8 * 8
    xp = _pad_rows(x, spq)
    xc = jnp.take_along_axis(x, idx[..., None], axis=1)
    xcp = _pad_rows(xc, cpq)
    sq = pk.fused_ln_qkvo_attention(xp, g, be, wqkv, bqkv, wo, bo,
                                    1e-5, s, h, hd, False, False, False,
                                    True)[:, :s]
    ref = jnp.take_along_axis(sq, idx[..., None], axis=1)
    rect = pk.fused_ln_qkvo_attention_rect(
        xcp, xp, g, be, wqkv, bqkv, wo, bo, 1e-5, s, h, hd,
        False, False, False, True)[:, :cap]
    np.testing.assert_allclose(np.asarray(rect), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    onehot = (idx[:, :, None] == jnp.arange(s)[None, None, :]
              ).astype(x.dtype)

    def loss(int4):
        def f(x, wqkv, wo):
            xc = jnp.einsum("bcs,bsd->bcd", onehot, x)
            out = pk.fused_ln_qkvo_attention_rect(
                _pad_rows(xc, cpq), _pad_rows(x, spq), g, be, wqkv, bqkv,
                wo, bo, 1e-5, s, h, hd, False, False, False, int4)[:, :cap]
            return jnp.sum(out * (1 + 0.1 * jnp.arange(d)))
        return f

    ga = jax.grad(loss(False), argnums=(0, 1, 2))(x, wqkv, wo)
    gb = jax.grad(loss(True), argnums=(0, 1, 2))(x, wqkv, wo)
    for name, a, b_ in zip("x wqkv wo".split(), ga, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_chunked_dw_backward_matches_monolithic():
    """d > 1024 routes the fused-MLP backward through the chunked-dW
    kernel (bf16 HBM partials, VERDICT r4 #3). Grads must match the
    monolithic kernel: dx/LN-grads fp32-exact, dW within one bf16 ulp."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitax.ops import pallas_kernels as pk

    n, d, m = 64, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x2 = jax.random.normal(ks[0], (n, d), jnp.float32)
    gamma = jnp.abs(jax.random.normal(ks[1], (d,), jnp.float32)) + 0.5
    beta = jax.random.normal(ks[2], (d,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (d, m), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[4], (m,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[5], (m, d), jnp.float32) * 0.05
    do2 = jax.random.normal(ks[6], (n, d), jnp.float32)

    mono = pk._ln_mlp_bwd_call(x2, gamma, beta, w1, b1, w2, do2, 1e-5, True)
    chk = pk._ln_mlp_bwd_chunked_call(x2, gamma, beta, w1, b1, w2, do2,
                                      1e-5, True)
    names = ["dx", "dg", "dbe", "dw1", "db1", "dw2", "db2"]
    for nm, a, b in zip(names, mono, chk):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(a).max())
        tol = 5e-3 if nm.startswith("dw") else 1e-5
        assert np.abs(a - b).max() / scale < tol, nm


def test_ln_mlp_supported_admits_h14_geometry():
    import jax.numpy as jnp
    from vitax.ops import pallas_kernels as pk
    x = jnp.zeros((2, 8, 1280), jnp.bfloat16)
    w1 = jnp.zeros((1280, 5120), jnp.bfloat16)
    w2 = jnp.zeros((5120, 1280), jnp.bfloat16)
    assert pk.ln_mlp_supported(x, w1, w2)
    # monolithic sizes still admitted
    xb = jnp.zeros((2, 8, 768), jnp.bfloat16)
    assert pk.ln_mlp_supported(xb, jnp.zeros((768, 3072), jnp.bfloat16),
                               jnp.zeros((3072, 768), jnp.bfloat16))
